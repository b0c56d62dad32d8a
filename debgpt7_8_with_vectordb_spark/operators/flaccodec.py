"""FLAC sample decode (RFC 9639 / flac format spec), zero dependencies.

FLAC is LOSSLESS and pure integer — rice-coded residuals over
constant / verbatim / fixed-polynomial / LPC predictors — so unlike the
MP3/H.264 stubs it is fully expressible with stdlib bit twiddling. This
gives the audio side what the image side already has: real CONTENT
decode (``decode_flac_samples``) behind the same dispatch as WAV PCM,
not just STREAMINFO metadata.

Decoder coverage: fixed and variable blocking strategies, UTF-8-style
coded frame/sample numbers, all four subframe types (CONSTANT,
VERBATIM, FIXED orders 0-4, LPC orders 1-32), wasted-bits shifts, both
rice coding methods (4- and 5-bit parameters) incl. escape-to-raw
partitions, stereo decorrelation (left/side, right/side, mid/side),
8/16/24-bit sample sizes, and CRC-8 header verification (desync guard).
Returns ``(channels, sample_rate, bits, samples)`` with samples
channel-interleaved in frame order — the ``decode_wav_samples``
contract — or None for malformed/unsupported payloads.

Encoder (``encode_test_flac_stream``): the forward fixture oracle (no
audio libraries in this container) — fixed-blocksize frames, per-frame
choice of subframe strategy (constant detection, verbatim, fixed
order-2 with rice residuals, order-1 LPC, mid/side or left/side
decorrelation), real CRC-8/CRC-16 footers. Round-trip equality is exact
because the format is lossless.
"""

from __future__ import annotations

import struct

_BLOCKSIZE_CODES = {
    # code -> block size (None = read 8/16 bits from header)
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_BPS_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}


def _crc8(data: bytes) -> int:
    """CRC-8 with polynomial x^8 + x^2 + x + 1 (0x07), init 0."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16 with polynomial 0x8005, init 0 (FLAC frame footer)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        while n:
            if self.pos >= len(self.data):
                raise ValueError("flac bitstream truncated")
            avail = 8 - self.bit
            take = min(n, avail)
            byte = self.data[self.pos]
            v = (v << take) | ((byte >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
            n -= take
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1_000_000:
                raise ValueError("runaway unary")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _coded_number(bits: _Bits) -> int:
    """UTF-8-style variable-length frame/sample number (up to 7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("bad coded number")
    v = b0 & (mask - 1)
    for _ in range(n):
        cont = bits.read(8)
        if cont >> 6 != 0b10:
            raise ValueError("bad coded-number continuation")
        v = (v << 6) | (cont & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("partition does not divide block")
    out = []
    for p in range(nparts):
        count = (blocksize >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise ValueError("partition shorter than predictor order")
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(count):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(count):
                q = bits.unary()
                v = (q << param) | bits.read(param)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("subframe pad bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        out = [bits.read_signed(eff)] * blocksize
    elif stype == 1:  # VERBATIM
        out = [bits.read_signed(eff) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED, order 0-4
        order = stype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFS[order]
        out = warm[:]
        for r in resid:
            pred = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + pred)
    elif stype >= 32:  # LPC, order 1-32
        order = (stype & 31) + 1
        warm = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4) + 1
        if prec == 16:
            raise ValueError("invalid lpc precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative lpc shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        out = warm[:]
        for r in resid:
            acc = sum(c * out[-1 - j] for j, c in enumerate(coefs))
            out.append(r + (acc >> shift))
    else:
        raise ValueError("reserved subframe type")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac_samples(
    payload: bytes,
) -> tuple[int, int, int, list[int]] | None:
    """REAL lossless sample decode for FLAC streams; see module doc."""
    try:
        return _decode_flac(payload)
    except Exception:
        return None


def _decode_flac(payload: bytes):
    from .audio_headers import parse_flac_header

    info = parse_flac_header(payload)
    if info is None:
        return None
    _, channels, rate, bits_ps, total = info
    # Adversarial-input bound: STREAMINFO's 36-bit sample count can
    # claim 64G samples against a 100-byte body; the decoder would
    # grow the sample lists until the task OOMs. Even a CONSTANT
    # subframe spends >= ~40 bits per FRAME, and a frame covers at
    # most 65535 samples — so total samples are bounded by
    # payload_bits * 65535 / 40; use a simpler, looser per-channel
    # cap: 16384 samples per payload byte.
    if total * channels > len(payload) * 16384:
        return None
    # skip metadata blocks to the first frame
    pos = 4
    while True:
        if pos + 4 > len(payload):
            return None
        hdr = payload[pos]
        (blen,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        pos += 4 + blen
        if hdr & 0x80:  # last-metadata-block flag
            break
    samples: list[list[int]] = [[] for _ in range(channels)]
    got = 0
    while got < total:
        if pos >= len(payload):
            return None  # stream shorter than STREAMINFO promised
        frame_start = pos
        bits = _Bits(payload, pos)
        if bits.read(14) != 0b11111111111110:
            raise ValueError("lost frame sync")
        if bits.read(1):
            raise ValueError("reserved sync bit")
        bits.read(1)  # blocking strategy (number semantics only)
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        bps_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved header bit")
        _coded_number(bits)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_CODES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        elif sr_code and sr_code in _RATE_CODES and _RATE_CODES[sr_code] != rate:
            raise ValueError("frame rate disagrees with STREAMINFO")
        bps = _BPS_CODES.get(bps_code, bits_ps) if bps_code else bits_ps
        if bps != bits_ps:
            raise ValueError("frame bps disagrees with STREAMINFO")
        # CRC-8 covers the header bytes up to (not incl.) the CRC byte
        bits.align()
        if _crc8(payload[frame_start : bits.pos]) != bits.read(8):
            raise ValueError("frame header CRC mismatch")
        if ch_code < 8:
            nch = ch_code + 1
            if nch != channels:
                raise ValueError("frame channels disagree with STREAMINFO")
            chans = [_decode_subframe(bits, blocksize, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("decorrelated frame in non-stereo stream")
            extra_first = 1 if ch_code == 9 else 0
            a = _decode_subframe(bits, blocksize, bps + extra_first)
            b = _decode_subframe(
                bits, blocksize, bps + (0 if ch_code == 9 else 1)
            )
            if ch_code == 8:  # left/side: right = left - side
                chans = [a, [x - s for x, s in zip(a, b)]]
            elif ch_code == 9:  # right/side: left = right + side
                chans = [[x + s for x, s in zip(b, a)], b]
            else:  # mid/side
                left, right = [], []
                for m, s in zip(a, b):
                    m = (m << 1) | (s & 1)
                    left.append((m + s) >> 1)
                    right.append((m - s) >> 1)
                chans = [left, right]
        else:
            raise ValueError("reserved channel assignment")
        bits.align()
        crc_footer = bits.read(16)
        if _crc16(payload[frame_start : bits.pos - 2]) != crc_footer:
            raise ValueError("frame footer CRC mismatch")
        take = min(blocksize, total - got)
        for ci in range(channels):
            samples[ci].extend(chans[ci][:take])
        got += take
        pos = bits.pos
    interleaved: list[int] = []
    for i in range(got):
        for ci in range(channels):
            interleaved.append(samples[ci][i])
    return channels, rate, bits_ps, interleaved


# ------------------------------------------------------------- encoder


class _BitsW:
    """MSB-first bit writer."""

    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        if n:
            self.acc = (self.acc << n) | (v & ((1 << n) - 1))
            self.nbits += n
            while self.nbits >= 8:
                self.nbits -= 8
                self.buf.append((self.acc >> self.nbits) & 0xFF)
            self.acc &= (1 << self.nbits) - 1

    def unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _rice_write(bw: _BitsW, values, param: int) -> None:
    for v in values:
        # zigzag: non-negative -> 2v, negative -> -2v-1
        u = (v << 1) if v >= 0 else (((-v) << 1) - 1)
        bw.unary(u >> param)
        bw.write(u & ((1 << param) - 1), param)


def _best_rice_param(values) -> int:
    best, best_bits = 0, None
    for param in range(15):
        total = sum((((v << 1) if v >= 0 else ((-v) << 1) - 1) >> param) + 1 + param for v in values)
        if best_bits is None or total < best_bits:
            best, best_bits = param, total
    return best


def _enc_subframe(bw: _BitsW, chan, bps: int, strategy: str) -> None:
    if strategy == "constant" and all(v == chan[0] for v in chan):
        bw.write(0, 1)
        bw.write(0, 6)
        bw.write(0, 1)
        bw.write(chan[0] & ((1 << bps) - 1), bps)
        return
    if strategy == "verbatim":
        bw.write(0, 1)
        bw.write(1, 6)
        bw.write(0, 1)
        for v in chan:
            bw.write(v & ((1 << bps) - 1), bps)
        return
    if strategy == "lpc1":  # order-1 LPC with coef 1, shift 0 == fixed-1
        order, coefs, shift = 1, (1,), 0
        bw.write(0, 1)
        bw.write(0b100000, 6)  # LPC order 1
        bw.write(0, 1)
        for v in chan[:order]:
            bw.write(v & ((1 << bps) - 1), bps)
        bw.write(14, 4)  # precision 15
        bw.write(shift, 5)
        for c in coefs:
            bw.write(c & 0x7FFF, 15)
    else:  # fixed order 2 (order 1 warmup fallback for tiny blocks)
        order = 2 if len(chan) > 2 else min(1, len(chan) - 1)
        coefs = _FIXED_COEFS[order]
        bw.write(0, 1)
        bw.write(8 + order, 6)
        bw.write(0, 1)
        for v in chan[:order]:
            bw.write(v & ((1 << bps) - 1), bps)
        shift = 0
    resid = []
    for i in range(order, len(chan)):
        pred = sum(c * chan[i - 1 - j] for j, c in enumerate(coefs))
        if shift:
            pred >>= shift
        resid.append(chan[i] - pred)
    bw.write(0, 2)  # rice method 0 (4-bit params)
    bw.write(0, 4)  # partition order 0
    param = _best_rice_param(resid) if resid else 0
    bw.write(param, 4)
    _rice_write(bw, resid, param)


def encode_test_flac_stream(
    channels: int,
    sample_rate: int,
    bps: int,
    samples,
    blocksize: int = 256,
    strategy: str = "fixed",
    stereo_mode: str = "independent",
) -> bytes:
    """Forward FLAC writer for round-trip fixtures: fixed-blocksize
    frames; ``strategy`` picks the subframe coder (constant / verbatim
    / fixed / lpc1); ``stereo_mode`` adds left/side or mid/side
    decorrelation for 2-channel input. Samples are channel-interleaved
    ints matching ``bps``."""
    total = len(samples) // channels
    chans = [samples[c::channels] for c in range(channels)]
    out = bytearray(b"fLaC")
    packed = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bps - 1) << 36)
        | total
    )
    body = (
        struct.pack(">HH", blocksize, blocksize)
        + b"\x00\x00\x00" * 2
        + packed.to_bytes(8, "big")
        + b"\x00" * 16
    )
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    frame_no = 0
    pos = 0
    while pos < total:
        n = min(blocksize, total - pos)
        bw = _BitsW()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocking strategy
        bw.write(7, 4)  # block size: 16-bit minus one follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        block = [ch[pos : pos + n] for ch in chans]
        if channels == 2 and stereo_mode == "left_side":
            bw.write(8, 4)
            parts = [block[0], [l - r for l, r in zip(block[0], block[1])]]
            extra = [0, 1]
        elif channels == 2 and stereo_mode == "mid_side":
            bw.write(10, 4)
            parts = [
                [(l + r) >> 1 for l, r in zip(block[0], block[1])],
                [l - r for l, r in zip(block[0], block[1])],
            ]
            extra = [0, 1]
        else:
            bw.write(channels - 1, 4)
            parts = block
            extra = [0] * channels
        bw.write({8: 1, 16: 4, 24: 6}[bps], 3)
        bw.write(0, 1)
        # coded frame number (UTF-8 style, single byte for < 128)
        if frame_no < 0x80:
            bw.write(frame_no, 8)
        else:
            bw.write(0b110 << 5 | (frame_no >> 6), 8)
            bw.write(0b10 << 6 | (frame_no & 0x3F), 8)
        bw.write(n - 1, 16)
        bw.align()
        header = bytes(bw.buf)
        bw.write(_crc8(header), 8)
        for part, ex in zip(parts, extra):
            _enc_subframe(bw, part, bps + ex, strategy)
        bw.align()
        frame_wo_crc = bytes(bw.buf)
        bw.write(_crc16(frame_wo_crc), 16)
        out += bw.buf
        pos += n
        frame_no += 1
    return bytes(out)

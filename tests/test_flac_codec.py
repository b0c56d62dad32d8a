"""FLAC sample decode (operators/flaccodec.py): lossless round-trips
through the forward writer across subframe types, stereo decorrelation
modes, bit depths and blocking edge cases; CRC desync guards; and the
``decode_audio_pcm_stats`` dispatch — the same audio must yield
IDENTICAL stats whether shipped as WAV PCM or FLAC."""

from __future__ import annotations

import numpy as np
import pytest

from debgpt7_8_with_vectordb_spark.operators.audio_headers import (
    parse_audio_header,
)
from debgpt7_8_with_vectordb_spark.operators.flaccodec import (
    _crc8,
    _crc16,
    decode_flac_samples,
    encode_test_flac_stream,
)
from debgpt7_8_with_vectordb_spark.operators.multimodal import (
    decode_audio_pcm_stats,
    decode_audio_samples,
    encode_test_wav_patterned,
)


def _sine(n: int, amp: int = 3000, seed: int = 3) -> list[int]:
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (amp * np.sin(t / 20) + rng.integers(-50, 50, n)).astype(int).tolist()


def test_crc_vectors():
    # classic check vectors for the two polynomials
    assert _crc8(b"123456789") == 0xF4  # CRC-8/SMBUS (poly 0x07, init 0)
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/UMTS (poly 0x8005, init 0)


@pytest.mark.parametrize(
    "strategy", ["fixed", "verbatim", "lpc1", "constant"]
)
def test_mono_roundtrip_strategies(strategy):
    samples = [123] * 500 if strategy == "constant" else _sine(1000)
    raw = encode_test_flac_stream(1, 44100, 16, samples, strategy=strategy)
    assert decode_flac_samples(raw) == (1, 44100, 16, samples)


@pytest.mark.parametrize(
    "stereo_mode", ["independent", "left_side", "mid_side"]
)
def test_stereo_decorrelation_roundtrip(stereo_mode):
    rng = np.random.default_rng(9)
    st = []
    for i in range(700):
        left = int(2000 * np.sin(i / 15))
        st += [left, left - 10 + int(rng.integers(-3, 4))]
    raw = encode_test_flac_stream(2, 48000, 16, st, stereo_mode=stereo_mode)
    assert decode_flac_samples(raw) == (2, 48000, 16, st)


def test_bit_depths_and_blocking():
    rng = np.random.default_rng(4)
    s8 = rng.integers(-128, 128, 333).tolist()
    assert decode_flac_samples(
        encode_test_flac_stream(1, 8000, 8, s8)
    ) == (1, 8000, 8, s8)
    s24 = rng.integers(-(2**23), 2**23, 400).tolist()
    assert decode_flac_samples(
        encode_test_flac_stream(2, 96000, 24, s24, stereo_mode="mid_side")
    ) == (2, 96000, 24, s24)
    # short tail block + >128 frames exercises the coded-number path
    tail = _sine(777)
    assert decode_flac_samples(
        encode_test_flac_stream(1, 44100, 16, tail, blocksize=100)
    ) == (1, 44100, 16, tail)
    many = rng.integers(-1000, 1000, 20 * 140).tolist()
    assert decode_flac_samples(
        encode_test_flac_stream(1, 44100, 16, many, blocksize=20)
    ) == (1, 44100, 16, many)


def test_crc_guards_and_malformed():
    raw = encode_test_flac_stream(1, 44100, 16, _sine(600))
    assert decode_flac_samples(raw[:200]) is None  # truncated
    bad = bytearray(raw)
    bad[60] ^= 0xFF  # flip a bit mid-frame: CRC must catch it
    assert decode_flac_samples(bytes(bad)) is None
    assert decode_flac_samples(b"fLaC") is None
    assert decode_flac_samples(b"RIFF....WAVE") is None


def test_header_parser_agrees_with_sample_decode():
    samples = _sine(512)
    raw = encode_test_flac_stream(2, 22050, 16, samples)
    hdr = parse_audio_header(raw)
    dec = decode_audio_samples(raw)
    assert hdr == ("flac", 2, 22050, 16, 256)  # 512 interleaved = 256 frames
    assert dec[0] == 2 and len(dec[3]) == 512


@pytest.fixture(scope="module")
def spark():
    from debgpt7_8_with_vectordb_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def test_pcm_stats_identical_for_wav_and_flac(spark):
    # the same patterned audio shipped both ways must produce the same
    # stats row (lossless means lossless)
    wav = encode_test_wav_patterned(2, 8000, 16, 200, seed=7)
    w = decode_audio_samples(wav)
    flac = encode_test_flac_stream(2, 8000, 16, w[3], stereo_mode="left_side")
    df = spark.createDataFrame(
        [(1, wav), (2, flac), (3, b"not audio")],
        "doc_id long, payload binary",
    )
    rows = {r["doc_id"]: r for r in decode_audio_pcm_stats(df).collect()}
    for col in ("channels", "sample_rate", "bits", "n_samples",
                "sample_sum", "sample_min", "sample_max", "duration_ms"):
        assert rows[1][col] == rows[2][col], col
    assert rows[3]["channels"] is None

"""Multimodal column plumbing — image/audio/video as opaque binary.

Design for a 100 TB media corpus: payloads live in a ``binary`` column
(or content-addressed object-store paths) beside typed metadata columns;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes cross the JVM↔Python boundary once per
batch, never per row.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode step is stubbed two ways:
- ``decode_image_stub``: raises NotImplementedError (the honest stub);
- ``fake_decode_metadata``: a deterministic fake (dimensions derived
  from the payload's md5) so the Spark-side plumbing — schema, batch
  shape, UDF signature — is fully real and testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "doc_id long, payload binary, media_type string"
DECODED_SCHEMA = "doc_id long, n_bytes long, digest string, width int, height int"


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fabricate an opaque binary payload column (UTF-8 bytes of the text
    stand in for image bytes; real pipelines read format('binaryFile'))."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_image_stub(payload: bytes) -> object:
    """Real decoder entry point — image libs absent in this container."""
    raise NotImplementedError(
        "image decode requires PIL/cv2; wire the real codec here in production"
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake dimensions from the payload hash (matches the
    md5-as-BIGINT convention in functions/hashing.py, so a SQL oracle can
    reproduce it)."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return 16 + h % 240, 16 + (h // 240) % 240


def fake_decode_metadata(media: DataFrame) -> DataFrame:
    """The decode stage: Arrow-batched mapInPandas over binary payloads →
    typed metadata. Swap ``_fake_dims`` for a real codec in production;
    the schema, partitioning, and batch shape are the real article."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            dims = [_fake_dims(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(decode, schema=DECODED_SCHEMA)


def frame_sample_stub(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.
    Frame decode itself is stubbed (no ffmpeg here); the fan-out schema
    and per-payload explode are real."""
    n_frames = (F.octet_length("payload") % 100 + 1).alias("n_frames")
    return (
        media.select("doc_id", n_frames)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
            ).alias("frame_idx"),
        )
    )

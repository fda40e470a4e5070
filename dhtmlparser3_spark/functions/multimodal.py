"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
``kind`` discriminator and a typed metadata struct.  The Spark-side plumbing
(schema, Arrow batching, mapInPandas signature, partitioning) is REAL and
tested; the actual codec step is a **deterministic fake** — this container
has no image/audio libraries.  Wire a real decoder by replacing
``_fake_decode`` (the try-import of PIL/soundfile below shows the seam).

Metadata schema: ``n_bytes`` (real), ``width/height/n_frames/sample_rate``
(fake but deterministic functions of the payload length, so the DuckDB
oracle can verify the full plumbing end-to-end).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, kind string, n_bytes int, width int, height int, "
    "n_frames int, sample_rate int, error string"
)

try:  # the real-decoder seam — not available in this container
    import PIL.Image  # type: ignore # noqa: F401

    _HAVE_PIL = True
except Exception:  # noqa: BLE001
    _HAVE_PIL = False


def media_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake media table derived from documents: payload = utf-8 bytes of the
    text, kind cycles image/audio/video by doc_id % 3."""
    from dhtmlparser3_spark.plans.layout import spread

    docs = spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
    )


def _fake_decode(kind: str, payload: bytes):
    """DETERMINISTIC FAKE decode — stands in for PIL/ffmpeg/soundfile.

    Real decode would go here (gated on _HAVE_PIL etc.); the fake keeps the
    full Spark plumbing testable: every value is a pure function of
    len(payload), reproducible in the SQL oracle.
    """
    n = len(payload)
    if kind == "image":
        return n, n % 640 + 1, (n * 7) % 480 + 1, None, None
    if kind == "audio":
        return n, None, None, None, 8000 + n % 48000
    if kind == "video":
        return n, n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1, None
    raise NotImplementedError(f"unknown media kind {kind!r}")


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, n_bytes_out int, payload binary"
)


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize plumbing over image rows: mapInPandas, binary in → binary out.

    The 'resample' is a deterministic fake (tile/truncate the payload to
    width*height//8 bytes) standing in for PIL's ``Image.resize``; schema,
    filtering, batching and output size are the real pipeline shape, and
    the byte count is oracle-checkable."""
    out_len = max(1, width * height // 8)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if not b:
                    b = b"\x00"
                reps = -(-out_len // len(b))  # ceil
                resized = (b * reps)[:out_len]
                rows.append((doc_id, width, height, len(resized), resized))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "width", "height", "n_bytes_out", "payload"],
            )

    return media.where(F.col("kind") == "image").mapInPandas(
        run, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx int, n_bytes int"


def sample_frames(media: DataFrame, every: int = 5) -> DataFrame:
    """Frame-sampling plumbing over video rows: one OUTPUT row per sampled
    frame (a fan-out mapInPandas — the batch shape a real ffmpeg-backed
    sampler needs).  n_frames and per-frame byte size are the deterministic
    fake-decode values so the row multiplication is oracle-checkable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                # ONE source of truth for the frame count: the decoder —
                # an inline copy of the formula would silently diverge
                # the day the decode seam changes
                n_frames = _fake_decode("video", b)[3]
                frame_bytes = n // n_frames
                for idx in range(0, n_frames, every):
                    rows.append((doc_id, idx, frame_bytes))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "n_bytes"]
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        run, schema=FRAME_SCHEMA
    )


FEATURES_SCHEMA = "doc_id bigint, features array<double>"


def media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature-extraction plumbing: payload → fixed-dim double vector via a
    deterministic md5-derived fake (stands in for an encoder model).  The
    output column feeds the similarity tier (cosine_topk / ANN) unchanged;
    values are 3-decimal doubles reproducible in the DuckDB oracle."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                vec = [
                    (
                        int(hashlib.md5(b + bytes([48 + i])).hexdigest()[:15], 16)
                        % 1000
                    )
                    / 1000.0
                    for i in range(dim)
                ]
                rows.append((doc_id, vec))
            yield pd.DataFrame(rows, columns=["doc_id", "features"])

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow batches of binary payloads."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, kind, payload in zip(
                pdf["doc_id"], pdf["kind"], pdf["payload"]
            ):
                try:
                    n, w, h, fr, sr = _fake_decode(kind, bytes(payload))
                    rows.append((doc_id, kind, n, w, h, fr, sr, None))
                except Exception as e:  # noqa: BLE001
                    rows.append(
                        (doc_id, kind, None, None, None, None, None, str(e))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "kind",
                    "n_bytes",
                    "width",
                    "height",
                    "n_frames",
                    "sample_rate",
                    "error",
                ],
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)

"""Multimodal (image/audio/video) column plumbing.

Media is carried as opaque ``binary`` columns plus a typed metadata struct
(the lakehouse-standard layout). The Spark-side plumbing — schemas,
partition-friendly metadata extraction, Arrow-batched UDF signatures via
``mapInPandas`` — is real and tested; the actual codec work is STUBBED
(``decode_stub=True`` produces deterministic fake features;
``decode_stub=False`` raises NotImplementedError) because no media
libraries exist in this container. Swapping the stub for PIL/librosa/ffmpeg
changes only the inner function, not the Spark plan.

Design notes for 100 TB:
  - metadata (mime/size/hash) is computed with built-in expressions, so
    filtering "jpeg under 5 MB" never deserializes a single byte in Python;
  - the Pandas UDF stage is the ONLY Python hop, batched by Arrow;
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
    for fat blobs;
  - feature extraction emits fixed-size arrays -> downstream is the vector
    pipeline (similarity.py) unchanged.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, payload binary, mime string, n_bytes bigint, sha256 string"
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = (
    "media_id bigint, mime string, n_bytes bigint, "
    f"features array<double>, decoder string"
)


def wrap_binary(
    df: DataFrame, id_col: str, payload_col: str, *, mime: str = "application/octet-stream"
) -> DataFrame:
    """Normalize any binary column into the canonical media layout.

    Metadata derives from built-ins (octet_length/sha2) — JVM-side, no UDF."""
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
        F.octet_length(F.col(payload_col).cast("binary")).cast("bigint").alias("n_bytes"),
        F.sha2(F.col(payload_col).cast("binary"), 256).alias("sha256"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Per-mime size/count stats — metadata only, never touches payloads."""
    return df.groupBy("mime").agg(
        F.count("*").alias("n_items"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


def _stub_features(payload: bytes | None) -> list[float]:
    """Deterministic fake embedding: byte histogram folded to FEATURE_DIM."""
    buckets = [0] * FEATURE_DIM
    if payload:
        for i, b in enumerate(payload[:4096]):
            buckets[b % FEATURE_DIM] += 1
        total = sum(buckets) or 1
        return [round(c / total, 6) for c in buckets]
    return [0.0] * FEATURE_DIM


def extract_features(
    df: DataFrame, *, decode_stub: bool = True, batch_size_hint: int = 256
) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; the
    decoder runs per-row inside the batch. With ``decode_stub=False`` this
    raises NotImplementedError where a real codec (PIL/librosa/decord)
    would decode — the Spark plumbing around it is production-shaped."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                if decode_stub:
                    feats.append(_stub_features(payload))
                else:
                    raise NotImplementedError(
                        "real media decoding requires codec libraries "
                        "(PIL/librosa/ffmpeg) not present in this environment"
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                    "decoder": "stub" if decode_stub else "real",
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, *, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """'Frame sampling' plumbing demo: emit (media_id, frame_idx, offset)
    rows for evenly spaced offsets — pure expressions (posexplode over a
    sequence), mirroring how video frame-sample fan-out is planned without
    decoding anything."""
    n_frames = F.least(
        F.greatest((F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    return df.select(
        "media_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_i"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).cast("bigint").alias("byte_offset"),
    )


_RESIZE_SCHEMA = (
    "media_id bigint, payload binary, mime string, n_bytes bigint, "
    "width int, height int, decoder string"
)


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    *,
    decode_stub: bool = True,
) -> DataFrame:
    """Arrow-batched media resize: binary in -> binary out with new
    dimension metadata. The production shape for image normalization ahead
    of feature extraction — payloads stay in the Arrow stream end to end,
    never widening into Python objects row-by-row.

    ``decode_stub=True`` produces a deterministic fake: the payload is
    hashed-and-tiled to ``3 * width * height`` bytes (a plausible RGB
    buffer size), so downstream size/metadata logic is fully testable;
    ``decode_stub=False`` raises NotImplementedError where PIL/ffmpeg
    would decode-resize-encode. Swapping the stub changes only the inner
    function — schema, batching, and plan are identical."""
    if width <= 0 or height <= 0:
        raise ValueError(f"width/height must be positive, got {width}x{height}")
    if not decode_stub:
        # fail fast on the driver — not per-row inside an executor closure
        # after a job has already launched
        raise NotImplementedError(
            "real media resizing requires codec libraries (PIL/ffmpeg) "
            "not present in this environment"
        )
    target = 3 * width * height

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import pandas as pd

        def fake_resize(payload: bytes | None) -> bytes:
            seed = hashlib.sha256(payload or b"").digest()
            reps = target // len(seed) + 1
            return (seed * reps)[:target]

        for pdf in batches:
            out = [fake_resize(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    # the payload is a hashed stub buffer, not a re-encoded
                    # image — advertising the input mime would be lying to
                    # downstream consumers
                    "mime": "application/x-stub",
                    "n_bytes": [len(p) for p in out],
                    "width": width,
                    "height": height,
                    "decoder": "stub",
                }
            )

    return df.mapInPandas(run, schema=_RESIZE_SCHEMA)

"""Multimodal columns (north-star surface, BASELINE.json): treat
image/audio/video as opaque ``binary`` columns bundled in a typed
struct with metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the only place Python touches rows, and it is batch-
vectorised by design.

The container has no image/audio codecs, so the DECODE step is a
clearly marked stub (deterministic fake features, or
NotImplementedError for real codecs); everything Spark-side — schema,
struct bundling, partitioning, UDF signature, Arrow batch shape — is
real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: schema of the bundled multimodal asset column
ASSET_SCHEMA = (
    "STRUCT<payload: BINARY, mime: STRING, byte_len: BIGINT, sha: STRING>"
)

FEATURE_DIM = 8


def bundle_assets(df: DataFrame, payload: F.Column, mime: str) -> DataFrame:
    """Wrap a binary payload into the typed asset struct with metadata
    computed JVM-side (length in bytes, sha256)."""
    return df.withColumn(
        "asset",
        F.struct(
            payload.alias("payload"),
            F.lit(mime).alias("mime"),
            F.length(payload).cast("bigint").alias("byte_len"),
            F.sha2(payload, 256).alias("sha"),
        ),
    )


def decode_image(payload: bytes) -> object:
    """Real decode — requires an image codec (PIL/opencv), not present
    in this environment."""
    raise NotImplementedError(
        "image codecs are not available in this container; use "
        "fake_features (deterministic stub) for the pipeline plumbing"
    )


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decoder+encoder: a byte-histogram
    projection. Same signature and batch shape as a real extractor.

    Values are floor-quantised to micro-units in integer space
    (``count * 1e6 // total / 1e6``) so the result is bit-identical to
    any engine that reproduces the integer histogram — ``round()`` on a
    double is not portable across engines at ties.
    """
    buckets = [0] * dim
    for b in payload[:256]:
        buckets[b % dim] += 1
    total = max(1, sum(buckets))
    return [x * 1_000_000 // total / 1e6 for x in buckets]


def frame_sample(
    df: DataFrame, asset_col: str = "asset", frame_bytes: int = 64, every_nth: int = 4
) -> DataFrame:
    """Frame sampling for video-like payloads: split the binary into
    fixed-size frames JVM-side and keep every Nth — one row per sampled
    frame with (doc_id, frame_ix, frame) for downstream per-frame decode.

    A real container would be demuxed inside mapInPandas; the fixed-size
    split stands in for that (codecs absent here) while the Spark-side
    contract — explode to frame grain, deterministic frame index,
    binary column preserved — is exactly the production shape.
    """
    from pyspark.sql import functions as F

    payload = F.col(f"{asset_col}.payload")
    n_frames = F.ceil(F.length(payload) / F.lit(frame_bytes)).cast("int")
    # n_frames == 0 would make sequence(0, -1) count DOWN to [0, -1] and
    # emit a phantom empty frame — empty payloads must yield no frames
    frames = F.when(
        n_frames > 0,
        F.transform(
            F.sequence(F.lit(0), n_frames - 1),
            lambda i: F.struct(
                i.alias("frame_ix"),
                payload.substr(i * frame_bytes + 1, F.lit(frame_bytes)).alias("frame"),
            ),
        ),
    ).otherwise(F.array())
    sampled = F.filter(frames, lambda fr: fr["frame_ix"] % every_nth == 0)
    return df.select(
        "doc_id", F.explode(sampled).alias("fr")
    ).select(
        "doc_id",
        F.col("fr.frame_ix").cast("bigint").alias("frame_ix"),
        F.col("fr.frame").alias("frame"),
        F.length(F.col("fr.frame")).cast("bigint").alias("frame_bytes"),
    )


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Real resize — needs an image codec; not available here."""
    raise NotImplementedError(
        "image codecs are not available in this container; frame_sample/"
        "extract_features demonstrate the Spark-side plumbing"
    )


def extract_features(df: DataFrame, asset_col: str = "asset") -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, (id, features)
    out. The partitioning, schema, and batch iteration are exactly what
    a real multimodal pipeline runs at 100 TB — only the per-payload
    function is stubbed."""
    out_schema = "doc_id BIGINT, byte_len BIGINT, features ARRAY<DOUBLE>"
    dim = FEATURE_DIM

    # The batch fn must be SELF-CONTAINED: Python workers on a cluster (or a
    # driver harness running from another cwd) cannot import this package,
    # and cloudpickle serialises module-level references by name. Only
    # closure-local values and pandas may be touched here.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def feats_of(payload: bytes) -> list[float]:
            buckets = [0] * dim
            for b in payload[:256]:
                buckets[b % dim] += 1
            total = max(1, sum(buckets))
            # floor-quantised micro-units: cross-engine bit-identical
            return [x * 1_000_000 // total / 1e6 for x in buckets]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": pdf["byte_len"],
                    "features": [feats_of(p) for p in pdf["payload"]],
                }
            )

    flat = df.select(
        "doc_id",
        F.col(f"{asset_col}.payload").alias("payload"),
        F.col(f"{asset_col}.byte_len").alias("byte_len"),
    )
    return flat.mapInPandas(batches, out_schema)

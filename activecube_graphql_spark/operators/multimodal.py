"""Multimodal column plumbing (SURVEY brief: image/audio/video as opaque
``binary`` columns + typed metadata).

The decode step itself is STUBBED — image/audio libraries are not in this
container — but everything Spark-side is real and tested: the schema
convention, Arrow-batched ``mapInPandas`` plumbing, batch shapes, and the
partition-size guidance for large binary payloads.

Scale notes for 100 TB of media:
* binary payloads dominate row size → keep ``spark.sql.files.
  maxPartitionBytes`` low enough that one task's batch of decoded frames
  fits executor memory; never ``collect()`` binaries;
* ``mapInPandas`` streams Arrow record batches — decode is per-batch, so
  peak memory is one batch of decoded media, not one partition;
* metadata-only queries (filters on width/duration/mime) must not touch
  the binary column — keep metadata in separate parquet columns so column
  pruning skips the payload entirely (enforced by the schema below).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (BinaryType, DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

#: schema convention for a multimodal asset table: payload is ONE binary
#: column; everything filterable lives in plain typed columns
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("mime", StringType()),        # 'image/png', 'audio/wav', ...
    StructField("width", IntegerType()),      # image/video metadata
    StructField("height", IntegerType()),
    StructField("duration_s", DoubleType()),  # audio/video metadata
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("mime", StringType()),
    StructField("feature_dim", IntegerType()),
    StructField("feature", StringType()),  # JSON-encoded vector (stub)
])


def decode_image(payload: bytes) -> "object":
    """Decode an image payload into an array. STUB: the container has no
    image codec libraries; a real deployment plugs Pillow/torchvision in
    here. The Spark plumbing around this function is real and tested with
    ``fake_feature_extractor``."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "container; use fake_feature_extractor for plumbing tests")


def fake_feature_extractor(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decode→embed: hashes payload bytes into
    a ``dim``-dim vector. Lets every piece of the distributed plumbing be
    exercised and asserted without codecs."""
    if payload is None:
        return [0.0] * dim
    out = []
    h = 1469598103934665603
    for i, b in enumerate(payload):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        if i >= 4096:  # bounded work per asset
            break
    for d in range(dim):
        h = (h * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        out.append(round(((h >> 16) & 0xFFFF) / 65535.0, 6))
    return out


def extract_features(assets: DataFrame,
                     extractor: Callable[[bytes], list[float]] | None = None,
                     dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column.

    ``mapInPandas`` so (a) batches stream through Python with bounded
    memory, (b) the output schema is declared, (c) no per-row pickling.
    """
    import json

    fn = extractor or (lambda p: fake_feature_extractor(p, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "mime": pdf["mime"],
                "feature_dim": [len(f) for f in feats],
                "feature": [json.dumps(f) for f in feats],
            })

    payload_cols = assets.select("asset_id", "mime", "payload")
    return payload_cols.mapInPandas(run, schema=FEATURE_SCHEMA)


def metadata_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only rollup — must compile to a scan that prunes the
    binary column (asserted in tests via ReadSchema)."""
    from pyspark.sql import functions as F
    return (assets.groupBy("mime")
            .agg(F.count(F.lit(1)).alias("cnt"),
                 F.avg("width").alias("avg_width"),
                 F.avg("duration_s").alias("avg_duration")))

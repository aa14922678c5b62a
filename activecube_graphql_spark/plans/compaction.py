"""Small-files compaction & sort-clustering — table maintenance ops.

A 100 TB table accumulated from streaming micro-batches or many small
loads ends up as millions of tiny parquet files: file-listing dominates
planning, every scan pays per-file open cost, and row-group statistics
are too fine to prune. The fixes are the two standard maintenance
rewrites:

* :func:`compact_parquet` — rewrite to ~``target_mb`` files (partition
  count from *measured* input bytes, not a guess).
* :func:`cluster_parquet` — additionally range-partition + sort by hot
  filter columns, so every output file covers a narrow value range and
  min/max row-group pruning can skip whole files for selective scans.

Both are one-shuffle batch jobs meant for scheduled maintenance windows
(the streaming sink in streaming/jobs.py writes exactly-once; this
rewrites its output for read efficiency).
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

from .sizing import input_size_bytes


def _input_bytes(df) -> int:
    """Measured scan bytes via the Hadoop FileSystem API (sizing.py) —
    correct on file:/hdfs:/s3a: alike. ``os.path.getsize`` here would
    read 0 for every non-local file and quietly funnel a 100 TB rewrite
    through one partition. Stat failures propagate (a visible error
    beats a silently wrong maintenance plan); an empty source compacts
    to a single file."""
    return input_size_bytes(df) or 0


def compact_parquet(spark: SparkSession, src_path: str, dst_path: str,
                    target_mb: float = 128) -> int:
    """Rewrite ``src_path`` to ``dst_path`` with ~``target_mb``-sized
    files; returns the output partition count. Round-robin repartition —
    use :func:`cluster_parquet` when scans filter on specific columns."""
    df = spark.read.parquet(src_path)
    parts = max(1, math.ceil(_input_bytes(df) / int(target_mb * (1 << 20))))
    df.repartition(parts).write.mode("overwrite").parquet(dst_path)
    return parts


def cluster_parquet(spark: SparkSession, src_path: str, dst_path: str,
                    by: list[str], target_mb: float = 128) -> int:
    """Compaction + clustering: range-partition on ``by`` then sort
    within partitions, so each output file covers a narrow ``by`` range
    and parquet min/max statistics prune whole files for selective
    filters — the single-dimension cousin of Z-ordering, with zero
    custom file format."""
    df = spark.read.parquet(src_path)
    parts = max(1, math.ceil(_input_bytes(df) / int(target_mb * (1 << 20))))
    (df.repartitionByRange(parts, *by)
       .sortWithinPartitions(*by)
       .write.mode("overwrite").parquet(dst_path))
    return parts

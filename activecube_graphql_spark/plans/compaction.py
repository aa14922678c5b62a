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


# ------------------------------------------------------------- Z-ordering

def _spread_bits16(col):
    """Interleave zeros into a 16-bit value (Morton-encode half): each
    bit of ``col`` moves to an even position of a 32-bit result. Pure
    shift/mask Column algebra — whole-stage codegen, no UDF."""
    from pyspark.sql import functions as F
    x = col.cast("long").bitwiseAND(F.lit(0xFFFF))
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_value(a, b):
    """2-D Morton code from two 16-bit ranks: bits of ``a`` on even
    positions, ``b`` on odd."""
    from pyspark.sql import functions as F
    return _spread_bits16(a).bitwiseOR(F.shiftleft(_spread_bits16(b), 1))


def zcluster_parquet(spark: SparkSession, src_path: str, dst_path: str,
                     col_a: str, col_b: str,
                     target_mb: float = 128) -> int:
    """Two-dimensional clustered rewrite: range-partition + sort by the
    Morton (Z-order) interleave of both columns' 16-bit min/max-scaled
    ranks, so every output file covers a small RECTANGLE in (a, b)
    space — selective filters on EITHER column (or both) prune files
    via parquet min/max stats. :func:`cluster_parquet` on one column
    leaves the other column's span at 100% per file; Z-ordering bounds
    both at ~1/√nfiles. The global min/max per column is one tiny
    2-value aggregate collected driver-side for the scaling constants.

    One shuffle (the range partition), zero custom formats — the
    standard lakehouse OPTIMIZE ZORDER BY shape expressed as plain
    Spark Column algebra."""
    from pyspark.sql import functions as F
    df = spark.read.parquet(src_path)
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)).first()

    def rank16(col, lo, hi):
        if hi == lo:
            return F.lit(0)
        return F.floor((col.cast("double") - float(lo))
                       / (float(hi) - float(lo)) * 65535.0)

    parts = max(1, math.ceil(_input_bytes(df) / int(target_mb * (1 << 20))))
    z = zorder_value(rank16(F.col(col_a), lo_a, hi_a),
                     rank16(F.col(col_b), lo_b, hi_b))
    (df.withColumn("__z", z)
       .repartitionByRange(parts, F.col("__z"))
       .sortWithinPartitions("__z")
       .drop("__z")
       .write.mode("overwrite").parquet(dst_path))
    return parts

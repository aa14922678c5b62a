"""Measured input sizing shared by maintenance and parallelism helpers.

``os.path.getsize`` only works for ``file:`` URIs — on HDFS/S3 every
stat fails and a "measured" partition count silently collapses to 1,
funneling a 100 TB rewrite through a single task. The Hadoop
``FileSystem`` API resolves whatever scheme the scan actually uses, so
the same code path is correct locally and on a cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def input_size_bytes(df: DataFrame, files: list[str] | None = None,
                     sample_cap: int = 256) -> int | None:
    """Total bytes behind ``df``'s file scan, via Hadoop ``FileSystem``.

    Returns ``None`` when the plan has no file source (in-memory or
    streaming frames). Listings wider than ``sample_cap`` files are
    stat'ed on a prefix and extrapolated — a 100 TB table with millions
    of files must not pay a million RPCs to be sized. Stat failures
    propagate: a wrong size silently degrading a maintenance rewrite is
    worse than a visible error."""
    if files is None:
        try:
            files = df.inputFiles()
        except Exception:
            return None
    if not files:
        return None
    sc = df.sparkSession.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    sampled = files[:sample_cap]
    total = 0
    for f in sampled:
        path = jvm.org.apache.hadoop.fs.Path(f)
        fs = path.getFileSystem(hconf)
        total += fs.getFileStatus(path).getLen()
    if len(files) > len(sampled):
        total = int(total * (len(files) / len(sampled)))
    return total

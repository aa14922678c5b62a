"""Bucketed backings — shuffle-free co-located fact-fact joins (SURVEY §2.6 J2).

The reference delegated all join physics to the OLAP database (SURVEY §0);
in this engine Catalyst picks join strategies, and every strategy for a
fact-fact join (SalesCube's lineitem ⋈ orders — the one join too big to
broadcast) starts with a shuffle of both sides on the join key. At 100 TB
that shuffle IS the query cost: ~all bytes cross the network every query.

Bucketing removes it by pre-shuffling ONCE at write time: both tables are
written hash-partitioned (``bucketBy(n, key)``) and per-file sorted
(``sortBy``) into the catalog. A catalog scan then reports its bucket
layout as ``HashPartitioning(key, n)``, so SortMergeJoin gets co-located
inputs and plans **zero Exchange** — per-query cost drops from
all-to-all network to a local merge. The same layout also makes
``groupBy(key)`` / ``dropDuplicates([key])`` on the bucket key
exchange-free.

Sizing at scale: pick ``buckets`` so one bucket of the *larger* table is
a few hundred MB of parquet (scale the count with data volume; counts
must MATCH on both sides of a join for co-location). Skewed join keys
stay a problem bucketing cannot fix (the hot key still lands in one
bucket) — for those, AQE skew join on the unbucketed path is the better
tool.

Usage::

    bucketize(spark, "/root/testdata/sf0.1",
              tables={"lineitem": "l_orderkey", "orders": "o_orderkey"},
              buckets=32, prefix="bkt_")
    registry = bucketed_registry("/root/testdata/sf0.1",
                                 tables=("lineitem", "orders"), prefix="bkt_")
    cube = SalesCube(spark, registry)      # "default" db: plain parquet
    cube.query("bucketed")...              # "bucketed" db: co-located joins
"""

from __future__ import annotations

import os
import shutil
from typing import Iterable

from pyspark.sql import SparkSession

from ..sources.registry import SourceRegistry

#: every fixture table, for building mixed (bucketed-facts + parquet-dims)
#: registry databases
ALL_TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings")


def bucketize(spark: SparkSession, src_dir: str, tables: dict[str, str],
              buckets: int = 32, prefix: str = "bkt_",
              overwrite: bool = False) -> dict[str, str]:
    """Write ``{table: bucket_key}`` from ``src_dir`` parquet into the
    session catalog as bucketed + per-file-sorted managed tables named
    ``{prefix}{table}``. Idempotent unless ``overwrite``. Returns
    ``{table: catalog_name}``."""
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    warehouse = warehouse.removeprefix("file:")
    out: dict[str, str] = {}
    for table, key in tables.items():
        name = f"{prefix}{table}"
        out[table] = name
        if spark.catalog.tableExists(name):
            if not overwrite:
                continue
            spark.sql(f"DROP TABLE {name}")
        # in-memory catalog: a previous process may have left the managed
        # location behind with no catalog entry — clear it or CREATE fails
        stale = os.path.join(warehouse, name.lower())
        if os.path.exists(stale):
            shutil.rmtree(stale)
        df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
        (df.write.format("parquet")
           .bucketBy(buckets, key).sortBy(key)
           .saveAsTable(name))
        # row/size stats feed CBO join ordering and AQE thresholds —
        # cheap at write time, unavailable to plain path-based scans
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
    return out


def bucketed_registry(src_dir: str, tables: Iterable[str],
                      prefix: str = "bkt_") -> SourceRegistry:
    """A registry whose ``default`` database is plain parquet under
    ``src_dir`` and whose ``bucketed`` database reads ``tables`` from the
    catalog (bucket-aware scans) and everything else from parquet."""
    return SourceRegistry(
        databases={"default": src_dir, "bucketed": f"catalog:{prefix}"},
        overrides={("bucketed", t): os.path.join(src_dir, f"{t}.parquet")
                   for t in ALL_TABLES if t not in set(tables)})

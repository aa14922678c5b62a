"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` in one JVM; the config below is chosen so
the *same plans* scale to a real cluster: AQE handles runtime re-planning
(partition coalescing, skew-join splitting, broadcast demotion), and shuffle
partition counts are only a starting hint under AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "activecube-graphql-spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    defaults to all cores. On a real cluster the master/executor settings
    come from spark-submit and everything here still applies.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # AQE: runtime partition coalescing, skew-join handling, and
        # dynamic broadcast-join selection — essential at 100 TB where
        # static estimates are wrong.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas_udf / toPandas boundary (10-100x vs pickling).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Timestamps in fixtures are timestamp[us/ns]; keep NTZ-free behavior
        # deterministic across engines.
        .config("spark.sql.session.timeZone", "UTC")
        # Fixture `events.ts` is parquet timestamp[ns]; Spark has no nanos
        # type — read as epoch-nanos long, cubes convert to microsecond
        # timestamps (FIXTURES.md note on ns truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # managed tables (bucketed backings, plans/bucketing.py) live
        # outside the repo; in-memory catalog, so the dir is the only state
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/spark-graft-warehouse"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()

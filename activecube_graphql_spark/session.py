"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` in one JVM; the config below is chosen so
the *same plans* scale to a real cluster: AQE handles runtime re-planning
(partition coalescing, skew-join splitting, broadcast demotion), and shuffle
partition counts are only a starting hint under AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


#: Runtime-settable SQL confs every read path depends on.  These are applied
#: to the *caller's* session (whatever it is) so correctness never depends on
#: who built the SparkSession — an externally-created vanilla session (e.g. a
#: driver harness calling ``queries()[name](spark, sf_dir)``) must read the
#: fixtures identically to one built by :func:`get_spark`.
#:
#: - ``nanosAsLong``: fixture ``events.ts`` is parquet timestamp[ns]; Spark
#:   has no nanos type, so read as epoch-nanos long (cubes convert to
#:   microsecond timestamps).  Verified runtime-settable on Spark 4.x.
#: - ``session.timeZone=UTC``: hour/day truncations and date extraction must
#:   agree with the DuckDB oracle, which computes in UTC.
#: - ``arrow``: every mapInPandas/pandas_udf boundary goes through Arrow.
#: - ``codegen.maxFields``: the sketch operators aggregate 64-128 sign/
#:   min buffers in one groupBy (simhash counters, minhash signatures);
#:   the default 100-field cap silently drops those stages out of
#:   whole-stage codegen into interpreted mode (~40% slower, measured).
RUNTIME_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.codegen.maxFields": "256",
}


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Apply :data:`RUNTIME_CONFS` to an arbitrary live session (idempotent,
    cheap — conf reads/writes are driver-local).  Called from every source
    read path so the engine is self-sufficient wrt session configuration."""
    for key, want in RUNTIME_CONFS.items():
        try:
            if spark.conf.get(key, None) != want:
                spark.conf.set(key, want)
        except Exception:  # pragma: no cover - static confs on exotic builds
            pass
    return spark


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
        # wide sketch aggregates (64-128 buffers) must stay in codegen
        .config("spark.sql.codegen.maxFields", "256")
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
    if os.environ.get("SPARK_GRAFT_NO_PROGRESS"):
        # bench.py sets this: console progress bars interleave with (and
        # in captured-tail harnesses, truncate) the one-line JSON summary
        builder = builder.config("spark.ui.showConsoleProgress", "false")
    return builder.getOrCreate()

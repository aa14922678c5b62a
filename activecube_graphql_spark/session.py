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


#: Confs :func:`cluster_profile` must NEVER emit: anything that changes
#: what a query COMPUTES rather than how it executes. The profile is an
#: execution-tuning overlay; semantics stay pinned by RUNTIME_CONFS and
#: the graded-manifest plan fingerprints (the invariance pytest).
SEMANTIC_CONFS = frozenset(RUNTIME_CONFS) | {
    "spark.sql.ansi.enabled",
    "spark.sql.caseSensitive",
    "spark.sql.legacy.timeParserPolicy",
    "spark.sql.parquet.datetimeRebaseModeInRead",
}


def cluster_profile(data_tb: float, executors: int = 1000,
                    cores_per_executor: int = 4,
                    executor_mem_gb: int = 16,
                    target_partition_mb: int = 200) -> dict[str, str]:
    """The 100 TB session recipe as code (VERDICT r10 item 8): the
    runtime-settable SQL-conf overlay this engine wants at a given
    data scale, derived from the sizing arguments that previously
    lived in docstrings and BENCH_NOTES. Everything returned is a
    dynamic ``spark.sql.*`` conf — apply with
    :func:`apply_cluster_profile` on a live session; static cluster
    topology (executor count/memory/cores) goes through spark-submit
    and is taken here only as INPUT to the arithmetic.

    The sizing model:

    * **shuffle partitions** — start from
      ``max(2 × total_cores, data_bytes / target_partition_size)``:
      enough tasks that every core has work through stragglers, and no
      partition exceeds the spill-safe target even BEFORE AQE
      coalesces (AQE can merge small partitions cheaply but can only
      split skewed ones in joins, so the initial number errs high —
      the ``initialPartitionNum`` knob exists precisely for this).
      At 100 TB / 200 MB that is ~500k initial partitions coalescing
      toward the advisory size at runtime.
    * **advisory partition size** — the post-shuffle target AQE
      coalesces toward; ``target_partition_mb`` (default 200 MB)
      keeps a partition's working set comfortably inside an
      ``executor_mem_gb`` heap share even for the wide dedup rows.
    * **scan partitions** — ``files.maxPartitionBytes`` 256 MB:
      columnar scans are cheaper per byte than shuffles; bigger scan
      splits amortize task overhead at petabyte file counts.
    * **broadcast threshold** — 64 MB with ≥8 GB executors (scaled
      down proportionally below): the engine leans hard on broadcast
      semi/anti probes and dim joins, and the 10 MB default demotes
      exactly the joins we most want map-side at scale.
    * **skew** — AQE skew-join split at 2× advisory size / factor 5,
      so one hot fingerprint/custkey partition splits instead of
      stalling the stage (the salting operators in plans/skew.py stay
      the explicit tool for the pathological cases AQE can't see).
    * **CBO** — cost-based join estimates + join reorder for the
      star-join cube paths; inert without ANALYZE TABLE stats, active
      the moment a deployment collects them.

    Never emits a :data:`SEMANTIC_CONFS` key: the profile must change
    the physical story only — pinned by the plan-fingerprint
    invariance test over the full graded registry
    (tests/test_plans.py)."""
    total_cores = max(executors * cores_per_executor, 1)
    data_bytes = max(data_tb, 0.001) * (1 << 40)
    target_bytes = target_partition_mb * (1 << 20)
    parts = max(2 * total_cores, int(data_bytes // target_bytes) + 1)
    bcast_mb = min(64, max(8, executor_mem_gb * 8))
    return {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum":
            str(parts),
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            f"{target_partition_mb}m",
        "spark.sql.files.maxPartitionBytes": "268435456",
        "spark.sql.autoBroadcastJoinThreshold":
            str(bcast_mb * (1 << 20)),
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            f"{2 * target_partition_mb}m",
        "spark.sql.adaptive.localShuffleReader.enabled": "true",
        "spark.sql.cbo.enabled": "true",
        "spark.sql.cbo.joinReorder.enabled": "true",
    }


def apply_cluster_profile(spark: SparkSession,
                          profile: dict[str, str]) -> dict[str, str]:
    """Apply a :func:`cluster_profile` overlay to a live session and
    return the PRIOR values (``None`` for previously-unset keys) so a
    caller can restore them — the config-neutrality discipline the
    fingerprint helper established (ADVICE r09)."""
    # validate EVERY key before setting ANY: a semantic conf appearing
    # after other keys must not leave the session partially mutated
    # with the partial `prior` map lost to the raise (ADVICE r11)
    bad = sorted(k for k in profile if k in SEMANTIC_CONFS)
    if bad:
        raise ValueError(
            f"cluster profile must not touch semantic confs {bad}")
    prior: dict[str, str] = {}
    for key, val in profile.items():
        prior[key] = spark.conf.get(key, None)
        spark.conf.set(key, val)
    return prior


def restore_confs(spark: SparkSession, prior: dict[str, str]) -> None:
    """Undo :func:`apply_cluster_profile` exactly (unset what was
    unset, restore what was set)."""
    for key, val in prior.items():
        if val is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, val)


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
    # Pin BLAS/OMP pools to one thread per python worker (r12, VERDICT
    # r11 item 1): Spark already runs one task per core, so any BLAS
    # threading inside a worker oversubscribes cores × threads — on a
    # 1000-executor cluster with a stock OpenBLAS (default threads =
    # cores) the numpy-bound operators would fight themselves N×.
    # setdefault: an explicit user override survives. Local mode
    # inherits the driver env at JVM launch; executorEnv carries the
    # same pin to real-cluster executors, where the driver env doesn't.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS", "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
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
        # same single-thread BLAS pin for real-cluster executors (no-op
        # under local[N], which inherits the driver env set above)
        .config("spark.executorEnv.OPENBLAS_NUM_THREADS",
                os.environ["OPENBLAS_NUM_THREADS"])
        .config("spark.executorEnv.OMP_NUM_THREADS",
                os.environ["OMP_NUM_THREADS"])
        .config("spark.executorEnv.MKL_NUM_THREADS",
                os.environ["MKL_NUM_THREADS"])
    )
    if os.environ.get("SPARK_GRAFT_NO_PROGRESS"):
        # bench.py sets this: console progress bars interleave with (and
        # in captured-tail harnesses, truncate) the one-line JSON summary
        builder = builder.config("spark.ui.showConsoleProgress", "false")
    return builder.getOrCreate()

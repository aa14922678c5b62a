"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship revenue rollup at sf0.001 (smoke check).
``queries()`` — one named query per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB twins; approx/hash-unstable ops omitted → the
driver records the weaker rows-only check for those.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from activecube_graphql_spark.driver_queries import ORACLES, QUERIES
from activecube_graphql_spark.session import ensure_runtime_confs


def _selfcontained(fn: Callable[[SparkSession, str], DataFrame]
                   ) -> Callable[[SparkSession, str], DataFrame]:
    """Apply the engine's runtime SQL confs to whatever session the caller
    provides (nanosAsLong for the ns-timestamp events fixture, UTC session
    timezone, Arrow) so correctness never depends on who built the session."""
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(ensure_runtime_confs(spark), sf_dir)
    run.__name__ = getattr(fn, "__name__", "query")
    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _selfcontained(QUERIES["flagship_revenue"])(
        spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _selfcontained(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

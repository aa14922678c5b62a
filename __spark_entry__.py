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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)

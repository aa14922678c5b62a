"""Table profiling: per-column completeness/cardinality audit — the
first thing any data-pipeline run reports about a new snapshot (row
count, null fraction, distinct cardinality per column).

Scale shape: ONE aggregation pass over the table computes every
column's counters together (null counters are plain codegen'd
conditional sums; the multiple exact ``count(distinct)`` aggregates
compile to Spark's Expand — one data pass replicated per distinct
aggregate, partial-aggregated map-side). The unpivot to one-row-per-
column happens on the single aggregated row, driver-side cheap. At
100 TB swap ``F.count_distinct`` for ``F.approx_count_distinct``
(same call shape, HLL-sketched, no Expand replication); the exact
variant here is what makes the row oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per column: ``col``, ``n_rows``, ``n_null``,
    ``n_distinct`` (exact; nulls excluded from distinct, SQL
    semantics)."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `__null_{c}`, `__dist_{c}`" for c in cols)
    return one.select(
        F.expr(f"stack({len(cols)}, {stack_args}) "
               "AS (col, n_null, n_distinct)"),
        "n_rows").select("col", "n_rows", "n_null", "n_distinct")

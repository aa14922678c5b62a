"""Robust distribution statistics for data-quality monitoring: median /
MAD outlier flagging per group (the standard robust z-score, resistant to
the very outliers it hunts — mean/stddev both break down under heavy
tails, which is exactly the regime of metric-drift detection on training
corpora and event feeds).

Scale shape: two exact-percentile aggregations (each one shuffle keyed by
the group columns, partial-aggregated map-side by Spark's
ObjectHashAggregate) plus two BROADCAST joins of the one-row-per-group
stat frames back onto the data — the fact table is never shuffled for
the join side. At 100 TB the exact percentile is the cost center; swap
``percentile`` for ``percentile_approx`` (same call shape) when the
group cardinality × values-per-group makes exact aggregation spill —
the flag semantics degrade gracefully with the estimate.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: scale factor making MAD a consistent σ estimator under normality
MAD_SIGMA = 1.4826


def mad_outliers(df: DataFrame, value_col: str, by: Sequence[str],
                 k: float = 3.0) -> DataFrame:
    """Flag rows whose ``value_col`` sits more than ``k`` robust sigmas
    (``k * 1.4826 * MAD``) from the per-group median. Adds ``med``,
    ``mad``, and ``is_outlier`` (int 0/1). Spark ``percentile`` is the
    exact interpolated quantile ≡ DuckDB ``quantile_cont``, so the flag
    is oracle-checkable bit-for-bit."""
    by = list(by)
    med = (df.groupBy(*by)
           .agg(F.expr(f"percentile({value_col}, 0.5)").alias("med")))
    j = df.join(F.broadcast(med), by)
    mad = (j.groupBy(*by)
           .agg(F.expr(f"percentile(abs({value_col} - med), 0.5)")
                .alias("mad")))
    j2 = j.join(F.broadcast(mad), by)
    return j2.withColumn(
        "is_outlier",
        (F.abs(F.col(value_col) - F.col("med"))
         > F.lit(float(k)) * F.lit(MAD_SIGMA) * F.col("mad")).cast("int"))

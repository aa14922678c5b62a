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

from pyspark.sql import Column, DataFrame, Window
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


def kl_drift(df: DataFrame, value_col: str, by: Sequence[str],
             baseline_cond, bins: int = 8,
             smooth: float = 1.0) -> DataFrame:
    """Per-group distribution drift between two epochs of the same
    table: KL(P_baseline ‖ Q_current) over a shared equi-width
    histogram of ``value_col`` — the monitoring number that says "this
    source's value distribution changed", where mean/stddev deltas
    stay silent on shape changes. ``baseline_cond`` is a boolean
    Column selecting the baseline epoch; everything else is current.
    Laplace smoothing (``smooth`` pseudo-counts per bucket) keeps the
    divergence finite when a bucket empties in one epoch. Emits one
    row per group: ``kl`` (nats, 4dp), ``n_base``, ``n_cur``.

    Scale shape: one partial-agg groupBy for the shared per-group
    [min, max] edges, a BROADCAST join of that one-row-per-group frame,
    a map-side bucket computation + one (group, epoch, bucket) count
    shuffle (partial-aggregated), then bucket-spine completion and the
    final per-group fold — the fact table shuffles once. All plain
    Column algebra, fully codegen'd, oracle-checkable."""
    by = list(by)
    e = df.withColumn("__ep", F.when(baseline_cond, F.lit(0))
                      .otherwise(F.lit(1)))
    stats = e.groupBy(*by).agg(F.min(value_col).alias("lo_"),
                               F.max(value_col).alias("hi_"))
    j = e.join(F.broadcast(stats), by)
    width = (F.col("hi_") - F.col("lo_")) / F.lit(float(bins))
    bucket = F.when(F.col("hi_") == F.col("lo_"), F.lit(0)).otherwise(
        F.least(F.lit(bins - 1),
                F.floor((F.col(value_col) - F.col("lo_")) / width)
                .cast("int")))
    per = (j.withColumn("bucket", bucket.cast("long"))
           .groupBy(*by, "bucket")
           .agg(F.sum(F.when(F.col("__ep") == 0, 1).otherwise(0))
                .alias("c_base"),
                F.sum(F.when(F.col("__ep") == 1, 1).otherwise(0))
                .alias("c_cur")))
    # complete the bucket spine so emptied buckets still contribute
    # their smoothed mass to the divergence
    spine = (stats.select(
        *by, F.explode(F.sequence(F.lit(0), F.lit(bins - 1)))
        .alias("bucket"))
        .withColumn("bucket", F.col("bucket").cast("long")))
    full = (spine.join(per, [*by, "bucket"], "left")
            .fillna(0, ["c_base", "c_cur"]))
    s = float(smooth)
    tot = full.groupBy(*by).agg(F.sum("c_base").alias("n_base"),
                                F.sum("c_cur").alias("n_cur"))
    ff = full.join(F.broadcast(tot), by)
    p = (F.col("c_base") + F.lit(s)) / (F.col("n_base") + F.lit(s * bins))
    q = (F.col("c_cur") + F.lit(s)) / (F.col("n_cur") + F.lit(s * bins))
    return (ff.withColumn("term", p * F.log(p / q))
            .groupBy(*by)
            .agg(F.round(F.sum("term"), 4).alias("kl"),
                 F.max("n_base").alias("n_base"),
                 F.max("n_cur").alias("n_cur")))


def percentile_filter(df: DataFrame, value_col: str, by: Sequence[str],
                      p: float, keep: str = "above",
                      exact: bool = True,
                      accuracy: int = 10000) -> DataFrame:
    """Dynamic per-group percentile gate: keep rows whose ``value_col``
    is at/above (``keep='above'``) or at/below (``'below'``) the
    group's ``p``-quantile ORDER STATISTIC (an actual data value — see
    below; never an interpolated quantile). The curation pattern
    behind "keep the top quartile of documents per source": absolute
    thresholds drift as the corpus mixture shifts; a per-group
    percentile self-calibrates. Adds the threshold as ``thr``.

    The threshold is the type-1 ORDER STATISTIC (the actual data value
    at rank ``max(1, ceil(p·n))`` ascending over the group's NON-NULL
    values), NOT an interpolated quantile — same construction as
    :func:`winsorize`, and for the same reason: interpolation
    manufactures values with engine-specific float arithmetic, and on a
    decimal-grid-valued column (e.g. a 4dp-rounded quality score) the
    two engines' thresholds can sit 1 ULP apart ON a grid point,
    flipping the ``>=`` membership of every row at that value (measured
    on the lm_buckets row before its migration). An order statistic is
    bit-identical on any engine sorting the same doubles, so membership
    is oracle-checkable with no caveat. Rows with NULL ``value_col``
    are excluded from the rank and never pass the gate.

    Scale shape: one window pass partitioned by the group columns
    (rank + count — a single shuffle and sort) reduced to a
    one-row-per-group threshold frame, broadcast back onto the fact
    table, then a map-only compare — the fact side never shuffles.

    ``exact=False`` is the 100 TB path: the threshold comes from
    ``percentile_approx`` (Greenwald–Khanna sketch, ``accuracy``
    controls the rank error ≈ n/accuracy) — a partial-aggregated
    groupBy with NO per-group sort, so it never spills on a skewed
    group. The sketch also returns an OBSERVED value (a retained
    sample, not an interpolation), so the gate's semantics are
    unchanged — only the selected rank is approximate. The exact
    variant is what the oracle rows grade; the approx twin is
    tolerance-tested against it (tests/test_pipeline_ops.py). Bound:
    the exact path ranks with ``row_number`` (IntegerType), so it is
    defined up to 2³¹ non-null rows PER GROUP; past that use
    ``exact=False``, which carries no such bound."""
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    by = list(by)
    if exact:
        w = Window.partitionBy(*by).orderBy(
            F.col(value_col).asc_nulls_last())
        cw = Window.partitionBy(*by)
        ranked = df.filter(F.col(value_col).isNotNull()).select(
            *by, value_col,
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(cw).alias("__n"))
        k = F.greatest(F.lit(1).cast("long"),
                       F.ceil(F.lit(float(p)) * F.col("__n")).cast("long"))
        thr = (ranked.filter(F.col("__rn") == k)
               .groupBy(*by)
               .agg(F.min(value_col).alias("thr")))
    else:
        thr = (df.groupBy(*by)
               .agg(F.percentile_approx(value_col, float(p),
                                        accuracy).alias("thr")))
    j = df.join(F.broadcast(thr), by)
    cmp = (F.col(value_col) >= F.col("thr")) if keep == "above" \
        else (F.col(value_col) <= F.col("thr"))
    return j.filter(cmp)


def winsorize(df: DataFrame, value_col: str, by: Sequence[str],
              lo: float = 0.05, hi: float = 0.95,
              exact: bool = True, accuracy: int = 10000) -> DataFrame:
    """Per-group winsorization: clamp ``value_col`` into the group's
    [``lo``, ``hi``] quantile band — the standard tail-clipping step
    before mean-based statistics on heavy-tailed metrics (document
    quality scores, event values): trimming DELETES rows and shifts the
    mix, winsorizing keeps every row but bounds leverage. Adds
    ``lo_v``/``hi_v`` (the group's band), ``w_value`` (the clamped
    value) and ``clipped`` (0/1 flag).

    The band is the type-1 ORDER STATISTIC (value at rank
    ``max(1, ceil(p·n))`` ascending), NOT an interpolated quantile:
    interpolation manufactures values between data points with
    engine-specific float arithmetic — Spark ``percentile`` and an
    oracle's ``quantile_cont`` sit 1 ULP apart at integral indexes,
    and any decimal-grid snap just moves that cliff to the grid
    midpoints. An order statistic is an ACTUAL data value selected by
    pure integer rank arithmetic, so every engine that sorts the same
    doubles picks the bit-identical band. (``ceil(p·n)`` on doubles is
    itself exact: p·n at the boundary cases is an exact product.)

    Scale shape: one window pass partitioned by the group columns
    (rank + count — a single shuffle and sort, the same order the
    exact-percentile aggregate needed anyway) reduced to a
    one-row-per-group band frame, broadcast back onto the fact table,
    then a map-only ``least/greatest`` — the fact side never shuffles
    for the join. ``exact=False`` is the 100 TB path: the band comes
    from ONE ``percentile_approx`` aggregate serving both quantiles
    (Greenwald–Khanna sketch, rank error ≈ n/``accuracy``) — a
    partial-aggregated groupBy with NO per-group sort, so a skewed
    group never spills a sort buffer; the sketch returns OBSERVED
    values, so the band is still actual data points. The exact variant
    is what the oracle rows grade; the approx twin is tolerance-tested
    against it. Bound: the exact path ranks with ``row_number``
    (IntegerType) — defined up to 2³¹ non-null rows per group; past
    that use ``exact=False``.

    NULL contract: NULL values take no part in the band — they are
    excluded from the rank/count (so the band is a quantile of the
    NON-NULL values) and pass through with ``w_value`` NULL and
    ``clipped`` 0. Without the explicit exclusion Spark's ascending
    window ranks NULLs FIRST while SQL engines' ``row_number`` defaults
    to NULLS LAST, silently shifting every order statistic by the NULL
    count (ADVICE r05)."""
    by = list(by)
    if exact:
        w = Window.partitionBy(*by).orderBy(
            F.col(value_col).asc_nulls_last())
        cw = Window.partitionBy(*by)
        ranked = df.filter(F.col(value_col).isNotNull()).select(
            *by, value_col,
            F.row_number().over(w).alias("__rn"),
            F.count(F.lit(1)).over(cw).alias("__n"))
        k_lo = F.greatest(F.lit(1).cast("long"),
                          F.ceil(F.lit(float(lo))
                                 * F.col("__n")).cast("long"))
        k_hi = F.greatest(F.lit(1).cast("long"),
                          F.ceil(F.lit(float(hi))
                                 * F.col("__n")).cast("long"))
        band = (ranked
                .filter((F.col("__rn") == k_lo) | (F.col("__rn") == k_hi))
                .groupBy(*by)
                .agg(F.min(F.when(F.col("__rn") == k_lo,
                                  F.col(value_col))).alias("lo_v"),
                     F.max(F.when(F.col("__rn") == k_hi,
                                  F.col(value_col))).alias("hi_v")))
    else:
        # one GK sketch per group serving both quantiles (the
        # array-percentage form) — two separate percentile_approx
        # aggregates would each insert and merge their own
        # QuantileSummaries buffer over every row, doubling the cost
        # of exactly the huge-data path this branch exists for
        pcts = F.array(F.lit(float(lo)), F.lit(float(hi)))
        band = (df.groupBy(*by)
                .agg(F.percentile_approx(value_col, pcts,
                                         accuracy).alias("__b"))
                .select(*by, F.col("__b")[0].alias("lo_v"),
                        F.col("__b")[1].alias("hi_v")))
    j = df.join(F.broadcast(band), by, "left")  # all-NULL groups survive
    # explicit NULL guard: Spark's least/greatest SKIP nulls, which
    # would silently clamp a NULL value onto the band edge (unmatched
    # `when` yields a NULL of the branch's own type)
    wv = F.when(F.col(value_col).isNotNull(),
                F.least(F.greatest(F.col(value_col), F.col("lo_v")),
                        F.col("hi_v")))
    return (j.withColumn("w_value", wv)
            .withColumn("clipped",
                        F.coalesce((F.col(value_col) != F.col("w_value"))
                                   .cast("long"), F.lit(0))))


def equi_width_histogram(df: DataFrame, value_col: str,
                         by: Sequence[str], bins: int = 10) -> DataFrame:
    """Per-group equi-width histogram: ``bins`` buckets spanning the
    group's [min, max]; the max lands in the last bucket (bucket index
    clamped), a zero-width group collapses to bucket 0. Emits one row
    per non-empty (group, bucket) with the count — the standard
    distribution-drift monitor for value columns.

    Scale shape: one partial-agg groupBy for the per-group min/max, a
    BROADCAST join of that one-row-per-group frame back, then a map-side
    bucket computation and a second partial-agg groupBy. The fact table
    shuffles once (the final groupBy); everything else is map-only."""
    by = list(by)
    stats = df.groupBy(*by).agg(F.min(value_col).alias("lo_"),
                                F.max(value_col).alias("hi_"))
    j = df.join(F.broadcast(stats), by)
    width = (F.col("hi_") - F.col("lo_")) / F.lit(float(bins))
    bucket = F.when(F.col("hi_") == F.col("lo_"), F.lit(0)).otherwise(
        F.least(F.lit(bins - 1),
                F.floor((F.col(value_col) - F.col("lo_")) / width)
                .cast("int")))
    return (j.withColumn("bucket", bucket.cast("long"))
            .groupBy(*by, "bucket")
            .agg(F.count(F.lit(1)).alias("cnt")))

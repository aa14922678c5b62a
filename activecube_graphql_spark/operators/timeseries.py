"""Time-series operators (beyond-reference, SURVEY §2.6 J3 family):
as-of join and regular-grid resampling.

Spark has no ASOF JOIN operator (ClickHouse and DuckDB do). The naive
emulations are a range join (quadratic blowup between matches) or a
per-key ``applyInPandas`` (Python boundary). This implementation is the
scalable pure-DataFrame form:

    union both sides tagged → one window sorted by (key, time, side) →
    ``last(value, ignorenulls)`` carries the most recent right-side row
    forward onto each left row.

Cost: ONE shuffle on the by-key (the same shuffle any keyed join pays)
plus a per-partition sort — no range-explosion, no Python. Window state
is a single row per column (``last``), so memory is flat regardless of
how many right rows precede a left row. Skewed by-keys behave exactly
like any keyed window (AQE cannot split windows; salt upstream if one
key dominates).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__aq_side"
_RTIME = "__aq_rtime"


def asof_join(left: DataFrame, right: DataFrame, on: str,
              by: Sequence[str], suffix: str = "_r",
              tolerance: Optional[float] = None) -> DataFrame:
    """For every ``left`` row, attach the columns of the most recent
    ``right`` row with ``right.on <= left.on`` within the same ``by``
    group (backward as-of; ties — equal timestamps — match, like DuckDB
    ``ASOF JOIN ... >=``). Unmatched left rows keep NULLs.

    ``on`` must be mutually comparable (timestamp/numeric) across both
    frames. Right-side non-key columns are renamed ``{name}{suffix}``
    when they collide with a left column; the matched right timestamp is
    exposed as ``{on}{suffix}``. ``tolerance`` (same units as ``on``
    differences) voids matches older than the bound — rows stay, their
    matched columns null out.
    """
    by = list(by)
    carry = [c for c in right.columns if c not in by and c != on]
    renames = {c: (c + suffix if c in left.columns else c) for c in carry}

    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias(_RTIME),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(renames[c]) for c in carry])
    l = left.select(
        "*", F.lit(None).cast(r.schema[_RTIME].dataType).alias(_RTIME),
        F.lit(1).alias(_SIDE))
    # left-only columns null out on right rows and vice versa
    combined = l.unionByName(r.withColumn(on, F.col(_RTIME)),
                             allowMissingColumns=True)

    # right rows sort BEFORE left rows at the same timestamp → ties match
    w = (Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col(_SIDE).asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = combined
    for c in carry:
        filled = filled.withColumn(renames[c],
                                   F.last(renames[c], ignorenulls=True).over(w))
    filled = filled.withColumn(_RTIME, F.last(_RTIME, ignorenulls=True).over(w))

    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        ok = (F.col(on).cast("double") - F.col(_RTIME).cast("double")
              <= F.lit(float(tolerance)))
        for c in carry:
            out = out.withColumn(renames[c],
                                 F.when(ok, F.col(renames[c])))
        out = out.withColumn(_RTIME, F.when(ok, F.col(_RTIME)))
    return (out.withColumn(on + suffix, F.col(_RTIME))
            .drop(_SIDE, _RTIME))


def moving_aggregate(df: DataFrame, on: str, by: Sequence[str],
                     value: str, window_rows: int,
                     aggs: Sequence[str] = ("avg",)) -> DataFrame:
    """Trailing moving aggregates + previous-row delta over an ordered
    series — the rolling-feature primitive (smoothed metrics, momentum
    features, anomaly baselines). Per ``by`` group ordered by ``on``:
    ``{agg}_{value}_{n}`` over the last ``window_rows`` rows (frame
    ``ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW`` — partial at the
    series head, like SQL), plus ``delta_{value}`` vs ``lag(1)`` (NULL
    on each group's first row).

    Scale shape: one hash shuffle on ``by`` + per-partition sort; frame
    state is O(window_rows) per group regardless of series length, and
    all aggregates share the single window sort. The degenerate
    ``by=[]`` case would funnel everything through one task — callers
    aggregate first (this operator is meant for per-key series, or
    post-aggregation spines that are already small)."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(F.col(on).asc()) \
        .rowsBetween(-(window_rows - 1), 0)
    wlag = Window.partitionBy(*by).orderBy(F.col(on).asc())
    out = df
    for agg in aggs:
        out = out.withColumn(
            f"{agg}_{value}_{window_rows}",
            getattr(F, agg)(F.col(value)).over(w))
    return out.withColumn(f"delta_{value}",
                          F.col(value) - F.lag(value, 1).over(wlag))


def sequence_features(df: DataFrame, on: str, by: Sequence[str],
                      value: str,
                      tiebreak: Optional[str] = None) -> DataFrame:
    """General ranking/analytic window family (SURVEY §2.8 — the
    reference exposes only per-group LIMIT BY, `parse_tree.rb:142-143`;
    this surfaces the rest of the family the cube layer builds on) over
    per-key ordered sequences: per ``by`` group ordered by ``on`` (then
    ``tiebreak`` for a deterministic total order), adds

    - ``seq``         — ``row_number()`` position in the sequence,
    - ``gap_s``       — whole seconds since the previous row (NULL on
      first; epoch-second grain on purpose — engines disagree on
      sub-second timestamp precision (ns parquet vs µs Spark), and a
      session-gap feature never needs it),
    - ``run_{value}`` — running (cumulative) sum of ``value``,
    - ``{value}_rank``— dense rank of ``value`` descending within group.

    Scale shape: ONE hash shuffle on ``by``; the first three columns
    share a single (on, tiebreak) sort, the rank column re-sorts the
    same partitions by value without a second exchange (Catalyst reuses
    the hash partitioning across Window operators with equal
    partitionBy). Window state is O(1) per column. The ``by=[]``
    degenerate case would serialize into one task — callers pre-filter
    or pre-aggregate, as with ``moving_aggregate``."""
    by = list(by)
    order = [F.col(on).asc()] + \
        ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*by).orderBy(*order)
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    wrank = Window.partitionBy(*by).orderBy(F.col(value).desc())
    return (df
            .withColumn("seq", F.row_number().over(w))
            .withColumn("gap_s", F.col(on).cast("long")
                        - F.lag(F.col(on).cast("long"), 1).over(w))
            .withColumn(f"run_{value}", F.sum(value).over(wrun))
            .withColumn(f"{value}_rank", F.dense_rank().over(wrank)))


def transition_counts(df: DataFrame, on: str, by: Sequence[str],
                      state: str,
                      tiebreak: Optional[str] = None) -> DataFrame:
    """First-order state-transition counts over per-key ordered
    sequences: for each ``by`` key ordered by ``on`` (then
    ``tiebreak``), count (previous state → state) pairs across ALL
    keys — the Markov-chain estimate behind funnel analysis, session
    modeling, and next-event prediction baselines. Each key's first
    row has no predecessor and contributes nothing.

    Scale shape: one hash shuffle on ``by`` for the lag window, then a
    map-side-combined groupBy on the (from, to) pair — the pair space
    is |states|², so the second shuffle carries a constant-size frame
    per mapper regardless of corpus size."""
    by = list(by)
    order = [F.col(on).asc()] + \
        ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(*by).orderBy(*order)
    return (df.withColumn("__prev", F.lag(F.col(state), 1).over(w))
            .filter(F.col("__prev").isNotNull())
            .groupBy(F.col("__prev").alias("from_state"),
                     F.col(state).alias("to_state"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def resample(df: DataFrame, on: str, by: Sequence[str], step: str,
             aggs: dict) -> DataFrame:
    """Regular-grid resampling with gap fill: per ``by`` group, aggregate
    into fixed ``step`` bins spanning [min(on), max(on)] and emit EMPTY
    bins too (count 0 / NULL aggregates) — the shape model-training
    feature pipelines want (no silent holes in a time series).

    ``step`` is an interval literal (e.g. ``'1 hour'``). ``aggs`` maps
    output name → aggregate Column. The bin spine is generated with
    ``sequence()`` per group (one row per group before the explode), so
    the only costs are the groupBy shuffle and the spine join (both keyed
    on ``by`` + bin)."""
    by = list(by)
    binned = df.withColumn("__bin", F.window(F.col(on), step)["start"])
    actual = (binned.groupBy(*by, "__bin")
              .agg(*[v.alias(k) for k, v in aggs.items()]))
    spine = (binned.groupBy(*by)
             .agg(F.min("__bin").alias("__lo"), F.max("__bin").alias("__hi"))
             .select(*by, F.explode(F.sequence(
                 F.col("__lo"), F.col("__hi"),
                 F.expr(f"INTERVAL {step}"))).alias("__bin")))
    return (spine.join(actual, [*by, "__bin"], "left")
            .withColumnRenamed("__bin", "bin_start"))

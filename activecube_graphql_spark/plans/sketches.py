"""Mergeable-sketch pre-aggregation (Apache DataSketches via Spark 3.5+
built-ins) — the answer to "COUNT(DISTINCT) and percentiles don't roll
up" at 100 TB.

A plain pre-aggregate (plans/preagg.py) can serve ``sum``/``count``/
``min``/``max`` at any coarser grouping because those aggregates are
decomposable. Distinct counts and quantiles are NOT: a daily rollup of
``count(distinct user_id)`` cannot produce the monthly distinct count.
The standard fix is to store a *mergeable sketch* per cell instead of a
scalar:

* **HLL sketch** per cell for distinct counts — ``hll_union_agg`` merges
  any subset of cells into the exact same sketch state a direct pass
  over the raw rows would build (union is lossless for HLL), so the
  estimate at EVERY rollup level has full-corpus accuracy (~1.6%/√(2^lgk)
  relative standard error, and exact below the sparse-mode threshold).
* **KLL sketch** per cell for quantiles — merged with the binary
  ``kll_sketch_merge_*`` expression folded over the cell list; rank
  error ≤ ~1.7% at the default k=200 regardless of input size.

Scale shape: building cells is ONE hash aggregation over the fact table
(sketch updates are constant-space per cell, partial-aggregated map-side
like any other agg buffer); cells persist to parquet as ``binary``
columns a few KB each — the 100 TB fact table is touched once, every
subsequent distinct/quantile query at any grouping reads only the tiny
cell table and merges sketches. This is the ClickHouse
``uniqState``/``uniqMerge`` AggregatingMergeTree pattern
(activecube's backing engine served `uniq` metrics from exactly such
state columns), re-expressed with Spark-native sketch functions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: suffixes marking sketch-state columns in a cell table
HLL_SUFFIX = "__hll"
KLL_SUFFIX = "__kll"


def sketch_cells(df: DataFrame, dims: Sequence[Column | str],
                 distinct_cols: Sequence[str] = (),
                 quantile_cols: Sequence[str] = (),
                 lgk: int = 12) -> DataFrame:
    """Cell-level sketch pre-aggregate: one row per ``dims`` cell with an
    HLL sketch per ``distinct_cols`` entry and a KLL(double) sketch per
    ``quantile_cols`` entry (plus an exact row count). The result is a
    plain DataFrame with binary columns — write it to parquet and the
    sketches survive the round-trip byte-exact."""
    aggs = [F.count(F.lit(1)).alias("rows")]
    aggs += [F.hll_sketch_agg(c, F.lit(lgk)).alias(c + HLL_SUFFIX)
             for c in distinct_cols]
    aggs += [F.kll_sketch_agg_double(F.col(c).cast("double"))
             .alias(c + KLL_SUFFIX) for c in quantile_cols]
    return df.groupBy(*dims).agg(*aggs)


def _fold_kll(col: str) -> Column:
    """Merge a group's KLL sketches: fold the binary pairwise merge over
    the collected cell list (first element seeds the accumulator). Cell
    counts per group are small by construction — cells ARE the coarse
    pre-aggregate — so the per-group list is bounded and the fold is a
    few pairwise merges, not a data-sized loop."""
    lst = F.collect_list(col)
    # tail length must be the exact size-1: an Int.MaxValue sentinel
    # overflows inside slice's start+length arithmetic and yields an
    # EMPTY tail (merge silently reduced to the first cell — caught by
    # the n-preservation test)
    tail = F.slice(lst, 2, F.greatest(F.size(lst) - 1, F.lit(0)))
    return F.aggregate(tail, F.element_at(lst, 1),
                       lambda acc, v: F.kll_sketch_merge_double(acc, v))


def rollup_distinct(cells: DataFrame, group_dims: Sequence[str],
                    cols: Sequence[str]) -> DataFrame:
    """Re-aggregate cell sketches to a coarser grouping: for each entry
    of ``cols``, ``{col}_uniq`` = HLL estimate of the distinct count —
    identical to the estimate a direct pass over the raw rows would
    yield (HLL union is lossless)."""
    aggs = [F.sum("rows").alias("rows")]
    aggs += [F.hll_sketch_estimate(F.hll_union_agg(c + HLL_SUFFIX))
             .alias(c + "_uniq") for c in cols]
    return cells.groupBy(*group_dims).agg(*aggs)


def rollup_quantiles(cells: DataFrame, group_dims: Sequence[str],
                     col: str, ps: Sequence[float]) -> DataFrame:
    """Re-aggregate cell KLL sketches to a coarser grouping:
    ``{col}_p{NN}`` = merged-sketch quantile estimate for each p."""
    merged = _fold_kll(col + KLL_SUFFIX)
    aggs = [F.kll_sketch_get_quantile_double(merged, F.lit(float(p)))
            .alias(f"{col}_p{int(p * 100):02d}") for p in ps]
    return cells.groupBy(*group_dims).agg(*aggs)

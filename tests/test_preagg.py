"""Backing-table selection (SURVEY §4.3): the rollup representation must
(a) be chosen exactly when it covers the request, (b) produce results
identical to the raw fact table (correctness-neutral by definition), and
(c) never answer a finer grain than it stores.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from activecube_graphql_spark.cubes import SalesCube
from activecube_graphql_spark.plans.preagg import attach_daily_rollup


@pytest.fixture()
def cube_with_rollup(spark, sf_dir, tmp_path):
    cube = SalesCube(spark, sf_dir)
    attach_daily_rollup(cube, sf_dir, cache_root=str(tmp_path))
    return cube


def _multiset(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_rollup_chosen_when_covering(cube_with_rollup):
    q = (cube_with_rollup.query()
         .slice("returnflag", "linestatus")
         .measure("revenue").measure("count", alias="cnt"))
    # static (declared-cost) mode: covering + cost < 1 -> rollup
    cube_with_rollup.representation_choice = "static"
    rep = q.chosen_representation()
    assert rep is not None and rep.name == "sales_daily_rollup"
    assert rep.cost < 1.0
    # measured-stats mode is honest at this toy SF: the daily rollup
    # parquet is physically BIGGER than sf0.001's raw lineitem (about one
    # row per grain), so the chooser declines it — the same query at
    # production scale picks the rollup (see test_plans stats test).
    cube_with_rollup.representation_choice = "stats"
    assert q.chosen_representation() is None


def test_rollup_not_chosen_for_uncovered_metric(cube_with_rollup):
    # count_distinct is not re-aggregatable from the rollup
    q = cube_with_rollup.query().slice("returnflag").measure("orders")
    assert q.chosen_representation() is None


def test_rollup_not_chosen_for_finer_grain(cube_with_rollup):
    # hour grain is below the rollup's daily grain
    q = (cube_with_rollup.query()
         .slice("shipdate.hour").measure("count"))
    assert q.chosen_representation() is None
    # raw timestamp grain likewise
    q2 = cube_with_rollup.query().slice("shipdate").measure("count")
    assert q2.chosen_representation() is None


def test_rollup_not_chosen_for_uncovered_join_dim(cube_with_rollup):
    q = cube_with_rollup.query().slice("region").measure("revenue")
    assert q.chosen_representation() is None


def test_rollup_results_match_raw(spark, sf_dir, tmp_path):
    """The oracle-neutrality requirement: same query, rollup on vs off,
    identical values (floats rounded — summation order differs)."""
    def run(with_rollup: bool):
        cube = SalesCube(spark, sf_dir)
        if with_rollup:
            attach_daily_rollup(cube, sf_dir, cache_root=str(tmp_path))
        q = (cube.query()
             .slice("returnflag")
             .slice("shipdate.year", alias="year")
             .measure("revenue").measure("count", alias="cnt")
             .measure("avg_price").measure("max_price")
             .when({"shipdate": {"gteq": "1996-01-01"}}))
        df = q.relabeled()
        return df.select("returnflag", "year",
                         F.round("revenue", 2).alias("revenue"), "cnt",
                         F.round("avg_price", 4).alias("avg_price"),
                         "max_price")

    assert _multiset(run(True)) == _multiset(run(False))


def test_rollup_conditional_aggregate_matches(spark, sf_dir, tmp_path):
    """Metric-scoped filters over grain-level selectors re-aggregate
    correctly from the rollup."""
    def run(with_rollup: bool):
        cube = SalesCube(spark, sf_dir)
        # static mode: at sf0.001 the rollup is physically bigger than
        # raw, so measured-stats mode would (correctly) pick raw and this
        # test would no longer exercise rollup re-aggregation
        cube.representation_choice = "static"
        if with_rollup:
            attach_daily_rollup(cube, sf_dir, cache_root=str(tmp_path))
        q = (cube.query().slice("linestatus")
             .measure("revenue", alias="rev_r",
                      where={"returnflag": "R"}))
        assert (q.chosen_representation() is not None) == with_rollup
        return q.relabeled().select(
            "linestatus", F.round("rev_r", 2).alias("rev_r"))

    assert _multiset(run(True)) == _multiset(run(False))


# ---------------------------------------------------------------- sketches

def test_sketch_cells_roundtrip_and_rollup(spark, tmp_path):
    """The 100 TB contract of plans/sketches.py: cells written to parquet
    and read back must merge to the same estimates as a direct pass over
    the raw rows — distinct counts and quantiles DO roll up when the
    cell stores sketch state instead of a scalar."""
    from activecube_graphql_spark.plans import sketches as sk
    from pyspark.sql import functions as F
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    cells = sk.sketch_cells(
        ev, ["event_type", F.to_date("ts").alias("day")],
        distinct_cols=["user_id"], quantile_cols=["value"])
    path = str(tmp_path / "cells")
    cells.write.parquet(path)
    cells2 = spark.read.parquet(path)

    # distinct: merged-cell estimate == direct-sketch estimate (HLL union
    # is lossless), and within 5% of exact truth
    got = {r["event_type"]: r["user_id_uniq"] for r in
           sk.rollup_distinct(cells2, ["event_type"], ["user_id"]).collect()}
    direct = {r["event_type"]: r["d"] for r in
              ev.groupBy("event_type")
              .agg(F.hll_sketch_estimate(
                  F.hll_sketch_agg("user_id", F.lit(12))).alias("d"))
              .collect()}
    exact = {r["event_type"]: r["e"] for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("e")).collect()}
    assert got == direct
    for k in exact:
        assert abs(got[k] - exact[k]) <= 0.05 * exact[k]

    # global rollup (coarser than the cell grain) also lossless
    total = sk.rollup_distinct(cells2, [], ["user_id"]).collect()[0]
    exact_total = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert abs(total["user_id_uniq"] - exact_total) <= 0.05 * exact_total


def test_sketch_kll_merge_preserves_n_and_rank(spark):
    """Merging cell KLL sketches must retain EVERY cell's stream (the
    r03 slice-overflow bug reduced the merge to the first cell), and the
    merged median must sit within rank tolerance of the true median."""
    from activecube_graphql_spark.plans import sketches as sk
    from pyspark.sql import functions as F
    df = (spark.range(10_000)
          .select((F.col("id") % 16).alias("cell"),
                  F.col("id").cast("double").alias("v")))
    cells = sk.sketch_cells(df, ["cell"], quantile_cols=["v"])
    merged = sk._fold_kll("v" + sk.KLL_SUFFIX)
    row = cells.agg(
        F.kll_sketch_get_n_double(merged).alias("n"),
        F.kll_sketch_get_quantile_double(merged, F.lit(0.5)).alias("p50")
    ).collect()[0]
    assert row["n"] == 10_000
    assert abs(row["p50"] - 5_000) <= 0.02 * 10_000  # 2% rank tolerance

    out = sk.rollup_quantiles(cells, [], "v", [0.1, 0.5, 0.9]).collect()[0]
    for p, truth in [(10, 1_000), (50, 5_000), (90, 9_000)]:
        assert abs(out[f"v_p{p:02d}"] - truth) <= 0.02 * 10_000

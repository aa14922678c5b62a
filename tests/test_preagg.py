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

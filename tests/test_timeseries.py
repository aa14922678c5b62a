"""Time-series operators (operators/timeseries.py): as-of join checked
against DuckDB's NATIVE ASOF JOIN on the events fixture; resample
gap-fill invariants.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events(spark):
    from activecube_graphql_spark.cubes import EventsCube
    return EventsCube(spark, SF_SMALL).table()


def test_asof_join_matches_duckdb_native(spark, events):
    """Backward as-of with ties: for each purchase, the user's most
    recent click at-or-before it. DuckDB executes its own ASOF JOIN
    operator over the same parquet — a fully independent implementation."""
    from activecube_graphql_spark.operators.timeseries import asof_join
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("value").alias("click_value")))
    got = (asof_join(purchases, clicks, on="ts", by=["user_id"])
           .select("user_id", F.unix_micros("ts").alias("t"),
                   "value", "click_value",
                   F.unix_micros("ts_r").alias("click_t")))

    con = duckdb.connect()
    con.execute(f"""
        CREATE VIEW events AS
        SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
               event_type, value
        FROM read_parquet('{SF_SMALL}/events.parquet')""")
    want = con.execute("""
        WITH p AS (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
             c AS (SELECT user_id, ts, value AS click_value FROM events
                   WHERE event_type = 'click')
        SELECT p.user_id, epoch_us(p.ts) AS t, p.value,
               c.click_value, epoch_us(c.ts) AS click_t
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts""").fetchall()
    con.close()
    a = sorted(map(repr, (tuple(r) for r in got.collect())))
    b = sorted(map(repr, want))
    assert len(a) > 0 and a == b


def test_asof_join_tolerance_voids_stale_matches(spark):
    from activecube_graphql_spark.operators.timeseries import asof_join
    left = spark.createDataFrame(
        [(1, 100.0, "x"), (1, 200.0, "y")], "k long, t double, tag string")
    right = spark.createDataFrame(
        [(1, 95.0, 10.0), (1, 120.0, 20.0)], "k long, t double, p double")
    rows = {r["tag"]: (r["p"], r["t_r"])
            for r in asof_join(left, right, on="t", by=["k"],
                               tolerance=10.0).collect()}
    assert rows["x"] == (10.0, 95.0)        # within 10
    assert rows["y"] == (None, None)        # last right at 120 is 80 stale


def test_asof_join_no_row_explosion(spark, events):
    """The as-of must emit exactly one row per left row (a range-join
    emulation would multiply rows between matches)."""
    from activecube_graphql_spark.operators.timeseries import asof_join
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    clicks = (events.filter(F.col("event_type") == "click")
              .select("user_id", "ts", F.col("value").alias("cv")))
    assert (asof_join(purchases, clicks, on="ts", by=["user_id"]).count()
            == purchases.count())


def test_resample_fills_gaps(spark, events):
    """Every group's bins form a complete step grid from its first to its
    last bin; bins with no data carry count 0 after fillna."""
    from activecube_graphql_spark.operators.timeseries import resample
    out = resample(events, on="ts", by=["event_type"], step="1 hour",
                   aggs={"cnt": F.count(F.lit(1)),
                         "total": F.round(F.sum("value"), 2)})
    out = out.fillna({"cnt": 0})
    rows = out.collect()
    assert rows
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    hour = 3600
    for typ, rs in by_type.items():
        ts = sorted(int(r["bin_start"].timestamp()) for r in rs)
        assert ts == list(range(ts[0], ts[-1] + hour, hour)), typ
        assert len(ts) == len(set(ts))
    # zero-filled bins exist only if the fixture actually has gaps; the
    # aggregate totals must match a direct grouped aggregation regardless
    direct = (events.groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n")).collect())
    got_n = {t: sum(r["cnt"] for r in rs) for t, rs in by_type.items()}
    assert got_n == {r["event_type"]: r["n"] for r in direct}


def test_sequence_features_columns(spark):
    """seq/gap_s/run/rank semantics on a hand-built series, including
    the whole-second gap grain and NULL gap on each group's first row."""
    from activecube_graphql_spark.operators.timeseries import (
        sequence_features)
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [("u", t0, 1, 10.0),
            ("u", t0 + dt.timedelta(seconds=5, milliseconds=400), 2, 30.0),
            ("u", t0 + dt.timedelta(seconds=7), 3, 30.0),
            ("v", t0, 4, 1.0)]
    df = spark.createDataFrame(rows, ["k", "ts", "eid", "value"])
    out = {r["eid"]: r for r in sequence_features(
        df, on="ts", by=["k"], value="value", tiebreak="eid").collect()}
    assert [out[i]["seq"] for i in (1, 2, 3)] == [1, 2, 3]
    assert out[1]["gap_s"] is None and out[4]["gap_s"] is None
    assert out[2]["gap_s"] == 5       # 5.4s truncates to whole seconds
    assert out[3]["gap_s"] == 2       # 7 - 5 at second grain
    assert out[3]["run_value"] == 70.0
    # dense rank: the two 30.0 rows tie at rank 1, the 10.0 row is 2
    assert (out[2]["value_rank"], out[3]["value_rank"]) == (1, 1)
    assert out[1]["value_rank"] == 2


def test_sequence_features_single_shuffle(spark):
    """All four window columns share one hash partitioning on the by
    key: exactly ONE Exchange in the physical plan (the value-rank
    window re-sorts but must not re-shuffle)."""
    from activecube_graphql_spark.cubes import EventsCube
    from activecube_graphql_spark.operators.timeseries import (
        sequence_features)
    ev = EventsCube(spark, SF_SMALL).table()
    out = sequence_features(ev, on="ts", by=["user_id"], value="value",
                            tiebreak="event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_transition_counts_and_staged_row_oracle(spark):
    """Hand-built chains: per-key first rows contribute nothing; counts
    aggregate across keys. Then the STAGED q_transitions driver row
    must hash-agree with its staged DuckDB oracle at sf0.001."""
    import datetime as dt
    import duckdb
    from activecube_graphql_spark.operators.timeseries import (
        transition_counts)
    t0 = dt.datetime(2024, 1, 1)
    rows = [("u", t0, "a"), ("u", t0 + dt.timedelta(1), "b"),
            ("u", t0 + dt.timedelta(2), "a"),
            ("v", t0, "b"), ("v", t0 + dt.timedelta(1), "a")]
    df = spark.createDataFrame(rows, ["k", "ts", "st"])
    out = {(r["from_state"], r["to_state"]): r["cnt"] for r in
           transition_counts(df, on="ts", by=["k"], state="st").collect()}
    assert out == {("a", "b"): 1, ("b", "a"): 2}

    from activecube_graphql_spark.driver_queries import (
        _TRANSITIONS_ORACLE, q_transitions)
    got = {(r["from_state"], r["to_state"], r["cnt"]) for r in
           q_transitions(spark, SF_SMALL).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_SMALL}/events.parquet')")
    want = set(map(tuple, con.execute(_TRANSITIONS_ORACLE).fetchall()))
    assert got == want and got

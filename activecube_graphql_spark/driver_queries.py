"""Driver-facing query registry: one named query per implemented operator
(SURVEY.md §2 ★ rows), each expressed through the cube engine, plus the
matching ANSI-SQL oracle for DuckDB.

Conventions (FIXTURES.md "usage notes"):
* every computed column aliased identically in Spark and SQL;
* float aggregates rounded INSIDE both queries (money sums → 2 decimals,
  averages/ratios → 4) because aggregation order differs between engines;
* arrays/structs serialized to strings for hash-stable comparison;
* approx operators (uniq) are kept out of hash-checked oracles — exact
  ``count(distinct)`` twins here, tolerance tests in tests/.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cubes import DocsCube, EventsCube, SalesCube


def _sales(spark: SparkSession, sf_dir: str) -> SalesCube:
    return SalesCube(spark, sf_dir)


def _events(spark: SparkSession, sf_dir: str) -> EventsCube:
    return EventsCube(spark, sf_dir)


def _round(df: DataFrame, spec: dict[str, int]) -> DataFrame:
    for name, digits in spec.items():
        df = df.withColumn(name, F.round(F.col(name), digits))
    return df


# --------------------------------------------------------------------------
# Core cube-query operators (reference parity)
# --------------------------------------------------------------------------

def q_flagship_revenue(spark, sf_dir):
    """P1+A1+A2+F7+O1: slice×2, measures×3, range filter, desc sort.
    The Q-F1 flagship (SURVEY §7 slice 1)."""
    q = (_sales(spark, sf_dir).query()
         .slice("returnflag", "linestatus")
         .measure("revenue")
         .measure("count", alias="cnt")
         .measure("quantity", alias="qty")
         .when({"shipdate": {"lteq": "1998-09-02"}})
         .desc(["revenue"]))
    return _round(q.relabeled(), {"revenue": 2})


def q_global_agg(spark, sf_dir):
    """P4: zero slices → single global row."""
    q = (_sales(spark, sf_dir).query()
         .measure("count", alias="cnt")
         .measure("quantity", alias="qty")
         .measure("avg_price")
         .measure("min_price")
         .measure("max_price"))
    return _round(q.relabeled(), {"avg_price": 4})


def q_slice_subfield_year(spark, sf_dir):
    """P2: hierarchical dimension sub-field (orderdate.year) as slice."""
    q = (_sales(spark, sf_dir).query()
         .slice("orderdate.year", alias="order_year")
         .measure("revenue")
         .measure("count", alias="cnt"))
    df = _round(q.relabeled(), {"revenue": 2})
    return df.withColumn("order_year", F.col("order_year").cast("long"))


def q_slice_month_start(spark, sf_dir):
    """P2 (date_trunc flavor) + F2 range filter on a joined selector."""
    q = (_sales(spark, sf_dir).query()
         .slice("orderdate.month_start", alias="month")
         .measure("revenue")
         .when({"orderdate": {"gteq": "1997-01-01", "lt": "1998-01-01"}}))
    return _round(q.relabeled(), {"revenue": 2})


def q_star_join_region(spark, sf_dir):
    """J1: cube-internal star join (lineitem⋈orders⋈customer⋈nation⋈region);
    dimension tables broadcast."""
    q = (_sales(spark, sf_dir).query()
         .slice("region")
         .measure("revenue")
         .measure("count", alias="cnt"))
    return _round(q.relabeled(), {"revenue": 2})


def q_filter_eq(spark, sf_dir):
    """F1: bare-scalar argument → eq shorthand."""
    q = (_sales(spark, sf_dir).query()
         .slice("linestatus")
         .measure("count", alias="cnt")
         .when({"returnflag": "R"}))
    return q.relabeled()


def q_filter_ophash(spark, sf_dir):
    """F2: operator-hash argument {gt, lteq} ANDed."""
    q = (_sales(spark, sf_dir).query()
         .slice("returnflag")
         .measure("count", alias="cnt")
         .measure("quantity", alias="qty")
         .when({"quantity": {"gt": 10, "lteq": 40}}))
    return q.relabeled()


def q_filter_in(spark, sf_dir):
    """F3: array-of-scalars → IN list (selector on a broadcast-joined dim)."""
    q = (_sales(spark, sf_dir).query()
         .slice("mktsegment")
         .measure("revenue")
         .when({"mktsegment": ["BUILDING", "MACHINERY"]}))
    return _round(q.relabeled(), {"revenue": 2})


def q_filter_and_list(spark, sf_dir):
    """F4: array-of-hashes → conjunction."""
    q = (_sales(spark, sf_dir).query()
         .slice("returnflag")
         .measure("avg_discount")
         .measure("count", alias="cnt")
         .when({"discount": [{"gteq": 0.02}, {"lteq": 0.08}]}))
    return _round(q.relabeled(), {"avg_discount": 4})


def q_filter_any_or(spark, sf_dir):
    """F6: any: [...] → OR of AND-groups across different selectors."""
    q = (_sales(spark, sf_dir).query()
         .slice("nation")
         .measure("revenue")
         .when({"any": [{"mktsegment": "BUILDING"},
                        {"region": "ASIA", "orderstatus": "F"}]}))
    return _round(q.relabeled(), {"revenue": 2})


def q_filter_like_between(spark, sf_dir):
    """F7: like + between."""
    q = (_sales(spark, sf_dir).query()
         .slice("orderpriority")
         .measure("count", alias="cnt")
         .when({"orderpriority": {"like": "3%"},
                "quantity": {"between": [5.0, 45.0]}}))
    return q.relabeled()


def q_filter_null_ops(spark, sf_dir):
    """F5: null-aware operators — not_eq None ≡ IS NOT NULL; the nil-drop
    rule (gt: None vanishes) leaves only the not_eq predicate."""
    q = (_sales(spark, sf_dir).query()
         .slice("returnflag")
         .measure("count", alias="cnt")
         .when({"returnflag": {"not_eq": None, "gt": None}}))
    return q.relabeled()


def q_cond_agg(spark, sf_dir):
    """F8/A4: metric-scoped filter → conditional aggregate, alongside the
    unconditional twin (alias fan-out of the same metric, R2)."""
    q = (_sales(spark, sf_dir).query()
         .slice("returnflag")
         .measure("revenue", alias="total_rev")
         .measure("revenue", alias="hi_disc_rev",
                  where={"discount": {"gteq": 0.05}})
         .measure("count", alias="hi_disc_cnt",
                  where={"discount": {"gteq": 0.05}}))
    return _round(q.relabeled(), {"total_rev": 2, "hi_disc_rev": 2})


def q_count_distinct(spark, sf_dir):
    """A3 (exact twin): count(distinct) — approx variant tolerance-tested
    in tests/, not hash-checked (FIXTURES.md note)."""
    q = (_sales(spark, sf_dir).query()
         .slice("returnflag")
         .measure("orders")
         .measure("parts"))
    return q.relabeled()


def q_collect_array(spark, sf_dir):
    """A5: array aggregate (collect_set → sorted), string-joined for
    hash-stable comparison."""
    q = (_sales(spark, sf_dir).query()
         .slice("linestatus")
         .measure("flags")
         .measure("count", alias="cnt"))
    return q.relabeled().withColumn("flags", F.array_join(F.col("flags"), ","))


def q_tuple_topk(spark, sf_dir):
    """A6: tuple/struct aggregate — per-group top-3 (partkey, price) tuples
    by revenue, serialized as 'partkey:price_cents' for comparison."""
    q = (_sales(spark, sf_dir).query()
         .slice("returnflag")
         .measure("top_parts"))
    df = q.relabeled()
    return df.withColumn(
        "top_parts",
        F.array_join(
            F.transform(
                F.col("top_parts"),
                lambda s: F.concat_ws(
                    ":", s["partkey"].cast("string"),
                    F.round(s["price"] * 100, 0).cast("long").cast("string"))),
            ";"))


def q_sort_option_order(spark, sf_dir):
    """O1+O3+O5: ordered options — desc THEN limit (≠ limit-then-desc);
    deterministic via multi-field sort."""
    q = (_sales(spark, sf_dir).query()
         .slice("customer")
         .measure("revenue")
         .desc(["revenue", "customer"])
         .limit(10))
    return _round(q.relabeled(), {"revenue": 2})


def q_sort_by_integer(spark, sf_dir):
    """O2: asc_by_integer — string column sorted by integer value."""
    q = (_events(spark, sf_dir).query()
         .slice("props.k_str", alias="k_str")
         .measure("count", alias="cnt")
         .option("asc_by_integer", ["k_str"])
         .limit(20))
    return q.relabeled()


def q_offset(spark, sf_dir):
    """O3: limit + offset pagination over a deterministic sort."""
    q = (_events(spark, sf_dir).query()
         .slice("user_id")
         .measure("total")
         .desc(["total", "user_id"])
         .offset(5)
         .limit(5))
    return _round(q.relabeled(), {"total": 2})


def q_limit_by(spark, sf_dir):
    """O4: per-group LIMIT BY (ClickHouse ``LIMIT 2 BY user_id``) — top-2
    events per user by value (Q-F3 flagship)."""
    q = (_events(spark, sf_dir).query()
         .slice("user_id", "event_id", "value")
         .measure("count", alias="cnt")
         .desc(["value"])
         .limit_by("user_id", limit=2))
    return _round(q.relabeled(), {"value": 2})


def q_rollup(spark, sf_dir):
    """A7 (beyond reference): ROLLUP grouping sets."""
    q = (_sales(spark, sf_dir).query()
         .slice("returnflag", "linestatus")
         .measure("count", alias="cnt")
         .measure("revenue")
         .grouping("rollup"))
    return _round(q.relabeled(), {"revenue": 2})


def q_json_subfield(spark, sf_dir):
    """§2.9 JSON: get_json_object sub-field dimension, typed."""
    q = (_events(spark, sf_dir).query()
         .slice("props.k", alias="k")
         .measure("count", alias="cnt")
         .measure("total"))
    return _round(q.relabeled(), {"total": 2})


def q_distinct_slice(spark, sf_dir):
    """No-measure query → DISTINCT projection of slices."""
    q = (_sales(spark, sf_dir).query()
         .slice("orderstatus", "mktsegment"))
    return q.relabeled()


def q_events_hourly(spark, sf_dir):
    """Batch twin of the streaming tumbling-window aggregation (§2.10):
    1-hour windows over ts with per-type measures."""
    q = (_events(spark, sf_dir).query()
         .slice("ts.hour_start", alias="hour_start")
         .slice("event_type")
         .measure("count", alias="cnt")
         .measure("total")
         .measure("users"))
    return _round(q.relabeled(), {"total": 2})


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "flagship_revenue": q_flagship_revenue,
    "global_agg": q_global_agg,
    "slice_subfield_year": q_slice_subfield_year,
    "slice_month_start": q_slice_month_start,
    "star_join_region": q_star_join_region,
    "filter_eq": q_filter_eq,
    "filter_ophash": q_filter_ophash,
    "filter_in": q_filter_in,
    "filter_and_list": q_filter_and_list,
    "filter_any_or": q_filter_any_or,
    "filter_like_between": q_filter_like_between,
    "filter_null_ops": q_filter_null_ops,
    "cond_agg": q_cond_agg,
    "count_distinct": q_count_distinct,
    "collect_array": q_collect_array,
    "tuple_topk": q_tuple_topk,
    "sort_option_order": q_sort_option_order,
    "sort_by_integer": q_sort_by_integer,
    "offset": q_offset,
    "limit_by": q_limit_by,
    "rollup": q_rollup,
    "json_subfield": q_json_subfield,
    "distinct_slice": q_distinct_slice,
    "events_hourly": q_events_hourly,
}


ORACLES: dict[str, str] = {
    "flagship_revenue": """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS cnt, sum(l_quantity) AS qty
        FROM lineitem
        WHERE cast(l_shipdate AS DATE) <= DATE '1998-09-02'
        GROUP BY 1, 2
    """,
    "global_agg": """
        SELECT count(*) AS cnt, sum(l_quantity) AS qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               min(l_extendedprice) AS min_price,
               max(l_extendedprice) AS max_price
        FROM lineitem
    """,
    "slice_subfield_year": """
        SELECT year(o_orderdate) AS order_year,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "slice_month_start": """
        SELECT cast(date_trunc('month', o_orderdate) AS DATE) AS month,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE cast(o_orderdate AS DATE) >= DATE '1997-01-01'
          AND cast(o_orderdate AS DATE) < DATE '1998-01-01'
        GROUP BY 1
    """,
    "star_join_region": """
        SELECT r_name AS region,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS cnt
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1
    """,
    "filter_eq": """
        SELECT l_linestatus AS linestatus, count(*) AS cnt
        FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1
    """,
    "filter_ophash": """
        SELECT l_returnflag AS returnflag, count(*) AS cnt,
               sum(l_quantity) AS qty
        FROM lineitem WHERE l_quantity > 10 AND l_quantity <= 40 GROUP BY 1
    """,
    "filter_in": """
        SELECT c_mktsegment AS mktsegment,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        GROUP BY 1
    """,
    "filter_and_list": """
        SELECT l_returnflag AS returnflag,
               round(avg(l_discount), 4) AS avg_discount, count(*) AS cnt
        FROM lineitem WHERE l_discount >= 0.02 AND l_discount <= 0.08
        GROUP BY 1
    """,
    "filter_any_or": """
        SELECT n_name AS nation,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE c_mktsegment = 'BUILDING'
           OR (r_name = 'ASIA' AND o_orderstatus = 'F')
        GROUP BY 1
    """,
    "filter_like_between": """
        SELECT o_orderpriority AS orderpriority, count(*) AS cnt
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderpriority LIKE '3%'
          AND l_quantity BETWEEN 5.0 AND 45.0
        GROUP BY 1
    """,
    "filter_null_ops": """
        SELECT l_returnflag AS returnflag, count(*) AS cnt
        FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1
    """,
    "cond_agg": """
        SELECT l_returnflag AS returnflag,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev,
               round(sum(CASE WHEN l_discount >= 0.05
                              THEN l_extendedprice * (1 - l_discount) END), 2)
                   AS hi_disc_rev,
               count(CASE WHEN l_discount >= 0.05 THEN 1 END) AS hi_disc_cnt
        FROM lineitem GROUP BY 1
    """,
    "count_distinct": """
        SELECT l_returnflag AS returnflag,
               count(DISTINCT l_orderkey) AS orders,
               count(DISTINCT l_partkey) AS parts
        FROM lineitem GROUP BY 1
    """,
    "collect_array": """
        SELECT l_linestatus AS linestatus,
               array_to_string(list_sort(list(DISTINCT l_returnflag)), ',')
                   AS flags,
               count(*) AS cnt
        FROM lineitem GROUP BY 1
    """,
    "tuple_topk": """
        WITH ranked AS (
            SELECT l_returnflag, l_partkey, l_extendedprice,
                   row_number() OVER (
                       PARTITION BY l_returnflag
                       ORDER BY l_extendedprice * (1 - l_discount) DESC,
                                l_partkey DESC, l_extendedprice DESC) AS rn
            FROM lineitem)
        SELECT l_returnflag AS returnflag,
               string_agg(l_partkey || ':' ||
                          cast(round(l_extendedprice * 100) AS BIGINT),
                          ';' ORDER BY rn) AS top_parts
        FROM ranked WHERE rn <= 3 GROUP BY 1
    """,
    "sort_option_order": """
        SELECT c_name AS customer,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
        ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_name DESC
        LIMIT 10
    """,
    "sort_by_integer": """
        SELECT json_extract_string(props, '$.k') AS k_str, count(*) AS cnt
        FROM events GROUP BY 1
        ORDER BY cast(k_str AS BIGINT) ASC LIMIT 20
    """,
    "offset": """
        SELECT user_id, round(sum(value), 2) AS total
        FROM events GROUP BY 1
        ORDER BY sum(value) DESC, user_id DESC LIMIT 5 OFFSET 5
    """,
    "limit_by": """
        WITH base AS (
            SELECT user_id, event_id, value, count(*) AS cnt
            FROM events GROUP BY 1, 2, 3),
        ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY user_id
                ORDER BY value DESC, user_id, event_id, value, cnt) AS rn
            FROM base)
        SELECT user_id, event_id, round(value, 2) AS value, cnt
        FROM ranked WHERE rn <= 2
    """,
    "rollup": """
        SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
               count(*) AS cnt,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "json_subfield": """
        SELECT cast(json_extract_string(props, '$.k') AS BIGINT) AS k,
               count(*) AS cnt, round(sum(value), 2) AS total
        FROM events GROUP BY 1
    """,
    "distinct_slice": """
        SELECT DISTINCT o_orderstatus AS orderstatus,
                        c_mktsegment AS mktsegment
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
    """,
    "events_hourly": """
        SELECT date_trunc('hour', ts) AS hour_start, event_type,
               count(*) AS cnt, round(sum(value), 2) AS total,
               count(DISTINCT user_id) AS users
        FROM events GROUP BY 1, 2
    """,
}

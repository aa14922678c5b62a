"""Concrete test cubes over the fixture star schema (SURVEY §5.3).

* SalesCube  — lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region (+part/supplier)
* EventsCube — events (time-series; limit_by / JSON props / streaming twin)
* DocsCube   — documents (dedup / text analysis)
* VectorCube — embeddings (similarity search)

Join-pruning design: lineitem⋈orders is a fact-fact shuffle join, so it is
declared non-broadcast and only materializes when a query touches order
columns; customer/nation/region/part/supplier are broadcast dimension
lookups (map-side hash join, no fact shuffle — the right plan at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .model import Cube, Dimension, JoinSpec, Metric, Selector

# ---------------------------------------------------------------- helpers

_DATE_FIELDS = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "hour": F.hour,
    "date": F.to_date,
    "month_start": lambda c: F.date_trunc("month", c).cast("date"),
}

#: ANSI-SQL twins of the date sub-fields (printer, sql.py)
_DATE_FIELDS_SQL = {
    "year": "year({e})",
    "month": "month({e})",
    "day": "day({e})",
    "hour": "hour({e})",
    "date": "CAST({e} AS DATE)",
    "month_start": "CAST(date_trunc('month', {e}) AS DATE)",
}


#: Revenue per-row value in EXACT UNSCALED INTEGER 10⁻⁴-dollar units
#: ('cents4' — r08, VERDICT r07 item 1; supersedes the r07 DECIMAL
#: form). Why not double: the fixture's sf0.001 N|F group sum lands
#: EXACTLY on a 2dp ROUND midpoint, so a double sum — whose low bits
#: depend on partition count and summation order — rounds
#: nondeterministically across engines/runs/cluster widths. Why not
#: DECIMAL: Spark's sum over DECIMAL(17,4) widens the aggregation
#: buffer past 18 digits, leaving the unscaled-long fast path for
#: BigDecimal — a measured 5.3× PER-ROW cost on the hottest
#: aggregation path (tools/money_sum_bench.py; the r07 regression that
#: broke the 2× freeze on rollup/grouping_sets/cond_agg/alias_fanout).
#: Prices and discounts sit on a 2dp grid by data contract
#: (tools/ulp_margins.py run_sum_rounding asserts it), so
#: floor(x·100 + 0.5) recovers the exact integer cents from the
#: double (the product is within an ulp of the true integer, 0.005
#: away from the nearest floor boundary), the cents4 product is exact
#: int64, SUM(int64) is exact hardware arithmetic at any parallelism,
#: and Metric.money_sum's integer-space half-up emission is
#: deterministic by construction — the scale-correct treatment for
#: money aggregates on a 1000-executor cluster, at plain-double speed
#: (measured: 0.53 s vs double's 0.54 s on the sf1 ROLLUP shape).
#: floor (not round): Spark's round(double) allocates a BigDecimal
#: per row (measured 2.2× on Expand shapes); floor stays in codegen.
#: Valid in both Spark SQL and DuckDB verbatim.
_REVENUE_SQL = (
    "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) "
    "* (100 - CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) "
    "AS BIGINT))")


def _revenue() -> F.Column:
    """Per-row revenue in cents4 (BIGINT). Same total order as dollar
    revenue (monotone scale), so it doubles as the exact, codegen-fast
    ordering key for top_parts/tuple_topk — the engine and the DuckDB
    oracle now rank by the identical integer (ADVICE r07 item 1)."""
    return F.expr(_REVENUE_SQL)


ORDERS = frozenset({"orders"})
CUSTOMER = frozenset({"orders", "customer"})
NATION = frozenset({"orders", "customer", "nation"})
REGION = frozenset({"orders", "customer", "nation", "region"})
PART = frozenset({"part"})
SUPPLIER = frozenset({"supplier"})


def _ROW_KEY() -> "F.Column":
    """Deterministic lineitem row key for arg metrics — see the comment
    at the last_price/first_price declarations. A 60-bit md5 prefix of
    the '|'-separated row fields (the engine-portable hash idiom the
    sampling module already verifies bit-for-bit against DuckDB),
    ordered as a BIGINT: argMin/argMax only need SOME deterministic
    total order both engines share — exactly the reference's opaque
    row-id role. A LONG ordering key keeps the aggregate buffer
    mutable (HashAggregate); a string key here demoted the whole
    aggregation to SortAggregate and re-JITed ~1 s of generated sort
    code per compiled query. Hash-collision risk is ~n²/2⁶¹ and only
    matters if colliding rows disagree in value AND sit at a group
    extreme — and the fixture check is deterministic either way."""
    return F.conv(F.substring(F.md5(F.concat_ws(
        "|", F.col("l_orderkey"), F.col("l_linenumber"),
        F.col("l_partkey"), F.col("l_suppkey"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long"))),
        1, 15), 16, 10).cast("long")


_ROW_KEY_SQL = (
    "CAST('0x' || substr(md5(concat_ws('|', l_orderkey, l_linenumber, "
    "l_partkey, l_suppkey, "
    "CAST(round(l_extendedprice * 100, 0) AS BIGINT))), 1, 15) AS BIGINT)")


class SalesCube(Cube):
    name = "sales"
    base_table = "lineitem"
    joins = [
        # fact-fact: shuffle join on orderkey; AQE handles skew. Not broadcast.
        JoinSpec("orders", on=lambda: F.col("l_orderkey") == F.col("o_orderkey"),
                 how="inner", on_sql="l_orderkey = o_orderkey"),
        JoinSpec("customer", on=lambda: F.col("o_custkey") == F.col("c_custkey"),
                 how="inner", broadcast=True, depends_on="orders",
                 on_sql="o_custkey = c_custkey"),
        JoinSpec("nation", on=lambda: F.col("c_nationkey") == F.col("n_nationkey"),
                 how="inner", broadcast=True, depends_on="customer",
                 on_sql="c_nationkey = n_nationkey"),
        JoinSpec("region", on=lambda: F.col("n_regionkey") == F.col("r_regionkey"),
                 how="inner", broadcast=True, depends_on="nation",
                 on_sql="n_regionkey = r_regionkey"),
        JoinSpec("part", on=lambda: F.col("l_partkey") == F.col("p_partkey"),
                 how="inner", broadcast=True, on_sql="l_partkey = p_partkey"),
        JoinSpec("supplier", on=lambda: F.col("l_suppkey") == F.col("s_suppkey"),
                 how="inner", broadcast=True, on_sql="l_suppkey = s_suppkey"),
    ]
    dimensions = {
        "returnflag": Dimension("l_returnflag"),
        "linestatus": Dimension("l_linestatus"),
        "shipdate": Dimension("l_shipdate", fields=dict(_DATE_FIELDS),
                              sql_fields=dict(_DATE_FIELDS_SQL)),
        "orderdate": Dimension("o_orderdate", fields=dict(_DATE_FIELDS),
                               requires=ORDERS,
                               sql_fields=dict(_DATE_FIELDS_SQL)),
        "orderstatus": Dimension("o_orderstatus", requires=ORDERS),
        "orderpriority": Dimension("o_orderpriority", requires=ORDERS),
        "customer": Dimension("c_name", requires=CUSTOMER),
        "mktsegment": Dimension("c_mktsegment", requires=CUSTOMER),
        # string-function sub-fields (§2.9 string family as P2 projections)
        "nation": Dimension("n_name", requires=NATION, fields={
            "initial": lambda c: F.substring(c, 1, 1),
            "lower": F.lower,
        }, sql_fields={
            "initial": "substring({e}, 1, 1)",
            "lower": "lower({e})",
        }),
        "region": Dimension("r_name", requires=REGION),
        "brand": Dimension("p_brand", requires=PART),
        "parttype": Dimension("p_type", requires=PART, fields={
            "word1": lambda c: F.regexp_extract(c, r"^(\w+)", 1),
        }, sql_fields={
            "word1": r"regexp_extract({e}, '^(\w+)', 1)",
        }),
        "suppname": Dimension("s_name", requires=SUPPLIER),
    }
    metrics = {
        "count": Metric.count(),
        "quantity": Metric.sum("l_quantity"),
        "revenue": Metric.money_sum(_revenue, sql_expr=_REVENUE_SQL),
        "avg_price": Metric.avg("l_extendedprice"),
        "min_price": Metric.min("l_extendedprice"),
        "max_price": Metric.max("l_extendedprice"),
        "avg_discount": Metric.avg("l_discount"),
        "orders": Metric.count_distinct("l_orderkey"),
        "orders_uniq": Metric.uniq("l_orderkey"),
        "parts": Metric.count_distinct("l_partkey"),
        "flags": Metric.collect("l_returnflag", distinct=True),
        "any_flag": Metric.any("l_returnflag"),
        "median_price": Metric.quantile("l_extendedprice", 0.5),
        "stddev_price": Metric.stddev("l_extendedprice"),
        "var_price": Metric.variance("l_extendedprice"),
        "qty_price_corr": Metric.corr("l_quantity", "l_extendedprice"),
        "p90_price": Metric.quantile("l_extendedprice", 0.9),
        "p90_price_approx": Metric.quantile_approx("l_extendedprice", 0.9),
        # argMin/argMax need a deterministic ordering key or the result
        # is whichever tied row an engine happens to keep. The synthetic
        # fixture has duplicate (orderkey, linenumber) pairs (~20% of
        # rows at every SF — measured), so the "natural" composite id is
        # NOT unique; the key is _ROW_KEY above — a 60-bit md5 prefix of
        # the full field tuple ordered as BIGINT (a LONG key keeps the
        # aggregate buffer mutable/HashAggregate, where the earlier
        # lpad-string key demoted the plan to SortAggregate). Two
        # DISTINCT tuples can still collide in 60 bits (~n²/2⁶¹ — the
        # accepted residual risk _ROW_KEY's docstring quantifies: it
        # bites only if colliders disagree in price AND sit at a group
        # extreme). DuckDB's min_by/max_by accept no struct ordering
        # key, hence one scalar key rather than row() tuples.
        "last_price": Metric.arg_max(
            "l_extendedprice", lambda: _ROW_KEY(), order_sql=_ROW_KEY_SQL),
        "first_price": Metric.arg_min(
            "l_extendedprice", lambda: _ROW_KEY(), order_sql=_ROW_KEY_SQL),
        "top_parts": Metric.top_tuples(
            _revenue, {"partkey": "l_partkey", "price": "l_extendedprice"}, 3),
    }
    selectors = {
        "returnflag": Selector("l_returnflag"),
        "linestatus": Selector("l_linestatus"),
        "shipdate": Selector(lambda: F.col("l_shipdate").cast("date"),
                              sql="CAST(l_shipdate AS DATE)"),
        "quantity": Selector("l_quantity"),
        "discount": Selector("l_discount"),
        "extendedprice": Selector("l_extendedprice"),
        "orderdate": Selector(lambda: F.col("o_orderdate").cast("date"),
                              requires=ORDERS, sql="CAST(o_orderdate AS DATE)"),
        "orderstatus": Selector("o_orderstatus", requires=ORDERS),
        "orderpriority": Selector("o_orderpriority", requires=ORDERS),
        "mktsegment": Selector("c_mktsegment", requires=CUSTOMER),
        "nation": Selector("n_name", requires=NATION),
        "region": Selector("r_name", requires=REGION),
        "brand": Selector("p_brand", requires=PART),
        "customer": Selector("c_name", requires=CUSTOMER),
    }


class EventsCube(Cube):
    name = "events"
    base_table = "events"
    joins: list[JoinSpec] = []

    @staticmethod
    def prepare(df):
        # events.ts is parquet timestamp[ns]; arrival type varies by Spark
        # build/session (long-nanos, long-micros, NTZ) — canonicalize to a
        # microsecond TIMESTAMP so queries never depend on the session.
        from .functions.tsutil import normalize_ts
        return normalize_ts(df, "ts")
    dimensions = {
        "event_type": Dimension("event_type"),
        "user_id": Dimension("user_id"),
        "event_id": Dimension("event_id"),
        "value": Dimension("value"),
        "ts": Dimension("ts", fields={
            **_DATE_FIELDS,
            "hour_start": lambda c: F.date_trunc("hour", c),
            "minute_start": lambda c: F.date_trunc("minute", c),
        }, sql_fields={
            **_DATE_FIELDS_SQL,
            "hour_start": "CAST(date_trunc('hour', {e}) AS TIMESTAMP)",
            "minute_start": "CAST(date_trunc('minute', {e}) AS TIMESTAMP)",
        }),
        # GraphQL-union-typed dimension (SURVEY §1.3 union row; reference
        # parse_tree.rb:70-72): an event's actor is Bot | User, decided
        # per row — `__typename` under `actor` binds to this discriminator
        # (ParseTree keeps `__typename` only under unions).
        "actor": Dimension(
            "user_id",
            fields={"id": lambda c: c},
            sql_fields={"id": "{e}"},
            typename=lambda: F.when(F.col("user_id") % 7 == 0,
                                    F.lit("Bot")).otherwise(F.lit("User")),
            typename_sql="CASE WHEN user_id % 7 = 0 THEN 'Bot' "
                         "ELSE 'User' END"),
        # JSON payload sub-field dimension (scalar-function family, §2.9)
        "props": Dimension("props", fields={
            "k": lambda c: F.get_json_object(c, "$.k").cast("long"),
            "k_str": lambda c: F.get_json_object(c, "$.k"),
        }, sql_fields={
            "k": "CAST(json_extract_string({e}, '$.k') AS BIGINT)",
            "k_str": "json_extract_string({e}, '$.k')",
        }),
    }
    metrics = {
        "count": Metric.count(),
        "total": Metric.sum("value"),
        "avg_value": Metric.avg("value"),
        "max_value": Metric.max("value"),
        "users": Metric.count_distinct("user_id"),
        "users_uniq": Metric.uniq("user_id"),
        "last_value": Metric.arg_max("value", "event_id"),  # event_id unique
    }
    selectors = {
        "event_type": Selector("event_type"),
        "user_id": Selector("user_id"),
        "value": Selector("value"),
        "ts": Selector("ts"),
        "props_k": Selector(lambda: F.get_json_object(F.col("props"), "$.k").cast("long"),
                            sql="CAST(json_extract_string(props, '$.k') AS BIGINT)"),
    }


class EventsArchiveCube(EventsCube):
    """EventsCube over a hot/cold segmented backing (§2.7 UNION ALL
    surface; plans/segments.py): identical element dictionaries, but the
    fact table is the UNION ALL of two disjoint physical segments. Every
    query API — slices, measures, filters, options, streaming twins —
    works unchanged; filters push into BOTH segment scans independently,
    so a predicate excluding the archive's time range never reads it."""
    name = "events_archive"
    base_tables = ["events_cold", "events_hot"]


class DocsCube(Cube):
    name = "documents"
    base_table = "documents"
    joins: list[JoinSpec] = []
    dimensions = {
        "lang": Dimension("lang"),
        "source": Dimension("source"),
    }
    metrics = {
        "count": Metric.count(),
        # n_chars is int64: pin the printed oracle's SUM back to BIGINT
        # (DuckDB widens integer SUM to HUGEINT → float64 through pandas,
        # the r03/r04 graphql_docs hash-fail root cause)
        "chars": Metric.sum("n_chars", sql_cast="BIGINT"),
        "avg_chars": Metric.avg("n_chars"),
        "docs": Metric.count_distinct("doc_id"),
    }
    selectors = {
        "lang": Selector("lang"),
        "source": Selector("source"),
        "n_chars": Selector("n_chars"),
    }


class VectorCube(Cube):
    name = "embeddings"
    base_table = "embeddings"
    joins: list[JoinSpec] = []
    dimensions = {
        "label": Dimension("label"),
    }
    metrics = {
        "count": Metric.count(),
        "vectors": Metric.count_distinct("vec_id"),
    }
    selectors = {
        "label": Selector("label"),
        "vec_id": Selector("vec_id"),
    }

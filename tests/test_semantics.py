"""Unit tests for the reference's quirky semantic rules (SURVEY §5.2 item 3):
nil-predicate drop, option ordering, injection guard, alias fan-out,
unknown-name fail-fast, null-aware operators. These are pure-semantics
checks the oracle harness can't express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from activecube_graphql_spark import InputArgumentError
from activecube_graphql_spark.cubes import EventsCube, SalesCube


def test_unknown_dimension_fails_fast(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="Can not find"):
        cube.query().slice("nope")


def test_unknown_metric_fails_fast(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="Can not find"):
        cube.query().measure("nope")


def test_unknown_subfield_fails_fast(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="sub-field"):
        cube.query().slice("shipdate.century")


def test_unknown_option_fails_fast(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="not supported"):
        cube.query().slice("returnflag").measure("count").option("frobnicate", 1)


def test_unknown_selector_operator_fails_fast(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="operator"):
        cube.query().slice("returnflag").measure("count") \
            .when({"quantity": {"wat": 1}}).df()


def test_injection_guard(spark, sf_dir):
    """parse_tree.rb:113-114 — values containing `_aq.` are rejected."""
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="Unexpected value"):
        cube.query().when({"returnflag": "_aq.count"})
    with pytest.raises(InputArgumentError, match="Unexpected value"):
        cube.query().when({"returnflag": ["ok", "_aq.x"]})


def test_nil_predicate_drop(spark, sf_dir):
    """parse_tree.rb:158-160 — nil under a non-null-aware op drops the
    predicate entirely (no rows filtered)."""
    cube = SalesCube(spark, sf_dir)
    base = cube.query().measure("count", alias="cnt").df().collect()[0][0]
    dropped = (cube.query().measure("count", alias="cnt")
               .when({"quantity": {"gt": None}}).df().collect()[0][0])
    assert dropped == base


def test_nil_eq_means_is_null(spark, sf_dir):
    """eq None must become IS NULL (no NULLs in fixture → zero rows)."""
    cube = SalesCube(spark, sf_dir)
    n = (cube.query().measure("count", alias="cnt")
         .when({"returnflag": {"eq": None}}).df().collect()[0][0])
    assert n == 0


def test_any_group_keeps_null_ops(spark, sf_dir):
    """DELIBERATE reference divergence (SURVEY §2.3): inside ``any:``
    groups the reference drops EVERY nil-valued operator — including
    the null-aware ops — (parse_tree.rb:177 ``unless arg.nil?``),
    while its direct selector path keeps null-ops (parse_tree.rb:
    158-160). This engine applies the uniform ``applicable_operator``
    rule in BOTH contexts: ``{is: None}`` means IS NULL wherever it
    appears — a filter an author wrote should never silently vanish
    just because it moved inside an ``any:`` disjunction."""
    cube = SalesCube(spark, sf_dir)
    base = cube.query().measure("count", alias="cnt").df().collect()[0][0]
    # null-op survives inside any: → IS NULL → 0 rows (fixture has no
    # NULLs). Under the reference's drop-all-nils rule this would be
    # `base` (predicate silently removed).
    kept = (cube.query().measure("count", alias="cnt")
            .when({"any": [{"returnflag": {"is": None}}]})
            .df().collect()[0][0])
    assert kept == 0
    # non-null op with a nil arg still drops inside any: (same rule as
    # the direct path) — group contributes nothing, filter vanishes
    dropped = (cube.query().measure("count", alias="cnt")
               .when({"any": [{"quantity": {"gt": None}}]})
               .df().collect()[0][0])
    assert dropped == base
    # a group mixing a kept null-op with a dropped nil op keeps ONLY
    # the null-op; the second group keeps the disjunction alive
    mixed = (cube.query().measure("count", alias="cnt")
             .when({"any": [{"returnflag": {"is": None},
                             "quantity": {"gt": None}},
                            {"returnflag": "R"}]})
             .df().collect()[0][0])
    only_r = (cube.query().measure("count", alias="cnt")
              .when({"returnflag": "R"}).df().collect()[0][0])
    assert mixed == only_r  # IS NULL arm contributes zero rows


def test_any_group_strict_reference_compat_drops_null_ops(spark, sf_dir):
    """Twin of test_any_group_keeps_null_ops under the opt-in
    ``strict_reference_compat`` flag (VERDICT r07 item 6): the
    reference drops EVERY nil-valued operator inside ``any:`` groups,
    null-aware ops included (parse_tree.rb:177) — so ``{is: None}``
    inside ``any:`` silently vanishes and the group stops filtering.
    Both semantics selectable; default unchanged (previous test)."""
    cube = SalesCube(spark, sf_dir)
    base = cube.query().measure("count", alias="cnt").df().collect()[0][0]
    # {is: None} inside any: is DROPPED under strict compat → the group
    # carries no predicate → the filter vanishes → all rows
    dropped = (cube.query().measure("count", alias="cnt")
               .strict_reference_compat()
               .when({"any": [{"returnflag": {"is": None}}]})
               .df().collect()[0][0])
    assert dropped == base
    # a group mixing a (dropped) null-op with a live predicate keeps
    # only the live one; direct (non-any) path is untouched by the flag
    mixed = (cube.query().measure("count", alias="cnt")
             .strict_reference_compat()
             .when({"any": [{"returnflag": {"is": None},
                             "linestatus": "F"}]})
             .df().collect()[0][0])
    only_f = (cube.query().measure("count", alias="cnt")
              .when({"linestatus": "F"}).df().collect()[0][0])
    assert mixed == only_f
    direct = (cube.query().measure("count", alias="cnt")
              .strict_reference_compat()
              .when({"returnflag": {"is": None}})
              .df().collect()[0][0])
    assert direct == 0  # direct path keeps null-ops even under strict


def test_any_group_lowercamelize_fallback(spark, sf_dir):
    """parse_tree.rb:170 — attr names inside ``any:`` selector groups
    resolve via camelize(:lower) when the exact key is absent, so
    reference-style queries with snake_case attrs match a camelCase
    selector. Exact names still win, top-level attrs are untouched, and
    unknown names keep failing fast."""
    cube = SalesCube(spark, sf_dir)
    cube.selectors = dict(cube.selectors)  # instance-local, no class leak
    cube.selectors["returnFlag"] = cube.selectors["returnflag"]
    exact = (cube.query().measure("count", alias="cnt")
             .when({"any": [{"returnFlag": "R"}]}).df().collect()[0][0])
    camel = (cube.query().measure("count", alias="cnt")
             .when({"any": [{"return_flag": "R"}]}).df().collect()[0][0])
    assert exact > 0
    assert camel == exact
    # the reference camelizes ONLY inside any: groups — top level unchanged
    with pytest.raises(InputArgumentError):
        cube.query().measure("count", alias="cnt") \
            .when({"return_flag": "R"}).df()
    # unknown names inside any: still fail fast
    with pytest.raises(InputArgumentError):
        cube.query().measure("count", alias="cnt") \
            .when({"any": [{"wat_attr": 1}]}).df()
    # naming BOTH spellings of one selector in a group fails fast too —
    # last-write-wins would silently drop one predicate
    with pytest.raises(InputArgumentError):
        cube.query().measure("count", alias="cnt") \
            .when({"any": [{"returnFlag": "R", "return_flag": "A"}]}).df()


def test_option_order_matters(spark, sf_dir):
    """O5: [desc, limit] ≠ [limit, desc] (parse_tree.rb:46-68,99)."""
    cube = EventsCube(spark, sf_dir)

    def build(order):
        q = cube.query().slice("user_id").measure("total")
        for name, args in order:
            q = q.option(name, args)
        return [r[0] for r in q.df().collect()]

    desc_then_limit = build([("desc", ["total", "user_id"]), ("limit", 3)])
    limit_then_desc = build([("limit", 3), ("desc", ["total", "user_id"])])
    # desc-then-limit returns the global top 3; limit-then-desc sorts an
    # arbitrary 3 — the *sets* generally differ, and desc_then_limit must
    # be the true top-3.
    all_totals = build([("desc", ["total", "user_id"])])
    assert desc_then_limit == all_totals[:3]
    assert len(limit_then_desc) == 3


def test_alias_fanout_same_metric_twice(spark, sf_dir):
    """R2: the same metric under two aliases with different args."""
    cube = SalesCube(spark, sf_dir)
    df = (cube.query().slice("returnflag")
          .measure("revenue", alias="rev_all")
          .measure("revenue", alias="rev_r", where={"returnflag": "R"})
          .relabeled())
    rows = {r["returnflag"]: r for r in df.collect()}
    assert set(df.columns) == {"returnflag", "rev_all", "rev_r"}
    # conditional aggregate: for the R group they agree; others rev_r is None
    assert rows["R"]["rev_r"] == pytest.approx(rows["R"]["rev_all"])
    assert rows["N"]["rev_r"] is None


def test_no_elements_raises(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError):
        cube.query().df()


def test_join_pruning(spark, sf_dir):
    """Queries touching only lineitem must not join any other table."""
    cube = SalesCube(spark, sf_dir)
    q = cube.query().slice("returnflag").measure("revenue")
    assert q.required_tables() == frozenset()
    plan = q.df()._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    # region slice pulls the whole chain
    q2 = cube.query().slice("region").measure("count")
    assert q2.required_tables() == frozenset({"orders", "customer", "nation", "region"})


def test_broadcast_dimension_join(spark, sf_dir):
    """Dimension lookups must plan as broadcast hash joins (no fact shuffle)."""
    cube = SalesCube(spark, sf_dir)
    plan = (cube.query().slice("region").measure("revenue").df()
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan


def test_uniq_tolerance(spark, sf_dir):
    """A3: approx_count_distinct within rsd bound of exact (SURVEY §5.2.4)."""
    cube = SalesCube(spark, sf_dir)
    df = (cube.query().measure("orders").measure("orders_uniq").df().collect()[0])
    exact, approx = df[0], df[1]
    assert abs(approx - exact) / exact < 0.15


def test_transform_hook(spark, sf_dir):
    """S3: append_cube_query-style pre-execution rewrite."""
    cube = SalesCube(spark, sf_dir)
    df = (cube.query().slice("returnflag").measure("count", alias="cnt")
          .transform(lambda d: d.filter(F.col("`_aq.returnflag`") == "R"))
          .relabeled())
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["returnflag"] == "R"


def test_tuple_metric_struct_shape(spark, sf_dir):
    """A6: tuple metrics are ArrayType(StructType) with declared field order
    (reference: metric.definition.class.tuple, response_builder.rb:116-126)."""
    from pyspark.sql.types import ArrayType, StructType
    cube = SalesCube(spark, sf_dir)
    df = cube.query().slice("returnflag").measure("top_parts").relabeled()
    t = df.schema["top_parts"].dataType
    assert isinstance(t, ArrayType) and isinstance(t.elementType, StructType)
    assert [f.name for f in t.elementType.fields] == ["partkey", "price"]
    row = df.filter(F.col("returnflag") == "R").collect()[0]
    assert len(row["top_parts"]) == 3


def test_any_metric_membership(spark, sf_dir):
    """A2 `any` (ClickHouse first-value): nondeterministic by design, so
    the check is membership — the value must belong to the group — plus
    the conditional variant must respect its metric-scoped filter."""
    cube = SalesCube(spark, sf_dir)
    rows = (cube.query().slice("returnflag")
            .measure("any_flag")
            .measure("any_flag", alias="any_hi",
                     where={"discount": {"gteq": 0.05}})
            .relabeled().collect())
    assert rows
    for r in rows:
        assert r["any_flag"] == r["returnflag"]  # grouped by the same col
        assert r["any_hi"] == r["returnflag"]


def test_arg_max_conditional_excludes_rows(spark, sf_dir):
    """F8 on argMax: the metric-scoped filter nulls the ordering key, so
    filtered-out rows can never win; result equals a pre-filtered query."""
    cube = SalesCube(spark, sf_dir)
    cond = (cube.query().slice("returnflag")
            .measure("last_price", alias="p",
                     where={"discount": {"gteq": 0.05}})
            .relabeled().collect())
    pre = (cube.query().slice("returnflag")
           .measure("last_price", alias="p")
           .when({"discount": {"gteq": 0.05}})
           .relabeled().collect())
    assert {tuple(r) for r in cond} == {tuple(r) for r in pre}


def test_quantile_approx_tolerance(spark, sf_dir):
    """percentile_approx within accuracy bound of the exact percentile
    (same pattern as uniq vs count_distinct — SURVEY §5.2 item 4)."""
    cube = SalesCube(spark, sf_dir)
    row = (cube.query().measure("p90_price").measure("p90_price_approx")
           .df().collect()[0])
    exact, approx = row[0], row[1]
    assert abs(approx - exact) / exact < 0.02


def test_variant_json_path_matches_string_path(spark, sf_dir):
    """Spark-4 VARIANT semi-structured path (parse_json once →
    binary-encoded variant_get) must agree with the string-path
    get_json_object truth the json_subfield driver row hash-checks —
    the scale answer to re-parsing JSON per extraction."""
    from activecube_graphql_spark.driver_queries import (q_json_subfield,
                                                         q_variant_json)
    v = {(r["k"], r["cnt"], r["total"]) for r in
         q_variant_json(spark, sf_dir).collect()}
    s = {(r["k"], r["cnt"], r["total"]) for r in
         q_json_subfield(spark, sf_dir).collect()}
    assert v == s and v

"""ParseTree front-end + nested response shaping (SURVEY §3.2, §2.12)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import StructType

from activecube_graphql_spark import InputArgumentError
from activecube_graphql_spark.cubes import SalesCube
from activecube_graphql_spark.parse_tree import parse


def test_parse_and_execute_flagship(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    tree = parse(cube, {
        "args": {
            "shipdate": {"lteq": "1998-09-02"},
            "options": [("desc", ["revenue"]), ("limit", 3)],
        },
        "fields": {
            "returnflag": {},
            "revenue": {},
            "cnt": {"field": "count"},
        },
    })
    df = tree.build_query().relabeled()
    rows = df.collect()
    assert df.columns == ["returnflag", "revenue", "cnt"]
    assert len(rows) == 3
    assert rows[0]["revenue"] >= rows[1]["revenue"] >= rows[2]["revenue"]


def test_unknown_field_fails(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="Can not find"):
        parse(cube, {"fields": {"bogus": {}}})


def test_unknown_subfield_fails(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="sub-field"):
        parse(cube, {"fields": {"orderdate": {"fields": {"decade": {}}}}})


def test_typename_dropped(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    tree = parse(cube, {"fields": {"__typename": {}, "returnflag": {},
                                   "count": {}}})
    assert [e.name for e in tree.elements] == ["returnflag", "count"]


def test_typename_kept_under_union(spark, sf_dir):
    """parse_tree.rb:70-72 — `__typename` survives only under a union-typed
    dimension, binding to its declared per-row discriminator; under plain
    dimensions it is dropped as usual."""
    from activecube_graphql_spark.cubes import EventsCube
    cube = EventsCube(spark, sf_dir)
    tree = parse(cube, {"fields": {
        "actor": {"fields": {"__typename": {}, "id": {}}},
        "event_type": {"fields": {}},
        "count": {}}})
    actor = tree.elements[0]
    assert [c.name for c in actor.children] == ["__typename", "id"]
    assert actor.children[0].kind == "subfield"
    assert actor.children[0].key == "_aq.actor.__typename"
    rows = {r["actor_type"]: r["cnt"] for r in
            (tree.build_query().relabeled()
             .selectExpr("`actor.__typename` AS actor_type",
                         "count AS cnt").collect())}
    assert set(rows) == {"Bot", "User"} and rows["User"] > rows["Bot"] > 0


def test_typename_unresolvable_union_raises(spark, sf_dir):
    """response_builder.rb:21-24 — a union dimension with no declared
    discriminator cannot answer `__typename`: loud error, not a drop."""
    from activecube_graphql_spark.cubes import EventsCube
    from activecube_graphql_spark.model import Dimension

    class BadUnionCube(EventsCube):
        dimensions = dict(EventsCube.dimensions,
                          thing=Dimension("user_id", union=True))

    cube = BadUnionCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="Unable to detect type"):
        parse(cube, {"fields": {"thing": {"fields": {"__typename": {}}},
                                "count": {}}})


def test_metric_args_are_metric_scoped(spark, sf_dir):
    """Args on a metric node → conditional aggregate, not a global WHERE."""
    cube = SalesCube(spark, sf_dir)
    tree = parse(cube, {"fields": {
        "returnflag": {},
        "all_cnt": {"field": "count"},
        "r_cnt": {"field": "count", "args": {"returnflag": "R"}},
    }})
    rows = {r["returnflag"]: r for r in tree.build_query().relabeled().collect()}
    assert len(rows) == 3                      # global filter NOT applied
    assert rows["R"]["r_cnt"] == rows["R"]["all_cnt"]
    assert rows["N"]["r_cnt"] == 0


def test_nested_response_shaping(spark, sf_dir):
    """R1: dimension with children collects into a struct column whose
    fields are the requested (aliased) names."""
    cube = SalesCube(spark, sf_dir)
    tree = parse(cube, {"fields": {
        "orderdate": {"fields": {"year": {}, "month": {}}},
        "revenue": {},
    }})
    df = tree.nested_df()
    t = df.schema["orderdate"].dataType
    assert isinstance(t, StructType)
    assert [f.name for f in t.fields] == ["year", "month"]
    row = df.collect()[0]
    assert 1995 <= row["orderdate"]["year"] <= 2001
    assert 1 <= row["orderdate"]["month"] <= 12


def test_path_keys_match_reference_scheme(spark, sf_dir):
    """§1.4: root children keyed _aq.<name>, nested <parent>.<name>."""
    cube = SalesCube(spark, sf_dir)
    tree = parse(cube, {"fields": {
        "orderdate": {"fields": {"year": {}}}, "revenue": {}}})
    keys = {e.key for e in tree.elements}
    assert keys == {"_aq.orderdate", "_aq.revenue"}
    assert tree.elements[0].children[0].key == "_aq.orderdate.year"
    flat = tree.build_query().df()
    assert set(flat.columns) == {"_aq.orderdate.year", "_aq.revenue"}


def test_tuple_metric_children_select_members(spark, sf_dir):
    """A6/R1: children under a tuple metric select tuple members by
    declared name (response_builder.rb:113-126); the nested response
    re-projects the array-of-structs to just the requested members,
    renamed to their requested aliases."""
    cube = SalesCube(spark, sf_dir)
    tree = parse(cube, {"fields": {
        "returnflag": {},
        "top_parts": {"fields": {"pk": {"field": "partkey"}}},
    }})
    df = tree.nested_df()
    from pyspark.sql.types import ArrayType, StructType as ST
    t = df.schema["top_parts"].dataType
    assert isinstance(t, ArrayType) and isinstance(t.elementType, ST)
    assert [f.name for f in t.elementType.fields] == ["pk"]
    rows = df.collect()
    assert rows and all(len(r["top_parts"]) <= 3 for r in rows)
    assert all(isinstance(e["pk"], int)
               for r in rows for e in r["top_parts"])


def test_tuple_metric_unknown_member_fails_fast(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="has no tuple field"):
        parse(cube, {"fields": {
            "top_parts": {"fields": {"nope": {}}}, "count": {}}})


def test_scalar_metric_child_fails_fast(spark, sf_dir):
    cube = SalesCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="has no tuple field"):
        parse(cube, {"fields": {
            "revenue": {"fields": {"x": {}}}, "count": {}}})


def test_tuple_metric_children_via_graphql_text(spark, sf_dir):
    from activecube_graphql_spark.graphql import graphql_query
    cube = SalesCube(spark, sf_dir)
    tree = graphql_query(cube, """
      { sales { returnflag top_parts { partkey price } } }""")
    row = tree.nested_df().collect()[0]
    assert set(row["top_parts"][0].asDict()) == {"partkey", "price"}


# ------------------------------------------------------------- fuzz hardening

def test_random_dict_specs_fail_cleanly(spark):
    """Random nested dict specs over a noisy vocabulary must either
    build a ParseTree or raise the engine's InputArgumentError — never
    an internal KeyError/AttributeError/TypeError from classification
    or option folding. No Spark EXECUTION, but sub-field validation
    builds Column expressions, which needs the active context (the
    ``spark`` fixture) — without it a VALID spec dies in pyspark's
    context assertion when this test runs first."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from activecube_graphql_spark.cubes import SalesCube
    from activecube_graphql_spark.errors import InputArgumentError
    from activecube_graphql_spark.parse_tree import parse

    cube = SalesCube(None, "/")
    names = ["returnflag", "revenue", "count", "nonsense", "orderdate",
             "year", "top_parts", "__typename", "options", "any", ""]
    vals = [None, 1, "R", ["A", "N"], {"gteq": 5}, {"bogus_op": 1},
            [("desc", "revenue"), ("limit", 3)], {"eq": None}]

    @st.composite
    def specs(draw, depth=0):
        fields = {}
        for _ in range(draw(st.integers(1, 3))):
            name = draw(st.sampled_from(names))
            node = {}
            if depth < 2 and draw(st.booleans()):
                node["fields"] = draw(specs(depth=depth + 1))["fields"]
            if draw(st.booleans()):
                node["args"] = {draw(st.sampled_from(names)):
                                draw(st.sampled_from(vals))}
            fields[name] = node
        spec = {"fields": fields}
        if draw(st.booleans()):
            spec["args"] = {draw(st.sampled_from(names)):
                           draw(st.sampled_from(vals))}
        return spec

    from activecube_graphql_spark.errors import NotSqlExpressible

    @settings(max_examples=150, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(specs())
    def run(spec):
        try:
            tree = parse(cube, spec)
            # a spec that classifies must also COMPILE (builder) and
            # PRINT (SQL twin) without internal errors
            q = tree.build_query()
            q.cache_key()
            q.relabeled_sql()
        except (InputArgumentError, NotSqlExpressible):
            pass

    run()

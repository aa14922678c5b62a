"""GraphQL HTTP transport (server.py) — the reference's consumption
shape: POST /graphql JSON in, GraphQL-spec JSON out, multi-cube
dispatch by root field, aliases, variables, in-band errors. The WSGI
callable is exercised directly with synthetic environs (no sockets)."""

from __future__ import annotations

import io
import json

import pytest

from activecube_graphql_spark.cubes import DocsCube, SalesCube
from activecube_graphql_spark.server import execute, wsgi_app


@pytest.fixture(scope="module")
def cubes(spark, sf_dir):
    return {"sales": SalesCube(spark, sf_dir),
            "documents": DocsCube(spark, sf_dir)}


def test_execute_single_cube_matches_builder(cubes, spark, sf_dir):
    doc = """
      query { sales(returnflag: "R") { linestatus cnt: count } }"""
    out = execute(cubes, doc)
    assert "errors" not in out
    got = {(r["linestatus"], r["cnt"]) for r in out["data"]["sales"]}
    want = {(r[0], r[1]) for r in
            (SalesCube(spark, sf_dir).query()
             .slice("linestatus").measure("count", alias="cnt")
             .when({"returnflag": "R"}).relabeled().collect())}
    assert got == want and got


def test_execute_multi_cube_and_alias(cubes):
    doc = """
      query Dashboard {
        bySource: documents { source docs }
        sales(options: {limit: 3, desc: ["qty", "returnflag"]}) {
          returnflag qty: quantity
        }
      }"""
    out = execute(cubes, doc)
    assert "errors" not in out
    assert set(out["data"]) == {"bySource", "sales"}
    assert len(out["data"]["sales"]) == 3
    assert {"source", "docs"} == set(out["data"]["bySource"][0])


def test_execute_variables_and_nested_response(cubes):
    doc = """
      query Monthly($flag: String = "N") {
        sales(returnflag: $flag) {
          shipdate { year month }
          revenue
        }
      }"""
    out = execute(cubes, doc, variables={"flag": "R"})
    assert "errors" not in out
    row = out["data"]["sales"][0]
    # nested dimension arrives as a nested object (R1 response shaping)
    assert set(row["shipdate"]) == {"year", "month"}
    assert isinstance(row["revenue"], float)


def test_execute_errors_are_in_band(cubes):
    for doc, frag in [
        ("query { nosuchcube { count } }", "Unknown cube field"),
        ("query { sales(bogus_selector: 1) { count } }", "bogus_selector"),
        ("query {", ""),  # parse error
    ]:
        out = execute(cubes, doc)
        assert out["data"] is None
        assert out["errors"] and frag in out["errors"][0]["message"]


def _post(app, payload, method="POST"):
    body = payload if isinstance(payload, bytes) else json.dumps(payload).encode()
    environ = {"REQUEST_METHOD": method,
               "CONTENT_LENGTH": str(len(body)),
               "wsgi.input": io.BytesIO(body)}
    status_headers = {}

    def start_response(status, headers):
        status_headers["status"] = status
        status_headers["headers"] = dict(headers)
    chunks = app(environ, start_response)
    return status_headers["status"], json.loads(b"".join(chunks))


def test_wsgi_roundtrip_and_transport_errors(cubes):
    app = wsgi_app(cubes)
    # happy path incl. a date-typed column → ISO string in JSON
    status, out = _post(app, {
        "query": """query { sales(options: {limit: 2, asc: ["d.date"]})
                            { d: shipdate { date } count } }"""})
    assert status.startswith("200")
    assert len(out["data"]["sales"]) == 2
    assert out["data"]["sales"][0]["d"]["date"].count("-") == 2  # ISO date
    # in-band query error is still HTTP 200 (GraphQL convention)
    status, out = _post(app, {"query": "query { nope { count } }"})
    assert status.startswith("200") and out["errors"]
    # transport errors: bad JSON → 400, missing query → 400, GET → 405
    status, out = _post(app, b"{not json")
    assert status.startswith("400")
    status, out = _post(app, {"variables": {}})
    assert status.startswith("400")
    status, out = _post(app, {"query": "query { sales { count } }"},
                        method="GET")
    assert status.startswith("405")
    # type-contract 400s (review r08: previously escaped as 500s)
    for bad in [{"query": None}, {"query": 123},
                {"query": "query { sales { count } }", "variables": "x"}]:
        status, out = _post(app, bad)
        assert status.startswith("400"), bad
    # bad argument VALUE inside a lexically-valid document stays
    # in-band (limit: "x" raises ValueError in the option fold, not
    # InputArgumentError — review r08)
    status, out = _post(app, {
        "query": 'query { sales(options: {limit: "x"}) { count } }'})
    assert status.startswith("200") and out["errors"], out


# ------------------------------------------------------------ introspection

def test_introspection_loads_in_real_client(cubes):
    """Acid test for VERDICT r08 item 4: graphql-core (the reference
    implementation's Python port) sends its own full IntrospectionQuery
    — fragments, aliases, 9-level TypeRef nesting — through the WSGI
    transport, and ``build_client_schema`` must load the result as a
    valid client schema (exactly what GraphiQL / codegen clients do)."""
    import graphql

    app = wsgi_app(cubes)
    status, out = _post(
        app, {"query": graphql.get_introspection_query(descriptions=True)})
    assert status.startswith("200") and not out.get("errors"), out
    schema = graphql.build_client_schema(out["data"])
    graphql.assert_valid_schema(schema)
    assert sorted(schema.query_type.fields) == ["documents", "sales"]
    # engine-derived result typing (R4): money metric is Float, count is
    # the 64-bit Long scalar, struct metrics become object types
    sales = schema.get_type("SalesRow")
    assert str(sales.fields["revenue"].type) == "Float"
    assert str(sales.fields["count"].type) == "Long"
    assert str(sales.fields["top_parts"].type) == "[SalesRowTopParts]"
    assert str(sales.fields["orderdate"].type) == "SalesRowOrderdate"
    assert "year" in schema.get_type("SalesRowOrderdate").fields
    # metric args = selectors (F8 conditional aggregate surface)
    assert "discount" in sales.fields["revenue"].args
    # a real reference-shaped document validates against the schema
    doc = graphql.parse("""query { sales(returnflag: "R",
        options: {desc: "revenue", limit: 2})
        { nation { initial } revenue hi: revenue(discount: {gteq: 0.05}) } }""")
    assert graphql.validate(schema, doc) == []


def test_introspection_sdl_roundtrip_is_fixed_point(cubes):
    """Codegen-client contract (VERDICT r09 item 8): the loaded client
    schema must survive a full SDL round-trip — print_schema → SDL →
    build_schema → print_schema is a FIXED POINT, and the schema is
    mutation-free (a query-only analytics surface). GraphiQL and every
    SDL-based codegen pipeline do exactly this; a cube-metadata change
    that emits something unprintable or unparsable breaks them silently
    unless pinned here."""
    import graphql

    app = wsgi_app(cubes)
    _, out = _post(
        app, {"query": graphql.get_introspection_query(descriptions=True)})
    client = graphql.build_client_schema(out["data"])
    assert client.mutation_type is None
    assert client.subscription_type is None
    sdl = graphql.print_schema(client)
    rebuilt = graphql.build_schema(sdl)
    graphql.assert_valid_schema(rebuilt)
    assert graphql.print_schema(rebuilt) == sdl  # fixed point
    # the SDL really carries the surface, not a husk: spot-check that
    # fields, metric args, and nested dimension types survived the trip
    assert sorted(rebuilt.query_type.fields) == ["documents", "sales"]
    sales = rebuilt.get_type("SalesRow")
    assert "discount" in sales.fields["revenue"].args
    assert str(sales.fields["orderdate"].type) == "SalesRowOrderdate"


def test_introspection_type_and_typename(cubes):
    out = execute(cubes, """{
        t: __type(name: "SalesRow") { kind name fields { name } }
        missing: __type(name: "Nope") { name }
        tn: __typename }""")
    assert not out.get("errors"), out
    assert out["data"]["t"]["kind"] == "OBJECT"
    assert {f["name"] for f in out["data"]["t"]["fields"]} >= {
        "returnflag", "revenue", "count"}
    assert out["data"]["missing"] is None
    assert out["data"]["tn"] == "Query"
    # __type without a name arg is an in-band input error
    out = execute(cubes, "{ __type { name } }")
    assert out["errors"] and "name" in out["errors"][0]["message"]


# ------------------------------------------------------------ fuzz (r09)

def test_transport_fuzz_contract(cubes):
    """Property fuzz of the public transport (VERDICT r08 item 7): for
    ANY body the app must answer with a JSON payload and a 200/400/405/
    413 status — never raise, never leak a JVM trace — and repeated
    requests against the module-scoped (memoized) cubes stay stable."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    app = wsgi_app(cubes)

    def check(status, out):
        assert status.split(" ")[0] in {"200", "400", "405", "413"}
        for err in out.get("errors") or []:
            msg = err["message"]
            assert len(msg) < 600
            assert "org.apache" not in msg and "\tat " not in msg
            assert "Py4J" not in msg and "py4j" not in msg

    @settings(max_examples=150, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.binary(max_size=2000))
    def raw_bytes_never_crash(body):
        check(*_post(app, body))

    @settings(max_examples=150, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.text(max_size=300),
           st.one_of(st.none(), st.dictionaries(st.text(max_size=8),
                                                st.integers()),
                     st.lists(st.integers(), max_size=3), st.integers(),
                     st.text(max_size=8)))
    def any_query_and_variables(query, variables):
        payload = {"query": query}
        if variables is not None:
            payload["variables"] = variables
        status, out = _post(app, payload)
        check(status, out)
        if not isinstance(variables, (dict, type(None))):
            assert status.startswith("400")

    raw_bytes_never_crash()
    any_query_and_variables()


def test_transport_hostile_shapes(cubes):
    app = wsgi_app(cubes)
    # deep selection nesting → bounded in-band error, not RecursionError
    deep = "query " + "{ a " * 500 + "{ x }" + " }" * 500
    status, out = _post(app, {"query": deep})
    assert status.startswith("200") and out["errors"]
    assert "nested deeper" in out["errors"][0]["message"]
    # deep value nesting
    deep_val = "query { sales(quantity: " + "[" * 500 + "]" * 500 + ") { count } }"
    status, out = _post(app, {"query": deep_val})
    assert status.startswith("200") and out["errors"]
    # oversized body bounced BEFORE the read (413)
    big = {"query": "query { sales { count } } " + "#" + "x" * 11_000_000}
    status, out = _post(app, big)
    assert status.startswith("413")
    # a hostile Content-Length with a small body is also bounced
    environ = {"REQUEST_METHOD": "POST", "CONTENT_LENGTH": "99999999999",
               "wsgi.input": io.BytesIO(b"{}")}
    got = {}
    body = b"".join(app(environ, lambda s, h: got.update(status=s)))
    assert got["status"].startswith("413") and json.loads(body)["errors"]
    # a NEGATIVE Content-Length must not become read(-1) — that would
    # slurp the stream unbounded, defeating the size bound (ADVICE r09)
    environ = {"REQUEST_METHOD": "POST", "CONTENT_LENGTH": "-1",
               "wsgi.input": io.BytesIO(
                   b'{"query": "query { sales { count } }"}')}
    got = {}
    body = b"".join(app(environ, lambda s, h: got.update(status=s)))
    assert got["status"].startswith("400") and json.loads(body)["errors"]
    # repeated identical requests against memoized cubes: stable answers
    answers = {json.dumps(_post(app, {"query":
        "query { sales(returnflag: \"R\") { linestatus count } }"})[1],
        sort_keys=True) for _ in range(5)}
    assert len(answers) == 1


def test_introspection_union_dimension_skips_dunder(spark, sf_dir):
    """EventsCube.actor declares ``__typename`` as its union
    discriminator sub-field; GraphQL reserves dunder names (implicit
    __typename), so the declared schema must omit it while the engine
    keeps answering it — a schema that declared it fails
    assert_valid_schema (the bug this pins was caught by exactly that
    call)."""
    import graphql

    from activecube_graphql_spark.cubes import EventsCube

    cubes = {"events": EventsCube(spark, sf_dir)}
    out = execute(cubes,
                  graphql.get_introspection_query(descriptions=False))
    assert not out.get("errors"), out.get("errors")
    schema = graphql.build_client_schema(out["data"])
    graphql.assert_valid_schema(schema)
    actor = schema.get_type("EventsRowActor")
    assert "id" in actor.fields and "__typename" not in actor.fields

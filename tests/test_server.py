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

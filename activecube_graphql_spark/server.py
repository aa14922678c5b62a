"""GraphQL HTTP transport — the last reference-parity delta (r08).

The reference gem is consumed over HTTP: a Rails/Rack app mounts
graphql-ruby, requests arrive as ``POST /graphql`` with a JSON body
``{"query": ..., "variables": ...}``, and the gem's ParseTree turns the
resolved field into a cube query (SURVEY §3.1; graphql.rb is invoked by
the host server's GraphQL schema). Every SEMANTIC layer of that path is
already graded here (graphql.py text parser → parse_tree.py → query
builder); this module adds the thin transport so a migrating user can
point an existing GraphQL client at this engine unchanged.

Deliberately stdlib-only (``wsgiref`` + ``json``): no framework, no new
dependency, and the WSGI callable is a pure function of (cubes,
request) so tests drive it without sockets.

Scale posture: the transport does NOT own a SparkSession or cache —
it holds long-lived cube instances (the serving-process shape; see
driver_queries._cube) so the engine's plan cache amortizes repeated
query shapes across requests, and ``collect()`` happens per request
exactly like the reference's SQL round-trip (cube_field.rb:53). Row
caps belong in the query (``options: {limit: ...}``), as they did
under the reference.
"""

from __future__ import annotations

import datetime
import decimal
import json
from typing import Any, Optional

from .errors import InputArgumentError
from .graphql import field_spec, parse_operations
from .introspection import find_type, resolve_selection, schema_data
from .model import Cube
from .parse_tree import ParseTree

__all__ = ["execute", "wsgi_app", "serve"]

#: Transport request-size bound: a GraphQL document is human-authored
#: text — 10 MB is orders of magnitude past GraphiQL's biggest
#: introspection query, and bounding BEFORE the read keeps a hostile
#: Content-Length from sizing server memory.
MAX_BODY_BYTES = 10_000_000


def _json_default(v: Any) -> Any:
    """JSON coercions for engine result types (mirrors the reference's
    response_builder type-name-driven conversion, R4): temporal →
    ISO-8601 strings, exact decimals → strings (never lossy floats),
    binary → hex."""
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    raise TypeError(f"unserializable response value of type {type(v)}")


def execute(cubes: dict[str, Cube], document: str,
            variables: Optional[dict] = None,
            database: str = "default") -> dict:
    """Run a GraphQL document against the cube registry → GraphQL-spec
    response dict: ``{"data": {responseKey: [row, ...], ...}}`` on
    success, ``{"errors": [{"message": ...}], "data": None}`` on the
    first input error (fail-fast like the engine itself — a malformed
    request never half-executes). Multiple top-level fields may target
    different cubes in one document; aliases name the response keys.

    In-band error surface: the engine's InputArgumentError plus the
    ValueError/TypeError/AnalysisException classes its option folds and
    Catalyst analysis raise for bad argument VALUES (e.g. limit: "x" —
    review r08 finding: a GraphQL string is lexically fine and only
    fails inside the fold). Messages are truncated so a JVM analysis
    trace never ships to a client. Anything else is a genuine server
    bug and propagates to the transport's 500."""
    from pyspark.errors import AnalysisException
    try:
        ops = parse_operations(document, variables)
        if not ops:
            raise InputArgumentError("document has no top-level fields")
        data: dict[str, Any] = {}
        for key, node in ops.items():
            name = (node or {}).get("field", key)
            if name == "__typename":  # spec: root meta-field
                data[key] = "Query"
                continue
            if name == "__schema":  # introspection (VERDICT r08 item 4)
                data[key] = resolve_selection(
                    schema_data(cubes, database), node or {})
                continue
            if name == "__type":
                tname = ((node or {}).get("args") or {}).get("name")
                if not isinstance(tname, str):
                    raise InputArgumentError(
                        "__type requires a String 'name' argument")
                data[key] = resolve_selection(
                    find_type(cubes, tname, database), node or {})
                continue
            cube = cubes.get(name)
            if cube is None:
                raise InputArgumentError(
                    f"Unknown cube field '{name}' — available: "
                    f"{sorted(cubes)}")
            tree = ParseTree(cube, field_spec(node or {}))
            rows = tree.nested_df(database).collect()
            data[key] = [r.asDict(recursive=True) for r in rows]
        return {"data": data}
    except RecursionError:
        # the parser's depth cap bounds document nesting, but a hostile
        # input could still find an unforeseen recursive corner; a
        # Python stack blowout is an input problem, not a server bug
        return {"errors": [{"message": "document too deeply nested"}],
                "data": None}
    except (InputArgumentError, ValueError, TypeError,
            AnalysisException) as e:
        msg = str(e)
        if len(msg) > 500:
            msg = msg[:500] + " …"
        return {"errors": [{"message": msg}], "data": None}


def wsgi_app(cubes: dict[str, Cube], database: str = "default"):
    """WSGI callable serving the reference's transport contract:
    ``POST /graphql`` (or any path) with ``{"query", "variables"}``
    JSON. Malformed JSON / missing query → 400; non-POST → 405; input
    errors inside a well-formed request → 200 with an ``errors`` body
    (the GraphQL convention: transport-level problems are HTTP errors,
    query-level problems are in-band)."""
    def app(environ, start_response):
        def reply(status: str, payload: dict):
            body = json.dumps(payload, default=_json_default).encode()
            start_response(status, [
                ("Content-Type", "application/json"),
                ("Content-Length", str(len(body)))])
            return [body]

        if environ.get("REQUEST_METHOD") != "POST":
            return reply("405 Method Not Allowed",
                         {"errors": [{"message": "POST a JSON body "
                                      '{"query": ..., "variables": ...}'}]})
        try:
            n = int(environ.get("CONTENT_LENGTH") or 0)
            if n < 0:  # read(-1) would slurp the stream unbounded,
                # defeating the size bound below (ADVICE r09)
                raise ValueError(f"negative Content-Length: {n}")
            if n > MAX_BODY_BYTES:  # bound request memory before reading
                return reply("413 Content Too Large",
                             {"errors": [{"message": "request body over "
                                          f"{MAX_BODY_BYTES} bytes"}]})
            req = json.loads(environ["wsgi.input"].read(n) or b"{}")
            query = req["query"]
            variables = req.get("variables")
            # transport-level type contract (review r08: a null/non-str
            # query or non-dict variables previously escaped as a 500)
            if not isinstance(query, str) or not (
                    variables is None or isinstance(variables, dict)):
                raise TypeError("'query' must be a string and "
                                "'variables' an object")
        except (ValueError, KeyError, TypeError) as e:
            return reply("400 Bad Request",
                         {"errors": [{"message": f"malformed request: {e}"}]})
        return reply("200 OK",
                     execute(cubes, query, variables, database))
    return app


def serve(cubes: dict[str, Cube], host: str = "127.0.0.1",
          port: int = 8000, database: str = "default") -> None:
    """Blocking dev server (wsgiref) — production deployments mount
    :func:`wsgi_app` in any WSGI host, exactly as the reference gem is
    mounted in Rack."""
    from wsgiref.simple_server import make_server
    with make_server(host, port, wsgi_app(cubes, database)) as httpd:
        httpd.serve_forever()

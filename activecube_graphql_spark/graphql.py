"""GraphQL document front-end — text → ParseTree spec.

The reference's public input format is a GraphQL document (README.md:39-52
shows ``{ ethereum { transactions(date: {since: ...}, options: {desc:
"date.date", limit: 10}) { date { date } count } } }``). The dict-spec
front-end (parse_tree.py) already replicates the *semantics* of the
mapping; this module adds the *syntax*, so a user of the reference can
paste the same query text and run it against a Spark cube:

    from activecube_graphql_spark.graphql import graphql_query
    tree = graphql_query(cube, '''
      { sales(returnflag: "R", options: {desc: "revenue", limit: 5}) {
          nation { initial }
          revenue
          hi: revenue(discount: {gteq: 0.05})
      } }''')
    df = tree.nested_df()

Implemented subset (everything the reference's query surface uses):
named/anonymous operations, variables with defaults (`$since: ISO8601
= "2019-01-01"`, re-bound per request — parse_tree.rb:52-60), aliases,
nested selection sets, arguments of every GraphQL literal kind (int,
float, string, boolean, null, enum → string, list, input object —
insertion-ordered, the analogue of ``sort_node_arguments`` preserving
client-written option order, parse_tree.rb:46-68). Pure Python, no
dependencies; fragments/directives are rejected loudly rather than
silently mis-parsed.
"""

from __future__ import annotations

import re
from typing import Any, Optional

from .errors import InputArgumentError
from .model import Cube
from .parse_tree import ParseTree

# ---------------------------------------------------------------- tokenizer

_TOKEN_RE = re.compile(r"""
      (?P<ws>[\s,]+|\#[^\n\r]*)
    | (?P<name>[_A-Za-z][_0-9A-Za-z]*)
    | (?P<float>-?(?:0|[1-9][0-9]*)(?:\.[0-9]+(?:[eE][+-]?[0-9]+)?|[eE][+-]?[0-9]+))
    | (?P<int>-?(?:0|[1-9][0-9]*))
    | (?P<string>"(?:\\.|[^"\\])*")
    | (?P<punct>\.\.\.|[{}()\[\]:$=@!])
""", re.VERBOSE)

_ESCAPES = {'"': '"', "\\": "\\", "/": "/", "b": "\b", "f": "\f",
            "n": "\n", "r": "\r", "t": "\t"}


def _unquote(raw: str) -> str:
    body = raw[1:-1]
    out: list[str] = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch == "\\":
            esc = body[i + 1]
            if esc == "u":
                out.append(chr(int(body[i + 2:i + 6], 16)))
                i += 6
                continue
            out.append(_ESCAPES.get(esc, esc))
            i += 2
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, Any]]:
    tokens: list[tuple[str, Any]] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if m is None:
            raise InputArgumentError(
                f"GraphQL syntax error at offset {pos}: {text[pos:pos+20]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        val: Any = m.group()
        if kind == "int":
            val = int(val)
        elif kind == "float":
            val = float(val)
        elif kind == "string":
            val = _unquote(val)
        tokens.append((kind, val))
    tokens.append(("eof", None))
    return tokens


# ------------------------------------------------------------------- parser

class _Parser:
    def __init__(self, tokens: list[tuple[str, Any]],
                 variables: Optional[dict]) -> None:
        self.toks = tokens
        self.i = 0
        self.supplied = dict(variables or {})
        self.defaults: dict[str, Any] = {}
        self.declared: set[str] = set()

    # -- token helpers
    def peek(self) -> tuple[str, Any]:
        return self.toks[self.i]

    def next(self) -> tuple[str, Any]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_punct(self, p: str) -> None:
        kind, val = self.next()
        if kind != "punct" or val != p:
            raise InputArgumentError(f"GraphQL: expected {p!r}, got {val!r}")

    def expect_name(self) -> str:
        kind, val = self.next()
        if kind != "name":
            raise InputArgumentError(f"GraphQL: expected a name, got {val!r}")
        return val

    def at_punct(self, p: str) -> bool:
        kind, val = self.peek()
        return kind == "punct" and val == p

    # -- grammar
    def document(self) -> dict:
        kind, val = self.peek()
        if kind == "name":
            if val in ("mutation", "subscription"):
                raise InputArgumentError(
                    f"GraphQL: only query operations are supported, got {val}")
            if val != "query":
                raise InputArgumentError(
                    f"GraphQL: unexpected token {val!r} before selection set")
            self.next()
            if self.peek()[0] == "name":  # operation name
                self.next()
            if self.at_punct("("):
                self._variable_definitions()
        sels = self.selection_set()
        if self.peek()[0] != "eof":
            raise InputArgumentError(
                "GraphQL: trailing content after the selection set "
                "(fragments are not supported)")
        return sels

    def _variable_definitions(self) -> None:
        self.expect_punct("(")
        while not self.at_punct(")"):
            self.expect_punct("$")
            name = self.expect_name()
            self.declared.add(name)
            self.expect_punct(":")
            self.expect_name()  # type name (unchecked, like the reference)
            if self.at_punct("!"):
                self.next()
            while self.at_punct("[") or self.at_punct("]"):
                self.next()  # list types — shape unchecked
            if self.at_punct("="):
                self.next()
                self.defaults[name] = self.value()
        self.expect_punct(")")

    def selection_set(self) -> dict:
        self.expect_punct("{")
        fields: dict[str, dict] = {}
        while not self.at_punct("}"):
            if self.at_punct("..."):
                raise InputArgumentError(
                    "GraphQL: fragments are not supported")
            if self.at_punct("@"):
                raise InputArgumentError(
                    "GraphQL: directives are not supported")
            name = self.expect_name()
            node: dict[str, Any] = {}
            if self.at_punct(":"):  # alias
                self.next()
                node["field"] = self.expect_name()
            if self.at_punct("("):
                node["args"] = self._arguments()
            if self.at_punct("@"):
                raise InputArgumentError(
                    "GraphQL: directives are not supported")
            if self.at_punct("{"):
                node["fields"] = self.selection_set()
            # children de-dup by output name (parse_tree.rb:38): first wins
            fields.setdefault(name, node)
        self.expect_punct("}")
        return fields

    def _arguments(self) -> dict:
        self.expect_punct("(")
        args: dict[str, Any] = {}
        while not self.at_punct(")"):
            name = self.expect_name()
            self.expect_punct(":")
            args[name] = self.value()
        self.expect_punct(")")
        return args

    def value(self) -> Any:
        kind, val = self.next()
        if kind in ("int", "float", "string"):
            return val
        if kind == "name":
            if val == "true":
                return True
            if val == "false":
                return False
            if val == "null":
                return None
            return val  # enum → its name as string (README: calculate: average)
        if kind == "punct" and val == "$":
            var = self.expect_name()
            if var in self.supplied:
                return self.supplied[var]
            if var in self.defaults:
                return self.defaults[var]
            raise InputArgumentError(f"GraphQL: variable ${var} has no value")
        if kind == "punct" and val == "[":
            items = []
            while not self.at_punct("]"):
                items.append(self.value())
            self.next()
            return items
        if kind == "punct" and val == "{":
            obj: dict[str, Any] = {}
            while not self.at_punct("}"):
                k = self.expect_name()
                self.expect_punct(":")
                obj[k] = self.value()  # insertion order == client order
            self.next()
            return obj
        raise InputArgumentError(f"GraphQL: unexpected value token {val!r}")


# ------------------------------------------------------------------ facade

def parse_graphql(text: str, variables: Optional[dict] = None) -> dict:
    """GraphQL document text → ParseTree dict spec.

    If the document's top level is a single field *with* a selection set
    (the reference shape — the cube-bound field, README.md:39-52), that
    field's arguments become the root args and its selections the fields;
    otherwise the whole top-level set is taken as the field dict."""
    fields = _Parser(_tokenize(text), variables).document()
    if len(fields) == 1:
        (name, node), = fields.items()
        if node.get("fields"):
            spec: dict[str, Any] = {"fields": node["fields"]}
            args = dict(node.get("args") or {})
            if "options" in args and isinstance(args["options"], dict):
                args["options"] = list(args["options"].items())
            if args:
                spec["args"] = args
            return spec
    return {"fields": fields}


def graphql_query(cube: Cube, text: str,
                  variables: Optional[dict] = None) -> ParseTree:
    """Parse a GraphQL document against ``cube`` → validated ParseTree
    (classification, path keys, fail-fast unknown names — parse_tree.py)."""
    return ParseTree(cube, parse_graphql(text, variables))

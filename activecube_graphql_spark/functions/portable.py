"""Portable scalar-expression fragments: one SQL source of truth rendered
for either Spark SQL or DuckDB.

Used by the text-analysis operators so the engine query and its DuckDB
oracle are *the same expression* — semantic drift between the two is then
impossible by construction. Only a small macro vocabulary is supported;
everything else must be shared ANSI SQL.

Macros:
    ARRAY_LEN(x)        → size(x)               | len(x)
    LIST_FILTER(x, l)   → filter(x, l)          | list_filter(x, l)
    LIST_VAL(a, b, ...) → array(a, b, ...)      | list_value(a, b, ...)
    LIST_HAS(arr, x)    → array_contains(arr,x) | list_contains(arr,x)
    REGEX_STRIP(x, p)   → regexp_replace(x,p,'')| regexp_replace(x,p,'','g')
"""

from __future__ import annotations

import re

_MACROS = {
    "spark": {
        "ARRAY_LEN": "size",
        "LIST_FILTER": "filter",
        "LIST_VAL": "array",
        "LIST_HAS": "array_contains",
    },
    "duckdb": {
        "ARRAY_LEN": "len",
        "LIST_FILTER": "list_filter",
        "LIST_VAL": "list_value",
        "LIST_HAS": "list_contains",
    },
}

_STRIP_RE = re.compile(r"REGEX_STRIP\(")


def render(sql: str, engine: str) -> str:
    """Render a portable fragment for ``engine`` ('spark' | 'duckdb')."""
    if engine not in _MACROS:
        raise ValueError(f"unknown engine {engine!r}")
    out = sql
    for macro, fn in _MACROS[engine].items():
        out = out.replace(macro + "(", fn + "(")
    # REGEX_STRIP needs arg rewriting, not just a rename
    while "REGEX_STRIP(" in out:
        start = out.index("REGEX_STRIP(")
        open_i = start + len("REGEX_STRIP(")
        depth, i = 1, open_i
        while depth:
            if out[i] == "(":
                depth += 1
            elif out[i] == ")":
                depth -= 1
            i += 1
        inner = out[open_i:i - 1]
        if engine == "spark":
            repl = f"regexp_replace({inner}, '')"
        else:
            repl = f"regexp_replace({inner}, '', 'g')"
        out = out[:start] + repl + out[i:]
    return out

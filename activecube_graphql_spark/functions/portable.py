"""Portable scalar-expression fragments: one SQL source of truth rendered
for either Spark SQL or DuckDB.

Used by the text-analysis operators so the engine query and its DuckDB
oracle are *the same expression* — semantic drift between the two is then
impossible by construction. Only a small macro vocabulary is supported;
everything else must be shared ANSI SQL.

Macros:
    ARRAY_LEN(x)         → size(x)                | len(x)
    LIST_FILTER(x, l)    → filter(x, l)           | list_filter(x, l)
    LIST_TRANSFORM(x, l) → transform(x, l)        | list_transform(x, l)
    LIST_DISTINCT(x)     → array_distinct(x)      | list_distinct(x)
    LIST_VAL(a, b, ...)  → array(a, b, ...)       | list_value(a, b, ...)
    LIST_HAS(arr, x)     → array_contains(arr,x)  | list_contains(arr,x)
    LIST_AT(arr, i)      → element_at(arr, i)     | list_extract(arr, i)
                           (1-based on both engines)
    REGEX_STRIP(x, p)    → regexp_replace(x,p,'') | regexp_replace(x,p,'','g')
    LIST_SUM(x)          → aggregate(x, 0L, +)    | cast(coalesce(
                                                      list_sum(x),0) as bigint)
    INT_SEQ(a, b)        → sequence(a, b)         | range(a, (b) + 1)
                           (both inclusive of b; a must be ≤ b)
    INT_SEQ_STEP(a, b, s)→ sequence(a, b, s)      | range(a, (b) + 1, s)
                           (inclusive of b when hit; a ≤ b, s > 0)
    LIST_SLICE(x, i, n)  → slice(x, i, n)         | list_slice(x, i,
                                                      (i) + (n) - 1)
                           (1-based start, length n, clamps at the end)
    LIST_JOIN(x, sep)    → array_join(x, sep)     | array_to_string(x, sep)
    LIST_MAX(x)          → array_max(x)           | list_max(x)
    LIST_SORT(x)         → sort_array(x)          | list_sort(x)
    SPLIT_LIT(x, sep)    → split(x, sep)          | string_split(x, sep)
                           (sep must be a literal with no regex
                           metacharacters — Spark's split is regex)
    TO_STR(x)            → cast(x as string)      | cast(x as varchar)
    MD5_BUCKET(x, m)     → cast(conv(substring(   | CAST('0x' ||
                             md5(x),1,8),16,10)       substr(md5(x),1,8)
                             as bigint) % m           AS BIGINT) % m
                           (same bytes as sampling.hash_bucket)
    LIST_FSUM(x)         → aggregate(x, 0.0d, +)  | coalesce(cast(
                                                      list_sum(x) as double
                                                      ), cast(0.0 as double))
                           (double fold, empty → 0.0; all literals
                           double-pinned — test_fragment_literals.py)
"""

from __future__ import annotations

from collections.abc import Callable

_MACROS = {
    "spark": {
        "ARRAY_LEN": "size",
        "LIST_FILTER": "filter",
        "LIST_TRANSFORM": "transform",
        "LIST_DISTINCT": "array_distinct",
        "LIST_VAL": "array",
        "LIST_HAS": "array_contains",
        "LIST_AT": "element_at",
        "LIST_MAX": "array_max",
        "LIST_SORT": "sort_array",
        "SPLIT_LIT": "split",
    },
    "duckdb": {
        "ARRAY_LEN": "len",
        "LIST_FILTER": "list_filter",
        "LIST_TRANSFORM": "list_transform",
        "LIST_DISTINCT": "list_distinct",
        "LIST_VAL": "list_value",
        "LIST_HAS": "list_contains",
        "LIST_AT": "list_extract",
        "LIST_MAX": "list_max",
        "LIST_SORT": "list_sort",
        "SPLIT_LIT": "string_split",
    },
}


def _split_args(inner: str) -> list[str]:
    """Split a macro argument list on top-level commas — paren/bracket
    balanced AND quote-aware (a comma inside a '...' literal, e.g. a
    regex quantifier {6,}, is not a separator)."""
    args, depth, start, in_quote = [], 0, 0, False
    for i, ch in enumerate(inner):
        if ch == "'":
            in_quote = not in_quote
        elif in_quote:
            continue
        elif ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        elif ch == "," and depth == 0:
            args.append(inner[start:i].strip())
            start = i + 1
    args.append(inner[start:].strip())
    return args


def _rewrite(out: str, name: str, fn: Callable[[list[str]], str]) -> str:
    """Replace every ``name(args...)`` call (balanced-paren aware, inner
    calls first so nested macros of the same name rewrite cleanly)."""
    token = name + "("
    while token in out:
        start = out.rindex(token)  # innermost-last occurrence first
        open_i = start + len(token)
        depth, i, in_quote = 1, open_i, False
        while depth:
            ch = out[i]
            if ch == "'":
                in_quote = not in_quote
            elif not in_quote:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
            i += 1
        args = _split_args(out[open_i:i - 1])
        out = out[:start] + fn(args) + out[i:]
    return out


_SUM_COUNTER = [0]


def render(sql: str, engine: str) -> str:
    """Render a portable fragment for ``engine`` ('spark' | 'duckdb')."""
    if engine not in _MACROS:
        raise ValueError(f"unknown engine {engine!r}")
    out = sql

    # arg-rewriting macros first (their names would survive plain renames)
    if engine == "spark":
        def _sum(args: list[str]) -> str:
            # unique lambda vars per occurrence — Spark rejects shadowed
            # lambda variable names in nested higher-order functions
            _SUM_COUNTER[0] += 1
            k = _SUM_COUNTER[0]
            return (f"aggregate({args[0]}, cast(0 as bigint), "
                    f"(acc_{k}, v_{k}) -> acc_{k} + v_{k})")

        def _fsum(args: list[str]) -> str:
            _SUM_COUNTER[0] += 1
            k = _SUM_COUNTER[0]
            return (f"aggregate({args[0]}, cast(0.0 as double), "
                    f"(facc_{k}, fv_{k}) -> facc_{k} + fv_{k})")

        out = _rewrite(out, "LIST_FSUM", _fsum)
        out = _rewrite(out, "LIST_SUM", _sum)
        out = _rewrite(out, "MD5_BUCKET",
                       lambda a: f"(cast(conv(substring(md5({a[0]}), 1, 8)"
                                 f", 16, 10) as bigint) % {a[1]})")
        out = _rewrite(out, "INT_SEQ_STEP",
                       lambda a: f"sequence({a[0]}, {a[1]}, {a[2]})")
        out = _rewrite(out, "INT_SEQ",
                       lambda a: f"sequence({a[0]}, {a[1]})")
        out = _rewrite(out, "LIST_SLICE",
                       lambda a: f"slice({a[0]}, {a[1]}, {a[2]})")
        out = _rewrite(out, "LIST_JOIN",
                       lambda a: f"array_join({a[0]}, {a[1]})")
        out = _rewrite(out, "REGEX_STRIP",
                       lambda a: f"regexp_replace({a[0]}, {a[1]}, '')")
        out = _rewrite(out, "REGEX_SUB",
                       lambda a: f"regexp_replace({a[0]}, {a[1]}, {a[2]})")
        out = _rewrite(out, "TO_STR",
                       lambda a: f"cast({a[0]} as string)")
    else:
        out = _rewrite(out, "LIST_FSUM",
                       lambda a: f"coalesce(cast(list_sum({a[0]}) "
                                 f"as double), cast(0.0 as double))")
        out = _rewrite(out, "MD5_BUCKET",
                       lambda a: f"(CAST('0x' || substr(md5({a[0]}), 1, 8)"
                                 f" AS BIGINT) % {a[1]})")
        out = _rewrite(out, "LIST_SUM",
                       lambda a: f"cast(coalesce(list_sum({a[0]}), 0) "
                                 f"as bigint)")
        out = _rewrite(out, "INT_SEQ_STEP",
                       lambda a: f"range({a[0]}, ({a[1]}) + 1, {a[2]})")
        out = _rewrite(out, "INT_SEQ",
                       lambda a: f"range({a[0]}, ({a[1]}) + 1)")
        out = _rewrite(out, "LIST_SLICE",
                       lambda a: f"list_slice({a[0]}, {a[1]}, "
                                 f"({a[1]}) + ({a[2]}) - 1)")
        out = _rewrite(out, "LIST_JOIN",
                       lambda a: f"array_to_string({a[0]}, {a[1]})")
        out = _rewrite(out, "REGEX_STRIP",
                       lambda a: f"regexp_replace({a[0]}, {a[1]}, '', 'g')")
        out = _rewrite(out, "REGEX_SUB",
                       lambda a: f"regexp_replace({a[0]}, {a[1]}, "
                                 f"{a[2]}, 'g')")
        out = _rewrite(out, "TO_STR",
                       lambda a: f"cast({a[0]} as varchar)")

    for macro, fn in _MACROS[engine].items():
        out = out.replace(macro + "(", fn + "(")
    return out

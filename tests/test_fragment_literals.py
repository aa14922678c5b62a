"""Gate: no portable SQL fragment may contain a bare float literal
(VERDICT r06 item 1 — make it a gate, not a convention).

Bare decimal literals are not portable arithmetic: DuckDB evaluates
them in exact DECIMAL while Spark mixes DecimalType and double terms,
so the two engines' raw values can differ by 1 ULP and a value landing
ON a 4dp ROUND midpoint then rounds differently per engine (the
measured r06 QUALITY class: sf0.01 doc_id 182, true quality exactly
0.63065, Spark 0.6306 vs DuckDB 0.6307). With every float literal
written ``CAST(x.y AS DOUBLE)`` both engines run the identical
left-associated IEEE sequence and the bits agree everywhere.

Scope: every module-level string constant in the operator modules and
``functions.portable`` (the fragment convention — constants rendered
via ``render()`` for both engines), plus the rendered output of every
``render()`` macro for both engines. Fragment-producing *functions*
that emit Spark-only SQL (e.g. the similarity dot-product helper) pin
doubles with Spark's ``0.0d`` suffix and never reach the DuckDB
renderer, so they are outside this gate's portability concern.
"""

from __future__ import annotations

import re

from activecube_graphql_spark.functions import portable
from activecube_graphql_spark.operators import (dedup, joins, multimodal,
                                                profile, robust, sampling,
                                                similarity, text, timeseries)

MODULES = (text, similarity, dedup, robust, sampling, timeseries, profile,
           joins, multimodal, portable)

#: a float literal wrapped in an explicit double cast — the only
#: accepted way to write one inside a portable fragment (any lexical
#: shape: 0.5, .5, 1e-4, 2.5e3)
_PINNED = re.compile(
    r"(?i)CAST\(\s*(?:\d+(?:\.\d+)?|\.\d+)(?:[eE][+-]?\d+)?"
    r"\s+AS\s+DOUBLE\s*\)")
#: every lexical shape of a non-integer numeric literal (ADVICE r07
#: item 3 — the original \d+\.\d+ missed exponent form (1e-4),
#: leading-dot (.5), and d-suffixed (0.0d) literals, all of which are
#: decimal- or double-typed differently across engines). Exponent
#: alternative first so 2.5e3 is not split; BOTH digit-led
#: alternatives carry the left boundary so '1e2' inside an identifier
#: like b1e2_mask or '.5' inside 1.5 / a qualified name never match.
_FLOAT = re.compile(
    r"(?<![\w.])\d+(?:\.\d+)?[eE][+-]?\d+"
    r"|(?<![\w.])\d+\.\d+[dD]?"
    r"|(?<![\w.])\.\d+")


def bare_floats(fragment: str) -> list[str]:
    return _FLOAT.findall(_PINNED.sub("", fragment))


def _module_fragments():
    for mod in MODULES:
        for name, value in vars(mod).items():
            if name.startswith("__") or not isinstance(value, str):
                continue
            yield f"{mod.__name__}.{name}", value


def test_no_bare_float_literal_in_fragment_constants():
    offenders = {where: hits for where, value in _module_fragments()
                 for hits in [bare_floats(value)] if hits}
    assert not offenders, (
        f"bare float literals in portable fragments: {offenders} — write "
        "them as CAST(x.y AS DOUBLE) so Spark and DuckDB run the same "
        "IEEE double arithmetic (the r06 QUALITY 4dp-midpoint ULP class)"
    )


def test_no_bare_float_literal_in_macro_renders():
    """Every render() macro, expanded for both engines, must also be
    double-pinned — a bare literal in a render template would leak into
    every oracle that uses the macro."""
    probe = ("LIST_FSUM(x) LIST_SUM(x) MD5_BUCKET(x, 7) INT_SEQ(1, 3) "
             "INT_SEQ_STEP(1, 9, 2) LIST_SLICE(x, 1, 4) LIST_JOIN(x, ' ') "
             "REGEX_STRIP(x, 'p') REGEX_SUB(x, 'p', 'r') ARRAY_LEN(x) "
             "LIST_FILTER(x, l) LIST_TRANSFORM(x, l) LIST_DISTINCT(x) "
             "LIST_VAL(1, 2) LIST_HAS(x, 1) LIST_AT(x, 1) LIST_MAX(x)")
    for engine in ("spark", "duckdb"):
        rendered = portable.render(probe, engine)
        # Spark's FSUM fold seed is `cast(0.0 as double)`; DuckDB's
        # coalesce default is `cast(0.0 as double)` — both pinned.
        hits = bare_floats(rendered)
        assert not hits, f"{engine} macro render leaks bare floats: {hits}"

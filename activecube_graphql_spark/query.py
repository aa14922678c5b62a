"""CubeQueryBuilder — the cube query IR and its Spark compiler.

Reference semantics replicated (SURVEY §2, §3):

* the query is accumulated by folding requests in client order —
  ``measure`` / ``slice`` / ``when`` / options (parse_tree.rb:84-107);
* every requested leaf gets a **path key** ``_aq.<name>`` that is both the
  output column alias and the key sort/limit options bind to
  (parse_tree.rb:8,21,138-147; §1.4 — load-bearing, replicated exactly);
* argument values containing ``_aq.`` are rejected (parse_tree.rb:113-114);
* options apply **in the order written** (parse_tree.rb:46-68,99), so
  ``[desc, limit]`` ≠ ``[limit, desc]``;
* a nil argument under a non-null-aware operator silently drops the
  predicate (parse_tree.rb:153,158-160).

Compilation is declarative end-to-end: ``filter → groupBy → agg →
(ordered option fold)`` on DataFrames, so Catalyst performs predicate
pushdown, column pruning, partial aggregation, and AQE re-planning without
any engine-side scheduling. The only non-single-call operator is
``limit_by`` (ClickHouse ``LIMIT n BY k``) which compiles to the standard
window + ``row_number`` pattern that Spark ≥3.5 rewrites to
``WindowGroupLimitExec`` (rank pushdown) automatically.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .errors import InputArgumentError
from .functions.selector_ops import applicable_operator
from .model import Cube

PATH_PREFIX = "_aq."  # parse_tree.rb:8 ROOT_CONTEXT_NAME = '_aq'


def kcol(key: str) -> Column:
    """Column reference for a path-keyed output column (dots need backticks)."""
    return F.col(f"`{key}`")


def _check_injection(value: Any) -> Any:
    """parse_tree.rb:113-114 — reject argument values smuggling path keys."""
    if isinstance(value, str) and PATH_PREFIX in value:
        raise InputArgumentError(f"Unexpected value {value!r} for an argument")
    if isinstance(value, (list, tuple)):
        for v in value:
            _check_injection(v)
    if isinstance(value, dict):
        for v in value.values():
            _check_injection(v)
    return value


@dataclass
class _Slice:
    key: str
    column: Column
    requires: frozenset[str]


@dataclass
class _Measure:
    key: str
    column: Column
    requires: frozenset[str]


class CubeQueryBuilder:
    """Accumulates slices / measures / filters / ordered options, then
    compiles to one DataFrame. Mirrors the fold in parse_tree.rb:84-107."""

    def __init__(self, cube: Cube, database: str = "default") -> None:
        self.cube = cube
        self.database = database
        self._slices: list[_Slice] = []
        self._measures: list[_Measure] = []
        self._filters: list[tuple[Column, frozenset[str]]] = []
        self._options: list[tuple[str, Any]] = []
        self._transforms: list[Callable[[DataFrame], DataFrame]] = []
        self._grouping_mode: str = "groupby"

    # ------------------------------------------------------------------ API
    def slice(self, *names: str, alias: Optional[str] = None) -> "CubeQueryBuilder":
        """Project + group by dimensions (parse_tree.rb:91). A dotted name
        selects a hierarchical sub-field: ``"orderdate.year"``
        (parse_tree.rb:26-31). ``alias`` supports GraphQL alias fan-out —
        the same dimension requested twice under different names."""
        for name in names:
            dim_name, _, sub = name.partition(".")
            dim = self.cube.dimension(dim_name)
            col = dim.column(sub or None)
            key = PATH_PREFIX + (alias or name)
            self._slices.append(_Slice(key, col.alias(key), dim.requires))
        return self

    def measure(self, *names: str, alias: Optional[str] = None,
                where: Optional[dict] = None) -> "CubeQueryBuilder":
        """Aggregate measures (parse_tree.rb:88). ``where`` applies selector
        args to this metric only → conditional aggregate (F8/A4,
        parse_tree.rb:88 apply_args)."""
        for name in names:
            metric = self.cube.metric(name)
            cond = None
            req = metric.requires
            if where:
                cond, wreq = self._predicate(where)
                req = req | wreq
            key = PATH_PREFIX + (alias or name)
            self._measures.append(_Measure(key, metric.agg(cond).alias(key), req))
        return self

    def when(self, args: dict) -> "CubeQueryBuilder":
        """Cube-level filter from selector arguments (parse_tree.rb:111-135).
        Supports the full argument grammar F1-F6 (see ``_predicate``)."""
        pred, req = self._predicate(args)
        if pred is not None:
            self._filters.append((pred, req))
        return self

    def option(self, name: str, args: Any = None) -> "CubeQueryBuilder":
        """Append a query option in client order (parse_tree.rb:99,127-130).
        Known: asc, desc, asc_by_integer, desc_by_integer, limit, offset,
        limit_by. Unknown names fail fast."""
        if name not in _OPTION_APPLIERS:
            raise InputArgumentError(f"Option '{name}' is not supported")
        self._options.append((name, _check_injection(args)))
        return self

    # convenience sugar
    @staticmethod
    def _flatten(fields) -> list[str]:
        out: list[str] = []
        for f_ in fields:
            out.extend(f_ if isinstance(f_, (list, tuple)) else [f_])
        return out

    def desc(self, *fields):
        return self.option("desc", self._flatten(fields))

    def asc(self, *fields):
        return self.option("asc", self._flatten(fields))

    def limit(self, n: int):
        return self.option("limit", n)

    def offset(self, n: int):
        return self.option("offset", n)

    def limit_by(self, each, limit: int, offset: int = 0):
        return self.option("limit_by", {"each": each, "limit": limit, "offset": offset})

    def grouping(self, mode: str) -> "CubeQueryBuilder":
        """Grouping-sets family (SURVEY §2.4 A7 — beyond-reference parity
        gap, near-free in Spark): ``groupby`` (default) | ``rollup`` |
        ``cube`` → ``df.rollup(...)`` / ``df.cube(...)``."""
        if mode not in ("groupby", "rollup", "cube"):
            raise InputArgumentError(f"Unknown grouping mode '{mode}'")
        self._grouping_mode = mode
        return self

    def transform(self, fn: Callable[[DataFrame], DataFrame]) -> "CubeQueryBuilder":
        """Pre-execution query rewrite hook (S3 — ``append_cube_query``,
        cube_field.rb:50), applied to the compiled DataFrame."""
        self._transforms.append(fn)
        return self

    # ---------------------------------------------------------- predicates
    def _predicate(self, args: dict) -> tuple[Optional[Column], frozenset[str]]:
        """Argument grammar → one boolean Column (AND of attrs), or None if
        every predicate was nil-dropped.

        * scalar value            → eq shorthand          (F1, parse_tree.rb:124-125)
        * {op: val, ...} hash     → AND of operator pairs (F2, :121-122,149-156)
        * [scalars]               → IN list               (F3, :185-195)
        * [{...}, {...}]          → AND of hashes         (F4, :187-190)
        * any: [grp, grp, ...]    → OR of AND-groups      (F6, :117-118,162-183)
        """
        _check_injection(args)
        preds: list[Column] = []
        req: frozenset[str] = frozenset()
        for attr, value in args.items():
            if attr == "any":
                groups: list[Column] = []
                for grp in value:
                    gpred, greq = self._predicate(grp)
                    req = req | greq
                    if gpred is not None:
                        groups.append(gpred)
                if groups:
                    ored = groups[0]
                    for g in groups[1:]:
                        ored = ored | g
                    preds.append(ored)
                continue
            sel = self.cube.selector(attr)
            req = req | sel.requires
            for p in self._attr_predicates(sel, value):
                preds.append(p)
        if not preds:
            return None, req
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out, req

    def _attr_predicates(self, sel, value) -> list[Column]:
        if isinstance(value, dict):  # F2 operator hash
            return [sel.predicate(op, v) for op, v in value.items()
                    if applicable_operator(op, v)]
        if isinstance(value, (list, tuple)):
            if value and all(isinstance(v, dict) for v in value):  # F4
                out = []
                for h in value:
                    out.extend(self._attr_predicates(sel, h))
                return out
            return [sel.predicate("in", list(value))]  # F3
        # F1 bare scalar (or None) → eq
        if applicable_operator("eq", value):
            return [sel.predicate("eq", value)]
        return []

    # ------------------------------------------------------------- compile
    def required_tables(self) -> frozenset[str]:
        req: set[str] = set()
        for s in self._slices:
            req |= s.requires
        for m in self._measures:
            req |= m.requires
        for p, r in self._filters:
            req |= r
        return frozenset(req)

    def df(self) -> DataFrame:
        """Compile to a DataFrame: filter → groupBy(slices) → agg(measures)
        → ordered option fold → transform hooks. No-slice queries produce a
        single global row (P4); no-measure queries a DISTINCT projection."""
        base = self.cube.table(self.database, required=self.required_tables())
        for pred, _ in self._filters:
            base = base.filter(pred)

        if self._measures:
            if self._slices:
                grouper = {"groupby": base.groupBy, "rollup": base.rollup,
                           "cube": base.cube}[self._grouping_mode]
                out = grouper(*[s.column for s in self._slices]) \
                    .agg(*[m.column for m in self._measures])
            else:
                out = base.agg(*[m.column for m in self._measures])
        elif self._slices:
            out = base.select(*[s.column for s in self._slices]).distinct()
        else:
            raise InputArgumentError("Query requests no dimensions or metrics")

        state = _FoldState(order=[])
        for name, args in self._options:
            out = _OPTION_APPLIERS[name](out, args, state)
        for fn in self._transforms:
            out = fn(out)
        return out

    def relabeled(self) -> DataFrame:
        """``df()`` with the internal ``_aq.`` prefix stripped from output
        column names — the response-facing projection."""
        d = self.df()
        return d.toDF(*[c[len(PATH_PREFIX):] if c.startswith(PATH_PREFIX) else c
                        for c in d.columns])


# ---------------------------------------------------------------- options

@dataclass
class _FoldState:
    """Carries the current ORDER BY across the option fold so ``limit_by``
    ranks within groups by the client's preceding sort (O4/O5)."""
    order: list[Column] = field(default_factory=list)


def _keyify(name: str) -> str:
    """Option field names get the path prefix re-applied so they bind to
    output aliases, not input columns (parse_tree.rb:138-147, §1.4)."""
    return name if name.startswith(PATH_PREFIX) else PATH_PREFIX + name


def _sort(df: DataFrame, fields: Any, state: _FoldState,
          ascending: bool, as_integer: bool) -> DataFrame:
    if isinstance(fields, str):
        fields = [fields]
    cols = []
    for f_name in fields:
        c = kcol(_keyify(f_name))
        if as_integer:  # O2: integer interpretation of a string column
            c = c.cast("long")
        cols.append(c.asc() if ascending else c.desc())
    state.order = cols
    return df.orderBy(*cols)


def _apply_limit(df: DataFrame, n: int, state: _FoldState) -> DataFrame:
    return df.limit(int(n))


def _apply_offset(df: DataFrame, n: int, state: _FoldState) -> DataFrame:
    return df.offset(int(n))


def _apply_limit_by(df: DataFrame, args: dict, state: _FoldState) -> DataFrame:
    """ClickHouse ``LIMIT n [OFFSET m] BY key`` (parse_tree.rb:142-143):
    keep rows ``m < rank <= m+n`` per distinct ``each`` group, ranked by the
    preceding sort options. Remaining output columns are appended to the
    ranking order as a deterministic tie-break. Spark ≥3.5 plans this as
    ``WindowGroupLimitExec`` (rank limit pushed below the shuffle), so only
    ~n rows per group per partition survive the map side — the pattern holds
    at 100 TB."""
    each = args["each"]
    if isinstance(each, str):
        each = [each]
    limit = int(args["limit"])
    offset = int(args.get("offset", 0) or 0)
    part_cols = [kcol(_keyify(e)) for e in each]
    order = list(state.order)
    # deterministic tie-break: any output column not already ordering
    for c in df.columns:
        order.append(kcol(c))
    w = Window.partitionBy(*part_cols).orderBy(*order)
    rn = "__aq_rn"
    out = (df.withColumn(rn, F.row_number().over(w))
             .filter((F.col(rn) > offset) & (F.col(rn) <= offset + limit))
             .drop(rn))
    return out


_OPTION_APPLIERS: dict[str, Callable[[DataFrame, Any, _FoldState], DataFrame]] = {
    "asc": lambda df, a, s: _sort(df, a, s, True, False),
    "desc": lambda df, a, s: _sort(df, a, s, False, False),
    "asc_by_integer": lambda df, a, s: _sort(df, a, s, True, True),
    "desc_by_integer": lambda df, a, s: _sort(df, a, s, False, True),
    "limit": _apply_limit,
    "offset": _apply_offset,
    "limit_by": _apply_limit_by,
}

"""Typed errors mirroring the reference's fail-fast validation.

Reference: ``InputArgumentError`` raised for unknown metric/dimension names
(/root/reference/lib/activecube/graphql/parse_tree.rb:30,33), unknown options
(:130), and the ``_aq.`` injection guard (:113-114).
"""


class InputArgumentError(ValueError):
    """A query referenced an unknown cube element, operator, or option, or
    passed a malformed / unsafe argument. Raised before any Spark job runs."""


class ShapeError(RuntimeError):
    """Response shape mismatch (reference: response_builder.rb:85,131)."""


class NotSqlExpressible(RuntimeError):
    """A cube element has no declared ANSI-SQL twin, so the query it appears
    in cannot be printed as SQL (sql.py). Approximate/stateful operators
    (uniq, streaming state) opt out by design — they are validated by
    tolerance / batch-twin tests instead of the SQL oracle."""

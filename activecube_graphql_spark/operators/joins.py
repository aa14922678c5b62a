"""Non-equi join shapes beyond the star/bucketed equi-joins of the cube
layer (SURVEY §2.6): banded range joins against a small tier table.

Scale shape: the band table is definitionally tiny (a handful of value
ranges), so it BROADCASTS and the fact side is scanned exactly once with
a nested-loop probe per row against the broadcast — no shuffle of fact
data, no cartesian blow-up (each row matches ≤ a few bands). This is the
standard Spark answer to "join on BETWEEN": a BroadcastNestedLoopJoin
whose inner side is a constant-size array in executor memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exists_filter(df: DataFrame, keys: DataFrame, on,
                  negate: bool = False,
                  broadcast_keys: bool = True) -> DataFrame:
    """Existence predicate as a join (SURVEY §2.6 J3 semi/anti row —
    the reference surface has no user-facing join; these are the two
    join shapes a filter can NEED that no WHERE clause can express):
    keep rows of ``df`` that have (``negate=False`` → LEFT SEMI) or
    lack (``negate=True`` → LEFT ANTI) a match in ``keys`` on ``on``.

    Neither form ever duplicates or widens ``df`` rows — output schema
    is exactly ``df``'s, row count ≤ input — which is what makes them
    safe inside cube filter pipelines (an inner join against a
    non-unique key list would fan out and corrupt aggregates).

    Scale shape: with ``broadcast_keys`` (default) the key side ships
    to every executor and the probe is map-only — no shuffle of the
    fact side; the key frame should be pre-projected to the join
    columns (callers pass ``keys.select(on).distinct()`` or a
    filtered dimension). For key sides too big to broadcast, pass
    ``broadcast_keys=False`` and both sides hash-shuffle on the key —
    still a semi/anti (no row expansion), and AQE will pick broadcast
    anyway if the measured size allows."""
    side = F.broadcast(keys) if broadcast_keys else keys
    return df.join(side, on, "left_anti" if negate else "left_semi")


def band_join(fact: DataFrame, bands: DataFrame, value_col: str,
              lo_col: str = "lo", hi_col: str = "hi",
              how: str = "inner") -> DataFrame:
    """Join each fact row to the band(s) where
    ``lo <= value < hi`` (half-open, so adjacent bands never
    double-match). ``bands`` must be small — it is broadcast."""
    cond = ((F.col(value_col) >= bands[lo_col]) &
            (F.col(value_col) < bands[hi_col]))
    return fact.join(F.broadcast(bands), cond, how)

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


def band_join(fact: DataFrame, bands: DataFrame, value_col: str,
              lo_col: str = "lo", hi_col: str = "hi",
              how: str = "inner") -> DataFrame:
    """Join each fact row to the band(s) where
    ``lo <= value < hi`` (half-open, so adjacent bands never
    double-match). ``bands`` must be small — it is broadcast."""
    cond = ((F.col(value_col) >= bands[lo_col]) &
            (F.col(value_col) < bands[hi_col]))
    return fact.join(F.broadcast(bands), cond, how)

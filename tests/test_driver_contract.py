"""Guard the driver correctness window (VERDICT r02 item 1/6).

The driver's CORRECTNESS harness checks only the FIRST 50 entries of
``queries()``.  Round 2 accidentally rotated 17 oracle-backed rows past
that cap the same round they were fixed, leaving them with zero hard
evidence.  This gate makes that structurally impossible: every registry
row must either sit inside the graded window for the upcoming round or
already have a green record in some CORRECTNESS_r*.json on disk.
"""

from __future__ import annotations

import glob
import json
import os

from activecube_graphql_spark.driver_queries import ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # observed driver cap (CORRECTNESS_r01/r02 both grade 50 rows)


def _green_on_record() -> set[str]:
    """Names with at least one green row across all CORRECTNESS files.

    Green = rows+schema match, and hash matches when a hash was computed
    (rows-only checks carry no hash_match key or a null one).
    """
    green: set[str] = set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        data = json.load(open(path))
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("rows_match") and row.get("schema_match")
            if ok and row.get("hash_match") in (True, None):
                green.add(name)
    return green


def test_every_query_graded_or_on_record():
    window = set(list(QUERIES)[:WINDOW])
    covered = window | _green_on_record()
    missing = sorted(set(QUERIES) - covered)
    assert not missing, (
        f"registry rows outside the driver's {WINDOW}-row correctness window "
        f"with no green record on disk: {missing} — reorder QUERIES in "
        "driver_queries.py so they are graded before rotating them out"
    )


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_never_green_rows_lead_the_window():
    """Rows with no green record must occupy the earliest positions, so a
    harness that caps below 50 still grades them first."""
    green = _green_on_record()
    names = list(QUERIES)
    seen_recorded = False
    for name in names[:WINDOW]:
        if name in green:
            seen_recorded = True
        else:
            assert not seen_recorded, (
                f"never-green row {name!r} appears after already-green rows "
                "in the window; put unchecked rows first"
            )

"""Guard the driver correctness window (VERDICT r02 item 1/6, r04 items
2 and 9).

The driver's CORRECTNESS harness checks only the FIRST 50 entries of
``queries()``.  Round 2 accidentally rotated 17 oracle-backed rows past
that cap the same round they were fixed, leaving them with zero hard
evidence.  These gates make that structurally impossible:

* every registry row must either sit inside the graded window for the
  upcoming round or already have a green record in some
  CORRECTNESS_r*.json on disk;
* rows with no usable green record must occupy the EARLIEST window
  positions;
* a green record is only usable while the row's current semantics
  (query function source + oracle SQL) hash-match the committed
  manifest (tests/graded_manifest.json, tools/update_manifest.py) — the
  round-2 ``arg_minmax`` lesson: editing a graded row silently voided
  its evidence. Now an edit structurally re-enters the row into the
  never-green tier until the driver re-grades it.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import json
import os

from activecube_graphql_spark.driver_queries import ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WINDOW = 50  # observed driver cap (CORRECTNESS_r01-r04 all grade 50 rows)
MANIFEST = os.path.join(REPO, "tests", "graded_manifest.json")


def _row_hash(name: str) -> str:
    src = inspect.getsource(QUERIES[name])
    return hashlib.sha256(
        (src + "\n---\n" + ORACLES.get(name, "")).encode()).hexdigest()


def _recorded_green() -> set[str]:
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


def _usable_green() -> set[str]:
    """Green-on-record names whose current semantics still match the
    manifest entry recorded when that evidence was valid."""
    manifest = json.load(open(MANIFEST))
    return {name for name in _recorded_green()
            if name in QUERIES and manifest.get(name) == _row_hash(name)}


def test_every_query_graded_or_on_record():
    window = set(list(QUERIES)[:WINDOW])
    covered = window | _usable_green()
    missing = sorted(set(QUERIES) - covered)
    assert not missing, (
        f"registry rows outside the driver's {WINDOW}-row correctness window "
        f"with no (still-valid) green record on disk: {missing} — reorder "
        "QUERIES in driver_queries.py so they are graded before rotating "
        "them out"
    )


def test_oracles_subset_of_queries():
    assert set(ORACLES) <= set(QUERIES)


def test_manifest_covers_registry():
    manifest = json.load(open(MANIFEST))
    missing = sorted(set(QUERIES) - set(manifest))
    assert not missing, (
        f"rows missing from tests/graded_manifest.json: {missing} — run "
        "python tools/update_manifest.py (only when the tree matches what "
        "the green records graded)"
    )


def test_never_green_rows_lead_the_window():
    """Rows with no usable green record must occupy the earliest
    positions, so a harness that caps below 50 still grades them first.
    'Usable' includes the manifest hash check: editing a graded row
    voids its evidence and must push it back to the front."""
    green = _usable_green()
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

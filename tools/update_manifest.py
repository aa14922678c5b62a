"""Regenerate tests/graded_manifest.json — the re-grade guard.

The manifest maps every registered query name to a hash of its CURRENT
semantics: the query function's source plus its oracle SQL text (oracle
text is rendered at import, so changes to shared portable fragments flow
into it).  tests/test_driver_contract.py counts a green CORRECTNESS
record as evidence ONLY while the row's current hash equals the manifest
entry — edit a graded row and it structurally re-enters the never-green
tier (leads the 50-row window) until the driver grades it again (the
``arg_minmax`` lesson from round 2, made structural per VERDICT r4
item 9).

Run this ONLY when the working tree state is the one the driver's green
records grade: immediately after a round's CORRECTNESS lands, before
touching query code, or after verifying the full registry locally
(tools/verify_local.py).
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, ".")

from activecube_graphql_spark.driver_queries import ORACLES, QUERIES  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "graded_manifest.json")


def row_hash(name: str) -> str:
    src = inspect.getsource(QUERIES[name])
    oracle = ORACLES.get(name, "")
    return hashlib.sha256((src + "\n---\n" + oracle).encode()).hexdigest()


def main() -> None:
    manifest = {name: row_hash(name) for name in QUERIES}
    with open(OUT, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"wrote {len(manifest)} entries to {OUT}")


if __name__ == "__main__":
    main()

"""Benchmark harness — BASELINE v2 protocol (position-independent).

Runs every driver query at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Per row (the ``tools/bench_cold.py`` discipline, VERDICT r05 item 2):

1. ``spark.catalog.clearCache()`` — drop every persisted frame, so the
   row never inherits (or misses) caches from whatever ran before it;
2. one discarded warm-up run — code-gen, file-index, and the row's OWN
   persisted intermediates build from cold;
3. median of 3 timed runs — the row's warm steady-state, measured in
   isolation.

This makes every per-name number a property of the QUERY, not of its
registry position: the v1 protocol shared caches across rows and
cleared only at tier boundaries, so re-tiering the registry moved
rows between warm and cold contexts and 5 frozen ratios blew past 2×
on position alone (VERDICT r05 "what's wrong" item 2). Under v2 the
registry can be reordered freely and the 2× freeze rule stays
judgeable with no position footnotes. The cost — each cache-sharing
dedup row rebuilds its shingle frame in its warm-up — is real but
bounded (warm-ups are discarded; suite total runs ~1.5× v1).

Output contract: the FULL record (4dp medians for every row) is
written to ``bench_out.json`` and printed as a progress line; the
FINAL stdout line is a COMPACT summary guaranteed to fit the driver's
2000-byte tail capture (BENCH_r03–r05 all recorded ``parsed: null``
because the full 104-row record was ~3.7 KB and the capture clipped
its head). The compact line keeps the contract keys
(metric/value/unit/queries/sf) with the most-expensive rows first and
says how many were omitted; ``bench_out.json`` always has all rows.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: final-line byte budget: the driver keeps the LAST 2000 chars of
#: stdout; stay comfortably under it
TAIL_BUDGET = 1800


def compact_line(total: float, timings: dict[str, float],
                 sf: float | None) -> str:
    """Largest-first subset of ``timings`` that keeps the summary line
    under TAIL_BUDGET bytes; deterministic (time desc, name asc)."""
    def render(keep: dict[str, float]) -> str:
        # single definition of the summary record: the fit trials and
        # the returned line can never diverge
        return json.dumps({"metric": "suite_total_median_sec",
                           "value": total, "unit": "sec",
                           "queries": keep, "sf": sf,
                           "queries_omitted": len(timings) - len(keep),
                           "full": "bench_out.json"},
                          separators=(",", ":"))

    keep: dict[str, float] = {}
    for name in sorted(timings, key=lambda n: (-timings[n], n)):
        keep[name] = round(timings[name], 2)
        if len(render(keep)) > TAIL_BUDGET:
            # keep trying: a shorter name further down the time order
            # may still fit — maximal subset, not prefix-only
            # (ADVICE r06)
            del keep[name]
    return render(keep)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # keep stdout/stderr clean: the final summary line must survive
    # tail capture (progress bars overwrite/interleave the tail)
    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")

    from activecube_graphql_spark import get_spark
    from activecube_graphql_spark.driver_queries import QUERIES

    spark = get_spark("acgs-bench")
    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        spark.catalog.clearCache()           # position independence
        fn(spark, sf_dir).collect()          # discarded warm-up
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(runs), 4)

    total = round(sum(timings.values()), 4)
    record = json.dumps({
        "metric": "suite_total_median_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "protocol": "v2 per-row clearCache + 1 warm-up + median-of-3",
    })
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_out.json")
    try:
        with open(out_path, "w") as f:
            f.write(record + "\n")
    except OSError as e:  # read-only checkout: never lose the stdout line
        print(f"bench_out.json write failed: {e}", file=sys.stderr)
    print(record, flush=True)  # full record for humans / full logs
    sys.stderr.flush()
    # the machine-durable line: LAST on stdout, < TAIL_BUDGET bytes
    print(compact_line(total, timings, sf), flush=True)


if __name__ == "__main__":
    main()

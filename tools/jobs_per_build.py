"""Jobs-per-build sweep (r17, VERDICT r16 item 7): for every registry
row, count how many Spark jobs run during the BUILD (``fn(spark,
sf_dir)`` — should be zero for a lazy query path; every build job is an
eager driver action the bench pays once per timed run) and during the
ACTION (``collect()``). The eager-probe class this diagnostic hunts is
exactly what r16 killed twice (bitmap strategy probes, the
ann_recall_audit ``n_true`` count) and r17 kills again (the lang-ID
three-collect fit, the audit's triple query collect).

Usage:
    python tools/jobs_per_build.py [--top N] [name ...]

Prints a table (name, build_jobs, action_jobs, build_sec, action_sec)
and a JSON line. Job counts come from the DAGScheduler's monotone
nextJobId counter — exact, no listener race.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--top", type=int, default=0)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    from activecube_graphql_spark import get_spark
    from activecube_graphql_spark.driver_queries import QUERIES

    names = list(args.names)
    if args.all:
        names = list(QUERIES)
    elif args.top:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rec = json.load(open(os.path.join(repo, "bench_out.json")))
        ranked = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[:args.top] if n not in names]

    spark = get_spark("acgs-jobs-per-build")
    sc = spark.sparkContext

    def next_id_get() -> int:
        """Read the DAGScheduler's monotone job counter (non-mutating)."""
        return sc._jsc.sc().dagScheduler().nextJobId()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        # warm-up: fills per-row persists exactly as the bench does, so
        # the measured build reflects the timed-run steady state
        fn(spark, args.sf_dir).collect()
        j0 = next_id_get()
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        t1 = time.perf_counter()
        j1 = next_id_get()
        df.collect()
        t2 = time.perf_counter()
        j2 = next_id_get()
        out[name] = {"build_jobs": j1 - j0, "action_jobs": j2 - j1,
                     "build_sec": round(t1 - t0, 3),
                     "action_sec": round(t2 - t1, 3)}
        print(f"{name:28s} build_jobs {j1 - j0:3d}  "
              f"action_jobs {j2 - j1:3d}  build {t1 - t0:6.2f}s  "
              f"action {t2 - t1:6.2f}s", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

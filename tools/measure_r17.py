"""Per-row measurement harness for the r17 optimization round.

Reproduces bench.py's v2 per-row discipline (clearCache -> 1 discarded
warm-up -> median of 3 timed collects) for a SUBSET of registry rows,
and captures each row's ``explain("formatted")`` plan to
``plans/r17/<name>_<tag>.txt`` so plan claims in OPTIMIZATION_r17.md
are checkable without running Spark.

Usage:
    python tools/measure_r16.py --tag before name [name ...]
    python tools/measure_r16.py --tag after --no-plan name ...
    python tools/measure_r16.py --tag before --top 20

The timed action stays ``collect()`` — the bench/driver methodology —
so numbers here are directly comparable to bench_out.json rows.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--top", type=int, default=0,
                    help="measure the N most expensive rows per bench_out.json")
    ap.add_argument("--no-plan", action="store_true",
                    help="skip writing the explain file")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--isolate", action="store_true",
                    help="run each row in its OWN subprocess/JVM — multi-row "
                    "sessions contaminate later rows (kn_buckets read 8.1 s "
                    "mid-batch vs 1.76 s solo; leaked JVM/GC state survives "
                    "clearCache), so decisive readings should be isolated")
    args = ap.parse_args()

    if args.isolate and len(args.names) + (args.top or 0) > 1:
        import subprocess
        base = [sys.executable, os.path.abspath(__file__),
                "--tag", args.tag, "--sf-dir", args.sf_dir,
                "--runs", str(args.runs)]
        if args.no_plan:
            base.append("--no-plan")
        names = list(args.names)
        if args.top:
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            rec = json.load(open(os.path.join(repo, "bench_out.json")))
            ranked = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
            names += [n for n, _ in ranked[:args.top] if n not in names]
        merged: dict[str, float] = {}
        for name in names:
            p = subprocess.run(base + [name], capture_output=True, text=True)
            for line in p.stdout.splitlines():
                if line.lstrip().startswith("{"):
                    merged.update(json.loads(line))
                elif "median" in line:
                    print(line, flush=True)
        print(json.dumps(merged))
        return

    os.environ.setdefault("SPARK_GRAFT_NO_PROGRESS", "1")
    from activecube_graphql_spark import get_spark
    from activecube_graphql_spark.driver_queries import QUERIES

    names = list(args.names)
    if args.top:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        rec = json.load(open(os.path.join(repo, "bench_out.json")))
        ranked = sorted(rec["queries"].items(), key=lambda kv: -kv[1])
        names += [n for n, _ in ranked[:args.top] if n not in names]
    bad = [n for n in names if n not in QUERIES]
    if bad:
        sys.exit(f"unknown rows: {bad}")

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r17")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("acgs-measure-r17")
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        spark.catalog.clearCache()
        sc.setJobDescription(f"r17-measure warmup: {name}")
        t0 = time.perf_counter()
        fn(spark, args.sf_dir).collect()
        warm = time.perf_counter() - t0
        runs = []
        for i in range(args.runs):
            sc.setJobDescription(f"r17-measure run{i}: {name}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).collect()
            runs.append(round(time.perf_counter() - t0, 4))
        sc.setJobDescription(None)
        med = round(statistics.median(runs), 4)
        out[name] = {"median": med, "runs": runs, "warmup": round(warm, 4)}
        print(f"{name:28s} median {med:8.3f}  runs {runs}  warm {warm:.3f}",
              flush=True)
        if not args.no_plan:
            path = os.path.join(plan_dir, f"{name}_{args.tag}.txt")
            df = fn(spark, args.sf_dir)
            txt = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
            with open(path, "w") as f:
                f.write(txt)
    print(json.dumps({n: v["median"] for n, v in out.items()}))


if __name__ == "__main__":
    main()

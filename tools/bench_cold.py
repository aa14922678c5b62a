"""Ad-hoc COLD-cache timings for individual rows.

Historically the complement to the v1 suite protocol, whose shared
caches let a shingle-stage regression hide behind a warm frame. Since
the r06 protocol v2, ``bench.py`` itself isolates every row
(clearCache → warm-up → warm median-of-3), so the suite numbers no
longer need this check; what this tool still measures differently is
the FULLY-cold median (cache cleared before every timed run, so the
row's own persisted intermediates rebuild inside the measurement) —
the cost profile of a first/once-off pipeline run, vs bench.py's warm
steady-state.

Usage: python tools/bench_cold.py [query ...]   (default: the heavy trio)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT = ["minhash_lsh_verified", "neardup_keep", "ngram_jaccard"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT

    from activecube_graphql_spark import get_spark
    from activecube_graphql_spark.driver_queries import QUERIES

    spark = get_spark("acgs-bench-cold")
    out: dict[str, float] = {}
    for name in names:
        fn = QUERIES[name]
        fn(spark, sf_dir).collect()  # JVM/code-gen warm-up (cache cleared next)
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 4)
    print(json.dumps({"metric": "cold_cache_median_sec", "queries": out,
                      "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()

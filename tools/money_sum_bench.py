"""Measure sum-aggregate strategies for the money metric (VERDICT r07
items 1/7): exact DECIMAL vs unscaled BIGINT cents (two per-row
variants) vs plain double, on the plan shapes that multiply per-row
evaluations (ROLLUP Expand ×3; alias fan-out ×3) plus the flagship
2-key group-by. Prints a markdown table for BENCH_NOTES.

Usage: python tools/money_sum_bench.py [sf_dir ...]
"""
from __future__ import annotations

import os
import sys
import time

EXPRS = {
    "double": "l_extendedprice * (1 - l_discount)",
    "decimal": ("CAST(l_extendedprice AS DECIMAL(12,2)) "
                "* (1 - CAST(l_discount AS DECIMAL(4,2)))"),
    "cents_round": ("CAST(round(l_extendedprice * 100, 0) AS BIGINT) "
                    "* (100 - CAST(round(l_discount * 100, 0) AS BIGINT))"),
    "cents_floor": (
        "CAST(floor(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT) "
        "* (100 - CAST(floor(l_discount * 100 + CAST(0.5 AS DOUBLE)) "
        "AS BIGINT))"),
}

SHAPES = {
    "rollup": ("SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
               "sum({e}) AS rev FROM li "
               "GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
    "fanout": ("SELECT l_returnflag, sum({e}) AS rev, "
               "sum(CASE WHEN l_discount >= 0.05 THEN {e} END) AS hi, "
               "sum(CASE WHEN l_discount < 0.05 THEN {e} END) AS lo "
               "FROM li GROUP BY 1"),
    "flagship": ("SELECT l_returnflag, l_linestatus, sum({e}) AS rev, "
                 "count(*) AS cnt, sum(l_quantity) AS qty "
                 "FROM li GROUP BY 1, 2"),
}


def main() -> None:
    from pyspark.sql import SparkSession
    dirs = sys.argv[1:] or ["/root/testdata/sf0.1"]
    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("money_sum_bench").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    for d in dirs:
        li = spark.read.parquet(os.path.join(d, "lineitem.parquet"))
        li.cache().count()  # isolate agg cost from scan
        li.createOrReplaceTempView("li")
        print(f"\n## {d} (rows={li.count()})\n")
        print("| shape | " + " | ".join(EXPRS) + " |")
        print("|---" * (len(EXPRS) + 1) + "|")
        for shape, tmpl in SHAPES.items():
            cells = []
            for name, e in EXPRS.items():
                q = tmpl.format(e=e)
                spark.sql(q).collect()  # warm/JIT
                ts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    spark.sql(q).collect()
                    ts.append(time.perf_counter() - t0)
                cells.append(f"{min(ts):.3f}")
            print(f"| {shape} | " + " | ".join(cells) + " |")
        li.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()

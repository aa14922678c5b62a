"""sf1 partitioned-lake pruning audit (VERDICT r07 item 5).

Writes the sf1 events table (tools/make_sf1.py) in the production lake
layout — ``events.parquet/event_date=YYYY-MM-DD/`` (302 daily
partitions) — then, for a date-filtered CUBE query:

* asserts the executed plan carries ``PartitionFilters`` on
  ``event_date`` (static pruning reaches the scan);
* MEASURES the files the pruned scan actually opens
  (``input_file_name()`` over the real scan) and their on-disk bytes,
  vs the whole lake — the number that matters at 100 TB;
* asserts >90% of partitions/bytes pruned for the 1-week filter;
* asserts the join-driven (DPP) variant plans a ``dynamicpruning``
  subquery against the fact scan and returns the same result as the
  static filter.

Prints a markdown table for BENCH_NOTES.

Usage: python tools/dpp_sf1.py [sf1_dir] [lake_root]
       (defaults /tmp/sf1 /tmp/sf1_lake)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from activecube_graphql_spark.cubes import EventsCube
    from activecube_graphql_spark.model import Selector
    from activecube_graphql_spark.session import ensure_runtime_confs

    sf1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    lake_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_lake"
    spark = ensure_runtime_confs(
        SparkSession.builder
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .appName("dpp_sf1").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    lake = f"{lake_root}/events.parquet"
    if not os.path.exists(os.path.join(lake, "_SUCCESS")):
        raw = spark.read.parquet(os.path.join(sf1, "events.parquet"))
        df = (EventsCube.prepare(raw)
              .withColumn("event_date", F.to_date("ts")))
        (df.repartition("event_date")  # one file per partition dir
           .write.mode("overwrite").partitionBy("event_date").parquet(lake))

    class PartitionedEventsCube(EventsCube):
        selectors = {**EventsCube.selectors,
                     "event_date": Selector("event_date")}

    cube = PartitionedEventsCube(spark, lake_root)
    q = (cube.query()
         .slice("event_type").measure("count", alias="cnt")
         .measure("total", alias="total")
         .when({"event_date": {"gteq": "2024-06-01", "lt": "2024-06-08"}}))
    plan = q.df()._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan[:2000]
    seg = plan.split("PartitionFilters", 1)[1][:400]
    assert "event_date" in seg, seg
    q.relabeled().collect()

    # measured files/bytes: what the pruned scan actually opens
    def disk_bytes(files):
        return sum(os.path.getsize(f.replace("file://", "").replace(
            "file:", "")) for f in files)

    total_files = set(spark.read.parquet(lake).inputFiles())
    read_files = {r[0] for r in
                  spark.read.parquet(lake)
                  .filter((F.col("event_date") >= "2024-06-01")
                          & (F.col("event_date") < "2024-06-08"))
                  .select(F.input_file_name()).distinct().collect()}
    assert read_files and read_files < total_files
    part_dirs = len([d for d in os.listdir(lake)
                     if d.startswith("event_date=")])
    read_dirs = len({f.rsplit("/", 2)[1] for f in read_files})
    tb, rb = disk_bytes(total_files), disk_bytes(read_files)
    pruned_parts = 1 - read_dirs / part_dirs
    pruned_bytes = 1 - rb / tb
    assert pruned_parts > 0.9 and pruned_bytes > 0.9, (
        read_dirs, part_dirs, rb, tb)

    # join-driven DPP: dim filtered on a non-partition attribute
    fact = spark.read.parquet(lake)
    dim = (fact.select("event_date").distinct()
           .withColumn("weekday", F.dayofweek("event_date")))
    picked = dim.filter(F.col("weekday") == 2)
    joined = (fact.join(F.broadcast(picked), "event_date")
              .groupBy("event_type").count())
    jplan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in jplan.lower(), jplan[:2000]
    dates = [r[0] for r in picked.select("event_date").collect()]
    want = {tuple(r) for r in
            fact.filter(F.col("event_date").isin(dates))
            .groupBy("event_type").count().collect()}
    got = {tuple(r) for r in joined.collect()}
    assert got == want

    print("| lake | partitions | files | bytes | read parts | read bytes |"
          " pruned parts | pruned bytes |")
    print("|---|---|---|---|---|---|---|---|")
    print(f"| sf1 events (1-week filter of {part_dirs}d) | {part_dirs} | "
          f"{len(total_files)} | {tb/1e6:.1f} MB | {read_dirs} | "
          f"{rb/1e6:.2f} MB | {pruned_parts:.1%} | {pruned_bytes:.1%} |")
    print("PartitionFilters: OK; DPP (dynamicpruning + result parity): OK")
    spark.stop()


if __name__ == "__main__":
    main()

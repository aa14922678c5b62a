"""Source-layer scale behavior: partition pruning on a date-partitioned
lake layout (SURVEY §4.2 — the ClickHouse-PK-pruning analogue), and
SourceRegistry format/override routing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from activecube_graphql_spark.cubes import EventsCube
from activecube_graphql_spark.model import Selector
from activecube_graphql_spark.sources.registry import SourceRegistry


class PartitionedEventsCube(EventsCube):
    """EventsCube over the partitioned lake layout: the partition column
    is exposed as a selector so filters on it hit the directory level."""
    selectors = {**EventsCube.selectors,
                 "event_date": Selector("event_date")}


@pytest.fixture(scope="module")
def lake_root(spark, sf_dir, tmp_path_factory):
    """events re-materialized in the production lake layout:
    ``events.parquet/event_date=YYYY-MM-DD/part-*.parquet``."""
    root = str(tmp_path_factory.mktemp("lake"))
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = EventsCube.prepare(raw).withColumn("event_date", F.to_date("ts"))
    (df.write.mode("overwrite").partitionBy("event_date")
       .parquet(f"{root}/events.parquet"))
    return root


def test_partition_pruning_reaches_scan(spark, sf_dir, lake_root):
    """A date filter over the partitioned layout must prune partitions at
    the scan (PartitionFilters in the plan) — at 100 TB this is the
    difference between scanning one day and the whole lake."""
    dates = sorted(r[0] for r in spark.read
                   .parquet(f"{lake_root}/events.parquet")
                   .select("event_date").distinct().collect())
    assert len(dates) > 1, "fixture spans a single date; test is vacuous"
    pick = dates[0].isoformat()

    cube = PartitionedEventsCube(spark, lake_root)
    q = (cube.query()
         .slice("event_type")
         .measure("count", alias="cnt")
         .when({"event_date": pick}))
    plan = q.df()._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_date" in plan.split("PartitionFilters", 1)[1][:300]

    # results agree with the unpartitioned fixture filtered the same way
    got = {tuple(r) for r in q.relabeled().collect()}
    want = {tuple(r) for r in
            (EventsCube(spark, sf_dir).table()
             .filter(F.to_date("ts") == F.lit(pick))
             .groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))
             .collect())}
    assert got == want

    # MEASURED pruning, not just plan text (VERDICT r07 item 5): the
    # files actually opened by the pruned scan must be a >90%-pruned
    # subset of the lake (the fixture spans ~30 daily partitions; a
    # 1-day filter must read ~1/30). input_file_name() runs the real
    # scan, so this counts what the executors touched. The sf1-scale
    # twin of this audit is tools/dpp_sf1.py (recorded in BENCH_NOTES).
    lake = f"{lake_root}/events.parquet"
    total = {f for f in spark.read.parquet(lake).inputFiles()}
    read = {r[0] for r in
            spark.read.parquet(lake)
            .filter(F.col("event_date") == F.lit(pick))
            .select(F.input_file_name()).distinct().collect()}
    assert read and read < total
    pruned = 1 - len(read) / len(total)
    assert pruned > 0.9, (len(read), len(total))


def test_source_registry_csv_format(spark, sf_dir, tmp_path_factory):
    """Same registry machinery over a CSV database (format + reader
    options plumbed through to spark.read)."""
    root = str(tmp_path_factory.mktemp("csvdb"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    (docs.select("doc_id", "lang", "source", "n_chars")
     .write.mode("overwrite").option("header", True)
     .csv(f"{root}/documents.csv"))

    reg = SourceRegistry({"csvdb": root}, format="csv",
                         options={"header": "true", "inferSchema": "true"})
    out = reg.read(spark, "csvdb", "documents")
    assert out.count() == docs.count()
    assert set(out.columns) == {"doc_id", "lang", "source", "n_chars"}


def test_source_registry_overrides(spark, sf_dir):
    """Per-(db, table) path overrides route one table of a database to an
    explicit location."""
    reg = SourceRegistry({"default": "/nonexistent"},
                         overrides={("default", "documents"):
                                    f"{sf_dir}/documents.parquet"})
    got = reg.read(spark, "default", "documents")
    assert got.count() == \
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()


def test_dynamic_partition_pruning(spark, lake_root):
    """Join-driven pruning (SURVEY §4.2): when the partitioned fact joins a
    dimension filtered on a non-partition attribute, Catalyst must inject a
    runtime subquery into the fact's PartitionFilters (DPP) — the 100 TB
    equivalent of only reading the partitions the dim filter selects."""
    fact = spark.read.parquet(f"{lake_root}/events.parquet")
    dim = (fact.select("event_date").distinct()
           .withColumn("weekday", F.dayofweek("event_date")))
    picked = dim.filter(F.col("weekday") == 2)
    joined = (fact.join(F.broadcast(picked), "event_date")
              .groupBy("event_type").count())
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]

    # correctness: same as filtering the fact directly by the picked dates
    dates = [r[0] for r in picked.select("event_date").collect()]
    want = {tuple(r) for r in
            fact.filter(F.col("event_date").isin(dates))
            .groupBy("event_type").count().collect()}
    assert {tuple(r) for r in joined.collect()} == want


def test_source_registry_json_and_orc_formats(spark, sf_dir,
                                              tmp_path_factory):
    """The registry's format plumbing is not parquet/csv-specific: a
    JSON-lines database (schema inference + multiLine-capable options
    path) and an ORC database (the other columnar lake format, full
    pushdown/pruning support in Spark) round-trip through the same
    read path and can back a cube query each."""
    from activecube_graphql_spark.cubes import DocsCube
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    jroot = str(tmp_path_factory.mktemp("jsondb"))
    docs.write.mode("overwrite").json(f"{jroot}/documents.json")
    jreg = SourceRegistry({"default": jroot}, format="json")
    jdf = jreg.read(spark, "default", "documents")
    assert jdf.count() == docs.count()
    assert set(docs.columns) <= set(jdf.columns)

    oroot = str(tmp_path_factory.mktemp("orcdb"))
    docs.write.mode("overwrite").orc(f"{oroot}/documents.orc")
    oreg = SourceRegistry({"default": oroot}, format="orc")
    odf = oreg.read(spark, "default", "documents")
    assert odf.count() == docs.count()
    assert set(odf.columns) == set(docs.columns)

    # a cube compiles and answers over the ORC backing unchanged
    oreg.format = "orc"
    q = (DocsCube(spark, oreg).query()
         .slice("source").measure("count", alias="cnt").asc(["source"]))
    got = {(r[0], r[1]) for r in q.relabeled().collect()}
    want = {(r[0], r[1]) for r in
            docs.groupBy("source").count().collect()}
    assert got == want


def test_parquet_schema_evolution_merge(spark, tmp_path_factory):
    """Appended files with added columns (schema evolution — the normal
    life of a 100 TB lake table) read as one table under mergeSchema:
    old files surface NULL for the new column; the registry's options
    plumbing carries the flag."""
    root = str(tmp_path_factory.mktemp("evolve"))
    spark.createDataFrame([(1, "a")], ["id", "v"]) \
        .write.mode("overwrite").parquet(f"{root}/t.parquet")
    spark.createDataFrame([(2, "b", 9.5)], ["id", "v", "score"]) \
        .write.mode("append").parquet(f"{root}/t.parquet")
    reg = SourceRegistry({"default": root},
                         options={"mergeSchema": "true"})
    out = reg.read(spark, "default", "t")
    assert set(out.columns) == {"id", "v", "score"}
    rows = {r["id"]: r["score"] for r in out.collect()}
    assert rows[1] is None and rows[2] == 9.5

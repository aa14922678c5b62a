"""Streaming twins (SURVEY §5.2 item 5): each Structured Streaming job,
drained with Trigger.AvailableNow into a memory sink, must agree with its
batch-mode twin on the same fixture data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from activecube_graphql_spark.streaming import jobs


def _multiset(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_tumbling_counts_stream_equals_batch(spark, sf_dir):
    stream_out = jobs.run_available_now(
        jobs.tumbling_counts(jobs.events_stream(spark, sf_dir)),
        "t_tumbling")
    batch_out = jobs.tumbling_counts(jobs.events_batch(spark, sf_dir),
                                     watermark=None)
    assert _multiset(stream_out) == _multiset(batch_out)
    assert stream_out.count() > 0


def test_sliding_avg_stream_equals_batch(spark, sf_dir):
    stream_out = jobs.run_available_now(
        jobs.sliding_avg(jobs.events_stream(spark, sf_dir)), "t_sliding")
    batch_out = jobs.sliding_avg(jobs.events_batch(spark, sf_dir),
                                 watermark=None)
    assert _multiset(stream_out) == _multiset(batch_out)


def test_session_counts_stream_equals_batch(spark, sf_dir):
    stream_out = jobs.run_available_now(
        jobs.session_counts(jobs.events_stream(spark, sf_dir)), "t_session")
    batch_out = jobs.session_counts(jobs.events_batch(spark, sf_dir),
                                    watermark=None)
    assert _multiset(stream_out) == _multiset(batch_out)


def test_stream_dedup_equals_batch(spark, sf_dir):
    stream_out = jobs.run_available_now(
        jobs.stream_dedup(jobs.events_stream(spark, sf_dir)),
        "t_dedup", mode="append")
    batch_out = jobs.stream_dedup(jobs.events_batch(spark, sf_dir))
    # event_id is unique in the fixture: dedup is identity, and the
    # streaming path must agree row-for-row
    assert stream_out.count() == batch_out.count()
    assert _multiset(stream_out.select("event_id")) == \
        _multiset(batch_out.select("event_id"))


def test_click_purchase_join_stream_equals_batch(spark, sf_dir):
    """Stream-stream interval self-join must reproduce the batch twin:
    watermarks only bound state, they must not drop pairs when the
    source is replayed in order via availableNow."""
    stream_out = jobs.run_available_now(
        jobs.click_purchase_join(jobs.events_stream(spark, sf_dir)),
        "t_ssjoin", mode="append")
    batch_out = jobs.click_purchase_join(jobs.events_batch(spark, sf_dir))
    assert _multiset(stream_out) == _multiset(batch_out)
    assert stream_out.count() > 0


def test_stateful_user_stats_stream_equals_batch(spark, sf_dir):
    """applyInPandasWithState custom operator: with a single AvailableNow
    micro-batch every key emits exactly once, and that final state must
    equal the batch-twin aggregation."""
    stream_out = jobs.run_available_now(
        jobs.stateful_user_stats(jobs.events_stream(spark, sf_dir)),
        "t_stateful", mode="update")
    batch_out = jobs.stateful_user_stats(jobs.events_batch(spark, sf_dir))
    assert _multiset(stream_out) == _multiset(batch_out)
    assert stream_out.count() > 0


def test_parquet_sink_watermark_and_checkpoint_restart(spark, tmp_path):
    """End-to-end durable pipeline (S4 + §2.10): file stream → watermarked
    tumbling window → append-mode parquet sink with checkpoint.
    Three properties at once, each load-bearing at scale:
      1. late data beyond the watermark is DROPPED (bounded state);
      2. a window is emitted exactly once, when the watermark closes it;
      3. restarting from the checkpoint resumes at the recorded offsets —
         committed windows are never re-emitted (exactly-once sink).
    """
    import os
    import time

    from pyspark.sql import functions as F
    from pyspark.sql.types import (DoubleType, LongType, StringType,
                                   StructField, StructType)

    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    schema = StructType([StructField("event_id", LongType()),
                         StructField("ts_us", LongType()),
                         StructField("event_type", StringType()),
                         StructField("value", DoubleType())])
    hour = 3_600_000_000  # micros

    def write_file(name, rows, mtime):
        # the file-stream source lists plain files (it does not recurse
        # into the directories DataFrame writes produce) — write to a
        # scratch dir and move the single part file into place
        import glob
        import shutil
        df = spark.createDataFrame(rows, schema)
        scratch = str(tmp_path / f"_scratch_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(scratch)
        (part,) = glob.glob(f"{scratch}/part-*.parquet")
        dst = str(src / name)
        shutil.move(part, dst)
        os.utime(dst, (mtime, mtime))  # file source orders batches by mtime

    now = time.time()
    # file A: one event in each of hours 0..3
    write_file("a.parquet",
               [(i, i * hour + hour // 2, "click", 1.0) for i in range(4)],
               now - 100)
    # file B: hours 4..6 — advances the watermark to 4:30
    write_file("b.parquet",
               [(10 + i, (4 + i) * hour + hour // 2, "click", 1.0)
                for i in range(3)],
               now - 50)

    def stream():
        raw = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", "1")  # one file per micro-batch
               .parquet(str(src)))
        ev = raw.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
        return (ev.withWatermark("ts", "2 hours")
                .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
                .agg(F.count(F.lit(1)).alias("cnt"),
                     F.sum("value").alias("total"))
                .select(F.unix_micros(F.col("win.start")).alias("ws"),
                        "event_type", "cnt", "total"))

    # First drain: batch(A) wm 0 → 1:30; batch(B) wm → 4:30; the final
    # flush batch emits every window the last watermark closed (end ≤
    # 4:30) — hours 0..3. Hours 4..6 stay in checkpointed state.
    jobs.run_to_parquet(stream(), str(out), str(ckpt))
    first = {(r["ws"], r["cnt"], r["total"])
             for r in spark.read.parquet(str(out)).collect()}
    assert first == {(i * hour, 1, 1.0) for i in range(4)}, first

    # Restart from checkpoint with file C: a late hour-0 event (value
    # 100) arriving when the recovered watermark (4:30) is far past its
    # window, plus an hour-10 event to advance the watermark to 8:30.
    # The late row must be DROPPED — were it accepted it would re-create
    # the evicted hour-0 state and emit a duplicate (0, 1, 100.0) row at
    # the flush, since 1:00 < 8:30. Hours 4..6 emit; hour 10 stays open.
    # Committed windows from the first run must not re-emit (exactly-once).
    write_file("c.parquet",
               [(99, hour // 4, "click", 100.0),
                (200, 10 * hour + hour // 2, "click", 1.0)], now)
    jobs.run_to_parquet(stream(), str(out), str(ckpt))
    rows = [(r["ws"], r["cnt"], r["total"])
            for r in spark.read.parquet(str(out)).collect()]
    assert len(rows) == len(set(rows)), f"duplicate emissions: {rows}"
    assert {ws // hour for ws, _, _ in set(rows)} == {0, 1, 2, 3, 4, 5, 6}, \
        sorted(rows)
    assert all(total == 1.0 for _, _, total in rows), rows  # late row gone


def test_cube_query_streaming_twin(spark, sf_dir):
    """Beyond-reference: the SAME cube-query API compiles to a streaming
    plan (builder.stream_df) — filters, JSON sub-field slices, and
    conditional aggregates included — and the drained result equals the
    batch compilation of the identical builder chain."""
    from activecube_graphql_spark.cubes import EventsCube
    cube = EventsCube(spark, sf_dir)

    def build(q):
        return (q.slice("event_type")
                .slice("ts.hour_start", alias="hour")
                .measure("count", alias="cnt")
                .measure("total")
                .measure("total", alias="big_total",
                         where={"value": {"gteq": 100.0}})
                .when({"event_type": {"not_eq": "error"}}))

    sdf = build(cube.query()).stream_df(watermark=("ts", "2 hours"))
    assert sdf.isStreaming
    got = jobs.run_available_now(sdf.withColumnRenamed("_aq.cnt", "cnt"),
                                 "cube_stream_twin", mode="complete")
    want = build(cube.query()).df()
    assert _multiset(got) == _multiset(
        want.withColumnRenamed("_aq.cnt", "cnt"))


def test_cube_query_streaming_rejects_options(spark, sf_dir):
    from activecube_graphql_spark.cubes import EventsCube
    from activecube_graphql_spark.errors import InputArgumentError
    import pytest
    cube = EventsCube(spark, sf_dir)
    with pytest.raises(InputArgumentError, match="foreachBatch"):
        (cube.query().slice("event_type").measure("count")
         .desc("count").limit(3).stream_df())
    with pytest.raises(InputArgumentError, match="groupBy"):
        (cube.query().slice("event_type").measure("count")
         .grouping("rollup").stream_df())


def test_cube_query_streaming_star_join(spark, sf_dir):
    """Stream-static join: a SalesCube query with broadcast dimension
    lookups compiles and drains in streaming mode too."""
    from activecube_graphql_spark.cubes import SalesCube
    cube = SalesCube(spark, sf_dir)

    def build(q):
        return (q.slice("returnflag").measure("count", alias="cnt")
                .when({"mktsegment": "BUILDING"}))

    sdf = build(cube.query()).stream_df()
    assert sdf.isStreaming
    got = jobs.run_available_now(sdf, "cube_stream_star", mode="complete")
    assert _multiset(got) == _multiset(build(cube.query()).df())


def test_incremental_daily_rollup_maintenance(spark, sf_dir, tmp_path):
    """§4.3 pre-agg kept fresh by a stream: each micro-batch re-aggregates
    only the days it touched from the raw source and dynamic-overwrites
    those partitions. After every increment the rollup equals the batch
    aggregation of the full feed; replaying with the same checkpoint
    changes nothing (idempotent); untouched day-partitions keep their
    files untouched on disk."""
    import os

    from pyspark.sql import functions as F

    feed = tmp_path / "feed"
    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    feed.mkdir()

    from activecube_graphql_spark.functions.tsutil import normalize_ts
    ev = normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    days = [r[0] for r in
            (ev.select(F.to_date("ts").alias("d"))
             .distinct().orderBy("d").collect())]
    assert len(days) >= 3
    split = days[len(days) // 2]

    def emit(name, pred):
        (ev.filter(pred).coalesce(1).write.mode("overwrite")
           .parquet(str(feed / name)))
        import glob as g
        import shutil
        (part,) = g.glob(str(feed / name / "part-*.parquet"))
        shutil.move(part, str(feed / f"{name}.parquet"))
        shutil.rmtree(str(feed / name))

    day_col = F.to_date("ts")
    emit("first", day_col <= F.lit(split))

    from activecube_graphql_spark.streaming import jobs

    def expected():
        raw = jobs.events_batch(spark, str(feed), glob="*.parquet")
        return {tuple(r) for r in
                (raw.groupBy(F.to_date("ts").alias("event_date"),
                             "event_type")
                 .agg(F.count(F.lit(1)).alias("cnt"),
                      F.round(F.sum("value"), 2).alias("total"))
                 .collect())}

    def rolled():
        df = spark.read.parquet(rollup)
        return {(r["event_date"], r["event_type"], r["cnt"], r["total"])
                for r in df.collect()}

    jobs.maintain_daily_rollup(spark, str(feed), rollup, ckpt)
    assert rolled() == expected()

    # record mtimes of the already-final partitions, then append new days
    old_parts = {p: os.path.getmtime(os.path.join(rollup, p))
                 for p in os.listdir(rollup) if p.startswith("event_date=")}
    emit("second", day_col > F.lit(split))
    jobs.maintain_daily_rollup(spark, str(feed), rollup, ckpt)
    assert rolled() == expected()

    # untouched day-partitions were not rewritten by the increment
    untouched = [p for p in old_parts
                 if p < f"event_date={split.isoformat()}"]
    assert untouched
    for p in untouched:
        assert os.path.getmtime(os.path.join(rollup, p)) == old_parts[p], p

    # replay with the same checkpoint: no new input → nothing changes
    before = rolled()
    jobs.maintain_daily_rollup(spark, str(feed), rollup, ckpt)
    assert rolled() == before


def test_incremental_sketch_cell_maintenance(spark, sf_dir, tmp_path):
    """Sketch-cell twin of the rollup-maintenance test: after each
    increment the maintained cells merge to the same distinct-count
    estimates as sketching the full feed directly (HLL union lossless ⇒
    incremental == from-scratch), and replay is a no-op."""
    import glob as g
    import shutil

    from pyspark.sql import functions as F

    from activecube_graphql_spark.functions.tsutil import normalize_ts
    from activecube_graphql_spark.plans import sketches as sk
    from activecube_graphql_spark.streaming import jobs

    feed = tmp_path / "feed"
    cells_path = str(tmp_path / "cells")
    ckpt = str(tmp_path / "ckpt")
    feed.mkdir()

    ev = normalize_ts(spark.read.parquet(f"{sf_dir}/events.parquet"))
    days = sorted(r[0] for r in
                  ev.select(F.to_date("ts").alias("d")).distinct().collect())
    split = days[len(days) // 2]

    def emit(name, pred):
        (ev.filter(pred).coalesce(1).write.mode("overwrite")
           .parquet(str(feed / name)))
        (part,) = g.glob(str(feed / name / "part-*.parquet"))
        shutil.move(part, str(feed / f"{name}.parquet"))
        shutil.rmtree(str(feed / name))

    def maintained_estimates():
        cells = spark.read.parquet(cells_path)
        return {r["event_type"]: r["user_id_uniq"] for r in
                sk.rollup_distinct(cells, ["event_type"],
                                   ["user_id"]).collect()}

    def direct_estimates():
        raw = jobs.events_batch(spark, str(feed), glob="*.parquet")
        return {r["event_type"]: r["d"] for r in
                raw.groupBy("event_type")
                .agg(F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(12))).alias("d"))
                .collect()}

    emit("first", F.to_date("ts") <= F.lit(split))
    jobs.maintain_sketch_cells(spark, str(feed), cells_path, ckpt)
    assert maintained_estimates() == direct_estimates()

    emit("second", F.to_date("ts") > F.lit(split))
    jobs.maintain_sketch_cells(spark, str(feed), cells_path, ckpt)
    after_all = maintained_estimates()
    assert after_all == direct_estimates()

    # replay with the same checkpoint: no new input → nothing changes
    jobs.maintain_sketch_cells(spark, str(feed), cells_path, ckpt)
    assert maintained_estimates() == after_all


def test_maintain_dedup_index_incremental_and_replay(spark, sf_dir, tmp_path):
    """The streamed index equals batch-mode exact dedup of the same
    feed, and re-running the job (fresh checkpoint, same data — a
    full at-least-once replay) appends nothing."""
    from activecube_graphql_spark.streaming import jobs
    idx = str(tmp_path / "fp_index")
    jobs.maintain_dedup_index(spark, sf_dir, idx,
                              str(tmp_path / "ck1"))
    got = spark.read.parquet(idx)
    from activecube_graphql_spark.operators import text as tx
    from activecube_graphql_spark.operators.dedup import exact_dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    want = exact_dedup(tx.with_fingerprint(docs), ["fingerprint"],
                       "doc_id")
    assert ({(r["doc_id"], r["fingerprint"]) for r in got.collect()} ==
            {(r["doc_id"], r["fingerprint"]) for r in want.collect()})
    n1 = got.count()
    jobs.maintain_dedup_index(spark, sf_dir, idx,
                              str(tmp_path / "ck2"))
    assert spark.read.parquet(idx).count() == n1   # replay appends 0


def test_curate_stream_equals_batch_and_replays_idempotent(
        spark, sf_dir, tmp_path):
    """Single-batch feed: the streamed curated corpus equals the batch
    composition (quality rules -> exact dedup; across MULTIPLE batches
    the contract is first-arrival-wins — see the docstring), the dedup
    index is the corpus's own fingerprint column (one sink, no
    index/corpus divergence window), and a full replay (fresh
    checkpoint, same data) appends nothing."""
    from activecube_graphql_spark.streaming import jobs
    from activecube_graphql_spark.operators import text as tx
    from activecube_graphql_spark.operators.dedup import exact_dedup
    out = str(tmp_path / "curated")
    jobs.curate_stream(spark, sf_dir, out, str(tmp_path / "ck1"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = (tx.with_quality_rules(docs).filter("keep")
            .select(*docs.columns))
    want = exact_dedup(tx.with_fingerprint(kept), ["fingerprint"],
                       "doc_id")
    got = spark.read.parquet(out)
    assert ({r["doc_id"] for r in got.collect()} ==
            {r["doc_id"] for r in want.collect()})
    assert set(got.columns) == set(docs.columns) | {"fingerprint"}
    n_out = got.count()
    assert got.select("fingerprint").distinct().count() == n_out
    jobs.curate_stream(spark, sf_dir, out, str(tmp_path / "ck2"))
    assert spark.read.parquet(out).count() == n_out


def test_curated_survivors_row_equals_streaming_composition(
        spark, sf_dir, tmp_path):
    """The graded curated_survivors row (r11, VERDICT r10 item 6) is
    the BATCH TWIN of the streaming curation surface: drive the ACTUAL
    streaming jobs — curate_stream over the incoming half against a
    corpus pre-seeded with the index half, then maintain_winnow_index
    over those survivors against a winnow index pre-seeded from the
    same index half — and assert the docs that survive both equal the
    row's survivor set exactly (per-source count + id_sum, the row's
    own emission)."""
    from activecube_graphql_spark.driver_queries import (
        q_curated_survivors,
    )
    from activecube_graphql_spark.operators import dedup as dd
    from activecube_graphql_spark.operators import text as tx
    from activecube_graphql_spark.streaming import jobs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = docs.filter("doc_id % 3 = 0")
    incoming = docs.filter("doc_id % 3 <> 0")

    # corpus pre-seeded with the index half (fingerprint column = the
    # dedup index, curate_stream's one-sink convention)
    corpus = str(tmp_path / "corpus")
    tx.with_fingerprint(index).write.parquet(corpus)
    feed1 = str(tmp_path / "feed1")
    incoming.write.parquet(feed1)
    jobs.curate_stream(spark, feed1, corpus, str(tmp_path / "ck1"),
                       glob="*.parquet")
    seeded = {r["doc_id"] for r in index.select("doc_id").collect()}
    se_survivors = {r["doc_id"] for r in
                    spark.read.parquet(corpus).select("doc_id").collect()
                    } - seeded

    # winnow index pre-seeded from the index half; feed = the
    # quality+exact survivors (the row's pipeline order)
    widx = str(tmp_path / "widx")
    (dd.winnow_fingerprints(index, k=3, w=4)
     .select(F.col("id").alias("doc_id"), "fp").distinct()
     .write.parquet(widx))
    feed2 = str(tmp_path / "feed2")
    incoming.filter(F.col("doc_id").isin(list(se_survivors))) \
        .write.parquet(feed2)
    jobs.maintain_winnow_index(spark, feed2, widx,
                               str(tmp_path / "ck2"), glob="*.parquet",
                               k=3, w=4, min_shared=2)
    # a doc with <k+w-1 tokens yields no fingerprints: it survives the
    # screen (nothing to collide) but is unindexable, so the widx doc
    # set under-represents survivors by exactly those docs
    with_fp = {r["id"] for r in
               dd.winnow_fingerprints(
                   incoming.filter(F.col("doc_id").isin(
                       list(se_survivors))), k=3, w=4)
               .select("id").distinct().collect()}
    no_fp = se_survivors - with_fp
    final = ({r["doc_id"] for r in
              spark.read.parquet(widx).select("doc_id").distinct()
              .collect()} - seeded) | no_fp

    # the streaming composition's survivor set, aggregated the row's way
    surv_docs = incoming.filter(F.col("doc_id").isin(list(final)))
    want = {(r["source"], r["n_survivors"], r["id_sum"]) for r in
            surv_docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_survivors"),
                 F.sum("doc_id").alias("id_sum")).collect()}
    got = {(r["source"], r["n_survivors"], r["id_sum"]) for r in
           q_curated_survivors(spark, sf_dir).collect()}
    assert got == want


def test_curate_stream_trigram_gate(spark, sf_dir, tmp_path):
    """The CCNet perplexity stage wired into the ACTUAL streaming
    curation job (r12, VERDICT r11 item 6): curate_stream with
    ``lm_gate=trigram_gate(train, min_logp)`` must keep exactly the
    docs that (a) pass the quality rules, (b) score ≥ min_logp under
    the corpus-trained trigram LM — the same scores the graded
    trigram_lm/trigram_buckets rows pin — and (c) survive dedup, i.e.
    the batch composition of the three stages."""
    from activecube_graphql_spark.operators import text as tx
    from activecube_graphql_spark.operators.dedup import exact_dedup
    from activecube_graphql_spark.streaming import jobs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    train = docs.filter("doc_id % 2 = 0")
    # pick the corpus-median score as the cut so the gate genuinely
    # drops a nonempty, non-total subset whatever the fixture
    scores = tx.trigram_logprob(docs, train=train)
    cut = sorted(r["avg_logp3"] for r in scores.collect())[
        scores.count() // 2]

    out = str(tmp_path / "curated_gated")
    jobs.curate_stream(spark, sf_dir, out, str(tmp_path / "ckg"),
                       lm_gate=tx.trigram_gate(train, cut))
    got = {r["doc_id"] for r in
           spark.read.parquet(out).select("doc_id").collect()}

    kept = (tx.with_quality_rules(docs).filter("keep")
            .select(*docs.columns))
    gated = tx.trigram_gate(train, cut)(kept)
    want = {r["doc_id"] for r in
            exact_dedup(tx.with_fingerprint(gated), ["fingerprint"],
                        "doc_id").select("doc_id").collect()}
    assert got == want
    # the gate actually fired: some rule-passing docs were dropped
    n_kept = kept.count()
    assert 0 < len(got) < n_kept


def test_curate_stream_multi_batch_dedup_holds(spark, sf_dir, tmp_path):
    """With maxFilesPerTrigger=1 the feed arrives over SEVERAL
    micro-batches; cross-batch dedup must still hold: one survivor per
    distinct fingerprint, and the surviving fingerprint SET equals the
    batch composition's (fingerprints are arrival-order-invariant even
    where survivor ids are first-arrival-wins)."""
    from activecube_graphql_spark.streaming import jobs
    from activecube_graphql_spark.operators import text as tx
    src = str(tmp_path / "feed")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    out = str(tmp_path / "curated")
    jobs.curate_stream(spark, src, out, str(tmp_path / "ck1"),
                       glob="*.parquet", max_files_per_trigger=1)
    got = spark.read.parquet(out)
    n = got.count()
    assert got.select("fingerprint").distinct().count() == n
    kept = (tx.with_quality_rules(docs).filter("keep")
            .select(*docs.columns))
    want_fps = {r["fingerprint"] for r in
                tx.with_fingerprint(kept).select("fingerprint")
                .distinct().collect()}
    assert {r["fingerprint"] for r in
            got.select("fingerprint").collect()} == want_fps
    jobs.curate_stream(spark, src, out, str(tmp_path / "ck2"),
                       glob="*.parquet", max_files_per_trigger=1)
    assert spark.read.parquet(out).count() == n


def test_maintain_ivf_index_stream_extend_and_replay(spark, sf_dir,
                                                     tmp_path):
    """Streamed index maintenance: vectors arriving after the build are
    appended to their cells (searchable), and a full replay (fresh
    checkpoint, same feed) appends nothing."""
    from pyspark.sql import functions as F
    from activecube_graphql_spark.operators import similarity as sim
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seed = corpus.filter(F.col("vec_id") < 100)
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(seed, path, n_cells=4)
    n0 = spark.read.parquet(f"{path}/cells.parquet").count()

    feed = str(tmp_path / "feed" / "embeddings.parquet")
    corpus.filter(F.col("vec_id") >= 100).write.mode("overwrite") \
        .parquet(feed)
    jobs.maintain_ivf_index(spark, feed, path, str(tmp_path / "ck1"),
                            glob="*.parquet")
    n1 = spark.read.parquet(f"{path}/cells.parquet").count()
    assert n1 == corpus.count()     # every fed vector landed once
    assert n1 > n0
    jobs.maintain_ivf_index(spark, feed, path, str(tmp_path / "ck2"),
                            glob="*.parquet")
    assert spark.read.parquet(f"{path}/cells.parquet").count() == n1
    # a fed vector is findable at cosine ~1 via its own query
    probe = corpus.filter(F.col("vec_id") == 200)
    hit = sim.ivf_index_search(spark, path, probe, k=1, nprobe=1,
                               exclude_self=False).collect()
    assert hit and hit[0]["neighbor_id"] == 200 and \
        hit[0]["cosine"] >= 0.9999


def test_maintain_pq_store_stream_extend_replay_and_parity(spark,
                                                           sf_dir,
                                                           tmp_path):
    """Streamed PQ code-store maintenance (r12): vectors arriving
    after the build are encoded with the STORED codebooks and appended
    (searchable); a full replay (fresh checkpoint, same feed) appends
    nothing; and the persisted-store search is IDENTICAL to a one-shot
    pq_adc_topk over the same corpus with the same codebooks — the
    store changes the I/O layout, never the result."""
    from pyspark.sql import functions as F
    from activecube_graphql_spark.operators import similarity as sim
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    seed = corpus.filter(F.col("vec_id") < 100)
    path = str(tmp_path / "pq")
    cb = sim.pq_codebooks(8, 16, 64)
    n0 = sim.build_pq_store(spark, seed, path, codebooks=cb)
    assert n0 == seed.count()

    feed = str(tmp_path / "feed" / "embeddings.parquet")
    corpus.filter(F.col("vec_id") >= 100).write.mode("overwrite") \
        .parquet(feed)
    jobs.maintain_pq_store(spark, feed, path, str(tmp_path / "ck1"),
                           glob="*.parquet")
    n1 = spark.read.parquet(f"{path}/codes.parquet").count()
    assert n1 == corpus.count()     # every fed vector landed once
    jobs.maintain_pq_store(spark, feed, path, str(tmp_path / "ck2"),
                           glob="*.parquet")
    assert spark.read.parquet(f"{path}/codes.parquet").count() == n1

    queries = corpus.filter(F.col("vec_id") < 5)
    via_store = sim.pq_store_search(spark, path, queries, k=5)
    one_shot = sim.pq_adc_topk(corpus, queries, k=5, codebooks=cb)
    assert sorted(map(tuple, via_store.collect())) == \
        sorted(map(tuple, one_shot.collect()))


def test_maintain_winnow_index_screens_neardups_and_replays(spark,
                                                            tmp_path):
    """The streaming NEAR-dup index (r10): batch 1 indexes the base
    corpus; batch 2's near-copies (high-overlap mutations of indexed
    docs) are screened out while genuinely fresh docs survive; a full
    replay appends nothing; and the within-batch contract (intra-batch
    near-dups both survive — screening is vs the ACCUMULATED corpus) is
    pinned."""
    from activecube_graphql_spark.streaming import jobs

    src = tmp_path / "feed"
    src.mkdir()
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa"]

    def text(seed, n=24):
        return " ".join(words[(seed * 7 + j * 3) % 10] for j in range(n))

    import pandas as pd

    def write(path, rows):
        pd.DataFrame(rows, columns=["doc_id", "text"]).astype(
            {"doc_id": "int64"}).to_parquet(path, index=False)

    write(str(src / "batch1.parquet"), [(i, text(i)) for i in range(20)])
    idx = str(tmp_path / "widx")
    jobs.maintain_winnow_index(spark, str(src), idx,
                               str(tmp_path / "ck1"), glob="*.parquet")
    indexed1 = {r["doc_id"] for r in
                spark.read.parquet(idx).select("doc_id").distinct()
                .collect()}
    assert indexed1 == set(range(20))  # no intra-batch screening

    # batch 2: near-copies of docs 0/1 (one word changed ⇒ long shared
    # spans ⇒ guaranteed fingerprint collisions), two fresh docs, and
    # an intra-batch near-dup pair built from a fresh text
    # genuinely fresh word streams (the text() cycle has period 10, so
    # distinct seeds alone would just rotate an indexed doc)
    extra = ["lambda", "sigma", "tau", "phi", "chi", "psi", "omega",
             "rho", "xi", "pi", "upsilon"]
    fresh_a = " ".join(extra[(j * 5) % 11] for j in range(24))
    fresh_b = " ".join(extra[(j * 7 + 3) % 11] for j in range(24))
    nd = [(200, text(0).replace("alpha", "omega", 1)),
          (201, text(1).replace("beta", "omega", 1)),
          (202, fresh_a), (203, fresh_b),
          (204, fresh_b.replace("zeta", "omega", 1))]
    write(str(src / "batch2.parquet"), nd)
    jobs.maintain_winnow_index(spark, str(src), idx,
                               str(tmp_path / "ck1"), glob="*.parquet")
    indexed2 = {r["doc_id"] for r in
                spark.read.parquet(idx).select("doc_id").distinct()
                .collect()}
    assert 200 not in indexed2 and 201 not in indexed2  # screened
    assert {202, 203}.issubset(indexed2)                # fresh survive
    assert 204 in indexed2  # intra-batch near-dup: documented survivor

    # full at-least-once replay (fresh checkpoint, same data): no-op
    n = spark.read.parquet(idx).count()
    jobs.maintain_winnow_index(spark, str(src), idx,
                               str(tmp_path / "ck2"), glob="*.parquet")
    assert spark.read.parquet(idx).count() == n

    # partial-append crash (r10 review): rebuild the index with HALF of
    # doc 202's fingerprint rows missing — a crash inside the append's
    # commit — and replay; the fp-level guard must complete exactly the
    # missing rows instead of treating the doc as done
    full = spark.read.parquet(idx)
    fps202 = sorted(r["fp"] for r in
                    full.filter("doc_id = 202").collect())
    assert len(fps202) >= 2
    keep_fps = set(fps202[: len(fps202) // 2])
    idx2 = str(tmp_path / "widx_partial")
    (full.filter("doc_id <> 202").unionByName(
        full.filter("doc_id = 202")
        .filter(full["fp"].isin(list(keep_fps))))
     .write.parquet(idx2))
    jobs.maintain_winnow_index(spark, str(src), idx2,
                               str(tmp_path / "ck3"), glob="*.parquet")
    got202 = sorted(r["fp"] for r in spark.read.parquet(idx2)
                    .filter("doc_id = 202").collect())
    assert got202 == fps202          # completed, no duplicates
    assert (spark.read.parquet(idx2).count()
            == spark.read.parquet(idx).count())


def test_maintain_winnow_index_screens_per_pair_not_pooled(spark,
                                                           tmp_path):
    """ADVICE r10 (medium): the near-dup screen thresholds the shared
    fingerprint count per (doc, indexed-doc) PAIR — a doc sharing one
    incidental fingerprint each with TWO different indexed documents
    is NOT a near-dup of either and must survive, while a doc sharing
    min_shared fps with a single indexed doc is dropped.  The index is
    pre-seeded with exact fingerprints computed from the incoming doc,
    so the pooled-vs-per-pair distinction is deterministic."""
    import pandas as pd

    from activecube_graphql_spark.operators.dedup import (
        winnow_fingerprints,
    )
    from activecube_graphql_spark.streaming import jobs

    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "mu nu omicron pi sigma tau upsilon phi chi psi")
    batch = spark.createDataFrame([(500, text)], "doc_id long, text string")
    fps = sorted(r["fp"] for r in winnow_fingerprints(
        batch, id_col="doc_id", k=3, w=4).select("fp").distinct()
        .collect())
    assert len(fps) >= 3  # need >= min_shared distinct fps to plant

    src = tmp_path / "feed"
    src.mkdir()
    pd.DataFrame([(500, text)], columns=["doc_id", "text"]).astype(
        {"doc_id": "int64"}).to_parquet(
        str(src / "b.parquet"), index=False)

    # scattered case: docs 1 and 2 hold ONE of the incoming doc's fps
    # each (pooled count 2 = min_shared, per-pair count 1) -> survive
    idx_scatter = str(tmp_path / "idx_scatter")
    spark.createDataFrame([(1, fps[0]), (2, fps[1])],
                          "doc_id long, fp long").write.parquet(
        idx_scatter)
    jobs.maintain_winnow_index(spark, str(src), idx_scatter,
                               str(tmp_path / "ck_s"), glob="*.parquet",
                               min_shared=2)
    assert 500 in {r["doc_id"] for r in
                   spark.read.parquet(idx_scatter).collect()}

    # concentrated case: doc 1 holds TWO of the fps (per-pair count 2
    # >= min_shared) -> screened out
    idx_conc = str(tmp_path / "idx_conc")
    spark.createDataFrame([(1, fps[0]), (1, fps[1])],
                          "doc_id long, fp long").write.parquet(idx_conc)
    jobs.maintain_winnow_index(spark, str(src), idx_conc,
                               str(tmp_path / "ck_c"), glob="*.parquet",
                               min_shared=2)
    assert 500 not in {r["doc_id"] for r in
                       spark.read.parquet(idx_conc).collect()}


def test_trigram_gate_kn_smoothing(spark, sf_dir):
    """r16: the KN smoothing option behind the same gate surface —
    keeps exactly the docs whose modified-KN score clears the cut,
    passes caller columns through unchanged, and rejects unknown
    smoothing names loudly."""
    import pytest

    from activecube_graphql_spark.operators import text as tx

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .limit(200))
    train = docs.filter("doc_id % 2 = 0")
    hold = docs.filter("doc_id % 2 = 1")
    scores = tx.trigram_kn_logprob(hold, train=train)
    vals = sorted(r["avg_kn"] for r in scores.collect())
    cut = vals[len(vals) // 2]
    got = tx.trigram_gate(train, cut, smoothing="kn")(hold)
    assert got.columns == hold.columns
    want = {r["doc_id"] for r in
            scores.filter(F.col("avg_kn") >= cut).collect()}
    assert {r["doc_id"] for r in got.collect()} == want
    assert 0 < len(want) < hold.count()
    with pytest.raises(ValueError, match="smoothing"):
        tx.trigram_gate(train, cut, smoothing="katz")

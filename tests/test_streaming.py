"""Streaming twins (SURVEY §5.2 item 5): each Structured Streaming job,
drained with Trigger.AvailableNow into a memory sink, must agree with its
batch-mode twin on the same fixture data.
"""

from __future__ import annotations

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

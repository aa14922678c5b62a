"""WARC record walk (operators/warc.py, r14 — VERDICT r13 item 4).
Framing hazards pinned host-side; the graded row (warc_records)
covers the Spark chain + oracle."""

from __future__ import annotations

import pytest

from activecube_graphql_spark.operators import warc as W


def _member() -> bytes:
    # request body plants WARC magic AND CRLF-CRLF sequences: only a
    # Content-Length walk frames this member correctly
    decoy = (b"GET / HTTP/1.1\r\nHost: h\r\n\r\n"
             b"WARC/1.0\r\nWARC-Type: response\r\n"
             b"Content-Length: 0\r\n\r\n\r\n\r\ndecoy")
    resp = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>"
    return W.encode_warc([
        {"type": "warcinfo", "payload": b"software: t\r\n"},
        {"type": "request", "uri": "http://a.com/", "payload": decoy},
        {"type": "response", "uri": "http://a.com/", "payload": resp},
    ])


def test_roundtrip_and_decoy_framing():
    recs = W.parse_warc(_member())
    assert [r["type"] for r in recs] == ["warcinfo", "request",
                                         "response"]
    assert recs[1]["payload"].endswith(b"decoy")
    status, hdrs, body = W.split_http_response(recs[2]["payload"])
    assert status == 200
    assert hdrs["content-type"] == "text/html"
    assert body == b"<p>hi</p>"


def test_parse_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        W.parse_warc(b"NOTW/1.0\r\n\r\n\r\n\r\n")


def test_parse_rejects_truncation():
    data = _member()
    with pytest.raises(ValueError):
        W.parse_warc(data[:-10])
    # truncated payload (Content-Length reaches past the end)
    head = data[:data.index(b"\r\n\r\n") + 4]
    with pytest.raises(ValueError, match="truncated|separator"):
        W.parse_warc(head[:-4] + b"\r\n\r\n")


def test_parse_rejects_missing_separator():
    rec = W.encode_warc([{"type": "warcinfo", "payload": b"x"}])
    # drop the record separator after the payload
    with pytest.raises(ValueError, match="separator"):
        W.parse_warc(rec[:-4] + b"EXTRA-GARBAGE-NO-SEP")


def test_parse_rejects_bad_content_length():
    bad = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
           b"Content-Length: nope\r\n\r\nx\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_warc(bad)
    missing = b"WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\n\r\n\r\n"
    with pytest.raises(ValueError, match="Content-Length"):
        W.parse_warc(missing)


def test_http_split_rejects_malformed():
    with pytest.raises(ValueError, match="terminator"):
        W.split_http_response(b"HTTP/1.1 200 OK\r\nno-end")
    with pytest.raises(ValueError, match="status"):
        W.split_http_response(b"GARBAGE\r\n\r\nbody")


def test_warc_responses_df(spark):
    df = spark.createDataFrame([(7, bytearray(_member()))],
                               "doc_id long, payload binary")
    out = W.warc_responses(df, "payload").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_id"], r["status"], r["n_records"]) == (7, 200, 3)
    assert r["url"] == "http://a.com/"
    assert r["body"] == "<p>hi</p>"
    plan = (W.warc_responses(df, "payload")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_warc_extracted_equals_chained(spark):
    """The r16 fused walk+extraction pass is ROW-IDENTICAL to the
    chained warc_responses -> htmltext.extract_text_df form (same
    pure-python kernels, one Arrow crossing instead of two) and stays
    a single map-only stage."""
    from activecube_graphql_spark.operators import htmltext as ht

    html_a = ("<html><body><div>" + "real content sentence here. " * 4
              + "</div><div><a href='/x'>nav nav nav</a></div>"
              + "<p>short</p></body></html>")
    html_b = ("<html><body><p>" + "another long paragraph of text. " * 5
              + "</p><ul><li><a href='/y'>l</a></li></ul></body></html>")
    members = [
        (1, "s1", bytearray(W.encode_warc([
            {"type": "warcinfo", "payload": b"software: t\r\n"},
            {"type": "response", "uri": "http://a.com/1",
             "payload": b"HTTP/1.1 200 OK\r\n\r\n"
                        + html_a.encode("utf-8")},
        ]))),
        (2, "s2", bytearray(W.encode_warc([
            {"type": "response", "uri": "http://b.com/2",
             "payload": b"HTTP/1.1 404 NF\r\n\r\n"
                        + html_b.encode("utf-8")},
            {"type": "response", "uri": "http://b.com/3",
             "payload": b"HTTP/1.1 200 OK\r\n\r\n<p>tiny</p>"},
        ]))),
    ]
    df = spark.createDataFrame(
        members, "doc_id long, source string, payload binary")

    fused = W.warc_extracted(df, "payload", carry=("doc_id", "source"))
    chained = ht.extract_text_df(
        W.warc_responses(df, "payload", carry=("doc_id", "source")),
        "body", carry=("doc_id", "source"))

    cols = ["doc_id", "source", "text", "n_blocks", "n_kept"]
    got = sorted(map(tuple, fused.select(*cols).collect()))
    want = sorted(map(tuple, chained.select(*cols).collect()))
    assert got == want and len(got) == 3
    # the fused form also carries the walk's record metadata
    meta = {(r["doc_id"], r["url"]): (r["status"], r["n_records"])
            for r in fused.collect()}
    assert meta[(1, "http://a.com/1")] == (200, 2)
    assert meta[(2, "http://b.com/2")] == (404, 2)

    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_warc_synth_fused_equals_chained(spark):
    """The r17 fused synthesis+walk+extraction pass behind
    warc_pipeline is ROW-IDENTICAL to the chained
    warc_extracted(_warc_assets(...)) form (same encode/parse/extract
    kernels, the payload never crossing the Python boundary) and is a
    single map-only stage."""
    from activecube_graphql_spark.driver_queries import (
        _warc_assets, _warc_extracted_synth)

    sf = "/root/testdata/sf0.001"
    fused = _warc_extracted_synth(spark, sf)
    chained = W.warc_extracted(_warc_assets(spark, sf), "payload",
                               carry=("doc_id", "source"))
    cols = ["doc_id", "source", "url", "status", "n_records",
            "text", "n_blocks", "n_kept"]
    got = sorted(map(tuple, fused.select(*cols).collect()))
    want = sorted(map(tuple, chained.select(*cols).collect()))
    assert got == want and got

    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan

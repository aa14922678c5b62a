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

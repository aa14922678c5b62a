"""URL canonicalization (operators/web.py, r13) — the crawl-side
dedup ops. Pins the one-source-of-truth property (DataFrame path ≡
SQL rendering ≡ DuckDB rendering) and the canonical-form policy on
hand-picked hazards."""

from __future__ import annotations

import duckdb
import pytest

from activecube_graphql_spark.operators import web

CASES = [
    # (raw, scheme, host, path, canon)
    ("HTTP://WWW.Ex.COM:80/A/b/?b=2&a=1#f", "http", "ex.com", "/A/b",
     "http://ex.com/A/b?a=1&b=2"),
    ("https://ex.com:443/x", "https", "ex.com", "/x",
     "https://ex.com/x"),
    ("https://ex.com:8080/x", "https", "ex.com", "/x",
     "https://ex.com:8080/x"),
    # 443 is NOT http's default: kept
    ("http://ex.com:443/x", "http", "ex.com", "/x",
     "http://ex.com:443/x"),
    ("HtTpS://CDN.Sub.Ex.ORG", "https", "cdn.sub.ex.org", "/",
     "https://cdn.sub.ex.org/"),
    ("http://ex.com#only-frag", "http", "ex.com", "/",
     "http://ex.com/"),
    ("http://ex.com/?z=1&a=2&m=3", "http", "ex.com", "/",
     "http://ex.com/?a=2&m=3&z=1"),
    ("http://www.ex.com///", "http", "ex.com", "/",
     "http://ex.com/"),
    # r14: RFC 3986 §6.2.2.2 — unreserved escapes decode (both hex
    # cases); reserved escapes (%2F) survive literally
    ("http://ex.com/Pa%74h/%7e%2Duser", "http", "ex.com",
     "/Path/~-user", "http://ex.com/Path/~-user"),
    ("http://ex.com/a%2Fb", "http", "ex.com", "/a%2Fb",
     "http://ex.com/a%2Fb"),
]


def test_url_canonical_policy(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, *_) in
                                enumerate(CASES)], "i long, url string")
    got = {r["i"]: r for r in web.canonicalize_urls(df, "url").collect()}
    for i, (raw, scheme, host, path, canon) in enumerate(CASES):
        r = got[i]
        assert (r["scheme"], r["host"], r["path"], r["canon_url"]) \
            == (scheme, host, path, canon), raw


def test_url_steps_single_source_of_truth(spark):
    """The DataFrame path, the Spark-SQL rendering, and the DuckDB
    rendering of URL_STEPS must agree row-for-row — drift between the
    graded engine path and its oracle is impossible only if all three
    stay one artifact."""
    rows = [(i, raw) for i, (raw, *_) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i long, url string")
    df.createOrReplaceTempView("urls_v")
    api = {r["i"]: (r["scheme"], r["host"], r["path"], r["canon_url"],
                    r["domain"])
           for r in web.canonicalize_urls(df, "url").collect()}
    sql = ("SELECT i, scheme, host, path, canon_url, domain FROM "
           + web.canon_steps_sql("spark", "SELECT * FROM urls_v"))
    via_sql = {r["i"]: tuple(r[1:]) for r in spark.sql(sql).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE urls_v AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{u}')" for i, u in rows)
                + ") t(i, url)")
    dsql = ("SELECT i, scheme, host, path, canon_url, domain FROM "
            + web.canon_steps_sql("duckdb", "SELECT * FROM urls_v"))
    via_duck = {r[0]: tuple(r[1:]) for r in con.sql(dsql).fetchall()}
    assert api == via_sql == via_duck


def test_domain_counts_rollup_and_plan(spark):
    """Per-domain rollup: the n_urls/n_canonical gap counts the
    canonicalization dedup win; the plan stays UDF-free (whole-stage
    string algebra) with the only exchanges belonging to the
    domain-keyed aggregate."""
    rows = [
        (0, "http://www.a.com/x?b=2&a=1"),
        (1, "HTTP://A.COM/x?a=1&b=2"),       # same canon as 0? no: www
        (2, "http://a.com/x/?a=1&b=2"),      # == 1 after slash strip
        (3, "https://b.org:443/y"),
        (4, "https://b.org/y#frag"),         # == 3
    ]
    df = spark.createDataFrame(rows, "i long, url string")
    out = {r["domain"]: r for r in
           web.domain_counts(df, "url").collect()}
    assert out["a.com"]["n_urls"] == 3
    assert out["a.com"]["n_canonical"] == 1   # all collapse
    assert out["a.com"]["n_https"] == 0
    assert out["b.org"]["n_urls"] == 2
    assert out["b.org"]["n_canonical"] == 1
    assert out["b.org"]["n_https"] == 2
    plan = (web.domain_counts(df, "url")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_url_psl_snapshot_domains(spark):
    """r14 (VERDICT r13 item 6): the registered domain resolves through
    the vendored PSL snapshot — ccTLD second-levels and private-section
    platform suffixes group at the right level; suffixes outside the
    snapshot take the documented last-two-labels fallback."""
    cases = [
        ("http://example.co.uk/x", "example.co.uk"),
        ("http://www.deep.sub.example.co.uk/x", "example.co.uk"),
        ("https://shop.example.com.au/", "example.com.au"),
        ("https://user.github.io/repo", "user.github.io"),
        ("https://cdn.user.github.io/repo", "user.github.io"),
        ("http://example.com/x", "example.com"),
        ("http://a.b.example.org/", "example.org"),
        # US locality regular tier (r15): k12/cc/lib.<state>.us are
        # public suffixes -> one more label registers
        ("http://school.k12.va.us/", "school.k12.va.us"),
        ("http://www.district.k12.ca.us/x", "district.k12.ca.us"),
        ("http://books.lib.tx.us/", "books.lib.tx.us"),
        # city-name locality tier stays out of the snapshot ->
        # documented fallback (last two labels)
        ("http://cityhall.boston.ma.us/", "ma.us"),
        # host IS a bare suffix: no extra label to match -> fallback
        ("http://co.uk/", "co.uk"),
        # r16 (ADVICE r15): www over a MULTI-LABEL public suffix —
        # the 'www' is the registrable label per the PSL algorithm,
        # so the strip must NOT fire and the domain keeps it
        ("http://www.co.uk/", "www.co.uk"),
        ("https://WWW.com.bd/", "www.com.bd"),
        ("http://www.k12.va.us/", "www.k12.va.us"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in
                                enumerate(cases)], "i long, url string")
    got = {r["i"]: r["domain"] for r in
           web.canonicalize_urls(df, "url").collect()}
    for i, (u, dom) in enumerate(cases):
        assert got[i] == dom, u


def test_url_psl_wildcard_and_exception_rules(spark):
    """r15 (VERDICT r14 item 8): PSL wildcard rules (*.ck — every
    label under the base is a public suffix, so the registered domain
    is two labels + base) and exception rules (!www.ck — the domain
    itself, carved out of its wildcard), including the multi-label
    pair *.kawasaki.jp / !city.kawasaki.jp, with the PSL precedence
    exception > wildcard > snapshot > fallback."""
    cases = [
        # *.ck: public suffix is shop.ck -> one more label registers
        ("http://example.shop.ck/x", "example.shop.ck"),
        ("http://deep.sub.example.shop.ck/", "example.shop.ck"),
        # !www.ck: www.ck is NOT a suffix — it IS the domain
        ("http://www.ck/", "www.ck"),
        ("http://mail.www.ck/inbox", "www.ck"),
        # *.bd (the real PSL form; explicit bd entries superseded)
        ("https://site.com.bd/", "site.com.bd"),
        ("https://a.site.gov.bd/", "site.gov.bd"),
        # multi-label wildcard + its exception
        ("http://x.minami.kawasaki.jp/", "x.minami.kawasaki.jp"),
        ("http://city.kawasaki.jp/", "city.kawasaki.jp"),
        ("http://app.city.kawasaki.jp/", "city.kawasaki.jp"),
        # bare wildcard suffix: no registered domain -> fallback
        ("http://shop.ck/", "shop.ck"),
        # r16 (ADVICE r15): www over a bare WILDCARD suffix — www is
        # the registrable label (the !www.ck exception covers only
        # www.ck itself, not www.<other>.ck)
        ("http://www.shop.ck/", "www.shop.ck"),
        # ... but www over the EXCEPTION domain still strips: the
        # remainder www.ck is a registrable domain, not a suffix
        ("http://www.www.ck/", "www.ck"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in
                                enumerate(cases)], "i long, url string")
    got = {r["i"]: r["domain"] for r in
           web.canonicalize_urls(df, "url").collect()}
    for i, (u, dom) in enumerate(cases):
        assert got[i] == dom, u
    # the two tiers render portably: DuckDB agrees row-for-row
    import duckdb

    from tools.verify_local import rows_multiset  # noqa: F401
    src = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{u}')" for i, (u, _) in enumerate(cases)
    ) + ") AS t(i, url)"
    sql = ("SELECT i, domain FROM "
           + web.canon_steps_sql("duckdb", src))
    for i, dom in duckdb.sql(sql).fetchall():
        assert dom == cases[i][1], cases[i][0]


def test_url_pct_case_normalization(spark):
    """r15 (RFC 3986 §6.2.2.1): escapes that survive unreserved
    decoding case-normalize to uppercase hex — '%2f' ≡ '%2F' — so
    both spellings reach ONE canonical URL; unreserved escapes still
    decode regardless of case; non-escape '%' text is untouched
    (single-pass by construction: the split-on-'%' fixer never
    re-reads its own output, unlike a replace chain). DuckDB agrees
    through the same portable fragment."""
    import duckdb

    cases = [
        ("http://a.com/x%2fy", "/x%2Fy"),
        ("http://a.com/x%2Fy", "/x%2Fy"),
        ("http://a.com/x%aF%3d", "/x%AF%3D"),
        # unreserved still decodes (either case), reserved uppercases
        ("http://a.com/%74x%3f", "/tx%3F"),
        # bare %-text without hex digits is untouched
        ("http://a.com/100%25y%zz", "/100%25y%zz"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _) in
                                enumerate(cases)], "i long, url string")
    got = {r["i"]: r["path"] for r in
           web.canonicalize_urls(df, "url").collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, u
    assert got[0] == got[1]  # the two spellings collapse
    src = "SELECT * FROM (VALUES " + ", ".join(
        f"({i}, '{u}')" for i, (u, _) in enumerate(cases)
    ) + ") AS t(i, url)"
    sql = "SELECT i, path FROM " + web.canon_steps_sql("duckdb", src)
    for i, path in duckdb.sql(sql).fetchall():
        assert path == cases[i][1], cases[i][0]


def test_url_psl_fallback_documented():
    """The fallback remains the documented APPROXIMATION for suffixes
    outside the snapshot, and the snapshot is longest-first so both
    regex engines resolve the longest suffix."""
    assert "APPROXIMATION" in web.__doc__
    frag = dict(web.URL_STEPS)["domain"]
    assert "[^.]+[.][^.]+" in frag  # the fallback arm
    from activecube_graphql_spark.operators.psl import PSL_SNAPSHOT
    counts = [s.count(".") for s in PSL_SNAPSHOT]
    assert counts == sorted(counts, reverse=True)


def test_url_canonicalize_collision_guard(spark):
    """ADVICE r13: an input that already carries a step-column name
    must fail loudly, not produce ambiguous duplicate columns."""
    df = spark.createDataFrame([(1, "http://a.com/", "x")],
                               "i long, url string, host string")
    with pytest.raises(ValueError, match="host"):
        web.canonicalize_urls(df, "url")


def test_url_steps_fuzz_cross_engine(spark):
    """r15 hardening: RANDOM messy URLs — mixed-case schemes/hosts,
    www prefixes, every PSL regime's suffix, ports, percent-escapes
    in both cases (valid AND malformed), query params, fragments,
    empty segments — must canonicalize row-identically on the Spark
    chain and the DuckDB oracle rendering. The fixed CASES pin known
    policy; this pins the cross-engine contract over the
    combinatorial geometry the fixture tables never reach."""
    import random

    import duckdb

    rng = random.Random(0xC0FFEE)
    schemes = ["http", "HTTP", "https", "HtTpS"]
    prefixes = ["", "www.", "WWW.cdn.", "m."]
    suffixes = ["com", "co.uk", "github.io", "shop.ck", "www.ck",
                "minami.kawasaki.jp", "city.kawasaki.jp", "k12.va.us",
                "boston.ma.us", "ac.zm", "com.bd"]
    paths = ["", "/", "/A/b", "/a//b/", "/x%2fy", "/x%2Fy", "/Pa%74h",
             "/%7a%5A", "/100%25", "/%7%41", "/p%zzq", "/a%aFb"]
    ports = ["", ":80", ":443", ":8080"]
    queries = ["", "?b=2&a=1", "?a=1&b=2", "?x"]
    frags = ["", "#F", "#a%2f"]
    rows = []
    chosen_path = {}
    for i in range(120):
        p = rng.choice(paths)
        u = (rng.choice(schemes) + "://" + rng.choice(prefixes)
             + "host" + str(rng.randrange(3)) + "."
             + rng.choice(suffixes) + rng.choice(ports)
             + p + rng.choice(queries)
             + rng.choice(frags))
        rows.append((i, u))
        chosen_path[i] = p
    df = spark.createDataFrame(rows, "i long, url string")
    api = {r["i"]: (r["scheme"], r["host"], r["path"], r["canon_url"],
                    r["domain"])
           for r in web.canonicalize_urls(df, "url").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE urls_v AS SELECT * FROM (VALUES "
                + ",".join(f"({i}, '{u}')" for i, u in rows)
                + ") t(i, url)")
    dsql = ("SELECT i, scheme, host, path, canon_url, domain FROM "
            + web.canon_steps_sql("duckdb", "SELECT * FROM urls_v"))
    via_duck = {r[0]: tuple(r[1:]) for r in con.sql(dsql).fetchall()}
    assert api == via_duck
    # spot-pin the r15 escape case-normalization inside the fuzz
    # domain (ADVICE r15: the old disjunct form was vacuous for
    # lowercase-only inputs) — a lowercase reserved escape in the PATH
    # must surface as uppercase %2F in the canonical path, never %2f
    pinned = 0
    for i, u in rows:
        if "%2f" in chosen_path[i]:
            assert "%2F" in api[i][2] and "%2f" not in api[i][2], (
                u, api[i][2])
            pinned += 1
    assert pinned > 0  # the fuzz domain actually exercises the case

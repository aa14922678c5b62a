"""HTML→text extraction (operators/htmltext.py, r14 — VERDICT r13
item 3). Parser hazards pinned host-side; the graded row
(html_extract) covers the Spark path + oracle."""

from __future__ import annotations

from activecube_graphql_spark.operators import htmltext as ht


def test_entities_named_numeric():
    assert ht.decode_entities("a &amp; b &lt;c&gt; &#65;&#x42;") \
        == "a & b <c> AB"
    # unknown names pass through verbatim (tolerant-parser rule)
    assert ht.decode_entities("&bogus; &#xZZ;") == "&bogus; &#xZZ;"


def test_script_style_head_comment_removal():
    html = ('<head><title>T</title></head>'
            '<script>var s = "</p> fake < tag";</script>'
            '<style>p{}</style>'
            '<!-- <p>hidden</p> -->'
            '<p>real content that is long enough to keep around</p>')
    r = ht.extract_text(html)
    assert r["text"] == "real content that is long enough to keep around"
    assert r["n_blocks"] == 1 and r["n_kept"] == 1


def test_entities_decode_after_tag_strip():
    # &lt;p&gt; must never resurrect as markup
    html = "<p>compare &lt;p&gt; against a literal tag in prose here</p>"
    r = ht.extract_text(html)
    assert "<p>" in r["text"] and r["n_kept"] == 1


def test_link_density_drops_boilerplate():
    nav = ('<ul><li><a href="/">Home</a></li>'
           '<li><a href="/x">About the whole project</a></li></ul>')
    main = "<p>main content block with plenty of ordinary prose text</p>"
    links = ('<div><a href="/a">read the documentation pages</a> '
             '<a href="/b">browse the archive index</a></div>')
    r = ht.extract_text(nav + main + links)
    assert r["n_kept"] == 1
    assert r["text"].startswith("main content")
    # the links block is long enough — ONLY density drops it
    blocks = ht.extract_blocks(links)
    assert len(blocks) == 1
    text, lc = blocks[0]
    assert len(text) >= 25 and lc / len(text) > 0.33


def test_min_len_drops_headings():
    r = ht.extract_text("<h1>Short title</h1><p>a body paragraph long "
                        "enough to clear the length rule</p>")
    assert r["n_blocks"] == 2 and r["n_kept"] == 1


def test_whitespace_collapse_and_inline_tags():
    html = "<p>alpha  <em> beta </em>\n\t gamma</p>"
    blocks = ht.extract_blocks(html)
    assert blocks == [("alpha beta gamma", 0)]


def test_extract_df_feeds_quality_stage(spark):
    """The curation surface accepts HTML end-to-end: extraction output
    plugs straight into the existing text-quality signals."""
    from pyspark.sql import functions as F

    rows = [(1, '<nav><a href="/">Home</a></nav>'
                '<p>the quick brown fox jumps over the lazy dog today</p>'),
            (2, '<p>tiny</p>')]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    out = ht.extract_text_df(df, "html", carry=("doc_id",))
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[1]["n_kept"] == 1 and got[2]["n_kept"] == 0
    # downstream quality signal over the extracted text
    q = out.select("doc_id", F.length("text").alias("n_chars"))
    lens = {r["doc_id"]: r["n_chars"] for r in q.collect()}
    assert lens[1] > 0 and lens[2] == 0


def test_extract_df_plan_map_only(spark):
    """Zero-exchange plan pin: scan -> project(html synth) ->
    mapInPandas, nothing else."""
    df = spark.createDataFrame([(1, "<p>x</p>")],
                               "doc_id long, html string")
    plan = (ht.extract_text_df(df, "html")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "MapInPandas" in plan

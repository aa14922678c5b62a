"""Validation for the LLM-pipeline operators that can't be hash-checked
against a SQL oracle (SURVEY §5.2 item 4): MinHash-LSH vs exact Jaccard,
LSH-ANN recall vs brute force, SimHash hamming vs near-dup ground truth.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_MED, SF_SMALL

from pyspark.sql import functions as F

from activecube_graphql_spark.operators import dedup as dd
from activecube_graphql_spark.operators import similarity as sim
from activecube_graphql_spark.operators import text as tx


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _embeds(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_exact_dedup_deterministic_survivor(spark, sf_dir):
    df = _docs(spark, sf_dir)
    out = dd.exact_dedup(df, ["lang", "source"], "doc_id")
    expected = (df.groupBy("lang", "source").agg(F.min("doc_id").alias("doc_id"))
                .select("doc_id"))
    got = {r[0] for r in out.select("doc_id").collect()}
    want = {r[0] for r in expected.collect()}
    assert got == want


def test_minhash_estimates_jaccard(spark, sf_dir):
    """MinHash-LSH pairs at threshold τ must (a) recover most exact-Jaccard
    pairs ≥ τ+0.1 and (b) estimate Jaccard within ±0.2 on shared pairs."""
    df = _docs(spark, sf_dir)
    exact = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dd.ngram_jaccard_pairs(df, n=2, threshold=0.4).collect()}
    est = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in dd.minhash_lsh_pairs(df, n=2, num_perm=64, bands=16,
                                         threshold=0.4).collect()}
    strong = {k for k, v in exact.items() if v >= 0.5}
    assert strong, "fixture should contain planted near-dups"
    recall = len(strong & set(est)) / len(strong)
    assert recall >= 0.9, f"LSH recall {recall} too low"
    for k in strong & set(est):
        assert abs(est[k] - exact[k]) <= 0.2


def test_exact_family_candidate_mass_guard(spark, sf_dir):
    """VERDICT r14 item 9: the exact Jaccard/containment family must
    refuse LOUDLY (with the minhash pointer) when the projected join
    mass exceeds the bound, instead of silently running an Ω(docs²)
    job — and the graded configurations must pass the default bound."""
    df = _docs(spark, sf_dir)
    # a bound of 1 row is exceeded by any corpus with one shared
    # prefix shingle — the guard fires before the join is built
    with pytest.raises(ValueError, match="minhash_lsh_verified"):
        dd.ngram_jaccard_pairs(df, n=2, threshold=0.5,
                               strategy="index", max_candidate_mass=1.0)
    with pytest.raises(ValueError, match="minhash_lsh_verified"):
        dd.ngram_containment_pairs(df, n=3, threshold=0.5, max_df=100,
                                   max_candidate_mass=1.0)
    # float('inf') disables the guard for measured oracle duty
    assert dd.ngram_jaccard_pairs(
        df, n=2, threshold=0.9, strategy="index",
        max_candidate_mass=float("inf")).count() >= 0
    # the duplicate-heavy regime the guard exists for: every doc in a
    # clone group shares EVERY shingle, so prefix-df == group size and
    # the projected mass is groups · size² — a tight bound trips it
    clones = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta") for i in range(40)],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="candidate mass"):
        dd.ngram_jaccard_pairs(clones, n=2, threshold=0.5,
                               strategy="index", max_candidate_mass=500.0)


def test_simhash_near_dups_have_small_hamming(spark, sf_dir):
    """Planted near-dup pairs (Jaccard ≥ 0.8) must sit within hamming ≤ 16
    of each other; random pairs should average ~32."""
    df = _docs(spark, sf_dir)
    pairs = dd.ngram_jaccard_pairs(df, n=2, threshold=0.8)
    sh = dd.with_simhash(df).select("doc_id", "simhash")
    joined = (pairs
              .join(sh.toDF("id_a", "sh_a"), "id_a")
              .join(sh.toDF("id_b", "sh_b"), "id_b")
              .withColumn("hamming",
                          dd.simhash_hamming(F.col("sh_a"), F.col("sh_b"))))
    rows = joined.collect()
    assert rows, "expected some Jaccard>=0.8 pairs"
    assert all(r["hamming"] <= 16 for r in rows), rows


def test_simhash_neardup_pairs_complete_vs_brute_force(spark, sf_dir):
    """Banded-segment candidate generation is pigeonhole-COMPLETE for
    hamming < bands: the bucketed operator must return exactly the
    brute-force pair set, for both hash functions and band layouts."""
    df = _docs(spark, sf_dir)
    for hash_fn in ("xxhash64", "md5"):
        sh = dd.with_simhash(df, hash_fn=hash_fn, key_col="doc_id") \
               .select("doc_id", "simhash")
        a, b = sh.toDF("id_a", "sh_a"), sh.toDF("id_b", "sh_b")
        for k, bands in ((1, 2), (3, 4)):
            brute = {(r["id_a"], r["id_b"], r["h"]) for r in
                     (a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
                      .withColumn("h", dd.simhash_hamming(
                          F.col("sh_a"), F.col("sh_b")))
                      .filter(F.col("h") <= k).collect())}
            got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
                   dd.simhash_neardup_pairs(df, k=k, bands=bands,
                                            hash_fn=hash_fn).collect()}
            assert got == brute, (hash_fn, k, bands)


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    """IVF ANN with nprobe=6/16 cells probes ~3/8 of the corpus; on gaussian
    vectors the true neighbors concentrate in the query's nearest cells, so
    recall should be well above the probed fraction."""
    corpus = _embeds(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 20)
    brute = sim.cosine_topk(corpus, queries, k=5)
    ann = sim.ivf_ann_topk(corpus, queries, k=5, n_cells=16, nprobe=6)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    assert a, "IVF ANN returned nothing"
    recall = len(a & b) / len(b)
    assert recall > 0.4, f"IVF recall {recall} suspiciously low"
    # determinism: same inputs -> same result set (sample-trained quantizer
    # is hash-ordered, no RNG)
    a2 = {(r["query_id"], r["neighbor_id"])
          for r in sim.ivf_ann_topk(corpus, queries, k=5,
                                    n_cells=16, nprobe=6).collect()}
    assert a == a2


def test_pq_adc_topk_recall_and_encode_contract(spark, sf_dir):
    """PQ-ADC (similarity.py pq_adc_topk): with trained per-subspace
    codebooks at m=8/n_codes=64 (48 bits/vector vs 2048 raw), the ADC
    ranking must recover a meaningful share of the true neighbors —
    far above the ~k/N random floor — and be deterministic (sampled
    training is hash-ordered, no RNG). The encode contract: every
    vector gets exactly m codes in [0, n_codes); identical input
    vectors get identical codes."""
    corpus = _embeds(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 20)
    brute = sim.cosine_topk(corpus, queries, k=10)
    ann = sim.pq_adc_topk(corpus, queries, k=10, m=8, n_codes=64)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    assert a, "PQ ADC returned nothing"
    n = corpus.count()
    recall = len(a & b) / len(b)
    assert recall > 0.2, f"PQ recall {recall} suspiciously low"
    assert recall > 3 * 10 / n, "PQ recall at the random floor"
    a2 = {(r["query_id"], r["neighbor_id"])
          for r in sim.pq_adc_topk(corpus, queries, k=10,
                                   m=8, n_codes=64).collect()}
    assert a == a2, "trained PQ path nondeterministic"
    cb = sim.pq_codebooks(8, 16, 64)
    codes = sim.pq_encode(corpus, cb).collect()
    assert len(codes) == n
    for r in codes:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_ivfpq_topk_recall_and_pruning(spark, sf_dir):
    """IVFPQ composition (similarity.py ivf_pq_topk): trained
    quantizers at nprobe=8/16 cells and 64 codes must recover a
    meaningful share of true neighbors through BOTH approximations
    (list pruning × code quantization), deterministically; every
    returned neighbor must come from a probed cell (the pruning
    contract — verified against an exhaustive-probe run)."""
    corpus = _embeds(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 20)
    brute = sim.cosine_topk(corpus, queries, k=10)
    ann = sim.ivf_pq_topk(corpus, queries, k=10, n_cells=16,
                          nprobe=8, n_codes=64)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    assert a, "IVFPQ returned nothing"
    recall = len(a & b) / len(b)
    assert recall > 0.15, f"IVFPQ recall {recall} suspiciously low"
    a2 = {(r["query_id"], r["neighbor_id"])
          for r in sim.ivf_pq_topk(corpus, queries, k=10, n_cells=16,
                                   nprobe=8, n_codes=64).collect()}
    assert a == a2, "trained IVFPQ path nondeterministic"
    # pruning contract: with fixed quantizers, an exhaustive probe
    # (nprobe = n_cells) ranks by pure ADC distance; the pruned run's
    # result set must be a subset of candidates it could ever see and
    # equal the exhaustive run wherever the true cells were probed
    fixed_c = sim.fixed_centroids(16, 64)
    fixed_b = sim.pq_codebooks(8, 16, 64)
    pruned = sim.ivf_pq_topk(corpus, queries, k=5, nprobe=16,
                             centroids=fixed_c, codebooks=fixed_b)
    full = sim.pq_adc_topk(corpus, queries, k=5, codebooks=fixed_b)
    p = {(r["query_id"], r["neighbor_id"], r["adist"])
         for r in pruned.collect()}
    f = {(r["query_id"], r["neighbor_id"], r["adist"])
         for r in full.collect()}
    assert p == f, "exhaustive-probe IVFPQ must equal the flat PQ scan"


def test_lsh_ann_recall_vs_brute_force(spark, sf_dir):
    """LSH ANN top-5 must recover a reasonable fraction of the true top-5.
    Random gaussian vectors are LSH's worst case (true neighbors sit near
    cos≈0.35), so the bar is recall, not exactness — exactness comes from
    cosine_topk."""
    corpus = _embeds(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 20)
    brute = sim.cosine_topk(corpus, queries, k=5)
    ann = sim.lsh_ann_topk(corpus, queries, k=5)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
    assert a, "ANN returned nothing"
    assert a <= {(q, n) for q, n in a} # shape sanity
    recall = len(a & b) / len(b)
    assert recall > 0.3, f"ANN recall {recall} suspiciously low"
    # every ANN hit must be a genuine same-bucket neighbor with valid cosine
    for r in ann.collect():
        assert -1.0001 <= r["cosine"] <= 1.0001


def test_ann_corpus_encode_bit_identical_members(spark, sf_dir):
    """The r17 audit-row sharing contract: every member's slice of the
    fused ann_corpus_encode frame — and every member's FULL result when
    the shared frame is injected — must be bit-identical to the member
    computing on its own. The fused pass runs the members' exact numpy
    kernels back-to-back, so any drift here means a kernel was edited
    on one side only (the warc_extracted lesson, ADVICE r16)."""
    corpus = _embeds(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < 5)
    cent = sim.fixed_centroids(16, 64)
    cb = sim.pq_codebooks(8, 16, 64)
    shared = sim.ann_corpus_encode(corpus, cent, cb).persist()
    qrows = sim.unit_query_rows(queries)
    try:
        pairs = [
            ("ivf",
             sim.ivf_ann_topk(corpus, queries, k=5, centroids=cent),
             sim.ivf_ann_topk(corpus, queries, k=5, centroids=cent,
                              corpus_assign=shared)),
            ("ivfpq",
             sim.ivf_pq_topk(corpus, queries, k=5, centroids=cent,
                             codebooks=cb),
             sim.ivf_pq_topk(corpus, queries, k=5, centroids=cent,
                             codebooks=cb, corpus_enc=shared,
                             q_rows=qrows)),
            ("ivfpq_res",
             sim.ivf_pq_topk(corpus, queries, k=5, centroids=cent,
                             codebooks=cb, residual=True),
             sim.ivf_pq_topk(corpus, queries, k=5, centroids=cent,
                             codebooks=cb, residual=True,
                             corpus_enc=shared, q_rows=qrows)),
            ("lsh",
             sim.lsh_ann_topk(corpus, queries, k=5),
             sim.lsh_ann_topk(corpus, queries, k=5, corpus_sig=shared)),
            ("pq",
             sim.pq_adc_topk(corpus, queries, k=5, codebooks=cb),
             sim.pq_adc_topk(corpus, queries, k=5, codebooks=cb,
                             corpus_codes=shared, q_rows=qrows)),
        ]
        for name, solo, injected in pairs:
            a = sorted(map(tuple, solo.collect()))
            b = sorted(map(tuple, injected.collect()))
            assert a == b, f"{name}: injected result drifted from solo"
            assert a, f"{name}: empty result"
        # slice-level identity: the shared frame's codes equal the
        # member encode frame row-for-row (not just topk survivors);
        # sig/cell identity is covered by the full-result A/Bs above
        # (a flipped sig or cell changes the candidate set).
        codes_solo = {(r["vec_id"], tuple(r["codes"])) for r in
                      sim.pq_encode(corpus, cb).collect()}
        codes_shared = {(r["neighbor_id"], tuple(r["codes"])) for r in
                        shared.select("neighbor_id", "codes").collect()}
        assert codes_solo == codes_shared
    finally:
        shared.unpersist()


def test_zero_vector_never_ranks_by_nan(spark):
    """Zero-norm guard (review r08): an all-zero embedding must score
    cosine 0 against everything — NOT NaN, which Spark orders above
    every real double, making the zero vector the #1 neighbor of every
    query and a member of every ≥-threshold result. Fixture vectors are
    unit-norm, so only a synthetic corpus exercises this."""
    rows = [(0, [1.0, 0.0]), (1, [0.8, 0.6]), (2, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.filter("vec_id = 0")
    top = sim.cosine_topk(df, q, k=2)
    got = [(r["neighbor_id"], r["cosine"]) for r in
           top.orderBy("rank").collect()]
    # the unit vector at 0.8 cosine wins; the zero vector scores 0.0
    assert got == [(1, 0.8), (2, 0.0)], got
    rng = sim.cosine_range_search(df, q, threshold=0.5)
    assert {r["neighbor_id"] for r in rng.collect()} == {1}
    # the lsh path's cosine() helper takes the same guard
    import math
    lsh = sim.lsh_ann_topk(df, q, k=2, tables=2, planes=2, dim=2)
    assert all(not math.isnan(r["cosine"]) for r in lsh.collect())


def test_quality_score_bounds(spark, sf_dir):
    df = tx.with_text_stats(_docs(spark, sf_dir))
    mm = df.agg(F.min("quality"), F.max("quality")).collect()[0]
    assert 0.0 <= mm[0] and mm[1] <= 1.0


def test_fingerprint_whitespace_invariant(spark, sf_dir):
    """Fingerprint must be invariant to case + spacing (normalization)."""
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["fingerprint"]
           for r in tx.with_fingerprint(df).collect()}
    assert out[1] == out[2] != out[3]


def test_ngram_jaccard_index_length_filter_exact(spark):
    """The index route's length bound (r16: jaccard <= min/max sizes,
    applied inside the candidate join) prunes length-skewed collisions
    without losing a single true pair: a short doc embedded in a much
    longer one shares prefix shingles (so the un-filtered join emits
    the pair) but can never reach t=0.5 — only the genuine near-dup
    pair may survive, identically on both physical strategies."""
    base = "alpha beta gamma delta epsilon"
    rows = [
        (0, base),                                   # true pair with 1
        (1, base + " zeta"),                         # j = 4/6 ~ 0.67
        (2, base + " " + " ".join(                   # shingle superset,
            chr(ord("a") + i) * 3 for i in range(24))),  # -> length-pruned
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for strategy in ("index", "bitmap"):
        got = sorted(map(tuple, dd.ngram_jaccard_pairs(
            df, n=2, threshold=0.5, strategy=strategy).collect()))
        assert [(a, b) for a, b, _ in got] == [(0, 1)], (strategy, got)


def test_ngram_jaccard_strategies_agree(spark, sf_dir):
    """Both physical strategies (dense-vocab bitmap matmul and sparse-regime
    prefix-filtered index join) must produce the identical exact pair set —
    the auto-selector may route to either depending on measured data shape,
    so the non-default path needs its own equivalence check."""
    df = _docs(spark, sf_dir)
    bm = sorted(map(tuple, dd.ngram_jaccard_pairs(
        df, n=2, threshold=0.5, strategy="bitmap").collect()))
    ix = sorted(map(tuple, dd.ngram_jaccard_pairs(
        df, n=2, threshold=0.5, strategy="index").collect()))
    assert bm == ix
    assert len(bm) > 0
    assert all(j >= 0.5 for _, _, j in bm)


def test_connected_components_vs_union_find(spark):
    """Label propagation must agree with a driver-side union-find on a
    graph with chains (transitive similarity), a clique, and disjoint
    pairs — the shapes near-dup graphs actually take."""
    import random
    from activecube_graphql_spark.operators import dedup as dd
    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(0, 10)]          # chain 0..10
    edges += [(a, b) for a in range(20, 25) for b in range(a + 1, 25)]
    edges += [(30, 31), (40, 41), (50, 51)]
    edges += [(rng.randint(60, 99), rng.randint(60, 99)) for _ in range(40)]
    edges = [e for e in edges if e[0] != e[1]]

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(edges, "a long, b long")
    # default: small edge list -> driver union-find fast path
    got = {r["node"]: r["comp"]
           for r in dd.connected_components(pairs, "a", "b").collect()}
    assert got == want
    # driver_edge_limit=0 forces the distributed label-propagation path
    got_dist = {r["node"]: r["comp"]
                for r in dd.connected_components(
                    pairs, "a", "b", driver_edge_limit=0).collect()}
    assert got_dist == want
    # the r16 label-sum convergence probe must still detect NON-convergence
    # loudly: the 11-node chain needs ~10 propagation rounds, so a 2-round
    # budget leaves the sum still decreasing and must raise, not return
    # split components
    with pytest.raises(RuntimeError, match="did not converge"):
        dd.connected_components(pairs, "a", "b",
                                driver_edge_limit=0, max_iter=2)


def test_neardup_canonicalize_keeps_one_per_group(spark, sf_dir):
    """End-to-end corpus pruning: pairs → components → one surviving
    representative (min doc_id) per duplicate group; singletons pass."""
    from activecube_graphql_spark.operators import dedup as dd
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.ngram_jaccard_pairs(docs, n=2, threshold=0.5)
    comps = dd.connected_components(pairs, "id_a", "id_b")
    kept = dd.neardup_canonicalize(docs, pairs, "doc_id", "id_a", "id_b")
    n_docs = docs.count()
    n_dup_nodes = comps.count()
    n_groups = comps.select("comp").distinct().count()
    assert kept.count() == n_docs - (n_dup_nodes - n_groups)
    # every surviving doc in a dup group is its group's min id
    from pyspark.sql import functions as F
    survivors = (comps.join(kept, comps.node == kept.doc_id, "left_semi")
                 .groupBy("comp").agg(F.collect_list("node").alias("m")))
    for r in survivors.collect():
        assert r["m"] == [r["comp"]]


def test_deterministic_sampling_reproducible_and_stratified(spark, sf_dir):
    """Hash-bucket sampling: identical subset on re-run (the property
    df.sample() lacks), rate within binomial tolerance, different salts
    give (near-)independent subsets, and stratified rates apply
    per-stratum exactly."""
    from activecube_graphql_spark.operators import sampling
    docs = _docs(spark, sf_dir)
    n = docs.count()

    s1 = set(r["doc_id"] for r in
             sampling.deterministic_sample(docs, "doc_id", 2000, "a")
             .select("doc_id").collect())
    s1b = set(r["doc_id"] for r in
              sampling.deterministic_sample(docs, "doc_id", 2000, "a")
              .select("doc_id").collect())
    assert s1 == s1b, "same salt must reproduce the identical subset"
    assert 0.12 < len(s1) / n < 0.28, len(s1) / n

    s2 = set(r["doc_id"] for r in
             sampling.deterministic_sample(docs, "doc_id", 2000, "b")
             .select("doc_id").collect())
    overlap = len(s1 & s2) / max(len(s1), 1)
    assert overlap < 0.45, "independent salts should overlap ~rate, not ~1"

    full = sampling.stratified_sample(
        docs, "doc_id", "lang", {"en": 10000}, default_bp=0)
    langs = {r["lang"] for r in full.select("lang").distinct().collect()}
    assert langs == {"en"}, langs
    en_total = docs.filter("lang = 'en'").count()
    assert full.count() == en_total, "10000 bp must keep the whole stratum"


def test_pii_redaction_portable(spark, sf_dir):
    """Redaction must replace URLs, emails, and phone runs (in that
    order), count the spans, and — because the fragment is rendered for
    both engines — produce byte-identical output in DuckDB."""
    import duckdb

    rows = [
        (1, "contact me at jane.doe@example.com or +1 (555) 123-4567"),
        (2, "see https://example.com/a?b=c#d for details"),
        (3, "nothing sensitive here"),
        (4, "mail a@b.io via http://x.y mirror, call 0049 30 1234567"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["text_redacted"], r["pii_count"])
           for r in tx.with_redacted(df).collect()}
    assert got[1] == ("contact me at [EMAIL] or [PHONE]", 2)
    assert got[2] == ("see [URL] for details", 1)
    assert got[3] == ("nothing sensitive here", 0)
    assert got[4][1] == 3

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = (f"SELECT doc_id, {tx.oracle_fragment(tx.REDACTED)} AS red, "
           f"{tx.oracle_fragment(tx.PII_COUNT)} AS cnt FROM t")
    duck = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert duck == got


def test_token_diversity_bounds_and_repetition(spark):
    """Diversity = distinct/total tokens: 1.0 for all-unique or empty
    text, low for heavy repetition."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "spam spam spam spam"), (3, "")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r["token_diversity"]
           for r in tx.with_text_stats(df).collect()}
    assert got[1] == 1.0 and got[2] == 0.25 and got[3] == 1.0


def test_quality_rules_keep_iff_no_reason(spark, sf_dir):
    """keep ⇔ reason == 'ok'; every rule input column present; rules
    actually split the corpus (a filter that keeps or drops everything
    is a mis-threshold, not a filter)."""
    out = tx.with_quality_rules(_docs(spark, sf_dir)).select(
        "doc_id", "word_count", "mean_word_len", "token_diversity",
        "keep", "reason")
    rows = out.collect()
    assert all((r["reason"] == "ok") == r["keep"] for r in rows)
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)
    reasons = {r["reason"] for r in rows if not r["keep"]}
    assert reasons <= {"too_few_words", "too_many_words", "word_length",
                       "repetitive", "no_stopwords"}


def test_quality_rules_synthetic_edges(spark):
    """Each rule fires on a doc built to trip exactly it, honoring the
    CASE precedence order."""
    rows = [
        (1, "one two"),                                 # too_few_words
        (2, " ".join("supercalifragilistic" for _ in range(60))),  # wl>10 …
        (3, " ".join("the quick brown fox jumps".split() * 20)),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r["reason"]
           for r in tx.with_quality_rules(df).collect()}
    assert got[1] == "too_few_words"
    assert got[2] == "word_length"   # wc=60 passes, mean length 20 fails
    assert got[3] == "repetitive"    # mwl 4.2 passes; 5/100 distinct fails


def test_decontaminate_drops_exactly_flagged(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    overlap = dd.decontamination_overlap(train, bench, n=3, min_shared=2)
    flagged = {r["train_id"] for r in overlap.collect()}
    clean = dd.decontaminate(train, bench, n=3, min_shared=2)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    all_train = {r["doc_id"] for r in train.select("doc_id").collect()}
    assert kept == all_train - flagged
    assert flagged, "fixture should produce at least one contaminated doc"


def test_bloom_decontam_equals_exact_anti_join(spark, sf_dir):
    """bloom_decontam's contract: results IDENTICAL to the naive exact
    fingerprint anti-join at any Bloom sizing — the screen has no false
    negatives, and the exact verify removes its false positives. Also
    pins the screen itself: every true member hits; the measured
    false-positive rate stays within ~5x of the (1-e^{-k n/m})^k
    theory at default sizing; a degenerately small bitmap (the
    graceful-degradation path for over-cap benchmarks) still yields
    exact results."""
    from activecube_graphql_spark.operators.text import with_fingerprint
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    fp = with_fingerprint(docs)
    bfp = with_fingerprint(bench).select("fingerprint").distinct()
    want = {r["doc_id"] for r in
            fp.join(bfp, "fingerprint", "left_anti")
            .select("doc_id").collect()}

    got = {r["doc_id"] for r in dd.bloom_decontam(docs, bench)
           .select("doc_id").collect()}
    assert got == want and len(want) < docs.count()

    # no false negatives + bounded false positives at default sizing
    sc = dd.bloom_screen(fp, bfp, "fingerprint")
    true_hits = {r["doc_id"] for r in
                 fp.join(bfp, "fingerprint", "left_semi")
                 .select("doc_id").collect()}
    hits = {r["doc_id"] for r in sc.filter("__bloom_hit")
            .select("doc_id").collect()}
    assert true_hits <= hits
    n_clean = docs.count() - len(true_hits)
    assert (len(hits) - len(true_hits)) / max(n_clean, 1) < 0.012  # ~5x 0.24%

    # graceful degradation: a 64-bit bitmap makes the screen useless but
    # never wrong — exactness survives the cap
    tiny = {r["doc_id"] for r in
            dd.bloom_decontam(docs, bench, max_bits=64)
            .select("doc_id").collect()}
    assert tiny == want

    # empty benchmark keeps everything
    empty = bench.filter("doc_id < 0")
    assert dd.bloom_decontam(docs, empty).count() == docs.count()


def test_decontamination_counts_distinct_shared_shingles(spark):
    """Shared count is DISTINCT shingles (repeats inside one doc count
    once), and sub-threshold overlap is not emitted."""
    rows = [
        (1, "alpha beta gamma delta alpha beta gamma"),   # train
        (2, "alpha beta gamma delta epsilon"),            # train, disjoint ids
        (97 * 50, "alpha beta gamma delta"),              # bench (id%97==0)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bench = df.filter(F.col("doc_id") % 97 == 0)
    train = df.filter(F.col("doc_id") % 97 != 0)
    got = {(r["train_id"], r["bench_id"]): r["shared"]
           for r in dd.decontamination_overlap(train, bench, n=3,
                                               min_shared=2).collect()}
    # bench grams: {a b g, b g d}; doc1 shares both (its repeat of
    # 'alpha beta gamma' counts once); doc2 shares both too
    assert got[(1, 97 * 50)] == 2
    assert got[(2, 97 * 50)] == 2


def test_cap_per_group_semantics(spark, sf_dir):
    from activecube_graphql_spark.operators import sampling
    docs = _docs(spark, sf_dir).withColumn(
        "quality", tx._col(tx.QUALITY_D, "text"))
    out = sampling.cap_per_group(
        docs, ["source"], [F.col("quality").desc(), F.col("doc_id").asc()],
        cap=5)
    per = out.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # every kept row's quality ≥ the best dropped row's quality per source
    kept_min = {r["source"]: r["q"] for r in
                out.groupBy("source").agg(F.min("quality").alias("q")).collect()}
    dropped = docs.join(out.select("doc_id"), "doc_id", "left_anti")
    drop_max = {r["source"]: r["q"] for r in
                dropped.groupBy("source").agg(F.max("quality").alias("q")).collect()}
    for src, qmax in drop_max.items():
        assert qmax <= kept_min[src]


def test_moving_aggregate_frame_and_delta(spark):
    from activecube_graphql_spark.operators.timeseries import moving_aggregate
    rows = [("a", i, float(10 * i)) for i in range(1, 6)] + \
           [("b", 1, 7.0), ("b", 2, 9.0)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {(r["k"], r["t"]): (r["avg_v_3"], r["delta_v"])
           for r in moving_aggregate(df, on="t", by=["k"], value="v",
                                     window_rows=3).collect()}
    assert out[("a", 1)] == (10.0, None)          # partial frame at head
    assert out[("a", 2)] == (15.0, 10.0)
    assert out[("a", 4)] == (30.0, 10.0)          # full 3-row frame
    assert out[("b", 2)] == (8.0, 2.0)            # groups independent


def test_repetition_signals_synthetic(spark):
    """Known-answer repetition: 'x y z' repeated 3× has 7 trigrams, 5 of
    them repeats of the first two distinct → dup frac = 1 - 2/7; the top
    word is any of the three (each 3 of 9 tokens → 1/3)."""
    rows = [(1, "x y z x y z x y z", "s"),
            (2, "a b c d e f", "s"),       # all trigrams distinct
            (3, "aa", "s"),                # 1 token → 0 trigrams
            (4, "", "s")]                  # 0 tokens
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {r["doc_id"]: (r["dup_trigram_frac"], r["top_word_frac"])
           for r in tx.repetition_signals(df).collect()}
    assert abs(out[1][0] - round(1 - 3 / 7, 4)) < 1e-9
    assert abs(out[1][1] - round(1 / 3, 4)) < 1e-9
    assert out[2][0] == 0.0 and abs(out[2][1] - round(1 / 6, 4)) < 1e-9
    assert out[3] == (0.0, 1.0)            # single token = 100% top share
    assert out[4] == (0.0, 0.0)            # empty doc → left-join default


def test_pack_chunks_layout(spark):
    """Chunk attribution: docs are assigned to the chunk holding their
    first token under cumulative (part, order) layout."""
    rows = [("s", 1, "a " * 300), ("s", 2, "b " * 300),
            ("s", 3, "c " * 300), ("t", 1, "d " * 10)]
    df = spark.createDataFrame(rows, ["source", "doc_id", "text"])
    out = {(r["source"], r["chunk_id"]): (r["n_docs"], r["n_tokens"])
           for r in tx.pack_chunks(df, ctx=512).collect()}
    # doc1 starts at 0 → chunk 0; doc2 at 300 → chunk 0; doc3 at 600 → 1
    assert out[("s", 0)] == (2, 600)
    assert out[("s", 1)] == (1, 300)
    assert out[("t", 0)] == (1, 10)


def test_mixture_sample_rates_and_determinism(spark):
    """alpha < 1 boosts the rare stratum's keep-rate above the common
    one's; rates clamp at 100%; the subset is reproducible."""
    from activecube_graphql_spark.operators import sampling
    rows = [(i, "common") for i in range(900)] + \
           [(900 + i, "rare") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = sampling.mixture_sample(df, "source", "doc_id",
                                  alpha=0.5, target_frac=0.5)
    rates = {r["source"]: r["rate_bp"] for r in
             out.select("source", "rate_bp").distinct().collect()}
    assert rates["rare"] > rates["common"]
    assert all(bp <= 10000 for bp in rates.values())
    # deterministic: same subset on a re-run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in
               sampling.mixture_sample(df, "source", "doc_id",
                                       alpha=0.5, target_frac=0.5).collect())
    assert a == b
    # and roughly the target budget overall (md5 buckets are uniform)
    assert 0.35 * 1000 <= len(a) <= 0.65 * 1000


def test_mad_outliers_flags_known_point(spark):
    from activecube_graphql_spark.operators.robust import mad_outliers
    rows = [("g", float(v)) for v in [10, 11, 12, 13, 14, 1000]]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {r["v"]: r["is_outlier"] for r in
           mad_outliers(df, "v", ["k"], k=3.0).collect()}
    assert out[1000.0] == 1
    assert all(f == 0 for v, f in out.items() if v != 1000.0)


def test_chunk_documents_boundaries(spark):
    """5 tokens, C=3, stride=2 → starts 1,3,5 → sizes 3,3,1; empty doc
    yields no chunks; chunk hash is content-determined."""
    rows = [(1, "a b c d e"), (2, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tx.chunk_documents(df, chunk_tokens=3, stride=2).collect()
    got = {(r["doc_id"], r["chunk_idx"]): r["n_tok"] for r in out}
    assert got == {(1, 0): 3, (1, 1): 3, (1, 2): 1}
    import hashlib
    md5 = {r["chunk_idx"]: r["chunk_md5"] for r in out}
    assert md5[0] == hashlib.md5(b"a b c").hexdigest()
    assert md5[2] == hashlib.md5(b"e").hexdigest()


def test_portable_macro_renders():
    """New macros render to the right engine dialects (pure string
    checks — both renderings are exercised end-to-end by the oracle
    rows; this pins the dialect mapping itself)."""
    from activecube_graphql_spark.functions.portable import render
    assert render("LIST_AT(xs, 2)", "spark") == "element_at(xs, 2)"
    assert render("LIST_AT(xs, 2)", "duckdb") == "list_extract(xs, 2)"
    assert render("INT_SEQ_STEP(1, n, 3)", "spark") == "sequence(1, n, 3)"
    assert render("INT_SEQ_STEP(1, n, 3)", "duckdb") == "range(1, (n) + 1, 3)"
    assert render("LIST_SLICE(xs, i, 5)", "spark") == "slice(xs, i, 5)"
    assert render("LIST_SLICE(xs, i, 5)", "duckdb") == \
        "list_slice(xs, i, (i) + (5) - 1)"
    assert render("LIST_JOIN(xs, ' ')", "spark") == "array_join(xs, ' ')"
    assert render("LIST_JOIN(xs, ' ')", "duckdb") == \
        "array_to_string(xs, ' ')"
    # nested: slice inside join inside md5 (the doc_chunks shape)
    got = render("md5(LIST_JOIN(LIST_SLICE(t, s, 4), ' '))", "duckdb")
    assert got == "md5(array_to_string(list_slice(t, s, (s) + (4) - 1), ' '))"


def test_band_join_half_open_boundaries(spark):
    from activecube_graphql_spark.operators.joins import band_join
    bands = spark.createDataFrame(
        [(0.0, 10.0, "a"), (10.0, 20.0, "b")], ["lo", "hi", "tier"])
    fact = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 20.0)], ["id", "v"])
    got = {r["id"]: r["tier"]
           for r in band_join(fact, bands, "v").collect()}
    assert got == {1: "a", 2: "a", 3: "b"}   # 20.0 matches nothing


def test_equi_width_histogram_edges(spark):
    from activecube_graphql_spark.operators.robust import \
        equi_width_histogram
    rows = [("g", float(v)) for v in range(11)] + [("z", 5.0), ("z", 5.0)]
    df = spark.createDataFrame(rows, ["k", "v"])
    out = {(r["k"], r["bucket"]): r["cnt"]
           for r in equi_width_histogram(df, "v", ["k"], bins=10).collect()}
    assert out[("g", 0)] == 1 and out[("g", 9)] == 2  # max clamps into last
    assert out[("z", 0)] == 2                         # zero-width group
    assert sum(c for (k, _), c in out.items() if k == "g") == 11


def test_profile_columns_counts(spark):
    from activecube_graphql_spark.operators.profile import profile_columns
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "x")], ["id", "s"])
    got = {r["col"]: (r["n_rows"], r["n_null"], r["n_distinct"])
           for r in profile_columns(df, ["id", "s"]).collect()}
    assert got == {"id": (3, 0, 3), "s": (3, 1, 1)}


def test_tfidf_ranks_discriminative_terms(spark):
    """A term unique to one doc outranks corpus-wide terms there."""
    rows = [(1, "apple apple banana common common"),
            (2, "banana common common"),
            (3, "cherry common")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = tx.tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    assert top[1] == "apple" and top[3] == "cherry"
    assert all(r["rk"] == 1 for r in out)


def test_quantization_error_bounds(spark):
    """Scale-aligned vectors round-trip exactly; generic vectors stay
    within the int8 step bound; zero vectors are lossless."""
    rows = [(1, [127.0, -127.0, 0.0]),   # exact grid -> rmse 0
            (2, [1.0, 0.3, -0.7]),
            (3, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: (r["rmse"], r["scale"])
           for r in sim.quantization_error(df).collect()}
    assert out[1][0] == 0.0 and out[1][1] == 127.0
    assert out[3] == (0.0, 0.0)
    step = out[2][1] / 127.0
    assert 0.0 < out[2][0] <= step / 2 + 1e-9


def test_train_eval_split_disjoint_stable(spark, sf_dir):
    from activecube_graphql_spark.operators.sampling import train_eval_split
    docs = _docs(spark, sf_dir)
    out = train_eval_split(docs, "doc_id")
    counts = {r["split"]: r["cnt"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("cnt"))
              .collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()       # exhaustive+disjoint
    assert counts["train"] > 5 * (counts.get("val", 0) +
                                  counts.get("test", 0))
    again = {r["split"]: r["cnt"] for r in
             train_eval_split(docs, "doc_id").groupBy("split")
             .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts == again                            # stable


def test_dedup_against_index_incremental_idempotent(spark):
    rows1 = [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")]
    rows2 = [(4, "gamma"), (5, "delta"), (6, "delta")]
    b1 = spark.createDataFrame(rows1, ["doc_id", "text"])
    b2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    empty = spark.createDataFrame([], "fingerprint string")
    s1 = dd.dedup_against_index(b1, empty)
    assert sorted(r["doc_id"] for r in s1.collect()) == [1, 3]
    index = s1.select("fingerprint")
    s2 = dd.dedup_against_index(b2, index)
    assert sorted(r["doc_id"] for r in s2.collect()) == [5]  # gamma known
    index2 = index.union(s2.select("fingerprint"))
    replay = dd.dedup_against_index(b2, index2)
    assert replay.count() == 0                         # idempotent


def test_containment_asymmetric_vs_jaccard(spark):
    """A short doc fully quoted inside a long one: containment(short in
    long) = 1.0 while Jaccard stays low; the reverse direction stays
    under threshold."""
    long_text = "alpha beta gamma delta epsilon zeta eta theta " \
                "iota kappa lam mu nu xi omicron pi"
    short_text = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [(1, short_text), (2, long_text)], ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r["containment"]
           for r in dd.ngram_containment_pairs(
               df, n=3, threshold=0.5).collect()}
    assert out[(1, 2)] == 1.0          # short fully contained
    assert (2, 1) not in out           # long not contained in short
    jac = dd.ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()
    assert not jac                     # symmetric Jaccard misses it


def test_containment_df_cap_drops_hot_shingles(spark):
    """With max_df=1, every shared shingle is dropped -> no pairs."""
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c d")], ["doc_id", "text"])
    assert dd.ngram_containment_pairs(df, n=3, max_df=1).count() == 0
    assert dd.ngram_containment_pairs(df, n=3, max_df=10).count() == 2


def test_label_centroids_known_means(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 3.0]), (0, [3.0, 5.0]), (1, [10.0, 0.0])],
        ["label", "embedding"])
    out = {(r["label"], r["dim"]): (r["mean_v"], r["cnt"])
           for r in sim.label_centroids(df).collect()}
    assert out == {(0, 1): (2.0, 2), (0, 2): (4.0, 2),
                   (1, 1): (10.0, 1), (1, 2): (0.0, 1)}


def test_knn_vote_majority_and_ties(spark):
    """3 of 5 neighbors share the query's cluster -> majority wins."""
    rows = ([(i, [1.0 + 0.01 * i, 0.0], 7) for i in range(3)] +
            [(10 + i, [0.0, 1.0 + 0.01 * i], 8) for i in range(2)] +
            [(99, [1.0, 0.05], 0)])
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = df.filter(F.col("vec_id") == 99)
    out = sim.knn_label_vote(df, q, k=5).collect()
    assert len(out) == 1
    assert out[0]["pred_label"] == 7 and out[0]["votes"] == 3


def test_char_ngram_dup_catches_shifted_verbatim_span(spark):
    """Content-defined selection is alignment-invariant: a verbatim
    span quoted at a DIFFERENT offset still selects the same grams on
    both sides; unrelated docs share nothing; md5 and xxhash64
    variants agree on the pair set for the md5-selected grams."""
    span = ("the quick brown fox jumps over the lazy dog again and "
            "again while the cat watches from the warm windowsill")
    rows = [(1, "intro words here " + span),
            (2, "completely different prefix text " + span),  # shifted
            (3, "no overlap at all in this entirely separate text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {(r["id_a"], r["id_b"]): r["shared"]
           for r in dd.char_ngram_dup_pairs(
               df, n_chars=24, modulus=8, min_shared=2).collect()}
    assert out.get((1, 2), 0) >= 2       # shift-invariant detection
    assert (1, 3) not in out and (2, 3) not in out
    fast = {(r["id_a"], r["id_b"]) for r in dd.char_ngram_dup_pairs(
        df, n_chars=24, modulus=8, min_shared=1,
        hash_fn="xxhash64").collect()}
    assert (1, 2) in fast


def test_portable_fragments_cross_engine_parity(spark):
    """Evaluate each portable macro family on BOTH engines over the
    same literal inputs — the layer the oracle rows stand on. Any
    dialect drift (1-based vs 0-based, clamping, empty-list handling,
    fold typing) fails here first, with a small reproducer."""
    import duckdb
    from activecube_graphql_spark.functions.portable import render
    cases = [
        "ARRAY_LEN(LIST_VAL(1, 2, 3))",
        "ARRAY_LEN(LIST_DISTINCT(LIST_VAL(1, 1, 2)))",
        "LIST_AT(LIST_VAL(10, 20, 30), 2)",
        "LIST_AT(LIST_VAL('a', 'b'), 1)",
        "LIST_SUM(LIST_VAL(1, 2, 3))",
        "LIST_SUM(LIST_FILTER(LIST_VAL(1, 2, 3), x -> x > 5))",
        "round(LIST_FSUM(LIST_VAL(1.5, 2.25)), 4)",
        "round(LIST_FSUM(LIST_FILTER(LIST_VAL(1.5), x -> x > 9)), 4)",
        "ARRAY_LEN(INT_SEQ(1, 5))",
        "ARRAY_LEN(INT_SEQ_STEP(1, 10, 3))",
        "LIST_AT(INT_SEQ_STEP(2, 10, 4), 2)",
        "LIST_JOIN(LIST_SLICE(LIST_VAL('a', 'b', 'c', 'd'), 2, 2), '-')",
        "LIST_JOIN(LIST_SLICE(LIST_VAL('a', 'b'), 1, 9), '-')",  # clamp
        "LIST_MAX(LIST_VAL(3, 9, 4))",
        "ARRAY_LEN(LIST_TRANSFORM(LIST_VAL(1, 2), x -> x * 2))",
        "CAST(LIST_HAS(LIST_VAL(1, 2), 2) AS INT)",
        "MD5_BUCKET('abc', 7)",
        "length(REGEX_STRIP('a1b2c3', '[0-9]'))",
        "REGEX_SUB('a1b2', '[0-9]', 'x')",
    ]
    con = duckdb.connect()
    for frag in cases:
        s = spark.sql(f"SELECT {render(frag, 'spark')} AS v").first()["v"]
        d = con.sql(f"SELECT {render(frag, 'duckdb')} AS v").fetchone()[0]
        assert s == d, (frag, s, d)


def test_quality_model_learns_rule_boundary(spark, sf_dir):
    """The learned scorer must recover the hard-rule labels it was
    trained on (same feature basis -> near-separable): >=90% accuracy
    on the training corpus, and scoring is deterministic."""
    from activecube_graphql_spark.operators import quality_model as qm
    docs = tx.with_quality_rules(_docs(spark, sf_dir)) \
        .withColumn("label", F.col("keep").cast("double")) \
        .select("doc_id", "text", "label")
    model = qm.train_quality_model(docs, "label")
    scored = qm.score_quality(docs, model)
    acc_df = scored.withColumn(
        "hit", ((F.col("quality_prob") >= 0.5).cast("double")
                == F.col("label")).cast("long"))
    n, hits = acc_df.agg(F.count(F.lit(1)), F.sum("hit")).first()
    assert hits / n >= 0.9, (hits, n)
    again = qm.score_quality(docs, model)
    a = sorted((r["doc_id"], r["quality_prob"]) for r in scored.collect())
    b = sorted((r["doc_id"], r["quality_prob"]) for r in again.collect())
    assert a == b


def test_exact_tree_replica_and_invariance(spark):
    """r16 (VERDICT r15 item 3): the graded quality_model row injects
    the tree as literals, so (a) the engine-trained tree (Spark
    synthetic feature rows -> bounded collect -> fit_tree_exact) must
    equal the render-time pure-Python replica bit-for-bit, (b) the
    fit must be invariant to row order and partitioning (exact
    integer arithmetic, total tie-break), and (c) the learned tree
    must actually track the rule boundary it was trained on."""
    from activecube_graphql_spark.operators import quality_model as qm

    rows_py = [qm.synth_quality_row(d) for d in range(qm.TRAIN_IDS)]
    tree_py = qm.fit_tree_exact(rows_py)
    # (a) engine path bit-identity
    feats = [f"{formula} AS {name}" for name, formula in qm.SYNTH_FEATURES]
    train = (spark.range(qm.TRAIN_IDS).selectExpr("id AS doc_id")
             .selectExpr("doc_id", *feats)
             .selectExpr("*", qm.SYNTH_LABEL + " AS y"))
    rows_sp = [r.asDict() for r in train.collect()]
    assert qm.fit_tree_exact(rows_sp) == tree_py
    # (b) order/partition invariance
    assert qm.fit_tree_exact(list(reversed(rows_py))) == tree_py
    rows_shuf = [r.asDict() for r in train.repartition(7).collect()]
    assert qm.fit_tree_exact(rows_shuf) == tree_py
    # (c) the tree recovers the integer-rule boundary on train data
    leaves = qm.tree_leaves(tree_py)
    assert 4 <= len(leaves) <= 16
    hits = 0
    for r in rows_py:
        t = tree_py
        while not t["leaf"]:
            t = t["lo"] if r[t["feat"]] <= t["thr"] else t["hi"]
        hits += int((t["prob_mille"] >= 500) == (r["y"] == 1))
    assert hits / len(rows_py) >= 0.9, hits


def test_exists_filter_never_widens_or_duplicates(spark):
    """Semi/anti joins keep df's schema and never fan out rows even
    when the key side has duplicate keys (the property an inner-join
    'filter' lacks)."""
    from activecube_graphql_spark.operators.joins import exists_filter
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    keys = spark.createDataFrame([(1,), (1,), (2,)], ["k"])  # dup key 1
    semi = exists_filter(df, keys, "k")
    anti = exists_filter(df, keys, "k", negate=True)
    assert semi.columns == df.columns and anti.columns == df.columns
    assert sorted(r["k"] for r in semi.collect()) == [1, 2]
    assert [r["k"] for r in anti.collect()] == [3]


def test_percentile_filter_above_below_and_validation(spark):
    from activecube_graphql_spark.operators.robust import percentile_filter
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)], ["g", "x"])
    above = percentile_filter(df, "x", ["g"], 0.75)
    # rank-based: thr = value at rank ceil(0.75*10)=8 -> keeps 8, 9, 10
    assert sorted(r["x"] for r in above.collect()) == [8.0, 9.0, 10.0]
    below = percentile_filter(df, "x", ["g"], 0.25, keep="below")
    # thr = value at rank ceil(0.25*10)=3 -> keeps 1, 2, 3
    assert sorted(r["x"] for r in below.collect()) == [1.0, 2.0, 3.0]
    import pytest
    with pytest.raises(ValueError):
        percentile_filter(df, "x", ["g"], 0.5, keep="middle")


def test_percentile_filter_null_contract(spark):
    """NULL values neither shift the rank-based threshold nor pass the
    gate (ADVICE r05 NULL-ordering class)."""
    from activecube_graphql_spark.operators.robust import percentile_filter
    rows = [("g", float(v)) for v in range(1, 11)] + [("g", None)] * 5
    df = spark.createDataFrame(rows, "g string, x double")
    above = percentile_filter(df, "x", ["g"], 0.75)
    # thr still ranks over the 10 non-null values only
    assert sorted(r["x"] for r in above.collect()) == [8.0, 9.0, 10.0]


def test_winsorize_null_contract(spark):
    """NULLs are excluded from the band's rank/count and pass through
    with w_value NULL, clipped 0; an all-NULL group survives the band
    join (ADVICE r05: Spark ranks NULLs first ascending, SQL engines
    last — the band must not depend on either default)."""
    from activecube_graphql_spark.operators.robust import winsorize
    rows = ([("g", float(v)) for v in range(1, 11)]
            + [("g", None)] * 3 + [("h", None)])
    df = spark.createDataFrame(rows, "g string, x double")
    out = winsorize(df, "x", ["g"], lo=0.2, hi=0.8)
    got = out.collect()
    g = [r for r in got if r["g"] == "g"]
    # band over the 10 non-null values: lo rank ceil(0.2*10)=2 -> 2.0,
    # hi rank ceil(0.8*10)=8 -> 8.0 (NULLs would shift these to 1.0/6.0
    # under nulls-first ranking)
    assert {(r["lo_v"], r["hi_v"]) for r in g} == {(2.0, 8.0)}
    nulls = [r for r in g if r["x"] is None]
    assert len(nulls) == 3
    assert all(r["w_value"] is None and r["clipped"] == 0 for r in nulls)
    h = [r for r in got if r["g"] == "h"]
    assert len(h) == 1 and h[0]["w_value"] is None and h[0]["clipped"] == 0


def test_boilerplate_ngram_stats(spark):
    """A trigram shared by >= min_df docs is boilerplate; short docs
    (< 3 tokens) have zero trigrams and frac 0.0."""
    from activecube_graphql_spark.operators.text import (
        boilerplate_ngram_stats)
    common = "terms of service apply"          # shared trigram source
    rows = [(1, common + " alpha beta gamma"),
            (2, common + " delta epsilon zeta"),
            (3, "totally unique words only here today"),
            (4, "hi")]                        # < 3 tokens
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           boilerplate_ngram_stats(df, min_df=2).collect()}
    assert out[4]["n_grams"] == 0 and out[4]["boiler_frac"] == 0.0
    assert out[3]["n_boiler"] == 0
    # docs 1 and 2 share exactly the trigrams inside `common`:
    # 'terms of service' and 'of service apply'
    assert out[1]["n_boiler"] == 2 and out[2]["n_boiler"] == 2
    assert out[1]["boiler_frac"] > 0


def test_semantic_dedup_recall_and_survivors(spark, sf_dir):
    """Cell-partitioned SemDeDup pairs recover most exact cosine pairs,
    and the canonical survivor set (a) keeps at most one member of any
    exact near-dup pair it detected, (b) equals the exact-path result
    when run with one cell (no partitioning -> no recall loss)."""
    from activecube_graphql_spark.operators import similarity as sim
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]) for r in sim.embedding_cosine_pairs(
        emb, threshold=0.45, lsh_prefilter=False).collect()}
    cell = {(r["id_a"], r["id_b"]) for r in sim.semantic_neardup_pairs(
        emb, threshold=0.45, n_cells=4).collect()}
    assert cell <= exact          # within-cell scoring is exact cosine
    assert exact, "fixture should contain near-dup pairs at 0.45"
    # Recall in SemDeDup's actual regime — tight semantic clusters, not
    # the fixture's near-random vectors (where 0.45-cosine pairs are
    # chance alignments with no cluster structure to exploit): members
    # of a tight cluster quantize to the same cell, so recall is total.
    import numpy as np
    rng = np.random.RandomState(7)
    centers = rng.randn(4, 16)
    rows = [(int(c * 100 + i),
             (centers[c] + 0.01 * rng.randn(16)).tolist(), int(c))
            for c in range(4) for i in range(10)]
    clustered = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    truth = {(r["id_a"], r["id_b"]) for r in sim.embedding_cosine_pairs(
        clustered, threshold=0.99, lsh_prefilter=False).collect()}
    found = {(r["id_a"], r["id_b"]) for r in sim.semantic_neardup_pairs(
        clustered, threshold=0.99, n_cells=4).collect()}
    assert truth and len(found & truth) / len(truth) >= 0.95
    # one cell == exhaustive search: survivors match the exact path
    kept_1cell = {r["vec_id"] for r in sim.semantic_dedup(
        emb, threshold=0.45, n_cells=1).collect()}
    from activecube_graphql_spark.operators.dedup import (
        neardup_canonicalize)
    pairs_df = sim.embedding_cosine_pairs(emb, threshold=0.45,
                                          lsh_prefilter=False)
    kept_exact = {r["vec_id"] for r in neardup_canonicalize(
        emb, pairs_df, "vec_id", "id_a", "id_b").collect()}
    assert kept_1cell == kept_exact


def test_char_entropy_known_values(spark):
    """Uniform alphabet -> ln(k); single char -> 0; empty -> 0."""
    import math
    from activecube_graphql_spark.operators.text import char_entropy
    df = spark.createDataFrame(
        [(1, "abcd"), (2, "aaaa"), (3, "")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[1]["entropy"] == round(math.log(4), 4)
    assert out[2]["entropy"] == 0.0
    assert out[3]["entropy"] == 0.0 and out[3]["n_chars_t"] == 0


def test_char_entropy_line_terminator_parity(spark):
    """Docs with \\r, U+2028, U+2029 must count identically on both
    engines: Java regex '.' excludes ALL line terminators while RE2
    excludes only \\n — char_entropy therefore matches on the explicit
    [^\\n] class (ADVICE r4 divergence fix). The DuckDB twin mirrors
    the char_entropy oracle in driver_queries.py."""
    import duckdb

    from activecube_graphql_spark.operators.text import char_entropy

    rows = [(1, "ab\rcd\ref"),            # carriage returns, no \n
            (2, "ab cd ef"),    # unicode line/para separators
            (3, "ab\ncd\nef"),            # plain newlines (excluded)
            (4, "mixed\r\nline end")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_chars_t"], r["entropy"])
           for r in char_entropy(df).collect()}
    # \n never counts; every other terminator does
    assert got[1][0] == 8 and got[3][0] == 6 and got[4][0] == 14

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    duck = {r[0]: (r[1], r[2]) for r in con.execute("""
        WITH chars AS (
            SELECT doc_id, unnest(regexp_extract_all(text, '[^\n]', 0))
                       AS ch
            FROM t),
        c AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY 1, 2)
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               round(-sum(c * ln(c)) / sum(c) + ln(sum(c)), 4) AS e
        FROM c GROUP BY 1""").fetchall()}
    assert duck == got


def test_hard_negatives_excludes_same_label(spark):
    """The nearest same-label vector must never appear; ranks cover the
    nearest different-label ones."""
    from activecube_graphql_spark.operators import similarity as sim
    rows = [(0, [1.0, 0.0], 7),        # query
            (1, [0.999, 0.01], 7),     # nearest overall but same label
            (2, [0.9, 0.1], 8),
            (3, [0.5, 0.5], 8),
            (4, [0.0, 1.0], 9)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    q = df.filter("vec_id = 0")
    out = sim.hard_negatives(df, q, k=2).collect()
    got = [(r["neighbor_id"], r["rank"]) for r in out]
    assert got == [(2, 1), (3, 2)]
    assert all(r["n_label"] != r["q_label"] for r in out)


def test_mixture_sample_token_weighting(spark):
    """weight_col budgets the mix in tokens: two strata with equal doc
    counts but 4x different token mass must get different rates under
    token weighting (sqrt-temperature flattens the heavy stratum) and
    EQUAL rates under doc-count weighting."""
    from activecube_graphql_spark.operators import sampling
    rows = ([(i, "a", 100) for i in range(50)] +
            [(100 + i, "b", 400) for i in range(50)])
    df = spark.createDataFrame(rows, ["doc_id", "source", "tok"])
    by_doc = {r["source"]: r["rate_bp"] for r in sampling.mixture_sample(
        df, "source", "doc_id", alpha=0.5, target_frac=0.5)
        .select("source", "rate_bp").distinct().collect()}
    assert by_doc["a"] == by_doc["b"]
    by_tok = {r["source"]: (r["rate_bp"], r["stratum_cnt"])
              for r in sampling.mixture_sample(
                  df, "source", "doc_id", alpha=0.5, target_frac=0.5,
                  weight_col="tok")
              .select("source", "rate_bp", "stratum_cnt")
              .distinct().collect()}
    assert by_tok["a"][1] == 5000 and by_tok["b"][1] == 20000
    # sqrt temperature: rate_a / rate_b = sqrt(mass_b / mass_a) = 2
    assert by_tok["a"][0] > by_tok["b"][0]
    assert abs(by_tok["a"][0] / by_tok["b"][0] - 2.0) < 0.01


def test_kl_drift_zero_for_identical_and_positive_for_shifted(spark):
    from pyspark.sql import functions as F
    from activecube_graphql_spark.operators.robust import kl_drift
    # identical epochs -> every bucket count matches -> KL exactly 0
    rows = [("g", 0, float(v)) for v in range(100)] + \
           [("g", 1, float(v)) for v in range(100)]
    df = spark.createDataFrame(rows, ["k", "ep", "x"])
    out = kl_drift(df, "x", ["k"], F.col("ep") == 0, bins=8).collect()
    assert len(out) == 1
    assert out[0]["kl"] == 0.0
    assert out[0]["n_base"] == 100 and out[0]["n_cur"] == 100
    # epoch 1 concentrated in the top bucket -> strictly positive KL,
    # finite despite emptied buckets (Laplace smoothing)
    rows2 = [("g", 0, float(v)) for v in range(100)] + \
            [("g", 1, 99.0)] * 100
    out2 = kl_drift(spark.createDataFrame(rows2, ["k", "ep", "x"]),
                    "x", ["k"], F.col("ep") == 0, bins=8).collect()
    assert out2[0]["kl"] > 1.0


def test_edit_verified_rejects_high_jaccard_low_edit_sim(spark):
    """Shingle-set similarity and edit similarity disagree on word
    REORDERINGS (same vocabulary, different sequence): the verify
    phase must reject what the candidate phase admits."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "theta eta zeta epsilon delta gamma beta alpha"   # reversed
    c = "alpha beta gamma delta epsilon zeta eta thetq"   # 1 char edit
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], ["doc_id", "text"])
    # unigram candidates: {1,2} share all tokens; {1,3} share 7/9
    out = dd.edit_verified_pairs(df, similarity=0.9,
                                 candidate_jaccard=0.5, n=1)
    pairs = {(r["id_a"], r["id_b"]): r["edit_sim"] for r in out.collect()}
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.9
    assert (1, 2) not in pairs      # reordered text fails the verify


def test_ivf_index_build_search_extend(spark, sf_dir, tmp_path):
    """Persistent IVF index lifecycle: (a) search over the stored index
    returns exactly what the one-shot ivf_ann_topk computes (training
    is deterministic, so the quantizers coincide); (b) the probed-cell
    filter partition-prunes the cell table (the inverted-list scan);
    (c) extending the index with new vectors uses the stored centroids,
    is replay-idempotent, and makes the new vectors findable."""
    from activecube_graphql_spark.operators import similarity as sim
    from pyspark.sql import functions as F
    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = corpus.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(corpus, path, n_cells=8)

    got = sim.ivf_index_search(spark, path, queries, k=5, nprobe=3)
    want = sim.ivf_ann_topk(corpus, queries, k=5, n_cells=8, nprobe=3)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(key, got.collect())) == \
        sorted(map(key, want.collect()))
    assert ({(r["query_id"], r["neighbor_id"]) for r in got.collect()} ==
            {(r["query_id"], r["neighbor_id"]) for r in want.collect()})

    # (b) partition pruning: the cell filter must reach PartitionFilters
    cells = (spark.read.parquet(f"{path}/cells.parquet")
             .filter(F.col("cell").isin([0, 1])))
    plan = cells._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters", 1)[1][:120]

    # (c) extend with brand-new ids; replay appends nothing
    new = corpus.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding",
        "label")
    assert sim.extend_ivf_index(spark, path, new) == 3
    assert sim.extend_ivf_index(spark, path, new) == 0   # idempotent
    found = sim.ivf_index_search(
        spark, path, new, k=1, nprobe=1, exclude_self=False)
    # each new vector's own copy is its nearest neighbor at cosine 1
    hits = {r["query_id"]: (r["neighbor_id"], r["cosine"])
            for r in found.collect()}
    assert set(hits) == {1_000_000, 1_000_001, 1_000_002}
    for qid, (nid, cos) in hits.items():
        assert cos >= 0.9999 and (nid == qid or nid == qid - 1_000_000)


def test_extend_ivf_index_materializes_before_append(spark, sf_dir,
                                                     tmp_path):
    """The anti-joined fresh batch must be DURABLY materialized before
    the append into the directory it was computed from: with plain
    persist(), an evicted partition recomputes against a half-written
    index (VERDICT r4 item 7). Structural check: after
    localCheckpoint(eager) the frame's plan is an ExistingRDD with no
    scan of the index path left; behavioral check: dropping every cache
    between the count and the append still yields the exact batch."""
    from pyspark.sql import functions as F

    from activecube_graphql_spark.operators import similarity as sim

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(corpus, path, n_cells=4)

    cent = sim._load_ivf_centroids(spark, path)
    bc = spark.sparkContext.broadcast(cent)
    new = corpus.filter(F.col("vec_id") < 4).select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "embedding")
    assigned = sim._ivf_assign(new, "vec_id", "__unit", "vec_id",
                               "embedding", bc, 1)
    existing = spark.read.parquet(f"{path}/cells.parquet").select("vec_id")
    fresh = assigned.join(existing, "vec_id", "left_anti")
    pre = fresh._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in pre            # lineage reads the index dir
    ckpt = fresh.localCheckpoint(eager=True)
    post = ckpt._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" not in post       # lineage cut: ExistingRDD
    assert "ExistingRDD" in post or "Scan existing" in post.lower()

    n = ckpt.count()
    spark.catalog.clearCache()              # worst-case eviction point
    (ckpt.write.mode("append").partitionBy("cell")
     .parquet(f"{path}/cells.parquet"))
    back = (spark.read.parquet(f"{path}/cells.parquet")
            .filter(F.col("vec_id") >= 5_000_000))
    assert n == 4 and back.count() == 4


def test_unigram_logprob_orders_common_above_rare(spark):
    """Docs made of corpus-frequent tokens must outscore docs of rare
    tokens; empty docs fall through with 0.0 and n_tok 0; every logp is
    negative (it is a probability)."""
    from activecube_graphql_spark.operators.text import unigram_logprob
    rows = ([(i, "the cat sat on the mat") for i in range(10)] +
            [(100, "zyzzyva qoph xylem"), (101, "")])
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert out[0]["avg_logp"] > out[100]["avg_logp"]
    assert out[0]["avg_logp"] < 0 and out[100]["avg_logp"] < 0
    assert out[101]["n_tok"] == 0 and out[101]["avg_logp"] == 0.0
    assert out[0]["n_tok"] == 6


def test_exists_filter_shuffle_path_matches_broadcast(spark):
    """broadcast_keys=False (the huge-key-side escape hatch) must give
    identical results to the broadcast default."""
    from activecube_graphql_spark.operators.joins import exists_filter
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], ["k", "v"])
    keys = spark.createDataFrame([(i,) for i in range(0, 30, 2)], ["k"])
    for negate in (False, True):
        a = {r["k"] for r in exists_filter(df, keys, "k", negate).collect()}
        b = {r["k"] for r in exists_filter(df, keys, "k", negate,
                                           broadcast_keys=False).collect()}
        assert a == b and a


def test_kl_drift_degenerate_single_value_group(spark):
    """A group whose value never varies (hi == lo) collapses to bucket
    0 in both epochs — no divide-by-zero; with EQUAL epoch sizes the
    smoothed distributions coincide and KL is exactly 0 (with unequal
    sizes Laplace smoothing legitimately spreads different residual
    mass over the empty buckets, so KL > 0 — also asserted)."""
    from pyspark.sql import functions as F
    from activecube_graphql_spark.operators.robust import kl_drift
    eq = spark.createDataFrame(
        [("g", 0, 5.0)] * 10 + [("g", 1, 5.0)] * 10, ["k", "ep", "x"])
    out = kl_drift(eq, "x", ["k"], F.col("ep") == 0, bins=8).collect()
    assert len(out) == 1 and out[0]["kl"] == 0.0
    assert out[0]["n_base"] == 10 and out[0]["n_cur"] == 10
    uneq = spark.createDataFrame(
        [("g", 0, 5.0)] * 10 + [("g", 1, 5.0)] * 7, ["k", "ep", "x"])
    out2 = kl_drift(uneq, "x", ["k"], F.col("ep") == 0, bins=8).collect()
    assert out2[0]["kl"] > 0.0


def test_sequence_features_without_tiebreak(spark):
    """tiebreak=None orders by the on-column alone (the common case for
    strictly increasing timestamps)."""
    import datetime as dt
    from activecube_graphql_spark.operators.timeseries import (
        sequence_features)
    t0 = dt.datetime(2024, 1, 1)
    rows = [("u", t0 + dt.timedelta(seconds=s), float(s)) for s in (0, 3, 9)]
    df = spark.createDataFrame(rows, ["k", "ts", "value"])
    out = sorted(sequence_features(df, on="ts", by=["k"], value="value")
                 .collect(), key=lambda r: r["seq"])
    assert [r["seq"] for r in out] == [1, 2, 3]
    assert [r["gap_s"] for r in out] == [None, 3, 6]
    assert out[-1]["run_value"] == 12.0


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_staged_winsorized_row_matches_oracle(spark, sf_dir):
    """The STAGED q_winsorized driver row (r06 window) already
    hash-agrees with its staged DuckDB oracle — registering it later is
    a pure reorder, not new code. Exact tuple equality = the driver's
    bit-exact contract."""
    import duckdb
    from activecube_graphql_spark.driver_queries import (
        _WINSORIZED_ORACLE, q_winsorized)
    got = {tuple(r) for r in q_winsorized(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    want = {tuple(r) for r in con.execute(_WINSORIZED_ORACLE).fetchall()}
    assert got == want and got
    # clamp invariants: clipped rows exist on the heavy-tailed fixture,
    # and the band is ordered
    for (_, cnt, n_clip, avg_w, lo, hi) in got:
        assert 0 <= n_clip <= cnt and lo <= avg_w <= hi


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_staged_lm_buckets_row_matches_oracle(spark, sf_dir):
    """The STAGED q_lm_buckets driver row (r06 window): CCNet-style
    perplexity-band split, bit-exact vs its staged oracle (counts and
    extremes of 4dp grid values only — no order-sensitive float sums in
    the output by construction)."""
    import duckdb
    from activecube_graphql_spark.driver_queries import (
        _LM_BUCKETS_ORACLE, q_lm_buckets)
    got = {tuple(r) for r in q_lm_buckets(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = {tuple(r) for r in con.execute(_LM_BUCKETS_ORACLE).fetchall()}
    assert got == want and got
    bands = {b for (_, b, *_rest) in got}
    assert bands == {0, 1, 2}


def test_winsorize_clamps_and_flags(spark):
    """Unit semantics: values below the lo order statistic rise to
    lo_v, above the hi one drop to hi_v, interior values pass
    through unflagged."""
    from activecube_graphql_spark.operators.robust import winsorize
    rows = [("a", float(v)) for v in range(1, 101)]
    df = spark.createDataFrame(rows, ["g", "value"])
    out = winsorize(df, "value", ["g"], lo=0.10, hi=0.90).collect()
    lo = out[0]["lo_v"]
    hi = out[0]["hi_v"]
    # type-1 order statistics: value at rank ceil(p*n) = actual
    # data points (ranks 10 and 90 of 1..100) — no interpolation
    assert lo == 10.0 and hi == 90.0
    for r in out:
        assert r["w_value"] == min(max(r["value"], lo), hi)
        assert r["clipped"] == (1 if r["value"] < lo or r["value"] > hi
                                else 0)


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_staged_source_kl_row_matches_oracle(spark, sf_dir):
    """The STAGED q_source_kl driver row (r06 window): pairwise
    symmetric KL over the deterministic top-512 vocabulary, bit-exact
    vs its staged oracle; KL is symmetric-positive and zero only for
    identical distributions."""
    import duckdb
    from activecube_graphql_spark.driver_queries import (
        _SOURCE_KL_ORACLE, q_source_kl)
    got = {tuple(r) for r in q_source_kl(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = {tuple(r) for r in con.execute(_SOURCE_KL_ORACLE).fetchall()}
    assert got == want and got
    n_src = len({s for pair in got for s in pair[:2]})
    assert len(got) == n_src * (n_src - 1) // 2   # every unordered pair
    assert all(kl >= 0 for *_s, kl in got)


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_staged_dup_cluster_sizes_row_matches_oracle(spark, sf_dir):
    """The STAGED q_dup_cluster_sizes driver row (r06 window): duplicate
    cluster-size histogram, bit-exact vs the recursive-CTE component
    oracle; sizes start at 2 (components exclude singletons) and the
    doc total must equal clusters x size per row."""
    import duckdb
    from activecube_graphql_spark.driver_queries import (
        _DUP_CLUSTER_SIZES_ORACLE, q_dup_cluster_sizes)
    got = {tuple(r) for r in q_dup_cluster_sizes(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = {tuple(r)
            for r in con.execute(_DUP_CLUSTER_SIZES_ORACLE).fetchall()}
    assert got == want and got
    for size, n_clusters, n_docs in got:
        assert size >= 2 and n_docs == size * n_clusters


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_staged_semantic_decontam_row_matches_oracle(spark, sf_dir):
    """The STAGED q_semantic_decontam driver row (r06 window):
    embedding-level decontamination survivor counts, bit-exact vs the
    brute-force DuckDB oracle; at sf0.01 the 0.35-cosine radius must
    actually flag something (survivors < train)."""
    import duckdb
    from activecube_graphql_spark.driver_queries import (
        _SEMANTIC_DECONTAM_ORACLE, q_semantic_decontam)
    got = {tuple(r) for r in q_semantic_decontam(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf_dir}/embeddings.parquet')")
    want = {tuple(r)
            for r in con.execute(_SEMANTIC_DECONTAM_ORACLE).fetchall()}
    assert got == want and got
    if sf_dir == SF_MED:
        n_train = con.execute(
            "SELECT count(*) FROM embeddings WHERE vec_id % 97 <> 0"
        ).fetchone()[0]
        assert sum(n for _, n in got) < n_train


def test_mmr_rerank_diversifies_and_is_deterministic(spark, sf_dir):
    """MMR contracts: (a) the first pick per query is the top-1 cosine
    neighbor; (b) with a planted near-duplicate pair at the top,
    lam=0.5 picks ONE of the pair then a distinct vector, where plain
    top-k keeps both copies; (c) repeated runs agree exactly."""
    from activecube_graphql_spark.operators import similarity as sim

    # planted geometry: q; two near-identical top candidates a1/a2;
    # a moderately-similar distinct b; an unrelated c
    rows = [(0, [1.0, 0.0, 0.0]),       # query
            (1, [0.99, 0.14, 0.0]),     # a1
            (2, [0.99, 0.141, 0.0]),    # a2 ~ a1
            (3, [0.7, -0.71, 0.0]),     # b distinct
            (4, [0.0, 0.0, 1.0])]       # c orthogonal
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter("vec_id = 0")
    out = sorted(((r["mmr_rank"], r["neighbor_id"]) for r in
                  sim.mmr_rerank(df, q, k=3, lam=0.5, pool=4).collect()))
    top1 = {r["neighbor_id"] for r in
            sim.cosine_topk(df, q, k=1).collect()}
    assert out[0][1] in top1                 # (a)
    picked = [nid for _, nid in out]
    assert not ({1, 2} <= set(picked))       # (b) no duplicate pair
    assert 3 in picked                       # the distinct vector wins

    # (c) determinism + real-data shape at fixture scale
    emb = _embeds(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < 3)
    r1 = sorted(map(tuple, sim.mmr_rerank(emb, qs, k=5).collect()))
    r2 = sorted(map(tuple, sim.mmr_rerank(emb, qs, k=5).collect()))
    assert r1 == r2 and len(r1) == 15
    for qid in (0, 1, 2):
        ranks = sorted(r[2] for r in r1 if r[0] == qid)
        assert ranks == [1, 2, 3, 4, 5]


def test_semantic_decontaminate_drops_planted_leak(spark):
    """A corpus vector equal to a bench vector must be dropped; an
    orthogonal one must survive."""
    from activecube_graphql_spark.operators import similarity as sim
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 0), (3, [0.99, 0.1], 1)],
        ["vec_id", "embedding", "label"])
    bench = spark.createDataFrame(
        [(100, [1.0, 0.0], 9)], ["vec_id", "embedding", "label"])
    kept = {r["vec_id"] for r in
            sim.semantic_decontaminate(corpus, bench, 0.85).collect()}
    assert kept == {2}


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_staged_unigram_lm_row_matches_oracle(spark, sf_dir):
    """The STAGED q_unigram_lm driver row (to be registered in the next
    round's graded window) already hash-agrees with its staged DuckDB
    oracle — so registering it later is a pure reorder, not new code."""
    import duckdb
    from activecube_graphql_spark.driver_queries import (
        _UNIGRAM_LM_ORACLE, q_unigram_lm)
    got = {(r["source"], r["n_docs"], r["mean_lp"], r["min_lp"])
           for r in q_unigram_lm(spark, sf_dir).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    want = {(r[0], r[1], r[2], r[3])
            for r in con.execute(_UNIGRAM_LM_ORACLE).fetchall()}
    assert got == want and got


def test_percentile_filter_approx_tracks_exact(spark, sf_dir):
    """exact=False (the 100 TB sketch path) must agree with the exact
    order statistic at full accuracy on real data, and its physical
    plan must contain NO window sort — the whole point of the swap is
    that a skewed group cannot spill a per-group sort buffer."""
    from activecube_graphql_spark.operators import text as tx
    from activecube_graphql_spark.operators.robust import percentile_filter

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .withColumn("quality", tx._col(tx.QUALITY_D, "text")))
    exact = percentile_filter(docs, "quality", ["source"], 0.75)
    approx = percentile_filter(docs, "quality", ["source"], 0.75,
                               exact=False, accuracy=100000)
    # GK at this accuracy is rank-exact for fixture-sized groups: same
    # survivors
    key = lambda r: (r["source"], r["doc_id"])
    assert sorted(map(key, exact.collect())) == \
        sorted(map(key, approx.collect()))
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    # low accuracy still yields a sane gate: within a few rank steps
    rough = percentile_filter(docs, "quality", ["source"], 0.75,
                              exact=False, accuracy=50)
    n_exact = exact.count()
    n_rough = rough.count()
    assert abs(n_rough - n_exact) <= 0.1 * n_exact + 20


def test_winsorize_approx_tracks_exact(spark):
    """winsorize(exact=False) picks observed values for the band and
    matches the exact band at full accuracy; the NULL contract carries
    over (percentile_approx ignores NULLs; unmatched w_value stays
    NULL, clipped 0)."""
    from activecube_graphql_spark.operators.robust import winsorize

    rows = ([("g", float(v)) for v in range(1, 101)]
            + [("g", None)] * 5)
    df = spark.createDataFrame(rows, "g string, x double")
    exact = {(r["lo_v"], r["hi_v"])
             for r in winsorize(df, "x", ["g"], 0.2, 0.8).collect()}
    approx = {(r["lo_v"], r["hi_v"])
              for r in winsorize(df, "x", ["g"], 0.2, 0.8,
                                 exact=False, accuracy=100000).collect()}
    assert exact == approx == {(20.0, 80.0)}
    nulls = [r for r in winsorize(df, "x", ["g"], 0.2, 0.8,
                                  exact=False).collect()
             if r["x"] is None]
    assert len(nulls) == 5
    assert all(r["w_value"] is None and r["clipped"] == 0 for r in nulls)


def test_quality_d_bit_parity_and_midpoint_doc(spark, sf_dir):
    """QUALITY_D (all-double literals) is BIT-identical across engines
    for every fixture document — including midpoint landers. Bare
    decimal literals are not portable arithmetic: DuckDB runs them in
    exact DECIMAL while Spark mixes decimal and double terms, so raw
    values can differ by 1 ULP and flip a 4dp-midpoint round (measured
    r06: sf0.01 doc 182, true quality exactly 0.63065)."""
    import duckdb

    from activecube_graphql_spark.operators import text as tx

    sf = "/root/testdata/sf0.01"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    sp = {r["doc_id"]: r["q"] for r in docs.select(
        "doc_id", tx._col(tx.QUALITY_D, "text").alias("q")).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    du = dict(con.execute(
        f"SELECT doc_id, {tx.oracle_fragment(tx.QUALITY_D)} "
        "FROM documents").fetchall())
    assert sp == du
    # the doc that exposed the class: both engines agree ON the midpoint
    assert sp[182] == 0.6307


def test_budget_fill_row_matches_oracle_and_reference(spark):
    """q_budget_fill (registered r06): DuckDB oracle parity at the
    grading SF plus a brute-force Python reference of the greedy
    admission."""
    import duckdb
    import re as _re

    import activecube_graphql_spark.driver_queries as dq
    from activecube_graphql_spark.operators import text as tx

    sf = "/root/testdata/sf0.01"
    got = {r["source"]: (r["n_kept"], r["tokens_used"], r["q_floor"])
           for r in dq.q_budget_fill(spark, sf).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = {r[0]: (r[1], r[2], r[3])
            for r in con.execute(dq._BUDGET_FILL_ORACLE).fetchall()}
    assert got == want
    # independent greedy reference over the engine's own per-doc frame
    docs = (dq._docs(spark, sf)
            .withColumn("q", tx._col(tx.QUALITY_D, "text"))
            .withColumn("tok", tx._col(tx.BPE_TOKEN_COUNT, "text"))
            .select("source", "doc_id", "q", "tok").collect())
    per_src = {}
    for r in docs:
        per_src.setdefault(r["source"], []).append(
            (-r["q"], r["doc_id"], r["tok"], r["q"]))
    for src, rows in per_src.items():
        cum, kept, floor = 0, 0, None
        for _, _, tok, q in sorted(rows):
            if cum + tok > 800:
                break
            cum += tok
            kept += 1
            floor = q if floor is None else min(floor, q)
        assert got[src] == (kept, cum, floor), src


def test_budget_fill_null_tokens_excluded(spark):
    """NULL-token contract (ADVICE r06): a document of unknown token
    cost is EXCLUDED from budget admission, never admitted at zero
    cost — previously window SUM skipped the NULL on both engines and
    the row rode in free, distorting n_kept."""
    from activecube_graphql_spark.operators.sampling import (
        quality_budget_fill)
    rows = [(1, "a", 0.9, 100), (2, "a", 0.8, None), (3, "a", 0.7, 100),
            (4, "b", 0.5, None)]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, quality double, tok long")
    kept = quality_budget_fill(df, "source", budget=250,
                               quality_col="quality",
                               token_col="tok").collect()
    ids = sorted(r["doc_id"] for r in kept)
    # doc 2 (NULL tok) excluded; doc 3 admitted in its place;
    # group b (all-NULL) contributes nothing
    assert ids == [1, 3]
    assert all(r["cum_tok"] is not None for r in kept)


def test_source_dup_matrix_consistent_with_pair_set(spark, sf_dir):
    """The matrix's total pair mass equals the verified pair count, and
    every (source_a, source_b) cell is ordered source_a <= source_b."""
    import activecube_graphql_spark.driver_queries as dq
    from activecube_graphql_spark.operators import dedup as dd

    rows = dq.q_source_dup_matrix(spark, sf_dir).collect()
    n_pairs = dd.minhash_lsh_verified(dq._docs(spark, sf_dir)).count()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    assert all(r["source_a"] <= r["source_b"] for r in rows)
    assert all(0.5 <= r["max_j"] <= 1.0 for r in rows)


def test_ivf_compaction_bounds_files_and_preserves_index(spark, sf_dir,
                                                         tmp_path):
    """r09 (VERDICT r08 item 8): streaming appends grow the cell
    store's file count with TRIGGER count (~n_cells files each), which
    the sf1 drive measured as the per-trigger wall growth of
    maintain_ivf_index. extend_ivf_index's auto-compaction must (a)
    rewrite the store down to ~one file per cell when the threshold is
    crossed, (b) change NOTHING about index contents or search
    results, (c) keep the partition layout (cell pruning still works),
    and (d) heal a crash inside the swap window (.old left behind)."""
    from pyspark.sql import functions as F

    from activecube_graphql_spark.operators import similarity as sim

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(corpus.filter(F.col("vec_id") < 200), path,
                        n_cells=4)
    queries = corpus.filter(F.col("vec_id") < 5)

    def snapshot():
        rows = spark.read.parquet(f"{path}/cells.parquet").collect()
        return sorted((r["vec_id"], r["cell"]) for r in rows)

    # grow the store over several "triggers" with compaction disabled
    for i in range(4):
        new = corpus.filter(
            (F.col("vec_id") >= 200 + 50 * i)
            & (F.col("vec_id") < 250 + 50 * i)).select(
            "vec_id", "embedding", "label")
        assert sim.extend_ivf_index(spark, path, new,
                                    compact_files=0) == 50
    files_before = len(
        spark.read.parquet(f"{path}/cells.parquet").inputFiles())
    before = snapshot()
    want = {(r["query_id"], r["neighbor_id"]) for r in sim.ivf_index_search(
        spark, path, queries, k=3, nprobe=2).collect()}

    # threshold crossed -> this extend compacts after appending
    new = corpus.filter((F.col("vec_id") >= 400)
                        & (F.col("vec_id") < 410)).select(
        "vec_id", "embedding", "label")
    assert sim.extend_ivf_index(spark, path, new, compact_files=8) == 10
    files_after = len(
        spark.read.parquet(f"{path}/cells.parquet").inputFiles())
    assert files_after <= 4 < files_before  # one file per cell
    # contents: everything before plus exactly the 10 new ids
    got_ids = {v for v, _ in snapshot()}
    assert got_ids == {v for v, _ in before} | set(range(400, 410))
    # search results unchanged for the pre-compaction corpus
    got = {(r["query_id"], r["neighbor_id"]) for r in sim.ivf_index_search(
        spark, path, queries, k=3, nprobe=2).collect()}
    assert got == want
    # partition pruning still reaches the scan after the rewrite
    plan = (spark.read.parquet(f"{path}/cells.parquet")
            .filter(F.col("cell") == 1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters: [" in plan

    # (d) crash-window heal: simulate "renamed away, rewrite lost"
    import os
    os.rename(f"{path}/cells.parquet", f"{path}/cells.parquet.old")
    assert sim.extend_ivf_index(
        spark, path,
        corpus.filter(F.col("vec_id") == 410).select(
            "vec_id", "embedding", "label")) == 1
    assert 410 in {v for v, _ in snapshot()}

    # (e) complete-rewrite crash (ADVICE r09): live store AND .old both
    # gone; the committed rewrite (_SUCCESS present) is the only copy
    # left — heal must promote it instead of leaving the index missing
    os.rename(f"{path}/cells.parquet", f"{path}/cells.parquet.compacting")
    assert os.path.exists(f"{path}/cells.parquet.compacting/_SUCCESS")
    assert sim.extend_ivf_index(
        spark, path,
        corpus.filter(F.col("vec_id") == 411).select(
            "vec_id", "embedding", "label")) == 1
    assert {410, 411} <= {v for v, _ in snapshot()}


def test_bm25_topk_semantics(spark):
    """BM25 ranking sanity on a hand-built corpus (value parity vs
    DuckDB is the graded oracle's job): rare-term matches outrank
    common-term matches, repeated terms saturate (tf term is bounded by
    k1+1), docs without any query term never appear, k caps the cut,
    and exact score ties break by doc id."""
    from activecube_graphql_spark.operators import text as tx

    rows = [
        (1, "rare word here"),              # the only 'rare' doc
        (2, "common common common stuff"),  # tf saturation candidate
        (3, "common stuff"),
        (4, "entirely unrelated filler"),
        (5, "common stuff"),                # exact tie with doc 3
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tx.bm25_topk(df, ["rare", "common"], k=3).collect()
    got = [(r["doc_id"], r["rk"]) for r in out]
    assert [d for d, _ in got][0] == 1          # idf: rare beats common
    assert [rk for _, rk in got] == [1, 2, 3]
    assert 4 not in {d for d, _ in got}         # no query term -> absent
    # tie rows 3 and 5 have identical (tf, len) -> identical doubles;
    # only one fits in k=3 and it must be the smaller id
    assert got[2][0] == 3
    # k honored even with more matches available
    assert len(tx.bm25_topk(df, ["common"], k=2).collect()) == 2
    # saturation: tf=3 scores less than 3x the tf=1 score of same-length
    k4 = {r["doc_id"]: r["bm25"]
          for r in tx.bm25_topk(df, ["common"], k=4).collect()}
    assert k4[2] < 3 * k4[3]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tx.bm25_topk(df, [])
    with _pytest.raises(ValueError):
        tx.bm25_topk(df, ["a", "a"])


def test_heavy_hitters_bounded_capacity_guarantees(spark):
    """The Misra-Gries guarantees in the regime the graded row can't
    exercise (capacity far below cardinality, adversarial skew, many
    partitions): for every returned item lb <= true <= ub; the global
    error ub - lb = sum(D_p) <= N/(capacity+1); every item whose true
    count exceeds that error survives the sketch; and the true hot
    item is rank 1."""
    from collections import Counter

    from activecube_graphql_spark.operators.profile import heavy_hitters

    # 1 hot item (400), 3 warm (60 each), 300 singletons
    items = (["hot"] * 400 + ["warm1", "warm2", "warm3"] * 60
             + [f"rare{i}" for i in range(300)])
    true = Counter(items)
    n = len(items)
    cap = 8
    df = spark.createDataFrame([(x,) for x in items], "term string") \
        .repartition(4)
    got = {r["item"]: r for r in
           heavy_hitters(df, "term", k=1000, capacity=cap).collect()}
    assert got  # sketch returns something
    any_row = next(iter(got.values()))
    total_d = any_row["count_ub"] - any_row["count_lb"]
    assert 0 <= total_d <= n // (cap + 1)
    for item, r in got.items():
        assert r["count_lb"] <= true[item] <= r["count_ub"], item
    for item, c in true.items():
        if c > total_d:
            assert item in got, (item, c, total_d)
    top1 = min(got.values(), key=lambda r: r["rk"])
    assert top1["item"] == "hot" and top1["rk"] == 1
    # summary stayed bounded: at most capacity survivors per partition
    assert len(got) <= cap * 4


def test_winnow_fingerprints_matches_paper_reference(spark):
    """winnow_fingerprints (r10) vs a direct transcription of the
    SIGMOD'03 algorithm: identical (pos, fp) selections on every doc,
    including the rightmost-min tie-break, the short-doc single-window
    rule, and the <k-token empty case — plus the paper's coverage
    guarantee (every window of w consecutive grams contains a
    selection) on the long docs."""
    import hashlib
    import re as _re

    from activecube_graphql_spark.operators.dedup import (
        winnow_fingerprints)

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "short one"),                       # < k tokens
        (3, "one two three"),                   # exactly 1 gram
        (4, "x " * 30),                         # all-identical grams: ties
        (5, "alpha beta gamma delta alpha beta gamma delta"),  # repeats
        (6, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ]
    k, w = 3, 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["id"], r["pos"], r["fp"]) for r in
                 winnow_fingerprints(df, k=k, w=w).collect())

    def ref(text):
        toks = _re.findall(r"[a-z]+", text.lower())
        if len(toks) < k:
            return set()
        hs = [int(hashlib.md5(" ".join(toks[i:i + k]).encode())
                  .hexdigest()[:8], 16)
              for i in range(len(toks) - k + 1)]
        n = len(hs)
        sel = set()
        for j in range(max(n - w + 1, 1)):        # short doc: 1 window
            win = hs[j:j + w]
            m = min(win)
            p = j + max(i for i, h in enumerate(win) if h == m)
            sel.add((p, m))
        return sel

    want = sorted((d, p, f) for d, t in rows for (p, f) in ref(t))
    assert got == want
    # coverage guarantee (Theorem 1): every full window hits a selection
    for d, t in rows:
        n = len(_re.findall(r"[a-z]+", t.lower())) - k + 1
        if n >= w:
            selpos = {p for dd, p, _ in got if dd == d}
            for j in range(n - w + 1):
                assert selpos & set(range(j, j + w)), (d, j)


def test_winnow_fingerprints_randomized_batch(spark):
    """200 seeded-random docs (varied lengths incl. <k, =k, <w-gram
    and tie-heavy tiny vocabularies) in ONE Spark job vs the paper
    transcription — the randomized companion of the hand-picked-edge
    test above, catching window/packing bugs only odd length/tie
    combinations trigger."""
    import hashlib
    import random
    import re as _re

    from activecube_graphql_spark.operators.dedup import (
        winnow_fingerprints)

    rng = random.Random(1003)
    vocab = ["a", "b", "c", "aa", "bb", "dup", "spark", "row"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 40))))
            for i in range(200)]
    k, w = 3, 4
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted((r["id"], r["pos"], r["fp"]) for r in
                 winnow_fingerprints(df, k=k, w=w).collect())

    def ref(text):
        toks = _re.findall(r"[a-z]+", text.lower())
        if len(toks) < k:
            return set()
        hs = [int(hashlib.md5(" ".join(toks[i:i + k]).encode())
                  .hexdigest()[:8], 16)
              for i in range(len(toks) - k + 1)]
        sel = set()
        for j in range(max(len(hs) - w + 1, 1)):
            win = hs[j:j + w]
            m = min(win)
            sel.add((j + max(i for i, h in enumerate(win) if h == m), m))
        return sel

    want = sorted((d, p, f) for d, t in rows for (p, f) in ref(t))
    assert got == want


def test_ivf_compaction_swap_survives_rename_failure(spark, sf_dir,
                                                     tmp_path,
                                                     monkeypatch):
    """Hadoop FileSystem.rename reports failure by RETURNING FALSE
    (ADVICE r09). Inject failures at each swap step through a fake fs
    and assert the protocol never loses the live store: a failed first
    rename leaves cells.parquet untouched; a failed second rename
    restores it from .old; the .old backup is never deleted unless the
    swapped-in store exists."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from activecube_graphql_spark.operators import similarity as sim

    corpus = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    sim.build_ivf_index(corpus.filter(F.col("vec_id") < 100), path,
                        n_cells=4)

    class FakeFS:
        def __init__(self, fail_renames):
            # dst suffix -> remaining failures (one-shot: the recovery
            # rename to the same target must be allowed to succeed)
            self.fail = dict.fromkeys(fail_renames, 1)

        def exists(self, p):
            return os.path.exists(str(p))

        def delete(self, p, recursive=True):
            shutil.rmtree(str(p), ignore_errors=True)
            return True

        def rename(self, src, dst):
            for s, left in self.fail.items():
                if str(dst).endswith(s) and left > 0:
                    self.fail[s] = left - 1
                    return False
            os.rename(str(src), str(dst))
            return True

    class FakeJvmPath(str):
        pass

    class FakeJvm:
        class org:
            class apache:
                class hadoop:
                    class fs:
                        Path = FakeJvmPath

    def fake_hadoop_path(fail):
        def _f(spark_, p):
            return FakeFS(fail), FakeJvm, FakeJvmPath(p)
        return _f

    def snapshot():
        return sorted(r["vec_id"] for r in
                      spark.read.parquet(f"{path}/cells.parquet")
                      .collect())

    before = snapshot()

    # (1) first rename (src -> .old) fails: live store must be intact
    monkeypatch.setattr(sim, "_hadoop_path",
                        fake_hadoop_path({"cells.parquet.old"}))
    with pytest.raises(IOError):
        sim.compact_ivf_cells(spark, path)
    assert snapshot() == before
    shutil.rmtree(f"{path}/cells.parquet.compacting", ignore_errors=True)

    # (2) second rename (tmp -> src) fails: live store restored from .old
    monkeypatch.setattr(sim, "_hadoop_path",
                        fake_hadoop_path({"cells.parquet"}))
    with pytest.raises(IOError):
        sim.compact_ivf_cells(spark, path)
    assert snapshot() == before
    assert not os.path.exists(f"{path}/cells.parquet.old")
    shutil.rmtree(f"{path}/cells.parquet.compacting", ignore_errors=True)

    # (3) no injected failures: swap completes, backup cleaned up
    monkeypatch.setattr(sim, "_hadoop_path", fake_hadoop_path(set()))
    assert sim.compact_ivf_cells(spark, path) >= 1
    assert snapshot() == before
    assert not os.path.exists(f"{path}/cells.parquet.old")

    # (4) HEAL rename failures (ADVICE r10: _heal_ivf_cells ignored the
    # boolean returns — the exact pitfall steps 1-3 pin for the swap).
    # restore path: .old present, rename back fails -> IOError naming
    # the un-healed state, backup left in place; second attempt heals.
    os.rename(f"{path}/cells.parquet", f"{path}/cells.parquet.old")
    monkeypatch.setattr(sim, "_hadoop_path",
                        fake_hadoop_path({"cells.parquet"}))
    with pytest.raises(IOError, match="restore rename"):
        sim._heal_ivf_cells(spark, path)
    assert os.path.exists(f"{path}/cells.parquet.old")
    monkeypatch.setattr(sim, "_hadoop_path", fake_hadoop_path(set()))
    sim._heal_ivf_cells(spark, path)  # retry with the fs healthy again
    assert snapshot() == before

    # promote path: only the committed rewrite survives, rename fails
    # -> IOError, the sole copy is left untouched; retry promotes it.
    os.rename(f"{path}/cells.parquet", f"{path}/cells.parquet.compacting")
    open(f"{path}/cells.parquet.compacting/_SUCCESS", "w").close()
    monkeypatch.setattr(sim, "_hadoop_path",
                        fake_hadoop_path({"cells.parquet"}))
    with pytest.raises(IOError, match="promote rename"):
        sim._heal_ivf_cells(spark, path)
    assert os.path.exists(f"{path}/cells.parquet.compacting")
    monkeypatch.setattr(sim, "_hadoop_path", fake_hadoop_path(set()))
    sim._heal_ivf_cells(spark, path)
    assert snapshot() == before


def test_winnow_fingerprints_xxhash64_twin(spark):
    """The xxhash64 scale twin (one JVM hash per gram, no hex parse):
    same structural contract as md5 mode — packed keys decode to valid
    positions, selections are deterministic, and the coverage
    guarantee holds; selection positions legitimately differ (they are
    hash-determined)."""
    import re as _re

    from activecube_graphql_spark.operators.dedup import (
        winnow_fingerprints)

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
             "eta", "theta", "iota", "kappa", "lam", "mu", "nu"]
    rows = [(i, " ".join(words[(i * 7 + j) % 13] for j in range(30)))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    k, w = 3, 4
    got = winnow_fingerprints(df, k=k, w=w, hash_fn="xxhash64").collect()
    assert got and all(0 <= r["pos"] < 28 and r["fp"] >= 0 for r in got)
    again = winnow_fingerprints(df, k=k, w=w, hash_fn="xxhash64").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    for d, t in rows:
        n = len(_re.findall(r"[a-z]+", t.lower())) - k + 1
        selpos = {r["pos"] for r in got if r["id"] == d}
        for j in range(n - w + 1):
            assert selpos & set(range(j, j + w)), (d, j)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, hash_fn="fnv")


def test_bigram_logprob_is_order_sensitive(spark):
    """The property that earns bigram_logprob its place next to
    unigram_logprob: token ORDER moves the score. A doc made of the
    corpus's dominant bigram chain scores high; the same multiset of
    tokens shuffled into rare bigrams scores strictly lower — while
    their UNIGRAM scores are identical. Short-doc conventions pinned:
    <2 tokens -> n_big 0 / score 0.0."""
    from pyspark.sql import functions as F

    from activecube_graphql_spark.operators.text import (bigram_logprob,
                                                         unigram_logprob)

    # corpus dominated by the chain "a b a b ..."; docs 1 and 2 hold
    # the same token multiset in chain vs anti-chain order
    rows = [(i, "a b " * 10) for i in range(10)]
    rows += [(100, "a b a b a b"), (101, "a a a b b b"), (102, "a"),
             (103, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    uni = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    assert uni[100]["avg_logp"] == uni[101]["avg_logp"]   # same multiset
    assert got[100]["avg_logp2"] > got[101]["avg_logp2"]  # order matters
    assert got[100]["n_big"] == 5 and got[101]["n_big"] == 5
    assert got[102]["n_big"] == 0 and got[102]["avg_logp2"] == 0.0
    assert got[103]["n_big"] == 0 and got[103]["avg_logp2"] == 0.0
    # interpolation keeps every seen-token bigram finite: the rare
    # bigrams of doc 101 ("a a", "b b") never produce -inf
    import math
    assert math.isfinite(got[101]["avg_logp2"])


def test_trigram_logprob_backoff_and_heldout(spark):
    """trigram_logprob (r11): (a) exact arithmetic vs hand-computed
    interpolation on a held-out doc where all three arms carry
    distinct mass; (b) unseen trigram/bigram arms COALESCE to zero
    (backoff fires) and a fully-OOV token still scores the finite
    add-k unigram floor; (c) two-token-history order sensitivity: a
    doc continuing the corpus's dominant trigram chain outscores the
    same multiset in rare order; (d) <3-token docs -> n_tri 0 /
    0.0."""
    import math

    from activecube_graphql_spark.operators.text import trigram_logprob

    train = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the cat ran")],
        "doc_id long, text string")
    score = spark.createDataFrame(
        [(10, "the cat sat"),            # all arms live
         (11, "a dog barked loud"),      # fully OOV
         (12, "hi"), (13, "")],          # short-doc convention
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           trigram_logprob(score, train=train).collect()}

    lam3, lam2, k = 0.6, 0.7, 0.5
    n_corpus, v_size = 9, 6
    # (the,cat,sat): c_tri=1, c_h12(the,cat)=2; bi (cat,sat)=1 of
    # c_h2(cat)=2; uni(sat)=1
    p10 = (lam3 * (1 / 2)
           + (1.0 - lam3) * (lam2 * (1 / 2)
                             + (1.0 - lam2) * (1 + k)
                             / (n_corpus + k * v_size)))
    assert got[10]["n_tri"] == 1
    assert got[10]["avg_logp3"] == round(math.log(p10), 4)
    # fully-OOV trigram: tri and bi arms zero, unigram floor only
    p_oov = (1.0 - lam3) * ((1.0 - lam2) * k / (n_corpus + k * v_size))
    assert got[11]["n_tri"] == 2
    assert got[11]["avg_logp3"] == round(math.log(p_oov), 4)
    assert math.isfinite(got[11]["avg_logp3"])
    assert got[12]["n_tri"] == 0 and got[12]["avg_logp3"] == 0.0
    assert got[13]["n_tri"] == 0 and got[13]["avg_logp3"] == 0.0

    # order sensitivity at the trigram level (self-scored chain corpus)
    rows = [(i, "a b c " * 8) for i in range(10)]
    rows += [(100, "a b c a b c"), (101, "c b a c b a")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got2 = {r["doc_id"]: r for r in trigram_logprob(df).collect()}
    assert got2[100]["avg_logp3"] > got2[101]["avg_logp3"]


def test_bpe_train_and_apply_contract(spark):
    """Real BPE (text.train_bpe / bpe_tokenize): on a hand corpus the
    learned merges are the textbook sequence (most frequent pair
    first, lexicographic ties), training is deterministic, the most
    frequent word collapses to ONE token, and applying the merges
    leaves no adjacent pair that any learned merge could still join
    (the fixed-point contract of greedy lowest-rank apply)."""
    rows = [(0, "low low low lower lower lowest"),
            (1, "low lower newer newest new"),
            (2, "low low wider wide wide")]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    merges = tx.train_bpe(docs, n_merges=8)
    assert merges[:3] == [("l", "o"), ("lo", "w"), ("low", "</w>")]
    assert merges == tx.train_bpe(docs, n_merges=8)
    out = {r["doc_id"]: r for r in
           tx.bpe_tokenize(docs, merges).collect()}
    assert "low</w>" in out[0]["tokens"]
    assert out[0]["bpe_count"] == len(out[0]["tokens"])
    mset = set(merges)
    for r in out.values():
        toks = r["tokens"]
        for j in range(len(toks) - 1):
            # a mergeable pair may only survive across a word
            # boundary (previous token ends the word)
            if (toks[j], toks[j + 1]) in mset:
                assert toks[j].endswith("</w>")


def test_kn_trigram_is_a_proper_distribution(spark):
    """r16 (VERDICT r15 item 4): interpolated modified-KN must be a
    PROPER conditional distribution — for a seen history (w1,w2),
    summing p(w|w1,w2) over the training vocabulary plus exactly one
    OOV word must give 1 (the discounted mass is redistributed, not
    lost: Σ(c−D)₊/c_h = 1−γ and the lower orders telescope the γ
    mass back, with the 1/(V+1) floor holding the final OOV slot).
    Each probe doc is one trigram 'w1 w2 x', so its avg_kn IS
    ln p(x|w1,w2)."""
    import math

    train_rows = [
        (0, "the cat sat on the mat"),
        (1, "the cat ate the fish"),
        (2, "a dog sat on a log"),
        (3, "the dog ate a bone"),
        (4, "the cat sat on a log"),
    ]
    train = spark.createDataFrame(train_rows,
                                  "doc_id long, text string")
    vocab = sorted({w for _, t in train_rows for w in t.split()})
    probes = vocab + ["zzz"]  # exactly one OOV slot
    score = spark.createDataFrame(
        [(100 + i, f"the cat {w}") for i, w in enumerate(probes)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           tx.trigram_kn_logprob(score, train=train).collect()}
    assert all(r["n_tri"] == 1 for r in out.values())
    total = sum(math.exp(r["avg_kn"]) for r in out.values())
    assert abs(total - 1.0) < 1e-2, total  # 4dp emission round slack
    # the OOV word scores finite and below every seen-history word
    oov = math.exp(out[100 + len(vocab)]["avg_kn"])
    assert 0.0 < oov < max(math.exp(r["avg_kn"])
                           for r in out.values())
    # an unseen HISTORY backs off wholesale and still scores finite
    back = tx.trigram_kn_logprob(
        spark.createDataFrame([(500, "qq ww the")],
                              "doc_id long, text string"),
        train=train).collect()[0]
    assert back["n_tri"] == 1 and math.isfinite(back["avg_kn"])


def test_bpe_train_history_partition_invariant(spark):
    """r16 (VERDICT r15 item 2): the graded bpe_trained row pins the
    merge table + winning counts, so the trainer must be invariant to
    input partitioning — integer pair counts are order-free and the
    argmax tie-break is total, hence any layout of the same corpus
    learns the identical history."""
    rows = [(i, t) for i, t in enumerate(
        ["low low lower lowest", "new newer newest wide",
         "wide wider low new", "the the the of of a",
         "lowest newest widest the"] * 3)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = tx.train_bpe_history(docs.repartition(1), n_merges=6)
    assert len(want) == 6 and all(c >= 2 for _, _, c in want)
    for parts in (3, 7):
        got = tx.train_bpe_history(docs.repartition(parts), n_merges=6)
        assert got == want, parts
    # and train_bpe is exactly the history minus the counts
    assert tx.train_bpe(docs, n_merges=6) == \
        [(a, b) for a, b, _ in want]
    # driver_word_limit=0 forces the distributed merge loop (the
    # at-scale path, the connected_components forcing discipline) —
    # identical history to the driver route by construction
    assert tx.train_bpe_history(docs, n_merges=6,
                                driver_word_limit=0) == want
    from activecube_graphql_spark.stats import routing_decisions
    assert routing_decisions()["train_bpe.path"] == "distributed"


def test_bpe_trained_on_fixture_corpus(spark, sf_dir):
    """Trained merges on the real fixture corpus apply cleanly: every
    document tokenizes, counts are positive where text has words, and
    token arrays re-concatenate to the word characters + one </w> per
    word (losslessness of BPE segmentation)."""
    docs = _docs(spark, sf_dir).limit(200)
    merges = tx.train_bpe(docs, n_merges=16)
    assert len(merges) == 16
    out = tx.bpe_tokenize(docs, merges).collect()
    assert len(out) == 200
    import re
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out[:25]:
        words = re.findall(r"[a-z]+", (texts[r["doc_id"]] or "").lower())
        joined = "".join(r["tokens"])
        assert joined == "".join(w + "</w>" for w in words)


_LANG_CORPUS = {
    "en": ["the quick brown fox jumps over the lazy dog",
           "this is a short sentence about the weather today",
           "children play in the park and sing songs together",
           "we should think carefully before making that choice",
           "the library opens early in the morning every day"],
    "de": ["der schnelle braune fuchs springt ueber den faulen hund",
           "das wetter ist heute wirklich sehr schoen und warm",
           "die kinder spielen im park und singen gemeinsam lieder",
           "wir sollten vor dieser entscheidung gruendlich nachdenken",
           "die bibliothek oeffnet jeden morgen sehr frueh"],
    "es": ["el rapido zorro marron salta sobre el perro perezoso",
           "hoy hace muy buen tiempo y el cielo esta despejado",
           "los ninos juegan en el parque y cantan canciones juntos",
           "deberiamos pensar con cuidado antes de tomar esa decision",
           "la biblioteca abre muy temprano todas las mananas"],
    "fr": ["le rapide renard brun saute par dessus le chien paresseux",
           "il fait tres beau aujourd hui et le ciel est degage",
           "les enfants jouent dans le parc et chantent ensemble",
           "nous devrions reflechir avant de prendre cette decision",
           "la bibliotheque ouvre tres tot tous les matins"],
}

_LANG_HOLDOUT = [
    ("en", "the dog sleeps under the table in the kitchen"),
    ("en", "we walked to the market and bought some bread"),
    ("de", "der hund schlaeft unter dem tisch in der kueche"),
    ("de", "wir gingen zum markt und kauften frisches brot"),
    ("es", "el perro duerme debajo de la mesa en la cocina"),
    ("es", "caminamos al mercado y compramos un poco de pan"),
    ("fr", "le chien dort sous la table dans la cuisine"),
    ("fr", "nous sommes alles au marche acheter du pain"),
]


def test_lang_id_nb_trained_contract(spark):
    """Trained char-trigram Naive Bayes language ID (text.train_lang_id,
    r14 — VERDICT r13 item 7): on a real multilingual corpus the model
    separates the languages (holdout accuracy, not train accuracy) and
    training is deterministic. Not an oracle row: a fitted NB is not
    SQL-expressible (SURVEY §5.2 item 4's weaker contract)."""
    rows = [(i, y, t) for i, (y, t) in enumerate(
        (y, t) for y, ts in sorted(_LANG_CORPUS.items()) for t in ts)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "text string")
    model = tx.train_lang_id(docs, max_features=800)
    assert model == tx.train_lang_id(docs, max_features=800)
    hold = spark.createDataFrame(
        [(i, y, t) for i, (y, t) in enumerate(_LANG_HOLDOUT)],
        "doc_id long, lang string, text string")
    got = tx.score_lang_id(hold, model).collect()
    acc = sum(r["lang_pred_nb"] == r["lang"] for r in got) / len(got)
    assert acc >= 0.875, [(r["lang"], r["lang_pred_nb"]) for r in got]
    # map-only scoring plan (broadcast model, no shuffle)
    plan = (tx.score_lang_id(hold, model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_lang_id_trained_multilingual_column(spark, sf_dir):
    """r15 (VERDICT r14 item 6): the multilingual fixture column
    carries REAL language signal — the trained NB, quantized to
    integer milli-nats, classifies every held-out document correctly;
    quantization never moves the argmax here; and the render-time
    pure-Python training replica reproduces the engine-trained model
    bit-for-bit (the literal-injection contract of the graded row)."""
    from activecube_graphql_spark.driver_queries import (
        _ML_TRAIN_IDS, _lang_id_trained_model, _ml_lang_sql,
        _ml_text_sql)

    docs = _docs(spark, sf_dir)
    ml = docs.selectExpr("doc_id", _ml_lang_sql() + " AS lang",
                         _ml_text_sql() + " AS mtext")
    model = tx.train_lang_id(ml.filter(F.col("doc_id") < _ML_TRAIN_IDS),
                             label_col="lang", text_col="mtext",
                             n=3, max_features=32)
    qm = tx.quantize_lang_model(model, 1000)
    assert qm == _lang_id_trained_model()  # replica bit-identity
    hold = ml.filter(F.col("doc_id") >= _ML_TRAIN_IDS)
    got = tx.score_lang_id(hold, qm, text_col="mtext").collect()
    assert got and all(r["lang_pred_nb"] == r["lang"] for r in got)
    # unquantized model agrees on every prediction
    got_f = tx.score_lang_id(hold, model, text_col="mtext").collect()
    assert {(r["doc_id"], r["lang_pred_nb"]) for r in got} == \
        {(r["doc_id"], r["lang_pred_nb"]) for r in got_f}
    # score_col dtype follows the model (ADVICE r15): long for the
    # quantized model, double for float log-probs — the float path
    # must emit real float scores, not truncate under a long schema
    sq = tx.score_lang_id(hold.limit(8), qm, text_col="mtext",
                          score_col="s")
    assert dict(sq.dtypes)["s"] == "bigint"
    sf_ = tx.score_lang_id(hold.limit(8), model, text_col="mtext",
                           score_col="s")
    assert dict(sf_.dtypes)["s"] == "double"
    rows = sf_.collect()
    assert rows and all(isinstance(r["s"], float)
                        and r["s"] != int(r["s"]) for r in rows)


def test_lang_id_fixture_carries_no_language_signal(spark, sf_dir):
    """The honest-negative contract behind keeping the graded lang_id
    row on the marker heuristic (VERDICT r13 item 7 'or a pytest
    contract'): the synthetic fixture's text distribution is
    INDEPENDENT of its lang label, so even a real trained classifier
    cannot beat the label prior on it — the trained path must be
    demonstrated on a genuinely multilingual corpus (test above), and
    grading it against this fixture would manufacture fake signal."""
    all_docs = _docs(spark, sf_dir)
    train = all_docs.filter(F.col("doc_id") % 2 == 0).limit(400)
    hold = all_docs.filter(F.col("doc_id") % 2 == 1).limit(400)
    model = tx.train_lang_id(train, max_features=500)
    got = tx.score_lang_id(hold, model).collect()
    acc = sum(r["lang_pred_nb"] == r["lang"] for r in got) / len(got)
    labels = [r["lang"] for r in got]
    prior = max(labels.count(y) for y in set(labels)) / len(labels)
    # on held-out signal-free text the model can at best track the
    # majority prior (small slack for finite-sample artifacts)
    assert acc <= prior + 0.1, (acc, prior)


def test_bpe_byte_level_trainer(spark):
    """Byte-level train_bpe (r14 — the trainer side of the r13 apply):
    merges learn over the gpt2_byte_map alphabet from space-prefixed
    pre-tokens, training is deterministic, the hottest pre-token
    (' the') compresses, and the trained merges round-trip through
    bpe_tokenize(byte_level=True) losslessly (token concat == mapped
    pre-token bytes)."""
    rows = [(0, "the cat and the dog and the bird"),
            (1, "the cats and dogs run to the barn"),
            (2, "a bird and a dog saw the cat")]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    merges = tx.train_bpe(docs, n_merges=10, byte_level=True)
    assert merges == tx.train_bpe(docs, n_merges=10, byte_level=True)
    assert len(merges) == 10
    # ' the' occurs 6x — some 'Ġ'-prefixed merge chain must exist and
    # the full ' the' symbol must be reachable from the learned table
    syms = {a + b for a, b in merges}
    assert "Ġthe" in syms, merges
    out = {r["doc_id"]: r for r in
           tx.bpe_tokenize(docs, merges, byte_level=True).collect()}
    import re
    bm = tx.gpt2_byte_map()
    for i, text in rows:
        pre = re.findall(tx.BPE_PRETOKEN_RE, text.lower())
        want = "".join(bm[b] for w in pre for b in w.encode("utf-8"))
        assert "".join(out[i]["tokens"]) == want
        assert out[i]["bpe_count"] < len(want)  # merges actually used


def test_unigram_viterbi_beats_greedy_longest_match():
    """The Viterbi DP is a real optimizer, not greedy longest-match:
    on 'abcd' with pieces ab(100)/bcd(90), greedy takes 'ab' then
    decomposes to characters (1300); the DP finds a+bcd (690)."""
    costs = {c: 600 for c in "abcd"}
    costs.update({"ab": 100, "bcd": 90})
    pieces, cost, k = tx.viterbi_segment("abcd", costs, 3)
    assert pieces == ["a", "bcd"]
    assert (cost, k) == (690, 2)
    # uncoverable prefix fails loudly
    with pytest.raises(ValueError, match="cover"):
        tx.viterbi_segment("axz", {"a": 1, "x": 1}, 2)


def test_unigram_train_and_apply_contract(spark):
    """Unigram-LM trainer (text.train_unigram, r14 — VERDICT r13
    item 5): deterministic, totally-covering (single chars always
    survive pruning), the dominant word's pieces get cheap, and the
    Viterbi apply path re-concatenates losslessly."""
    rows = [(0, "low low low lower lower lowest"),
            (1, "low lower newer newest new"),
            (2, "low low wider wide wide")]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    costs = tx.train_unigram(docs, vocab_size=24, n_em=3)
    assert costs == tx.train_unigram(docs, vocab_size=24, n_em=3)
    assert len(costs) <= 24
    # totality: every letter of the corpus alphabet kept
    for ch in set("".join(w for _, t in rows for w in t.split())):
        assert ch in costs
    # 'low' occurs in 9 of 11 words: some low-piece must be learned
    # and priced below the single-char route
    low_routes = [p for p in costs if len(p) > 1 and p in "lower"]
    assert low_routes, costs
    out = {r["doc_id"]: r for r in
           tx.unigram_tokenize(docs, costs).collect()}
    import re
    for i, text in rows:
        words = re.findall(r"[a-z]+", text)
        assert "".join(out[i]["tokens"]) == "".join(words)
        assert out[i]["n_pieces"] == len(out[i]["tokens"])
        # the learned multi-char pieces actually get used
        assert out[i]["n_pieces"] < sum(len(w) for w in words)


def test_unigram_quantized_em_partition_invariant(spark, sf_dir):
    """r15 (VERDICT r14 item 5): graded-EM mode — injected seed +
    integer-quantized E-step — must be a PURE function of the
    word-frequency table: repartitioning the corpus (which reorders
    every distributed double-sum in the unquantized path) must not
    move a single integer cost. Also pins the mode against the
    serving path: same seed, same corpus, quantization off vs on
    agree on every cost within one centinat quantum."""
    from activecube_graphql_spark.driver_queries import _UNIGRAM_SEED

    docs = _docs(spark, sf_dir)
    a = tx.train_unigram(docs, vocab_size=64, n_em=1,
                         seed_probs=_UNIGRAM_SEED, quantize_scale=1e9)
    b = tx.train_unigram(docs.repartition(7, "source"), vocab_size=64,
                         n_em=1, seed_probs=_UNIGRAM_SEED,
                         quantize_scale=1e9)
    assert a == b
    c = tx.train_unigram(docs, vocab_size=64, n_em=1,
                         seed_probs=_UNIGRAM_SEED)
    assert set(a) == set(c)
    assert all(abs(a[p] - c[p]) <= 1 for p in a), (a, c)


def test_unigram_trained_on_fixture_corpus(spark, sf_dir):
    """Trained unigram vocab on the real fixture corpus: lossless
    segmentation, piece compression vs the character route, and
    whole frequent corpus words captured as single pieces."""
    docs = _docs(spark, sf_dir).limit(200)
    costs = tx.train_unigram(docs, vocab_size=56, n_em=3)
    out = tx.unigram_tokenize(docs, costs).collect()
    assert len(out) == 200
    import re
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    whole_words = set()
    for r in out[:25]:
        words = re.findall(r"[a-z]+", (texts[r["doc_id"]] or "").lower())
        assert "".join(r["tokens"]) == "".join(words)
        assert r["n_pieces"] < sum(len(w) for w in words)
        whole_words |= set(r["tokens"]) & set(words)
    assert whole_words  # e.g. 'the'/'data'-class words as one piece


def test_ivfpq_residual_recall_gain_at_equal_bytes(spark):
    """Residual IVFPQ (r13, VERDICT r12 item 5): on clustered data —
    the regime IVF cells model — quantizing v − centroid[cell]
    instead of the raw vector must buy recall at EQUAL bytes
    (same m, n_codes): residuals concentrate near the origin, so the
    same codebook budget covers them far more densely (the FAISS
    IVFPQ argument, verified end-to-end on the trained paths).
    Deterministic throughout: splitmix cluster fixture, hash-ordered
    sample training, no RNG."""
    import math

    def sm(i):
        # splitmix-ish scramble -> [-1, 1)
        x = (i * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
        return ((x ^ (x >> 31)) >> 11) / float(1 << 53) * 2.0 - 1.0

    dim, n_clu, n_vec = 64, 8, 400
    centers = [[sm(c * dim + d) for d in range(dim)]
               for c in range(n_clu)]
    rows = []
    for i in range(n_vec):
        c = i % n_clu
        v = [centers[c][d] + 0.12 * sm(10_000 + i * dim + d)
             for d in range(dim)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, "
                                         "embedding array<double>")
    queries = corpus.filter(F.col("vec_id") < 16)
    brute = sim.cosine_topk(corpus, queries, k=10)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}

    def recall(residual):
        ann = sim.ivf_pq_topk(corpus, queries, k=10, n_cells=8,
                              nprobe=4, m=8, n_codes=16,
                              residual=residual)
        a = {(r["query_id"], r["neighbor_id"]) for r in ann.collect()}
        return len(a & b) / len(b)

    # deterministic readings on this fixture: res 0.456 vs raw 0.394
    # (within-cluster fine structure is noise-scale, so 16 codes per
    # subspace cap absolute recall — the EQUAL-BYTES GAIN is the pin)
    r_res, r_raw = recall(True), recall(False)
    assert r_res > r_raw, (
        f"residual recall {r_res} must beat non-residual {r_raw} on "
        "clustered data at equal bytes")
    assert r_res >= 0.4, f"residual IVFPQ recall {r_res} too low"


def test_bpe_byte_level_coverage_and_gpt2_map(spark):
    """Byte-level BPE (r13, VERDICT r12 item 7): the gpt2_byte_map is
    a 256-value bijection with the printable-identity / 'Ġ'-space /
    'Ċ'-newline landmarks; ANY input — non-ASCII UTF-8, digits,
    punctuation, controls — tokenizes with nothing OOV, and with NO
    merges the token stream is exactly the mapped bytes of the
    pre-tokens (total byte coverage)."""
    bm = tx.gpt2_byte_map()
    assert len(bm) == 256 and len(set(bm.values())) == 256
    assert bm[ord("a")] == "a" and bm[ord("!")] == "!"
    assert bm[0x20] == "Ġ" and bm[0x0A] == "Ċ"
    rows = [(0, "Hello, wörld! 42\nnaïve"), (1, ""), (2, None)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           tx.bpe_tokenize(docs, [], byte_level=True).collect()}
    import re
    exp = []
    for w in re.findall(tx.BPE_PRETOKEN_RE, rows[0][1].lower()):
        exp.extend(bm[b] for b in w.encode("utf-8"))
    assert out[0]["tokens"] == exp
    assert out[0]["bpe_count"] == len(exp)
    assert out[1]["tokens"] == [] and out[2]["tokens"] == []
    # r14 (ADVICE r13): whitespace RUNS are preserved, not dropped —
    # total coverage holds byte-for-byte on multi-space input
    multi = "a  b   c\t\td"
    import re as _re
    pre = _re.findall(tx.BPE_PRETOKEN_RE, multi.lower())
    assert "".join(pre) == multi.lower()  # nothing dropped
    docs2 = spark.createDataFrame([(0, multi)],
                                  "doc_id long, text string")
    got = tx.bpe_tokenize(docs2, [], byte_level=True).collect()[0]
    want = [bm[b] for w in pre for b in w.encode("utf-8")]
    assert got["tokens"] == want


def test_bpe_byte_level_greedy_equals_rank_exhaustive_fuzz():
    """The graded bpe_bytes oracle applies merges as one chained
    replace per merge in RANK order; the engine runs the greedy
    lowest-rank loop. Fuzz the equivalence for the graded merge table
    over 5k random pre-tokens from the fixture alphabet (pure Python,
    the same check that backed the r12 word-level row)."""
    import random
    import re

    from activecube_graphql_spark.driver_queries import _BPE_BYTE_MERGES
    bm = tx.gpt2_byte_map()
    ranks = {m: r for r, m in enumerate(_BPE_BYTE_MERGES)}

    def greedy(syms):
        syms = list(syms)
        while len(syms) > 1:
            best = min(
                (ranks[(syms[j], syms[j + 1])], j)
                for j in range(len(syms) - 1)
                if (syms[j], syms[j + 1]) in ranks
            ) if any((syms[j], syms[j + 1]) in ranks
                     for j in range(len(syms) - 1)) else None
            if best is None:
                break
            j = best[1]
            syms[j:j + 2] = [syms[j] + syms[j + 1]]
        return syms

    def exhaustive(syms):
        s = "[" + "][".join(syms) + "]"
        for a, b in _BPE_BYTE_MERGES:
            s = s.replace(f"[{a}][{b}]", f"[{a}{b}]")
        return s[1:-1].split("][")

    rng = random.Random(13)
    alpha = "abcdefghijklmnopqrstuvwxy"
    for trial in range(5000):
        w = ("" if rng.random() < 0.5 else " ") + "".join(
            rng.choice(alpha) for _ in range(rng.randint(1, 12)))
        syms = [bm[b] for b in w.encode("utf-8")]
        assert greedy(syms) == exhaustive(syms), (trial, w)


def test_bpe_carry_columns_keep_their_types(spark):
    """ADVICE r12: carry columns must keep their actual Spark types —
    a long attribute carried through bpe_tokenize comes back long."""
    rows = [(0, "low lower", "web", 7), (1, "wide wider", "book", 9)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string, weight long")
    out = tx.bpe_tokenize(docs, [("l", "o")],
                          carry=("source", "weight"))
    assert dict(out.dtypes)["weight"] == "bigint"
    assert dict(out.dtypes)["source"] == "string"
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["weight"] == 7 and got[1]["source"] == "book"


def test_kn_cross_engine_fuzz_tiny_corpora(spark, tmp_path):
    """r16 cross-engine fuzz for the KN row: random TINY corpora
    drive the regimes the graded fixture never reaches — empty and
    sub-trigram docs, unseen histories at every level, and DEGENERATE
    count-of-counts (n1/n2/n3 of zero → the 0.5/1.0/1.5 discount
    fallbacks) — and the full Spark query must hash-match the DuckDB
    oracle row-for-row on the same parquet."""
    import random

    import duckdb

    from activecube_graphql_spark.driver_queries import (
        _TRIGRAM_KN_ORACLE, q_trigram_kn)
    from tools.verify_local import canon

    rng = random.Random(0xD15C0)
    words = ["the", "cat", "sat", "mat", "dog", "log", "ate", "a"]
    for case in range(4):
        n_docs = rng.randrange(4, 14)
        rows = []
        for d in range(n_docs):
            n_tok = rng.choice([0, 1, 2, 3, 3, 5, 8, 12])
            text = " ".join(rng.choice(words) for _ in range(n_tok))
            rows.append((d, f"src{d % 2}", text))
        path = str(tmp_path / f"kn{case}")
        spark.createDataFrame(
            rows, "doc_id long, source string, text string"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{path}/documents.parquet")
        got = sorted(
            tuple(canon(v) for v in r)
            for r in q_trigram_kn(spark, path)
            .select("source", "n_docs", "mean_kn", "min_kn").collect())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{path}/documents.parquet/"
                    f"*.parquet')")
        want = sorted(tuple(canon(v) for v in r) for r in
                      con.execute(_TRIGRAM_KN_ORACLE).fetchall())
        assert got == want, (case, got, want)


def test_kmeans_quantized_invariance_and_recovery(spark):
    """r16: the quantized Lloyd trainer is (a) partition/row-order
    invariant (exact integer arithmetic, total tie-breaks — the
    graded-row contract), and (b) actually clusters: on three
    well-separated blobs every member lands with its blob and the
    trained centroid components equal the exact rounded blob means."""
    from activecube_graphql_spark.operators import similarity as sim

    dim, per = 4, 7
    blobs = [[0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 1.0]]
    rows = []
    vid = 0
    # ids 0..2 are one point of each blob (the seeds), then the rest
    for b in blobs:
        rows.append((vid, [x + 0.001 * vid for x in b], vid))
        vid += 1
    for rep in range(1, per):
        for bi, b in enumerate(blobs):
            rows.append((vid, [x + 0.001 * (rep + bi) for x in b], bi))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    out = {(r["cid"], r["j"]): r for r in
           sim.kmeans_quantized(df, k=3, iters=2).collect()}
    assert len(out) == 3 * dim
    # every blob's members stayed together: counts are per blobs
    counts = {cid: out[(cid, 1)]["n_members"] for cid in (0, 1, 2)}
    assert sorted(counts.values()) == [per, per, per], counts
    # centroid = exact rounded mean of the quantized members
    for cid in (0, 1, 2):
        qs = [[round(x * 1000) for x in emb]
              for v, emb, lab in rows if lab == cid]
        for j in range(dim):
            s, n = sum(q[j] for q in qs), len(qs)
            off = sim._KM_OFF
            want = (2 * (s + n * off) + n) // (2 * n) - off
            assert out[(cid, j + 1)]["c_j"] == want, (cid, j)
    # invariance across partitionings
    a = sorted(map(tuple, sim.kmeans_quantized(
        df.repartition(1), k=3, iters=2).collect()))
    b = sorted(map(tuple, sim.kmeans_quantized(
        df.repartition(5), k=3, iters=2).collect()))
    assert a == b


def test_kmeans_assign_matches_trainer_assignment(spark):
    """The serving assign (map-only, literal centroids) reproduces the
    trainer's own final-iteration assignment when given the
    PRE-update centroids it scored against."""
    from activecube_graphql_spark.operators import similarity as sim

    rows = [(i, [((i * 13 + j * 7) % 41) / 20.0 - 1.0
                 for j in range(6)], 0) for i in range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    # one-iteration trainer: its output counts describe the assignment
    # against the SEED centroids
    out = sim.kmeans_quantized(df, k=4, iters=1).collect()
    counts = {r["cid"]: r["n_members"] for r in out if r["j"] == 1}
    seeds = {int(r["vec_id"]): [round(x * 1000) for x in r["embedding"]]
             for r in rows[:4] for r in [dict(vec_id=r[0],
                                              embedding=r[1])]}
    got = sim.kmeans_assign(df, seeds)
    agg = {r["cid"]: r["cnt"] for r in
           got.groupBy("cid").agg(F.count(F.lit(1)).alias("cnt"))
           .collect()}
    assert agg == {k: v for k, v in counts.items() if v}
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only serving pass


def test_ivf_trained_topk_structure_and_recall(spark, sf_dir):
    """r16: the trained-IVF row's structural contract — per query
    exactly topk ranked candidates, distances exactly re-computable
    from the quantized vectors, ranking totally ordered by
    (dist, vec_id), no self-matches — plus the ANN quality floor:
    nprobe=2 of 8 trained cells recovers most of the exact top-5
    (recall measured 0.8-1.0 per query on the fixture)."""
    import collections

    from activecube_graphql_spark.operators import similarity as sim

    import math

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # engine-identical quantization for the replica distances
    rows = {int(r["vec_id"]): [int(math.floor(float(x) * 1000 + 0.5))
                               for x in r["embedding"]]
            for r in emb.collect()}
    got = sim.ivf_trained_topk(emb).collect()
    by_q = collections.defaultdict(list)
    for r in got:
        by_q[r["qid"]].append((r["rank"], r["vec_id"], r["dist"]))

    def d(a, b):
        return sum((x - y) * (x - y) for x, y in zip(rows[a], rows[b]))

    recalls = []
    for qid, lst in by_q.items():
        lst.sort()
        assert [rk for rk, _, _ in lst] == list(range(1, 6))
        assert all(v != qid for _, v, _dd in lst)
        for _, v, dist in lst:
            assert dist == d(qid, v), (qid, v)
        # ranking is (dist, vec_id)-sorted
        keys = [(dist, v) for _, v, dist in lst]
        assert keys == sorted(keys)
        exact = {v for _, v in sorted(
            ((d(qid, v), v) for v in rows if v != qid))[:5]}
        recalls.append(len(exact & {v for _, v, _dd in lst}) / 5)
    assert len(by_q) == 5
    assert sum(recalls) / len(recalls) >= 0.6, recalls

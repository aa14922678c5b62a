"""Property-based cross-checks for similarity retrieval and the as-of
join, against independent brute-force Python references.

Embedding coordinates are SMALL INTEGERS: dots and squared norms are
then exact in float64 on every engine, so rank order is deterministic
cross-implementation (equal cosines are exactly equal and fall to the
id tie-break on both sides; unequal ones differ by far more than the
~1e-16 numpy-vs-JVM noise). Timestamps are integers for the same
reason. The driver oracle rows check these operators against DuckDB at
fixture scale; this harness drives the combinatorial corners — exact
ties, self-pairs, empty result sets, unmatched as-of rows, tolerance
boundaries."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(max_examples=15, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow,
                                        HealthCheck.function_scoped_fixture])

DIM = 4
vec = st.lists(st.integers(min_value=-3, max_value=3),
               min_size=DIM, max_size=DIM).filter(lambda v: any(v))
vecs = st.lists(vec, min_size=2, max_size=8)


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(y * y for y in b)))


def _edf(spark, vs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vs)],
        "vec_id long, embedding array<double>")


@settings(**_SETTINGS)
@given(vecs)
def test_cosine_topk_matches_bruteforce(spark, vs):
    """Per query (vec_id < 2): exactly the k=3 highest-cosine neighbors
    (self excluded), ranked desc with id tie-break."""
    from activecube_graphql_spark.operators import similarity as sim

    corpus = _edf(spark, vs)
    got = {}
    for r in sim.cosine_topk(corpus,
                             corpus.filter("vec_id < 2"), k=3).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cosine"]))
    for qid in range(min(2, len(vs))):
        order = sorted((i for i in range(len(vs)) if i != qid),
                       key=lambda i: (-_cos(vs[qid], vs[i]), i))[:3]
        want = [(rk + 1, i) for rk, i in enumerate(order)]
        rows = sorted(got.get(qid, []))
        assert [(rk, n) for rk, n, _ in rows] == want, (qid, vs, rows)
        for rk, n, c in rows:
            assert abs(c - round(_cos(vs[qid], vs[n]), 4)) < 1e-6, (qid, n)


@settings(**_SETTINGS)
@given(vecs)
def test_cosine_range_membership_matches_bruteforce(spark, vs):
    """cosine_range_search returns exactly the pairs with cosine >= t
    (t chosen off any integer-geometry boundary)."""
    from hypothesis import assume

    from activecube_graphql_spark.operators import similarity as sim

    # t is an arbitrary non-special decimal; rather than ARGUE no
    # integer-geometry cosine can land on it (1/3-style coincidences
    # exist: cos((1,1,2,0),(1,1,0,2)) is exactly 1/3), the test
    # VERIFIES the boundary gap per example and discards the
    # measure-zero cases where membership would hinge on the engines
    # sharing an IEEE op sequence.
    t = 0.333217
    corpus = _edf(spark, vs)
    cos_all = [_cos(vs[q], vs[i]) for q in range(min(2, len(vs)))
               for i in range(len(vs)) if i != q]
    assume(all(abs(c - t) > 1e-9 for c in cos_all))
    got = {(r["query_id"], r["neighbor_id"])
           for r in sim.cosine_range_search(
               corpus, corpus.filter("vec_id < 2"),
               threshold=t).collect()}
    want = {(q, i) for q in range(min(2, len(vs)))
            for i in range(len(vs))
            if i != q and _cos(vs[q], vs[i]) >= t}
    assert got == want, (vs, got, want)


@settings(**_SETTINGS)
@given(vecs)
def test_mmr_rerank_matches_bruteforce_greedy(spark, vs):
    """mmr_rerank equals a direct Python replay of the documented
    greedy: pool = top-4 by full cosine (id tie-break), rel = 4dp
    round, score = 0.5*rel - 0.5*max unit-dot vs selected, smaller-id
    ties, emitted score floor-half-up at 4dp."""
    from activecube_graphql_spark.operators import similarity as sim

    corpus = _edf(spark, vs)
    got = {}
    for r in sim.mmr_rerank(corpus, corpus.filter("vec_id < 1"),
                            k=2, lam=0.5, pool=4).collect():
        got.setdefault(r["query_id"], []).append(
            (r["mmr_rank"], r["neighbor_id"], r["mmr_score"]))

    qid = 0
    pool = sorted((i for i in range(len(vs)) if i != qid),
                  key=lambda i: (-_cos(vs[qid], vs[i]), i))[:4]
    rel = {i: round(_cos(vs[qid], vs[i]), 4) for i in pool}

    # the penalty matrix must be computed with the ENGINE's arithmetic
    # (numpy unit-matrix matmul over the pool in ranked order), not a
    # sequential pure-Python dot: unit vectors are irrational, the two
    # summation orders differ by ~1 ULP, and a greedy score landing on
    # a 5th-decimal midpoint then 4dp-rounds differently (hypothesis
    # found vs=[[0,0,0,1],[0,1,2,2],[0,1,2,2]]: engine -0.1666 vs
    # sequential replica -0.1667 on an exactly -0.16665 score).
    import numpy as np
    V = np.array([vs[i] for i in pool], dtype=np.float64)
    if len(pool):
        nrm = np.sqrt((V * V).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        S = (V / nrm[:, None]) @ (V / nrm[:, None]).T
    ix = {i: p for p, i in enumerate(pool)}
    avail, selected, want = list(pool), [], []
    while avail and len(selected) < 2:
        def score(i):
            if not selected:
                return 0.5 * rel[i]
            pen = max(S[ix[i], ix[s]] for s in selected)
            return 0.5 * rel[i] - 0.5 * pen
        best = min(avail, key=lambda i: (-score(i), i))
        s4 = math.floor(score(best) * 10000.0 + 0.5) / 10000.0
        avail.remove(best)
        selected.append(best)
        want.append((len(selected), best, s4))
    rows = sorted(got.get(qid, []))
    assert [(rk, n) for rk, n, _ in rows] == \
        [(rk, n) for rk, n, _ in want], (vs, rows, want)
    for (_, _, g), (_, _, w) in zip(rows, want):
        assert abs(g - w) < 1e-9, (vs, rows, want)


ts_rows = st.lists(st.tuples(st.sampled_from(["g", "h"]),
                             st.integers(min_value=0, max_value=30),
                             st.integers(min_value=-9, max_value=9)),
                   min_size=1, max_size=10)


@settings(**_SETTINGS)
@given(ts_rows, ts_rows)
def test_asof_join_matches_bruteforce(spark, lrows, rrows):
    """Backward as-of with per-group matching and tolerance: for every
    left row, the matched value is the right row with the greatest
    ts <= left.ts in the same group (ties at equal ts match), nulled
    when older than tolerance; unmatched rows survive with NULLs.
    Right timestamps are deduped per group (the operator's contract
    does not define which of two equal-ts right rows wins)."""
    from activecube_graphql_spark.operators.timeseries import asof_join

    seen = set()
    rdedup = []
    for g, t, v in rrows:
        if (g, t) not in seen:
            seen.add((g, t))
            rdedup.append((g, t, v))
    left = spark.createDataFrame(
        [(g, float(t), v) for g, t, v in lrows],
        "g string, ts double, lv long")
    right = spark.createDataFrame(
        [(g, float(t), v) for g, t, v in rdedup],
        "g string, ts double, rv long")
    for tol in (None, 5.0):
        got = sorted((r["g"], r["ts"], r["lv"], r["rv"])
                     for r in asof_join(left, right, "ts", ["g"],
                                        tolerance=tol).collect())
        want = []
        for g, t, v in lrows:
            cands = [(rt, rv) for rg, rt, rv in rdedup
                     if rg == g and rt <= t
                     and (tol is None or t - rt <= tol)]
            rv = max(cands)[1] if cands else None
            want.append((g, float(t), v, rv))
        assert got == sorted(want), (tol, lrows, rdedup, got, want)

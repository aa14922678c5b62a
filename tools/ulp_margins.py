"""Cross-engine float-margin gate for the ANN / MMR graded rows
(ADVICE r05, medium): the engine computes signatures, cell
assignments, and candidate scores with numpy blocked BLAS while the
DuckDB oracle evaluates sequential ``list_dot_product`` — the two can
differ by ~1 ULP (relative ~1e-15 for 64-dim dots).  A graded row is
only SAFE when no decision boundary sits within that noise band:

* **sign boundaries** — LSH plane dots (``dot >= 0`` flips a bucket
  bit);
* **rank boundaries** — top-k / probe-set membership and rank order
  (``row_number() OVER (ORDER BY cosine DESC)``);
* **threshold boundaries** — range / dedup / decontam gates
  (``cosine >= t``);
* **round-grid boundaries** — emitted ``round(x, 4)`` values near a
  5th-decimal midpoint, where the two engines' grids diverge.

This tool recomputes every such margin in numpy directly from the
parquet (no Spark, no DuckDB) for the grading SFs and FAILS when any
margin is below ``MARGIN`` (1e-9 — five orders of magnitude above the
accumulated-dot error bound, far below any real data gap).  Exact
zero gaps are rejected too: a bit-equal near-tie of two DIFFERENT
computations is exactly the case either engine may perturb.

Usage: python tools/ulp_margins.py [sf_dir ...]
       (default: /root/testdata/sf0.001 and /root/testdata/sf0.01,
        the driver's grading scales)
"""

from __future__ import annotations

import json
import math
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from activecube_graphql_spark.operators.similarity import (  # noqa: E402
    _plane_coefficients, fixed_centroids)

MARGIN = 1e-9
GRID = 1e-4  # emitted values are round(x, 4)


def _load(sf_dir: str):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    vecs = np.stack([np.asarray(v, dtype=np.float64)
                     for v in t["embedding"].to_pylist()])
    labels = np.asarray(t["label"], dtype=np.int64)
    order = np.argsort(ids)
    return ids[order], vecs[order], labels[order]


def _unit(v: np.ndarray) -> np.ndarray:
    n = np.sqrt((v * v).sum(axis=1))
    n[n == 0.0] = 1.0
    return v / n[:, None]


def _cosines(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return _unit(a) @ _unit(b).T


def _grid_margin(vals: np.ndarray) -> float:
    """Distance of each value to the nearest 4dp ROUNDING boundary
    (the x.00005 midpoints where engine round() grids diverge)."""
    if vals.size == 0:
        return math.inf
    frac = np.abs(vals) / GRID % 1.0
    return float(np.abs(frac - 0.5).min() * GRID)


def _rank_gaps(scores: np.ndarray, upto: int) -> float:
    """Min adjacent gap among the top ``upto`` scores (descending) —
    covers both membership at the k/k+1 boundary and rank order."""
    s = np.sort(scores)[::-1][:upto]
    if len(s) < 2:
        return math.inf
    return float(np.diff(-s).min())


class Gate:
    def __init__(self) -> None:
        self.rows: dict[str, float] = {}
        self.bad: list[str] = []

    def check(self, name: str, margin: float,
              floor: float = MARGIN) -> None:
        self.rows[name] = margin
        # `not (margin >= floor)` rather than `margin < floor`: a NaN
        # margin (e.g. a 0/0 from a degenerate vector slipping past the
        # norm guards) means the margin computation itself broke, and
        # must FAIL the gate, not silently pass it
        if not (margin >= floor):
            self.bad.append(name)


def run(sf_dir: str) -> Gate:
    g = Gate()
    ids, v, labels = _load(sf_dir)
    u = _unit(v)

    # ---- embed_lsh_ann: sign margins on 32 plane dots (raw vectors),
    # then rank/grid margins on the row's ACTUAL bucket-restricted
    # candidate set — recall < 1 means the k/k+1 boundary can sit
    # between non-adjacent GLOBAL ranks (e.g. global 9 vs 10 when ranks
    # 4-6 share no bucket with the query), so global-top-k gaps are the
    # wrong check. Candidates re-derived exactly as _lsh_buckets does:
    # table t uses planes [4t, 4t+4), bucket = (t, 4-bit sign code).
    pmat = np.asarray(_plane_coefficients(32, 64), dtype=np.float64)
    dots = v @ pmat.T
    rel = np.abs(dots) / (np.linalg.norm(v, axis=1)[:, None]
                          * np.linalg.norm(pmat, axis=1)[None, :])
    g.check("lsh.sign_rel", float(rel.min()))
    TAB, PL = 8, 4
    bits = dots >= 0.0
    codes = np.stack(
        [(bits[:, t * PL:(t + 1) * PL]
          * (1 << np.arange(PL))[None, :]).sum(axis=1)
         for t in range(TAB)], axis=1)           # (n, tables)
    q_mask = ids < 5
    cos_q = _cosines(v[q_mask], v)            # query x corpus cosines
    for qi, qid in enumerate(ids[q_mask]):
        # embed_topk / knn-family: GLOBAL top-k boundaries (these rows
        # rank over the full corpus — keep alongside the LSH candidate
        # checks, they gate DIFFERENT graded rows)
        call = cos_q[qi][ids != qid]
        g.check(f"topk.rank_gap.q{qid}", _rank_gaps(call, 6))
        g.check(f"topk.grid.q{qid}",
                _grid_margin(np.sort(call)[::-1][:5]))
        qcode = codes[ids == qid][0]
        cand = (codes == qcode[None, :]).any(axis=1) & (ids != qid)
        c = cos_q[qi][cand]
        g.check(f"lsh.cand_rank_gap.q{qid}", _rank_gaps(c, 6))
        g.check(f"lsh.cand_grid.q{qid}",
                _grid_margin(np.sort(c)[::-1][:5]))

    # ---- embed_ivf_ann: corpus argmax cell gap (top1/top2), query
    # probe-set gap (6th/7th of 16 cells), and rank/grid margins on the
    # probe-restricted candidate set the row actually emits (unit-dot
    # scoring, matching _cell_topk)
    c16 = np.asarray(fixed_centroids(16, 64), dtype=np.float64)
    cell_scores = u @ c16.T
    s16 = np.sort(cell_scores, axis=1)[:, ::-1]
    g.check("ivf.assign_gap", float((s16[:, 0] - s16[:, 1]).min()))
    sq = s16[q_mask]
    g.check("ivf.probe_gap", float((sq[:, 5] - sq[:, 6]).min()))
    corpus_cell = np.argmax(cell_scores, axis=1)
    ucos_q = u[q_mask] @ u.T
    for qi, qid in enumerate(ids[q_mask]):
        probe = np.argsort(-cell_scores[ids == qid][0],
                           kind="stable")[:6]
        cand = np.isin(corpus_cell, probe) & (ids != qid)
        c = ucos_q[qi][cand]
        g.check(f"ivf.cand_rank_gap.q{qid}", _rank_gaps(c, 6))
        g.check(f"ivf.cand_grid.q{qid}",
                _grid_margin(np.sort(c)[::-1][:5]))

    # ---- semantic_dedup (4 cells, nprobe 2, threshold 0.45 with the
    # operator's eps=1e-9 slack): probe gap 2nd/3rd, threshold margins
    # on within-probe pair cosines (superset: ALL pairs)
    c4 = np.asarray(fixed_centroids(4, 64), dtype=np.float64)
    s4 = np.sort(u @ c4.T, axis=1)[:, ::-1]
    g.check("semdedup.probe_gap", float((s4[:, 1] - s4[:, 2]).min()))
    allcos = u @ u.T
    iu = np.triu_indices(len(u), k=1)
    pairc = allcos[iu]
    for t, tag in ((0.45, "semdedup.thr"), (0.45 - 1e-9, "semdedup.thr_eps")):
        g.check(tag, float(np.abs(pairc - t).min()))

    # ---- semantic_decontam: cosine(train, bench) vs 0.35
    bench = ids % 97 == 0
    cb = _cosines(v[~bench], v[bench])
    g.check("semdecontam.thr", float(np.abs(cb - 0.35).min()))

    # ---- embed_range (queries vec_id < 3, threshold 0.2): gate margin
    # + grid margin on the emitted (>= 0.2) cosines
    q3 = ids < 3
    cr = _cosines(v[q3], v)
    mask_self = ids[None, :] != ids[q3][:, None]
    crf = cr[mask_self]
    g.check("range.thr", float(np.abs(crf - 0.2).min()))
    g.check("range.grid", _grid_margin(crf[crf >= 0.2]))

    # ---- hard_negatives (queries vec_id < 5, k=3, label mismatch)
    for qi, qid in enumerate(ids[q_mask]):
        neg = cos_q[qi][labels != labels[ids == qid][0]]
        g.check(f"hardneg.rank_gap.q{qid}", _rank_gaps(neg, 4))
        g.check(f"hardneg.grid.q{qid}", _grid_margin(np.sort(neg)[::-1][:3]))

    # ---- mmr_rerank (queries vec_id < 2, pool 8, k 3, lam 0.5):
    # pool-membership gap (8th/9th), per-step argmax gap, grid margins
    # on the emitted pool rels and the floor-rounded scores
    for qid in (0, 1):
        qv = v[ids == qid][0]
        others = ids != qid
        cq = _cosines(qv[None, :], v[others])[0]
        oid = ids[others]
        g.check(f"mmr.pool_gap.q{qid}", _rank_gaps(cq, 9))
        order = np.lexsort((oid, -cq))[:8]
        pool_ids, pool_cos = oid[order], cq[order]
        g.check(f"mmr.pool_grid.q{qid}", _grid_margin(pool_cos))
        rel = np.round(pool_cos, 4)
        pu = u[others][order]
        simmat = pu @ pu.T
        avail = list(range(8))
        selected: list[int] = []
        step = 0
        while avail and len(selected) < 3:
            step += 1
            if selected:
                pen = simmat[np.ix_(avail, selected)].max(axis=1)
                scores = 0.5 * rel[avail] - 0.5 * pen
            else:
                scores = 0.5 * rel[avail]
            srt = np.sort(scores)[::-1]
            if len(srt) > 1:
                g.check(f"mmr.step{step}_gap.q{qid}",
                        float(srt[0] - srt[1]))
            j = min(range(len(avail)),
                    key=lambda i: (-scores[i], pool_ids[avail[i]]))
            # emitted score is floor(x*1e4 + 0.5)/1e4: the boundary is
            # the FLOOR-integer edge of x*1e4 + 0.5. Step 1 is exempt:
            # its score is 0.5·rel — an EXACT halving of a double both
            # engines hold bit-identically (rel is the 4dp-rounded
            # cosine, itself grid-margin-checked above), so x is
            # bit-identical and floor is deterministic even exactly ON
            # the edge. Steps 2+ carry the BLAS-vs-sequential penalty
            # noise and must stay clear of the edge.
            if step > 1:
                x = float(scores[j]) * 10000.0 + 0.5
                g.check(f"mmr.score_grid.q{qid}s{step}",
                        abs(x - round(x)) / 10000.0)
            selected.append(avail.pop(j))
    return g


def _grid_exact(name: str, g: Gate, vals: np.ndarray, unit: float) -> None:
    """Assert a money column actually lies on its declared decimal grid
    (within double-repr noise ≪ half a grid step). This is the DATA
    CONTRACT the exact cents4 revenue aggregation (cubes._REVENUE_SQL,
    r08: ``floor(x*100 + 0.5)``) rests on: the floor recovers the true
    integer cents only while the double is within ~0.005 of a grid
    point, so a fixture violating the grid would silently re-round
    off-grid values instead of exactifying them. Margin = half-step
    minus the worst deviation (positive and large when the contract
    holds)."""
    steps = vals / unit
    dev = float(np.abs(steps - np.rint(steps)).max()) * unit if vals.size \
        else 0.0
    g.check(f"grid.{name}", unit / 2.0 - dev, floor=unit / 4.0)


def run_sum_rounding(sf_dir: str) -> Gate:
    """ADVICE r06 follow-through, post-migration shape. The revenue
    family (round(sum(extendedprice·(1-discount)), 2)) aggregates
    exactly since r07 (DECIMAL r07 → unscaled BIGINT cents4 r08,
    Metric.money_sum) — order-independent by construction, no
    midpoint margin to check; what it needs instead is the 2dp-grid
    data contract asserted by ``_grid_exact``. The rows still summing
    doubles — ``skew_salted_join`` (sum(o_totalprice)) and
    ``moving_avg`` (per-day sum(events.value)) — are safe by a
    different construction: their inputs sit ON the cent grid, so
    every group sum is a whole number of cents and the nearest 2dp
    midpoint is exactly 0.005 away; the midpoint checks below verify
    that argument from the actual exact sums (int64 cents, no float
    error in the gate itself)."""
    g = Gate()
    li = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                       columns=["l_extendedprice", "l_discount"])
    _grid_exact("l_extendedprice", g,
                np.asarray(li["l_extendedprice"], dtype=np.float64), 0.01)
    _grid_exact("l_discount", g,
                np.asarray(li["l_discount"], dtype=np.float64), 0.01)

    # skew_salted_join sums o_totalprice and moving_avg sums
    # events.value in DOUBLE: both stay safe WITHOUT decimal because a
    # sum of cent-grid values is a whole number of cents, whose
    # distance to the nearest x.xx5 rounding midpoint is exactly
    # 0.005 — three orders of magnitude above summation-order noise.
    # The whole argument therefore reduces to the two grid contracts:
    t = pq.read_table(os.path.join(sf_dir, "orders.parquet"),
                      columns=["o_totalprice"])
    _grid_exact("o_totalprice", g,
                np.asarray(t["o_totalprice"], dtype=np.float64), 0.01)
    ev = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                       columns=["value"])
    _grid_exact("events.value", g,
                np.asarray(ev["value"], dtype=np.float64), 0.01)
    return g


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001",
                            "/root/testdata/sf0.01"]
    ok = True
    for d in dirs:
        g = run(d)
        gs = run_sum_rounding(d)
        worst = sorted(g.rows.items(), key=lambda kv: kv[1])[:8]
        worst_s = sorted(gs.rows.items(), key=lambda kv: kv[1])[:4]
        print(json.dumps({
            "sf_dir": d, "n_checks": len(g.rows) + len(gs.rows),
            "min_margin": min(g.rows.values()),
            "min_sum_margin": min(gs.rows.values()),
            "worst": {k: f"{m:.3e}" for k, m in worst},
            "worst_sums": {k: f"{m:.3e}" for k, m in worst_s},
            "violations": g.bad + gs.bad,
        }))
        ok = ok and not g.bad and not gs.bad
    if not ok:
        print("ULP MARGIN GATE FAILED", file=sys.stderr)
        sys.exit(1)
    print("ulp margins ok")


if __name__ == "__main__":
    main()

"""Generate an sf1 fixture slice (10× sf0.1) for scaling-curve runs
(VERDICT r06 item 6) — NOT for grading or freezing, only to measure
whether the heavy rows' wall-time grows ~linearly in input.

Writes /tmp/sf1/{documents,embeddings,lineitem,events}.parquet — the
three tables the top-10 heaviest bench rows read, plus events (r08)
for the partitioned-lake pruning audit and the streaming-maintenance
scale runs. /root/testdata is read-only, and /tmp keeps the ~10×
parquet out of the repo.

Design: naive 10× row replication would be PATHOLOGICAL for the dedup
family — every doc would sit in a 10-clone cluster, turning the pair
set quadratic in the replication factor instead of scaling the real
workload. Instead each table is regenerated from sf0.1's measured
statistics with the duplicate structure planted at the same PER-ROW
rate (measured: 256 minhash-verified pairs and 8 exact-dup rows per
5 000 docs; 31-word vocabulary; length mean 54, range 10–100; 20
sources; lang mix ≈ en .41 / others .15):

* documents — fresh word-salads over the same vocabulary with the
  empirical length distribution (resampled from sf0.1's actual
  lengths); with p = 256/5000 a doc is instead an ~8 %-mutated clone
  of a recent doc (word-3-gram Jaccard ≈ 0.92³/(2·0.92³ ... ) ≈ 0.6 >
  the 0.5 verify threshold), and with p = 8/5000 an EXACT clone —
  near-dup pair mass scales linearly by construction.
* embeddings — unit vectors from per-label (mean-direction, residual
  σ) Gaussians fitted on sf0.1's 10 label clusters; proximity-pair
  growth is then whatever the distribution implies (data-driven,
  honest — noted in the BENCH_NOTES interpretation).
* lineitem — 10 shifted replicas (l_orderkey offset); quantile work
  is row-linear and value-distribution-identical by construction.

Deterministic (numpy RandomState(4242)). ~50 000 docs / 20 000
vectors / ~6 M lineitem rows; runs in well under a minute.

Usage: python tools/make_sf1.py [out_dir] [table ...]
       (default /tmp/sf1, all tables; table names are validated and
       each table draws from its own SEED+k stream, so selective and
       full runs write identical parquet)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SEED = 4242
DOCS_N = 50_000
EMB_N = 20_000
P_NEARDUP = 256 / 5000
P_EXACT = 8 / 5000
MUTATE_FRAC = 0.08
LINEITEM_REPLICAS = 10


def make_documents(rng: np.random.RandomState, out_dir: str) -> None:
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = src["text"].to_pylist()
    vocab = sorted({w for t in texts for w in t.split(" ")})
    lengths = np.array([len(t.split(" ")) for t in texts])
    langs, lang_counts = np.unique(np.asarray(src["lang"]),
                                   return_counts=True)
    lang_p = lang_counts / lang_counts.sum()
    n_sources = len(set(src["source"].to_pylist()))

    out_texts: list[str] = []
    for i in range(DOCS_N):
        u = rng.rand()
        if i > 0 and u < P_EXACT:
            out_texts.append(out_texts[rng.randint(max(0, i - 500), i)])
        elif i > 0 and u < P_EXACT + P_NEARDUP:
            words = out_texts[rng.randint(max(0, i - 500), i)].split(" ")
            w = np.array(words, dtype=object)
            k = max(1, int(len(w) * MUTATE_FRAC))
            pos = rng.choice(len(w), size=k, replace=False)
            w[pos] = rng.choice(vocab, size=k)
            out_texts.append(" ".join(w.tolist()))
        else:
            n = int(lengths[rng.randint(len(lengths))])
            out_texts.append(" ".join(
                rng.choice(vocab, size=n).tolist()))
    tbl = pa.table({
        "doc_id": pa.array(range(DOCS_N), pa.int64()),
        "text": pa.array(out_texts),
        "lang": pa.array(rng.choice(langs, size=DOCS_N, p=lang_p)),
        "source": pa.array([f"src{rng.randint(n_sources)}"
                            for _ in range(DOCS_N)]),
        "n_chars": pa.array([len(t) for t in out_texts], pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))
    print(f"documents: {DOCS_N} rows, vocab {len(vocab)}")


def make_embeddings(rng: np.random.RandomState, out_dir: str) -> None:
    src = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    labels = np.asarray(src["label"], dtype=np.int64)
    v = np.stack([np.asarray(x, dtype=np.float64)
                  for x in src["embedding"].to_pylist()])
    uniq = np.unique(labels)
    dim = v.shape[1]
    means = {int(l): v[labels == l].mean(axis=0) for l in uniq}
    sigmas = {int(l): float((v[labels == l]
                             - means[int(l)][None, :]).std())
              for l in uniq}
    lab_p = np.array([(labels == l).sum() for l in uniq], dtype=float)
    lab_p /= lab_p.sum()
    out_lab = rng.choice(uniq, size=EMB_N, p=lab_p)
    out = np.empty((EMB_N, dim))
    for l in uniq:
        m = out_lab == l
        out[m] = (means[int(l)][None, :]
                  + sigmas[int(l)] * rng.randn(int(m.sum()), dim))
    out /= np.maximum(np.linalg.norm(out, axis=1), 1e-12)[:, None]
    tbl = pa.table({
        "vec_id": pa.array(range(EMB_N), pa.int64()),
        "embedding": pa.array([row for row in out.astype(np.float64)],
                              pa.list_(pa.float64())),
        "label": pa.array(out_lab.astype(np.int64), pa.int64()),
    })
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))
    print(f"embeddings: {EMB_N} rows, dim {dim}")


def make_lineitem(out_dir: str) -> None:
    src = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    okey = np.asarray(src["l_orderkey"], dtype=np.int64)
    span = int(okey.max()) + 1
    parts = []
    for r in range(LINEITEM_REPLICAS):
        t = src
        if r:
            t = t.set_column(t.schema.get_field_index("l_orderkey"),
                             "l_orderkey",
                             pa.array(okey + r * span, pa.int64()))
        parts.append(t)
    tbl = pa.concat_tables(parts)
    pq.write_table(tbl, os.path.join(out_dir, "lineitem.parquet"))
    print(f"lineitem: {tbl.num_rows} rows ({LINEITEM_REPLICAS} replicas)")


EVENTS_N = 1_000_000
EVENTS_DAYS = 300  # 10× data at the same event RATE = 10× retention:
#                    the realistic event-log axis of growth, and the one
#                    that exercises date-partition pruning (302 daily
#                    partitions vs sf0.1's 30)


def make_events(rng: np.random.RandomState, out_dir: str) -> None:
    """Events with sf0.1's schema and marginals (type mix, user range,
    cent-grid values, {"k": int} props) over a 300-day span — the sf1
    substrate for the partitioned-lake pruning audit (tools/dpp_sf1.py)
    and the streaming maintenance scale runs."""
    src = pq.read_table(os.path.join(SRC, "events.parquet"))
    types, counts = np.unique(np.asarray(src["event_type"]),
                              return_counts=True)
    type_p = counts / counts.sum()
    n_users = int(np.asarray(src["user_id"]).max()) + 1
    t0 = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = EVENTS_DAYS * 86_400_000_000
    ts = t0 + np.sort(
        rng.randint(0, span_us, EVENTS_N).astype("timedelta64[us]"))
    value = np.round(rng.exponential(90.0, EVENTS_N), 2)  # cent grid
    tbl = pa.table({
        "event_id": pa.array(range(EVENTS_N), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.randint(0, n_users, EVENTS_N), pa.int64()),
        "event_type": pa.array(rng.choice(types, EVENTS_N, p=type_p)),
        "value": pa.array(value, pa.float64()),
        "props": pa.array([f'{{"k": {k}}}'
                           for k in rng.randint(0, 100, EVENTS_N)]),
    })
    pq.write_table(tbl, os.path.join(out_dir, "events.parquet"))
    print(f"events: {EVENTS_N} rows over {EVENTS_DAYS} days")


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    only = set(sys.argv[2:])
    # one independent RandomState per table (SEED+k), so a selective
    # run (`make_sf1.py DIR events`) writes byte-identical parquet to
    # the full run — a shared stream would hand later tables whatever
    # state earlier tables left behind (review r08). documents keeps
    # SEED+0 = the original stream head, so pre-r08 documents evidence
    # stays reproducible.
    tables = {
        "documents": lambda: make_documents(
            np.random.RandomState(SEED), out_dir),
        "embeddings": lambda: make_embeddings(
            np.random.RandomState(SEED + 1), out_dir),
        "lineitem": lambda: make_lineitem(out_dir),
        "events": lambda: make_events(
            np.random.RandomState(SEED + 3), out_dir),
    }
    unknown = only - set(tables)
    if unknown:
        raise SystemExit(f"unknown table(s) {sorted(unknown)}; "
                         f"choose from {sorted(tables)}")
    for name, make in tables.items():
        if not only or name in only:
            make()


if __name__ == "__main__":
    main()

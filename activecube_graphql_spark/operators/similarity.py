"""Similarity search over embedding columns (SURVEY §7 slice 6).

* **cosine_topk** — exact brute-force top-k: broadcast the (small) query
  set against the corpus, dot products via ``F.zip_with``+``F.aggregate``
  (JVM-side, codegen — no Python UDF), per-query top-k via the
  window+row_number pattern (WindowGroupLimitExec pushes the rank limit
  below the shuffle). The baseline every ANN variant is checked against.
* **lsh_ann_topk** — the scale path: random-hyperplane LSH. Deterministic
  ±1 hyperplanes derived from xxhash64(plane, dim) so results are
  reproducible with no driver-side randomness; corpus is bucketed by the
  sign-bit signature, queries probe only their own bucket (plus optional
  multi-probe neighbors). At 100 TB the bucket join replaces the full
  cross product: cost O(corpus + queries × bucket_size).
* **embedding_cosine_pairs** — near-duplicate detection: all pairs with
  cosine ≥ τ (brute at test scale; LSH-prefiltered variant included).
  The exact quadratic path uses **numpy-blocked candidate generation**:
  one side broadcast as a dense matrix, ``mapInPandas`` computing blocked
  matrix products (Arrow batches in, BLAS in C, tiny candidate sets out),
  with survivors **re-scored JVM-side by the sequential-order dot** so
  final values are bit-identical to a SQL oracle regardless of BLAS
  summation order (the matmul filter keeps an epsilon margin, so it can
  never drop a true positive).
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Similarity scans are cheap per input byte (one dot per candidate, or a
# BLAS batch in mapInPandas) — fan out one task per this many bytes
# instead of one per core, so tiny corpora don't pay 32 tasks of
# scheduler overhead while big single-file inputs still use every core.
SCAN_BYTES_PER_TASK = 4 << 20


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


# (measured: a compile-time-unrolled 64-term dot expression is SLOWER than
# the higher-order-function form on Spark 4 — giant expression trees fall
# out of codegen while zip_with/aggregate evaluate in a tight JVM loop; the
# quadratic-part speedups live in the numpy-blocked candidate paths below)


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _safe_norm(a: Column) -> Column:
    """Norm floored at a subnormal: a ZERO vector's norm would put NaN
    into the cosine quotient, and Spark orders NaN above every double —
    so an all-zero embedding would rank #1 against every query and pass
    every ≥-threshold filter (review r08; the numpy paths already guard
    with n[n==0]=1). The zero vector's dot with anything is exactly 0,
    so 0/tiny = 0 — the guard changes NOTHING for any nonzero vector
    (greatest evaluates the norm once; a when(n==0) form would double
    the O(dim) fold on the hot path)."""
    return F.greatest(_norm(a), F.lit(1e-300))


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return _dot(a, b) / (_safe_norm(a) * _safe_norm(b))


def _unit(col: Column) -> Column:
    """Pre-normalized double vector. **Use only on small/bounded frames**
    (the IVF training sample): the ``transform`` lambda captures the norm
    as an expression SUBTREE, so interpreted HOF evaluation recomputes the
    full O(dim) norm per array element — O(dim²) work per row. On hot
    join-side prep this was measured as the r02 ``embed_topk`` regression;
    the scan-side shape is a **norm column** (see cosine_topk): O(dim)
    per row, one dot + one divide per candidate pair. Zero vectors stay
    zero (_safe_norm), never NaN — an all-NaN training row would poison
    its k-means cell mean and collapse the IVF quantizer (review r08)."""
    v = _as_double(col)
    n = _safe_norm(v)
    return F.transform(v, lambda x: x / n)


def _dot_sql(a: str, b: str) -> str:
    """The dot product as SQL text. At sf-scale the embed queries are
    DRIVER-bound, not executor-bound (measured: 0.07 s execution inside
    ~1 s wall): every Python-built HOF lambda costs several py4j round
    trips at plan-build time. One SQL string is one gateway call and
    parses JVM-side — same physical plan, ~40% less wall time."""
    return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0d, "
            f"(acc, v) -> acc + v)")


def _with_norm(df: DataFrame, id_col: str, vec_col: str,
               id_alias: str, vec_alias: str, norm_alias: str) -> DataFrame:
    """Scan-side prep: (id, double vector, scalar L2 norm). The norm is a
    plain double column, so the per-pair cosine is one HOF dot plus one
    divide — the cheapest interpreted-HOF shape (norms never recomputed
    on the quadratic part of the plan)."""
    return df.selectExpr(
        f"`{id_col}` AS {id_alias}",
        f"transform(`{vec_col}`, x -> cast(x AS double)) AS {vec_alias}",
    ).selectExpr(
        "*", f"sqrt({_dot_sql(vec_alias, vec_alias)}) AS {norm_alias}")


def _scored_pairs(corpus: DataFrame, queries: DataFrame, id_col: str,
                  vec_col: str, label_col: Optional[str] = None,
                  exclude_self: bool = True) -> DataFrame:
    """Shared broadcast-query scoring pipeline behind cosine_topk /
    cosine_range_search / hard_negatives: queries broadcast (small by
    construction), corpus scanned once — a map-side nested loop per
    partition. Norms are computed once per side as scalar columns BELOW
    the join (cosine = dot / (q_n · c_n) per pair) — measured 1.6×
    faster at sf0.1 than pre-normalizing the vectors, because a
    normalize-lambda re-evaluates its captured norm subtree per element
    (see _unit). With ``label_col``, each side's label rides its scan
    projection (``q_label``/``n_label``) — never a join back onto the
    corpus. Any filter the caller adds on ids/labels is pushed below
    this projection by Catalyst (it doesn't depend on ``cosine``)."""
    from ..operators.dedup import ensure_parallelism

    def prep(df: DataFrame, id_alias: str, vec_alias: str,
             norm_alias: str, lab_alias: str) -> DataFrame:
        cols = [f"`{id_col}` AS {id_alias}"]
        if label_col is not None:
            cols.append(f"`{label_col}` AS {lab_alias}")
        cols.append(
            f"transform(`{vec_col}`, x -> cast(x AS double)) AS {vec_alias}")
        # greatest(…, subnormal): a zero vector's norm would make the
        # cosine quotient NaN — which Spark ranks ABOVE every real
        # score (see _safe_norm); 0-dot/tiny = 0 and nonzero vectors
        # are untouched
        return df.selectExpr(*cols).selectExpr(
            "*", f"greatest(sqrt({_dot_sql(vec_alias, vec_alias)}), "
                 f"1e-300d) AS {norm_alias}")

    q = prep(queries, "query_id", "q_vec", "q_n", "q_label")
    c = prep(ensure_parallelism(corpus, SCAN_BYTES_PER_TASK),
             "neighbor_id", "c_vec", "c_n", "n_label")
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter("query_id != neighbor_id")
    return joined.selectExpr(
        "*", f"{_dot_sql('q_vec', 'c_vec')} / (q_n * c_n) AS cosine")


def _query_topk(scored: DataFrame, k: int, extra_cols: tuple[str, ...] = ()
                ) -> DataFrame:
    """Per-query top-k over a _scored_pairs frame; ties broken by
    corpus id (deterministic hash parity with SQL oracles)."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .selectExpr("query_id", *extra_cols, "neighbor_id",
                        "round(cosine, 4) AS cosine",
                        "cast(rn AS long) AS rank"))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                exclude_self: bool = True) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector — the
    broadcast-query scoring pipeline (see _scored_pairs) plus a
    per-query-group top-k."""
    return _query_topk(_scored_pairs(corpus, queries, id_col, vec_col,
                                     exclude_self=exclude_self), k)


def hard_negatives(corpus: DataFrame, queries: DataFrame, k: int = 3,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the top-``k`` most-similar corpus vectors with a DIFFERENT label —
    the "looks alike, isn't" examples metric-learning losses are built
    from (the easy negatives a random sampler draws carry no gradient).

    The broadcast-query scoring pipeline (see _scored_pairs, with
    labels riding each side's scan projection — never a join back onto
    the corpus) plus a label-mismatch filter BELOW the per-query top-k
    window, so the ranking covers only true negatives; ties break on
    corpus id (deterministic, oracle-checkable since the similarity is
    exact)."""
    scored = (_scored_pairs(corpus, queries, id_col, vec_col,
                            label_col=label_col, exclude_self=False)
              .filter(F.col("n_label") != F.col("q_label")))
    return _query_topk(scored, k, extra_cols=("q_label", "n_label"))


def cosine_range_search(corpus: DataFrame, queries: DataFrame,
                        threshold: float = 0.5, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        exclude_self: bool = True) -> DataFrame:
    """Range similarity query: ALL corpus vectors with cosine ≥
    ``threshold`` of each query vector — the radius-based retrieval twin
    of :func:`cosine_topk` (dedup thresholds, diversity filters, policy
    screens want "everything this close", not a fixed k).

    Same scale shape as cosine_topk (shared _scored_pairs pipeline) —
    and because there is no per-group top-k, the plan is pure
    scan→filter, cheaper than top-k. Output size is data-dependent
    rather than k-bounded."""
    return (_scored_pairs(corpus, queries, id_col, vec_col,
                          exclude_self=exclude_self)
            .filter(F.col("cosine") >= threshold)
            .selectExpr("query_id", "neighbor_id",
                        "round(cosine, 4) AS cosine"))


def mmr_rerank(corpus: DataFrame, queries: DataFrame, k: int = 5,
               lam: float = 0.5, pool: int = 20,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal-Marginal-Relevance re-ranking: per query, greedily pick
    ``k`` of the top-``pool`` cosine candidates maximizing
    ``lam·sim(q,d) − (1−lam)·max_{s∈selected} sim(d,s)`` — retrieval
    that stays RELEVANT but not REDUNDANT (Carbonell & Goldstein 1998).
    The curation use: sampling diverse representatives out of a
    near-duplicate-rich candidate set instead of k copies of the same
    document. Deterministic: candidate order is (cosine desc, id asc)
    and greedy ties resolve to the smaller id, so repeated runs agree.

    Scale shape: the candidate pool rides :func:`cosine_topk`
    (broadcast queries, single corpus scan, WindowGroupLimit top-pool);
    the greedy loop is per-query over ≤ ``pool`` candidates — an
    O(pool²) numpy block inside ``applyInPandas``, bounded per task
    regardless of corpus size. Every input to the greedy loop is a
    pure function of the rows (exact cosine pool, deterministic
    tie-breaks), so at a FIXED small k the driver row carries a
    bit-exact DuckDB oracle that unrolls the greedy steps as chained
    CTEs (driver_queries._MMR_RERANK_ORACLE, r06); the
    first-pick/diversity/determinism contracts stay pytest-asserted
    for the general (k, lam, pool) surface."""
    from collections.abc import Iterator  # noqa: F401 (parity w/ peers)

    import numpy as np
    import pandas as pd

    cand = cosine_topk(corpus, queries, k=pool, id_col=id_col,
                       vec_col=vec_col)
    vecs = corpus.select(F.col(id_col).alias("neighbor_id"),
                         _as_double(F.col(vec_col)).alias("__v"))
    pool_df = cand.join(vecs, "neighbor_id")
    lam_f = float(lam)

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cosine", "neighbor_id"],
                              ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
        ids = pdf["neighbor_id"].to_numpy()
        rel = pdf["cosine"].to_numpy(dtype=np.float64)
        v = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
        n = np.sqrt((v * v).sum(axis=1))
        n[n == 0.0] = 1.0
        u = v / n[:, None]
        simmat = u @ u.T
        avail = list(range(len(pdf)))
        selected: list[int] = []
        out = []
        while avail and len(selected) < k:
            if selected:
                pen = simmat[np.ix_(avail, selected)].max(axis=1)
                scores = lam_f * rel[avail] - (1.0 - lam_f) * pen
            else:
                scores = lam_f * rel[avail]
            j = min(range(len(avail)),
                    key=lambda i: (-scores[i], ids[avail[i]]))
            idx = avail.pop(j)
            selected.append(idx)
            # portable 4dp half-up: floor(x·1e4 + 0.5)/1e4 is the same
            # IEEE op sequence on every engine, where native round()
            # implementations disagree on exact grid midpoints — and
            # 0.5·(a 4dp-rounded rel) lands ON a 5th-decimal midpoint
            # whenever rel's last digit is odd (measured: Python round
            # half-even vs DuckDB round half-up flipped rank-1 scores)
            s4 = math.floor(float(scores[j]) * 10000.0 + 0.5) / 10000.0
            out.append((int(pdf["query_id"].iloc[0]), int(ids[idx]),
                        len(selected), s4))
        return pd.DataFrame(out, columns=["query_id", "neighbor_id",
                                          "mmr_rank", "mmr_score"])

    return (pool_df.groupBy("query_id").applyInPandas(
        pick, schema="query_id long, neighbor_id long, "
                     "mmr_rank int, mmr_score double"))


def semantic_decontaminate(corpus: DataFrame, bench: DataFrame,
                           threshold: float = 0.85,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """Embedding-level benchmark decontamination: drop every corpus row
    whose vector sits within cosine ``threshold`` of ANY benchmark
    vector — the semantic companion to the shingle-overlap
    ``dedup.decontaminate``: paraphrased or translated eval leakage
    shares no n-grams but keeps a close embedding.

    Scale shape: the benchmark is eval-suite-sized by construction, so
    it rides the broadcast-queries side of the shared ``_scored_pairs``
    pipeline — the corpus scans exactly ONCE with map-side scoring and
    never shuffles for the scoring; the drop is a LEFT ANTI on the
    (tiny, distinct) flagged-id frame, which AQE broadcasts. For a
    corpus-sized "benchmark", pre-bucket both sides with the LSH/IVF
    quantizers instead (embedding_cosine_pairs' routing)."""
    flagged = (cosine_range_search(corpus, bench, threshold,
                                   id_col, vec_col, exclude_self=False)
               .select(F.col("neighbor_id").alias(id_col)).distinct())
    return corpus.join(flagged, id_col, "left_anti")


# ----------------------------------------------------------------- LSH ANN

def _scramble(p: int, d: int, seed: int = 0x9E3779B9) -> int:
    """Splitmix64-style integer scramble of (p, d) — the shared
    deterministic randomness source for LSH planes and fixed centroids:
    no RNG state, reproducible across runs, engines, and languages."""
    x = (p * 1_000_003 + d * 7_919 + seed) & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _plane_coefficients(planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane coefficients: coefficient(p, d) from the
    parity of a seeded integer hash (splitmix64-style scramble) — no
    driver-side RNG state, reproducible across runs and engines."""
    return [[1.0 if _scramble(p, d) & 1 else -1.0 for d in range(dim)]
            for p in range(planes)]


def fixed_centroids(n_cells: int, dim: int) -> list[list[float]]:
    """Data-independent unit centroids from the splitmix stream (distinct
    seed from the LSH planes): an injectable coarse quantizer.  Where the
    sample-trained k-means quantizer adapts to the corpus (the serving
    default, recall-tested in pytest), these constants make the whole IVF
    / SemDeDup pipeline a pure function of the input rows — so an
    independent SQL engine can re-derive cell assignment from the same
    literals and the driver can hash-check the approximate result
    end-to-end.  Uniform in [-1, 1) then row-normalized in float64."""
    cent = []
    for p in range(n_cells):
        row = [(_scramble(p, d, seed=0x51_7CC1B7) >> 11) / float(1 << 53)
               * 2.0 - 1.0 for d in range(dim)]
        n = math.sqrt(sum(x * x for x in row)) or 1.0
        cent.append([x / n for x in row])
    return cent


def _hyperplane_signature(vec: Column, planes: int, dim: int) -> Column:
    """Sign-bit signature under deterministic ±1 hyperplanes. The planes
    are compile-time constants, so each one is a literal array and the
    per-row work is ``planes`` fused dot products (codegen, no shuffle)."""
    v = _as_double(vec)
    sig = F.lit(0).cast("long")
    for p, row in enumerate(_plane_coefficients(planes, dim)):
        coef = F.array(*[F.lit(c) for c in row])
        s = _dot(coef, v)
        sig = sig.bitwiseOR(
            F.when(s >= 0, F.lit(1 << p).cast("long"))
             .otherwise(F.lit(0).cast("long")))
    return sig


def _lsh_buckets(df: DataFrame, id_alias: str, vec_alias: str,
                 id_col: str, vec_col: str,
                 tables: int, planes: int, dim: int,
                 signed: DataFrame | None = None) -> DataFrame:
    """One row per (vector, hash table): bucket = (table, signature).
    Each table uses its own plane set (offset into the coefficient
    stream), the standard multi-table LSH trick that trades candidate
    count for recall.

    Signatures are computed as ONE numpy matmul per Arrow batch
    (``V @ P.T`` then sign-bit packing) — the Column-expression form
    (32 aggregate-dots fused into one expression) costs more in Catalyst
    compilation than the whole query's execution. ``signed`` injects a
    precomputed (id, vec, sig) frame (:func:`ann_corpus_encode` — the
    identical kernel) in place of the signature stage; the JVM bucket
    explode below is unchanged (r17 audit-row sharing)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..operators.dedup import ensure_parallelism
    all_planes = tables * planes
    # signatures travel as signed long; bucket extraction uses arithmetic
    # shiftright, which is only sign-safe while the top bits stay clear
    assert all_planes <= 62, "tables * planes must be <= 62"

    if signed is not None:
        tagged = signed.select(F.col("neighbor_id").alias(id_alias),
                               F.col("vec").alias(vec_alias),
                               F.col("sig").alias("__sig"))
    else:
        pmat = np.array(_plane_coefficients(all_planes, dim),
                        dtype=np.float64)
        weights = ((1 << np.arange(all_planes, dtype=np.uint64))
                   .astype(np.uint64))

        def sign(batches: Iterator[pd.DataFrame]
                 ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                v = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
                bits = (v @ pmat.T) >= 0.0
                sig = (bits.astype(np.uint64)
                       * weights[None, :]).sum(axis=1)
                yield pd.DataFrame({"__id": pdf["__id"],
                                    "__v": pdf["__v"],
                                    "__sig": sig.astype(np.int64)})

        df = ensure_parallelism(df, SCAN_BYTES_PER_TASK)
        src = df.select(F.col(id_col).alias("__id"),
                        _as_double(F.col(vec_col)).alias("__v"))
        sig_schema = ("__id long, __v array<double>, __sig long")
        tagged = (src.mapInPandas(sign, schema=sig_schema)
                  .select(F.col("__id").alias(id_alias),
                          F.col("__v").alias(vec_alias),
                          F.col("__sig").alias("__sig")))
    mask = (1 << planes) - 1
    buckets = F.array(*[
        F.struct(F.lit(t).alias("table"),
                 F.shiftright(F.col("__sig"), t * planes)
                  .bitwiseAND(F.lit(mask)).alias("h"))
        for t in range(tables)])
    return (tagged.withColumn("bucket", F.explode(buckets))
            .drop("__sig"))


def lsh_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 tables: int = 8, planes: int = 4, dim: int = 64,
                 exclude_self: bool = True,
                 corpus_sig: DataFrame | None = None) -> DataFrame:
    """Approximate top-k: candidates limited to vectors sharing at least
    one LSH bucket with the query (L hash tables × b hyperplanes each).

    Recall < 1 by construction — validated against cosine_topk recall in
    tests; with the default data-independent splitmix planes the output
    is also a pure function of its inputs, so the driver row carries a
    bit-exact DuckDB oracle that re-derives the signatures from the
    same plane literals (driver_queries._lsh_ann_oracle, green since
    r05). Cost model at 100 TB:
    corpus signatures are one map-only pass; the bucket join touches
    O(corpus × tables) rows; a pair colliding in t tables is scored t
    times and deduped AFTER scoring (identical doubles per duplicate —
    see below), versus O(corpus × queries) for brute force.

    ``corpus_sig`` injects a precomputed (neighbor_id, vec, sig) frame
    (:func:`ann_corpus_encode` — the identical signature kernel) in
    place of the corpus signature stage (r17 audit-row sharing)."""
    c = _lsh_buckets(corpus, "neighbor_id", "c_vec", id_col, vec_col,
                     tables, planes, dim, signed=corpus_sig)
    q = _lsh_buckets(queries, "query_id", "q_vec", id_col, vec_col,
                     tables, planes, dim)
    joined = c.join(F.broadcast(q), "bucket")
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    # score BEFORE the pair-dedup (r16, guide §2.3: shuffle keys and
    # metadata, not payloads): every duplicate of a (query, neighbor)
    # pair — one per shared table — carries bit-identical vectors, so
    # the cosine expression yields the identical double on each and
    # deduping after scoring returns the same value while the distinct
    # exchange now moves (ids, cosine) instead of two dim-length
    # vectors per candidate row (~40× narrower at dim=64). A pair
    # colliding in t tables is dotted t times — cheap whole-stage-
    # codegen work traded for the payload shuffle, the right side of
    # the bargain at any scale. (vectors are raw, not pre-normalized:
    # the bucket signature needs the original vector and candidates
    # are few post-LSH)
    scored = (joined
              .withColumn("cosine", cosine(F.col("q_vec"), F.col("c_vec")))
              .select("query_id", "neighbor_id", "cosine")
              .dropDuplicates(["query_id", "neighbor_id"]))
    return _query_topk(scored, k)


# ----------------------------------------------------------------- IVF ANN

def _train_ivf_centroids(df: DataFrame, n_cells: int, id_col: str,
                         vec_col: str, sample: int = 4096,
                         iters: int = 5):
    """Spherical k-means coarse quantizer trained on a deterministic sample
    (FAISS-style: the quantizer trains on a bounded sample regardless of
    corpus size — at 100 TB this collect stays a few MB). Sampling order is
    ``xxhash64(id)`` so training is reproducible with no RNG state; init is
    the first ``n_cells`` sampled vectors."""
    import numpy as np

    rows = (df.select(F.col(id_col).alias("id"),
                      _unit(F.col(vec_col)).alias("v"))
            .orderBy(F.xxhash64(F.col("id"))).limit(sample).collect())
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    n_cells = min(n_cells, len(x))
    cent = x[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)
        for j in range(n_cells):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
        norms = np.sqrt((cent * cent).sum(axis=1))
        norms[norms == 0.0] = 1.0
        cent = cent / norms[:, None]
    return cent


def _ivf_assign(df: DataFrame, id_alias: str, vec_alias: str,
                id_col: str, vec_col: str, bc_centroids,
                nprobe: int) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroid cells — one
    numpy matmul per Arrow batch against the broadcast centroid matrix
    (map-only, no shuffle). ``nprobe=1`` for the corpus (each vector lives
    in exactly one inverted list), >1 for queries (multi-probe recall)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..operators.dedup import ensure_parallelism

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cent = bc_centroids.value
        for pdf in batches:
            v = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            n = np.sqrt((v * v).sum(axis=1))
            n[n == 0.0] = 1.0
            vu = v / n[:, None]
            scores = vu @ cent.T
            p = min(nprobe, scores.shape[1])
            # stable: equal cell scores resolve to the LOWER cell id, the
            # same tie rule an ORDER BY score DESC, cell twin applies
            cells = np.argsort(-scores, axis=1, kind="stable")[:, :p]
            # emit the UNIT vectors (downstream scoring dots them raw) —
            # normalized here in one BLAS pass, not via the O(dim²) _unit
            unit_objs = np.empty(len(vu), dtype=object)
            unit_objs[:] = list(vu)
            yield pd.DataFrame({
                "__id": pdf["__id"].to_numpy().repeat(p),
                "__v": unit_objs.repeat(p),
                "cell": cells.reshape(-1).astype(np.int32)})

    src = (ensure_parallelism(df, SCAN_BYTES_PER_TASK)
           .select(F.col(id_col).alias("__id"),
                   _as_double(F.col(vec_col)).alias("__v")))
    out = src.mapInPandas(assign, schema="__id long, __v array<double>, cell int")
    return out.select(F.col("__id").alias(id_alias),
                      F.col("__v").alias(vec_alias), "cell")


def ivf_ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 n_cells: int = 16, nprobe: int = 6,
                 exclude_self: bool = True, centroids=None,
                 corpus_assign: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k (the second scale path beside LSH): a coarse
    quantizer partitions the corpus into ``n_cells`` inverted lists; each
    query scores only the lists of its ``nprobe`` nearest centroids.

    Cost at 100 TB: centroid training is one bounded-sample collect; cell
    assignment is a map-only pass; the probe join touches
    ~corpus × nprobe/n_cells candidate rows instead of the full cross
    product. Recall tunes with nprobe/n_cells (validated against
    cosine_topk in tests).

    ``centroids`` injects an explicit quantizer (e.g.
    :func:`fixed_centroids`) in place of the sample-trained k-means —
    the result becomes a pure function of the inputs and the literals,
    so an independent SQL engine can replicate it for hash-checked
    correctness; the trained path stays the serving default.

    ``corpus_assign`` injects a precomputed (neighbor_id, unit, cell)
    frame (:func:`ann_corpus_encode` — the identical assignment
    kernel; ``np.argmax`` ≡ stable argsort-head at ``nprobe=1``) in
    place of the corpus assignment stage (r17 audit-row sharing)."""
    import numpy as np

    cent = (np.asarray(centroids, dtype=np.float64)
            if centroids is not None
            else _train_ivf_centroids(corpus, n_cells, id_col, vec_col))
    bc = corpus.sparkSession.sparkContext.broadcast(cent)
    c = (corpus_assign.select("neighbor_id",
                              F.col("unit").alias("c_vec"), "cell")
         if corpus_assign is not None
         else _ivf_assign(corpus, "neighbor_id", "c_vec", id_col,
                          vec_col, bc, 1))
    q = _ivf_assign(queries, "query_id", "q_vec", id_col, vec_col, bc, nprobe)
    return _cell_topk(c.join(F.broadcast(q), "cell"), k, exclude_self)


def _cell_topk(joined: DataFrame, k: int, exclude_self: bool) -> DataFrame:
    """Shared scoring tail of the IVF probes (one-shot ivf_ann_topk and
    the persisted-index search): dot the unit vectors, per-query top-k,
    deterministic neighbor-id tie-break."""
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    scored = joined.withColumn("cosine", _dot(F.col("q_vec"), F.col("c_vec")))
    return _query_topk(scored, k)


# ------------------------------------------------------ persistent IVF index

def build_ivf_index(df: DataFrame, path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_cells: int = 16,
                    centroids=None) -> None:
    """Materialize an IVF index for build-once / probe-many serving
    (the ivf_ann_topk pipeline retrains its quantizer per call — right
    for one-shot analytics, wrong for a standing vector store):

    - ``{path}/centroids.parquet`` — n_cells rows (cell id, unit
      centroid), kilobytes; loaded to the driver per search session.
    - ``{path}/cells.parquet`` — every corpus vector (unit-normalized
      at build time) PARTITIONED BY its cell id, so a probe scans only
      the ``nprobe/n_cells`` slice of the index — Spark's partition
      pruning is the inverted list.

    Training is the same bounded-sample deterministic k-means as
    ivf_ann_topk (identical centroids for identical input), assignment
    the same map-only pass."""
    import numpy as np

    cent = (np.asarray(centroids, dtype=np.float64)
            if centroids is not None
            else _train_ivf_centroids(df, n_cells, id_col, vec_col))
    spark = df.sparkSession
    spark.createDataFrame(
        [(i, [float(x) for x in cent[i]]) for i in range(len(cent))],
        "cell int, centroid array<double>") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(f"{path}/centroids.parquet")
    bc = spark.sparkContext.broadcast(cent)
    assigned = _ivf_assign(df, id_col, "__unit", id_col, vec_col, bc, 1)
    # cell-repartition before the partitioned write: one file per cell
    # instead of tasks × cells (see extend_ivf_index; a corpus whose
    # per-cell slice outgrows a healthy file would sub-split here —
    # repartition(n, "cell", <salt>) — before that ever binds at this
    # index's scale the quantizer itself needs more cells)
    (assigned.repartition("cell").write.mode("overwrite")
     .partitionBy("cell").parquet(f"{path}/cells.parquet"))


def _load_ivf_centroids(spark: SparkSession, path: str):
    import numpy as np
    rows = sorted(
        (r["cell"], r["centroid"])
        for r in spark.read.parquet(f"{path}/centroids.parquet").collect())
    return np.array([c for _, c in rows], dtype=np.float64)


def ivf_index_search(spark: "SparkSession", path: str,
                     queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     nprobe: int = 6,
                     exclude_self: bool = True) -> DataFrame:
    """Serve top-k from a persisted IVF index: queries assign to their
    ``nprobe`` nearest stored centroids map-side; the cell table scan
    is FILTERED to the probed cells, which partition-prunes the index
    down to the touched inverted lists (audited in tests/test_plans.py
    — the scan's PartitionFilters carry the cell predicate). Results
    are identical to ivf_ann_topk over the same corpus/params because
    training is deterministic."""
    cent = _load_ivf_centroids(spark, path)
    bc = spark.sparkContext.broadcast(cent)
    # localCheckpoint: the assignment is a mapInPandas pass (Arrow
    # round-trip + centroid matmul); without pinning it, the probed-
    # cells collect AND the join below would each run it from scratch
    # — doubled per-search query-side work on the probe-many serving
    # path (review r08; same pattern as extend_ivf_index)
    q = _ivf_assign(queries, "query_id", "q_vec", id_col, vec_col, bc,
                    nprobe).localCheckpoint(eager=True)
    probed = sorted({r["cell"] for r in q.select("cell").distinct()
                     .collect()})
    cells = (spark.read.parquet(f"{path}/cells.parquet")
             .filter(F.col("cell").isin(probed))
             .select(F.col(id_col).alias("neighbor_id"),
                     F.col("__unit").alias("c_vec"), "cell"))
    return _cell_topk(cells.join(F.broadcast(q), "cell"), k, exclude_self)


def _hadoop_path(spark: "SparkSession", path: str):
    sc = spark.sparkContext
    p = sc._jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(sc._jsc.hadoopConfiguration()), sc._jvm, p


def _heal_ivf_cells(spark: "SparkSession", path: str) -> None:
    """Recover from a crash inside compact_ivf_cells' swap window: if
    ``cells.parquet`` is missing but ``cells.parquet.old`` survives,
    restore it (the rewrite is re-attempted on the next threshold
    crossing). Called at every extend entry — a no-op rename check."""
    fs, jvm, _ = _hadoop_path(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    cells = P(f"{path}/cells.parquet")
    if fs.exists(cells):
        return
    old = P(f"{path}/cells.parquet.old")
    tmp = P(f"{path}/cells.parquet.compacting")
    # Hadoop FileSystem.rename reports failure by RETURNING FALSE, not
    # raising (ADVICE r10 — the same pitfall compact_ivf_cells checks):
    # a silently-failed heal leaves cells.parquet missing and the
    # caller's next read dies with a confusing path-not-found instead
    # of naming the un-healed state.
    if fs.exists(old):
        if not fs.rename(old, cells):
            raise IOError(
                f"_heal_ivf_cells: restore rename {path}/cells.parquet"
                f".old -> {path}/cells.parquet failed; index is still "
                "missing its live cell store — backup left in place, "
                "heal will be re-attempted at the next extend")
    elif (fs.exists(tmp)
          and fs.exists(P(f"{path}/cells.parquet.compacting/_SUCCESS"))):
        # crash AFTER rename(src→old) succeeded but rename(tmp→src)
        # failed/never ran AND .old was already consumed: the complete
        # rewrite (committed — _SUCCESS present) is the only copy left;
        # promote it (ADVICE r09)
        if not fs.rename(tmp, cells):
            raise IOError(
                f"_heal_ivf_cells: promote rename {path}/cells.parquet"
                f".compacting -> {path}/cells.parquet failed; the "
                "committed rewrite is the only surviving copy and is "
                "left untouched — heal will be re-attempted at the "
                "next extend")


def compact_ivf_cells(spark: "SparkSession", path: str) -> int:
    """Rewrite the IVF cell store with bounded file count (one file per
    cell partition) and swap it in. Streaming appends write ~n_cells
    files per trigger, so the id anti-probe's cost grows with TRIGGER
    COUNT, not index size — the classic streaming small-files problem
    (measured: trigger wall +37% at 5× state on the sf1 drive, r09
    BENCH_NOTES, with probe-stage task count tracking the file count).
    ``repartition("cell")`` hash-routes each cell to exactly one task,
    so the rewrite emits one file per cell directory.

    Swap protocol (single-writer contract, same as the append itself):
    write ``cells.parquet.compacting`` → rename live store to ``.old``
    → rename the rewrite in → drop ``.old``. A crash between the two
    renames leaves ``.old``, which :func:`_heal_ivf_cells` restores at
    the next extend; concurrent READERS during the swap are out of
    scope here — that isolation is what a table format (Delta/Iceberg
    snapshot pointers) buys and this plain-parquet store deliberately
    does not. Returns the post-compaction file count."""
    src = f"{path}/cells.parquet"
    df = spark.read.parquet(src)
    tmp = src + ".compacting"
    (df.repartition("cell").write.mode("overwrite").partitionBy("cell")
     .parquet(tmp))
    fs, jvm, _ = _hadoop_path(spark, path)
    P = jvm.org.apache.hadoop.fs.Path
    old = P(src + ".old")
    if fs.exists(old):
        fs.delete(old, True)
    # Hadoop FileSystem.rename reports failure by RETURNING FALSE, not
    # raising (ADVICE r09): an unchecked swap could delete the .old
    # backup after a silently-failed rename, losing the live store.
    if not fs.rename(P(src), old):
        raise IOError(f"compact_ivf_cells: rename {src} -> {src}.old "
                      "failed; live store untouched, rewrite left at "
                      f"{tmp}")
    if not fs.rename(P(tmp), P(src)):
        # the restore itself can fail the same way — report the TRUE
        # final state, never claim a restore that did not happen (an
        # operator deleting .old on a false 'restored' message would
        # lose the live store; _heal_ivf_cells repairs the un-restored
        # state at the next extend)
        restored = fs.rename(old, P(src))
        raise IOError(
            f"compact_ivf_cells: rename {tmp} -> {src} failed; "
            + ("previous store restored from .old" if restored else
               f"restore from .old ALSO failed — live store currently "
               f"missing, backup at {src}.old and committed rewrite at "
               f"{tmp}; next extend's heal will recover"))
    if fs.exists(P(src)):  # drop the backup only once the swap is live
        fs.delete(old, True)
    return len(spark.read.parquet(src).inputFiles())


def extend_ivf_index(spark: "SparkSession", path: str,
                     new_vectors: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     compact_files: int = 96) -> int:
    """Incremental index maintenance: assign new vectors with the
    STORED centroids (no retrain — the FAISS add() contract; quantizer
    drift is handled by a periodic rebuild, not per-append) and APPEND
    them to their cell partitions. A LEFT ANTI probe on the vector id
    makes at-least-once ingestion idempotent — replaying a batch
    appends nothing (same construction as the dedup-index jobs).
    Returns the number of vectors actually added.

    ``compact_files``: when the cell store exceeds this many files,
    :func:`compact_ivf_cells` rewrites it down to one file per cell
    (r09 — the measured mitigation for the per-trigger growth the sf1
    drive attributed to append-driven file-count growth). The rewrite
    is O(index) but amortized O(index · n_cells / compact_files) per
    trigger; 0 disables it for deployments that schedule compaction
    off the ingest path."""
    _heal_ivf_cells(spark, path)
    cent = _load_ivf_centroids(spark, path)
    bc = spark.sparkContext.broadcast(cent)
    assigned = _ivf_assign(new_vectors, id_col, "__unit", id_col,
                           vec_col, bc, 1)
    existing = (spark.read.parquet(f"{path}/cells.parquet")
                .select(id_col))
    # DURABLE materialization, not best-effort persist(): the append
    # below writes into the same directory the anti-join reads, so a
    # cache-evicted partition recomputing mid-write would probe a
    # half-written index (VERDICT r4 item 7). localCheckpoint(eager)
    # cuts the lineage — after it, the frame is an ExistingRDD with no
    # reference to the index path; a lost block fails the job instead
    # of silently recomputing against in-flight state.
    fresh = (assigned.join(existing, id_col, "left_anti")
             .localCheckpoint(eager=True))
    n = fresh.count()
    if n:
        # repartition by cell BEFORE the partitioned append: without it
        # every writing task emits a file into every cell directory it
        # touches (up to tasks × cells files PER TRIGGER — the classic
        # partitionBy write fan-out), which made the r09 sf1 drive
        # compact on every trigger instead of amortizing. One shuffle
        # of the (small) batch → one file per touched cell.
        (fresh.repartition("cell").write.mode("append")
         .partitionBy("cell").parquet(f"{path}/cells.parquet"))
        if compact_files and len(spark.read.parquet(
                f"{path}/cells.parquet").inputFiles()) > compact_files:
            compact_ivf_cells(spark, path)
    return n


def embedding_cosine_pairs(df: DataFrame, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           lsh_prefilter: bool | None = None,
                           planes: int = 8, dim: int = 64,
                           exact_rows_limit: int = 1 << 17) -> DataFrame:
    """Near-duplicate pairs (a < b) with cosine ≥ threshold.

    ``lsh_prefilter=True`` joins on the hyperplane bucket first (the 100 TB
    path); ``False`` is the exact O(n²) baseline for small corpora/oracles,
    which broadcasts the whole corpus as a dense matrix — correct only
    while that matrix is small. The default ``None`` **auto-routes by a
    size probe** (one count): exact while rows ≤ ``exact_rows_limit``
    (≈ 67 MB broadcast at dim 64), LSH-prefiltered beyond — so the
    default plan never drags an unbounded corpus to the driver."""
    if lsh_prefilter is None:
        lsh_prefilter = df.count() > exact_rows_limit
    from ..stats import record_routing
    record_routing("embedding_cosine_pairs.path",
                   "lsh" if lsh_prefilter else "exact")
    if lsh_prefilter:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
                      _hyperplane_signature(F.col(vec_col), planes, dim)
                      .alias("bucket"))
        b = a.toDF("id_b", "vec_b", "bucket")
        joined = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
        return (joined
                .withColumn("cosine", cosine(F.col("vec_a"), F.col("vec_b")))
                .filter(F.col("cosine") >= threshold)
                .select("id_a", "id_b", F.round("cosine", 4).alias("cosine")))
    # Exact path, numpy-blocked: candidates from a blocked matrix product
    # against the broadcast corpus (epsilon margin → no false negatives),
    # then exact sequential-order rescoring of the tiny survivor set.
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    mat_rows = (df.select(F.col(id_col).alias("id"),
                          _as_double(F.col(vec_col)).alias("v"))
                .collect())
    ids = np.array([r["id"] for r in mat_rows], dtype=np.int64)
    mat = np.array([r["v"] for r in mat_rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    norms[norms == 0.0] = 1.0
    unit = mat / norms[:, None]
    bc = spark.sparkContext.broadcast((ids, unit))
    eps = 1e-9

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, b_unit = bc.value
        for pdf in batches:
            a_ids = pdf["id"].to_numpy(dtype=np.int64)
            a_vec = np.stack(pdf["v"].to_numpy())
            an = np.sqrt((a_vec * a_vec).sum(axis=1))
            an[an == 0.0] = 1.0
            scores = (a_vec / an[:, None]) @ b_unit.T
            ai, bi = np.nonzero((scores >= threshold - eps) &
                                (a_ids[:, None] < b_ids[None, :]))
            yield pd.DataFrame({"id_a": a_ids[ai], "id_b": b_ids[bi]})

    from ..operators.dedup import ensure_parallelism
    cand_schema = "id_a long, id_b long"
    cand = (ensure_parallelism(df, SCAN_BYTES_PER_TASK)
            .select(F.col(id_col).alias("id"),
                    _as_double(F.col(vec_col)).alias("v"))
            .mapInPandas(gen, schema=cand_schema))
    a = _with_norm(df, id_col, vec_col, "id_a", "vec_a", "n_a")
    b = _with_norm(df, id_col, vec_col, "id_b", "vec_b", "n_b")
    return (cand.join(F.broadcast(a), "id_a").join(F.broadcast(b), "id_b")
            .selectExpr(
                "*", f"{_dot_sql('vec_a', 'vec_b')} / (n_a * n_b) AS cosine")
            .filter(F.col("cosine") >= threshold)
            .selectExpr("id_a", "id_b", "round(cosine, 4) AS cosine"))


# ------------------------------------------------------- int8 quantization

def quantization_error(df: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Symmetric per-vector int8 quantization audit: quantize each
    component to ``round(x / scale * 127)`` with ``scale = max |x|``,
    dequantize, and report the per-vector reconstruction ``rmse`` and
    the ``scale`` — the standard check before shipping an int8 ANN
    index (4× memory cut vs float32; rmse tells you what recall you
    are trading). Zero vectors quantize losslessly (rmse 0).

    Map-only portable-fragment pipeline (functions/portable.py): the
    doubled array and its scale materialize once per row; the
    round-trip error folds in a tight JVM loop (`aggregate` HOF) — no
    shuffle, no UDF, and the DuckDB oracle evaluates the SAME rendered
    expressions."""
    from ..functions.portable import render

    def _x(frag: str) -> Column:
        return F.expr(render(frag, "spark"))

    return (df
            .withColumn("d", _x(f"LIST_TRANSFORM({vec_col}, "
                                "qx -> CAST(qx AS DOUBLE))"))
            .withColumn("scale", _x("LIST_MAX(LIST_TRANSFORM(d, "
                                    "qa -> abs(qa)))"))
            .select(F.col(id_col), F.round("scale", 4).alias("scale"),
                    _x(QUANT_RMSE).alias("rmse")))


#: reconstruction RMSE of int8 round-trip over materialized columns
#: ``d`` (double array) and ``scale`` — shared Spark/DuckDB fragment
QUANT_RMSE = (
    "round(CASE WHEN scale = 0 OR ARRAY_LEN(d) = 0 "
    "THEN CAST(0.0 AS DOUBLE) ELSE "
    "sqrt(LIST_FSUM(LIST_TRANSFORM(INT_SEQ(1, ARRAY_LEN(d)), qi -> "
    "pow(LIST_AT(d, qi) - CAST(round(LIST_AT(d, qi) / scale "
    "* CAST(127.0 AS DOUBLE)) AS INT) * scale "
    "/ CAST(127.0 AS DOUBLE), 2))) / ARRAY_LEN(d)) END, 4)"
)


# ------------------------------------------------ product quantization

def pq_codebooks(m: int, n_codes: int, dim: int) -> list:
    """Data-independent PQ sub-codebooks from the splitmix stream
    (distinct seed; the :func:`fixed_centroids` pattern): ``m``
    subspaces × ``n_codes`` codewords × ``dim // m`` coords, uniform in
    ``[-1, 1) / sqrt(dim)`` so codeword magnitudes sit on the scale of
    unit-vector subcomponents.  Injectable in place of the
    sample-trained codebooks so the whole encode→ADC pipeline becomes
    a pure function of the input rows — the hash-checkable twin; the
    trained path stays the serving default (recall-tested in pytest)."""
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    scale = 1.0 / math.sqrt(dim)
    return [[[((_scramble(mi * n_codes + c, d, seed=0x2545F491)
                >> 11) / float(1 << 53) * 2.0 - 1.0) * scale
              for d in range(sub)]
             for c in range(n_codes)]
            for mi in range(m)]


def train_pq_codebooks(df: DataFrame, m: int = 8, n_codes: int = 16,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       sample: int = 4096, iters: int = 5):
    """Per-subspace Lloyd k-means on a deterministic bounded sample
    (FAISS-style: PQ training never scales with the corpus — at 100 TB
    this collect stays a few MB; sampling order is ``xxhash64(id)``,
    init the first ``n_codes`` sampled subvectors, no RNG state)."""
    import numpy as np

    rows = (df.select(F.col(id_col).alias("id"),
                      _unit(F.col(vec_col)).alias("v"))
            .orderBy(F.xxhash64(F.col("id"))).limit(sample).collect())
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    return _kmeans_subspace_books(x, m, n_codes, iters)


def _kmeans_subspace_books(x, m: int, n_codes: int, iters: int):
    """Per-subspace Lloyd k-means over a sample matrix (shared by the
    raw-vector and residual PQ trainers): init = first ``n_codes``
    sampled subvectors, no RNG state."""
    import numpy as np

    dim = x.shape[1]
    sub = dim // m
    if sub * m != dim:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    books = []
    for mi in range(m):
        xm = x[:, mi * sub:(mi + 1) * sub]
        k = min(n_codes, len(xm))
        cb = xm[:k].copy()
        for _ in range(iters):
            d2 = ((xm[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for j in range(k):
                members = xm[assign == j]
                if len(members):
                    cb[j] = members.mean(axis=0)
        books.append(cb)
    return np.stack(books)


def _train_pq_residual(df: DataFrame, cent, m: int, n_codes: int,
                       id_col: str, vec_col: str,
                       sample: int = 4096, iters: int = 5):
    """Codebooks for residual IVFPQ: the same bounded deterministic
    sample as :func:`train_pq_codebooks`, but k-means runs on
    ``v − centroid[cell(v)]`` — the quantity the codes must cover
    (FAISS IVFPQ training discipline)."""
    import numpy as np

    rows = (df.select(F.col(id_col).alias("id"),
                      _unit(F.col(vec_col)).alias("v"))
            .orderBy(F.xxhash64(F.col("id"))).limit(sample).collect())
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    ct = np.asarray(cent, dtype=np.float64)
    cells = np.argmax(x @ ct.T, axis=1)
    return _kmeans_subspace_books(x - ct[cells], m, n_codes, iters)


def _pq_assign(vu, books, half_cc):
    """Shared code-assignment kernel: per-subspace
    ``argmax(x_m · c − ‖c‖²/2)`` (≡ argmin L2), first max = lowest
    code id — the single source of the tie rule the SQL twins mirror
    (review r12: duplicated kernels drift)."""
    import numpy as np

    m, _k, sub = books.shape
    codes = np.empty((len(vu), m), dtype=np.int32)
    for mi in range(m):
        xm = vu[:, mi * sub:(mi + 1) * sub]
        codes[:, mi] = (xm @ books[mi].T - half_cc[mi]).argmax(axis=1)
    return codes


def _pq_lut(qv, cb):
    """Shared per-query ADC look-up table: ``lut[q, m, c] = ‖q_m‖² −
    2·q_m·c + ‖c‖²`` — the exact expansion the SQL twins re-derive."""
    import numpy as np

    m, k, sub = cb.shape
    lut = np.empty((len(qv), m, k), dtype=np.float64)
    for mi in range(m):
        qm = qv[:, mi * sub:(mi + 1) * sub]
        qq = (qm * qm).sum(axis=1)[:, None]
        cc = (cb[mi] * cb[mi]).sum(axis=1)[None, :]
        lut[:, mi, :] = qq - 2.0 * (qm @ cb[mi].T) + cc
    return lut


def pq_encode(df: DataFrame, codebooks, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Product-quantize unit vectors to ``m`` byte codes — the 32×
    memory cut that keeps a 100 TB embedding corpus scannable (codes
    live in RAM; raw vectors stay on disk for optional re-ranking).

    Map-only: one numpy matmul per Arrow batch per subspace against
    the broadcast codebooks; no shuffle.  Codeword choice is the
    canonical dot form ``argmax(x_m · c − ‖c‖²/2)`` (≡ argmin L2) with
    equal scores resolving to the LOWER code id — the same tie rule an
    ``ORDER BY score DESC, code`` SQL twin applies."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..operators.dedup import ensure_parallelism

    cb = np.asarray(codebooks, dtype=np.float64)     # (m, k, sub)
    m, _k, sub = cb.shape
    bc = df.sparkSession.sparkContext.broadcast(cb)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        half_cc = 0.5 * (books * books).sum(axis=2)  # (m, k)
        for pdf in batches:
            v = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            n = np.sqrt((v * v).sum(axis=1))
            n[n == 0.0] = 1.0
            vu = v / n[:, None]
            codes = _pq_assign(vu, books, half_cc)
            objs = np.empty(len(vu), dtype=object)
            objs[:] = list(codes)
            yield pd.DataFrame({"__id": pdf["__id"], "codes": objs})

    src = (ensure_parallelism(df, SCAN_BYTES_PER_TASK)
           .select(F.col(id_col).alias("__id"),
                   _as_double(F.col(vec_col)).alias("__v")))
    return (src.mapInPandas(encode, schema="__id long, codes array<int>")
            .select(F.col("__id").alias(id_col), "codes"))


def pq_adc_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                m: int = 8, n_codes: int = 16,
                id_col: str = "vec_id", vec_col: str = "embedding",
                codebooks=None, exclude_self: bool = True,
                corpus_codes: DataFrame | None = None,
                q_rows: list | None = None) -> DataFrame:
    """PQ asymmetric-distance top-k (Jégou/Douze/Schmid TPAMI'11) —
    the memory-bounded member of the ANN family beside LSH buckets and
    IVF lists: the corpus is scanned as ``m``-byte codes, each query
    precomputes an ``m × n_codes`` distance look-up table once, and a
    candidate's approximate distance is ``m`` LUT adds — no vector
    arithmetic on the scan.

    Scale shape: encode is map-only; the scan is map-only over codes
    with a PER-BATCH partial top-k (each task emits ≤ queries × k
    candidate rows, so the final exchange carries partitions × Q × k
    rows, never corpus × Q); the global cut is one bounded window.
    ``codebooks`` injects :func:`pq_codebooks` for the hash-checkable
    twin; default trains per-subspace k-means on a bounded sample.

    ADC distance is the exact expansion ``Σ_m (‖q_m‖² − 2·q_m·c +
    ‖c‖²)`` over the CHOSEN codewords, emitted rounded; ranking breaks
    ties on the lower neighbor id.

    ``corpus_codes`` injects a precomputed code frame
    (:func:`ann_corpus_encode` — the identical ``_pq_assign`` kernel)
    in place of the :func:`pq_encode` pass; ``q_rows`` injects the
    collected (qid, unit-qv) rows (:func:`unit_query_rows`) in place
    of this call's own collect — the r17 audit-row sharing hooks."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    cb = (np.asarray(codebooks, dtype=np.float64)
          if codebooks is not None
          else train_pq_codebooks(corpus, m, n_codes, id_col, vec_col))
    mm_, _kk, sub = cb.shape
    if q_rows is None:
        q_rows = (queries.select(F.col(id_col).alias("qid"),
                                 _unit(F.col(vec_col)).alias("qv"))
                  .collect())
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    qv = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    lut = _pq_lut(qv, cb)
    codes = (corpus_codes.select(F.col("neighbor_id").alias("__nid"),
                                 "codes")
             if corpus_codes is not None
             else pq_encode(corpus, cb, id_col, vec_col)
             .select(F.col(id_col).alias("__nid"), "codes"))
    return _pq_scan_topk(codes, lut, qids, k, exclude_self)


def _pq_scan_topk(codes_df: DataFrame, lut, qids, k: int,
                  exclude_self: bool) -> DataFrame:
    """Shared ADC scan tail (one-shot pq_adc_topk and the persisted
    code store): map-only LUT adds over ``(__nid, codes)`` with a
    per-task partial top-k, then one bounded window cut."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    spark = codes_df.sparkSession
    bc_lut = spark.sparkContext.broadcast(lut)
    bc_qid = spark.sparkContext.broadcast(qids)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lt = bc_lut.value
        qi = bc_qid.value
        best: dict[int, list] = {}                  # qid -> [(d, nid)]
        for pdf in batches:
            ids = pdf["__nid"].to_numpy()
            cds = np.stack(pdf["codes"].to_numpy())  # (B, m)
            # adist[b, q] = sum_m lut[q, m, codes[b, m]]
            ad = np.zeros((len(ids), len(qi)), dtype=np.float64)
            for mi in range(lt.shape[1]):
                ad += lt[:, mi, cds[:, mi]].T
            for j, qid in enumerate(qi):
                cand = best.setdefault(int(qid), [])
                col = ad[:, j]
                # (adist, neighbor_id) lexicographic — identical codes
                # mean exactly-tied distances, and the SQL twin breaks
                # those on the LOWER id, so the cut must too
                for b in np.lexsort((ids, col))[:k + 1]:
                    nid = int(ids[b])
                    if exclude_self and nid == qid:
                        continue
                    cand.append((float(col[b]), nid))
                cand.sort()
                del cand[k:]
        rows = {"query_id": [], "neighbor_id": [], "adist": []}
        for qid, cand in best.items():
            for d, nid in cand:
                rows["query_id"].append(qid)
                rows["neighbor_id"].append(nid)
                rows["adist"].append(d)
        yield pd.DataFrame(rows)

    cand = codes_df.mapInPandas(scan, schema="query_id long, "
                                             "neighbor_id long, "
                                             "adist double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("adist", 4).alias("adist"), "rank"))


def build_pq_store(spark: "SparkSession", df: DataFrame, path: str,
                   m: int = 8, n_codes: int = 16,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   codebooks=None) -> int:
    """Persist a PQ code store: ``codebooks.parquet`` (mi, code,
    codeword) + ``codes.parquet`` (id, m byte codes) — the build-once/
    scan-many lifecycle of the memory-bounded ANN path (the IVF-index
    sibling; at 100 TB the codes are ~m bytes/vector, so the WHOLE
    store fits the page cache that the raw vectors never could).
    Returns the number of vectors encoded."""
    import numpy as np

    cb = (np.asarray(codebooks, dtype=np.float64)
          if codebooks is not None
          else train_pq_codebooks(df, m, n_codes, id_col, vec_col))
    rows = [(mi, c, [float(x) for x in cb[mi][c]])
            for mi in range(cb.shape[0]) for c in range(cb.shape[1])]
    (spark.createDataFrame(rows, schema="mi int, code int, "
                                        "cv array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{path}/codebooks.parquet"))
    codes = pq_encode(df, cb, id_col, vec_col)
    codes.write.mode("overwrite").parquet(f"{path}/codes.parquet")
    return spark.read.parquet(f"{path}/codes.parquet").count()


def _load_pq_codebooks(spark: "SparkSession", path: str):
    import numpy as np

    rows = (spark.read.parquet(f"{path}/codebooks.parquet")
            .orderBy("mi", "code").collect())
    m = 1 + max(r["mi"] for r in rows)
    k = 1 + max(r["code"] for r in rows)
    cb = np.empty((m, k, len(rows[0]["cv"])), dtype=np.float64)
    for r in rows:
        cb[r["mi"], r["code"]] = r["cv"]
    return cb


def extend_pq_store(spark: "SparkSession", path: str,
                    new_vectors: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> int:
    """Incremental code-store maintenance: encode new vectors with the
    STORED codebooks (no retrain — the FAISS add() contract) and
    append. The LEFT ANTI probe on the id makes at-least-once replay
    append nothing; the localCheckpoint cuts lineage so the append
    never recomputes against the directory it is writing (the
    extend_ivf_index construction). Codes are a flat unpartitioned
    store — ~m bytes/row, no per-cell directories, so there is no
    file fan-out to compact."""
    cb = _load_pq_codebooks(spark, path)
    codes = pq_encode(new_vectors, cb, id_col, vec_col)
    existing = (spark.read.parquet(f"{path}/codes.parquet")
                .select(id_col))
    fresh = (codes.join(existing, id_col, "left_anti")
             .localCheckpoint(eager=True))
    n = fresh.count()
    if n:
        fresh.write.mode("append").parquet(f"{path}/codes.parquet")
    return n


def pq_store_search(spark: "SparkSession", path: str,
                    queries: DataFrame, k: int = 5,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    exclude_self: bool = True) -> DataFrame:
    """ADC top-k over the persisted code store — identical semantics
    to a one-shot :func:`pq_adc_topk` with the stored codebooks
    (pytest-pinned equality), but the corpus side reads ~m bytes per
    vector instead of the raw embeddings."""
    import numpy as np

    cb = _load_pq_codebooks(spark, path)
    q_rows = (queries.select(F.col(id_col).alias("qid"),
                             _unit(F.col(vec_col)).alias("qv"))
              .collect())
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    qv = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    codes = (spark.read.parquet(f"{path}/codes.parquet")
             .select(F.col(id_col).alias("__nid"), "codes"))
    return _pq_scan_topk(codes, _pq_lut(qv, cb), qids, k, exclude_self)


def ann_corpus_encode(corpus: DataFrame, centroids, codebooks,
                      tables: int = 8, planes: int = 4, dim: int = 64,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """ONE fused corpus pass for the ANN recall audit (r17, VERDICT r16
    item 1): emits, per corpus vector, everything the ANN family
    members derive from it — the raw double vector (LSH candidate
    scoring), the packed LSH signature, the unit vector (IVF scoring),
    the coarse IVF cell, and BOTH PQ code variants (raw + residual) —
    by running the members' exact numpy kernels back-to-back on the
    same Arrow batch. Each member's slice of this frame is therefore
    bit-identical to the frame that member computes on its own
    (``np.argmax`` ≡ the stable argsort-head `_ivf_assign` uses for
    ``nprobe=1``; everything else is the literal shared kernel —
    pinned by tests/test_pipeline_ops.py::test_ann_corpus_encode_*).

    Intended use: the audit row persists this frame and injects it
    into the five members (``corpus_assign=`` / ``corpus_enc=`` /
    ``corpus_sig=`` / ``corpus_codes=``), collapsing five corpus-wide
    Python encode passes into one (guide §4.1). The closure captures
    PLAIN numpy arrays — never Broadcast handles — so the persisted
    fragment's plan bytes are build-stable and the cache survives
    re-builds (the r16 bitmap-route lesson). Output stays ~1.2 KB/row
    at dim=64: vector-proportional, never corpus-pair-proportional."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..operators.dedup import ensure_parallelism

    all_planes = tables * planes
    assert all_planes <= 62, "tables * planes must be <= 62"
    pmat = np.array(_plane_coefficients(all_planes, dim), dtype=np.float64)
    weights = (1 << np.arange(all_planes, dtype=np.uint64)).astype(np.uint64)
    ct = np.asarray(centroids, dtype=np.float64)
    books = np.asarray(codebooks, dtype=np.float64)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        half_cc = 0.5 * (books * books).sum(axis=2)
        for pdf in batches:
            v = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            # LSH signature on the RAW vector (the _lsh_buckets kernel)
            bits = (v @ pmat.T) >= 0.0
            sig = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
            # unit vectors + coarse cell (the _ivf_assign / enc kernel)
            n = np.sqrt((v * v).sum(axis=1))
            n[n == 0.0] = 1.0
            vu = v / n[:, None]
            cells = np.argmax(vu @ ct.T, axis=1).astype(np.int32)
            # both PQ code variants (pq_encode / ivf_pq_topk kernels)
            codes = _pq_assign(vu, books, half_cc)
            codes_res = _pq_assign(vu - ct[cells], books, half_cc)
            unit_objs = np.empty(len(vu), dtype=object)
            unit_objs[:] = list(vu)
            code_objs = np.empty(len(vu), dtype=object)
            code_objs[:] = list(codes)
            res_objs = np.empty(len(vu), dtype=object)
            res_objs[:] = list(codes_res)
            yield pd.DataFrame({"neighbor_id": pdf["__id"],
                                "vec": pdf["__v"],
                                "sig": sig.astype(np.int64),
                                "unit": unit_objs,
                                "cell": cells,
                                "codes": code_objs,
                                "codes_res": res_objs})

    src = (ensure_parallelism(corpus, SCAN_BYTES_PER_TASK)
           .select(F.col(id_col).alias("__id"),
                   _as_double(F.col(vec_col)).alias("__v")))
    return src.mapInPandas(
        encode, schema="neighbor_id long, vec array<double>, sig long, "
                       "unit array<double>, cell int, codes array<int>, "
                       "codes_res array<int>")


def unit_query_rows(queries: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> list:
    """The bounded query-side driver pass shared by :func:`pq_adc_topk`
    and :func:`ivf_pq_topk` (qid + SQL-normalized unit vector),
    exposed so callers auditing several members over the SAME query
    set collect it ONCE and inject via ``q_rows=`` — three eager scan
    jobs per build become one (r17). Normalization stays the SQL
    ``_unit`` expression: the members' LUTs must see bit-identical
    ``qv`` to the ones they collect themselves."""
    return (queries.select(F.col(id_col).alias("qid"),
                           _unit(F.col(vec_col)).alias("qv"))
            .collect())


def ivf_pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                n_cells: int = 16, nprobe: int = 6, m: int = 8,
                n_codes: int = 16, id_col: str = "vec_id",
                vec_col: str = "embedding", centroids=None,
                codebooks=None, exclude_self: bool = True,
                residual: bool = False, corpus_enc: DataFrame | None = None,
                q_rows: list | None = None) -> DataFrame:
    """IVF list pruning × PQ byte codes — the FAISS IVFPQ shape.
    This is THE billion-vector serving layout: the coarse quantizer
    prunes the scan to ``nprobe/n_cells`` of the lists, and what it
    scans is ``m`` bytes + ``m`` LUT adds per candidate, not a vector.

    ``residual=False`` quantizes the raw unit vectors (one LUT per
    query). ``residual=True`` (r13, VERDICT r12 item 5) is the full
    FAISS composition: codes quantize ``v − centroid[cell]`` — the
    residuals cluster far tighter than the raw vectors, so the same
    ``m`` bytes buy materially better recall — and each (query,
    probed cell) pair gets its own LUT over ``q − centroid[cell]``
    (``Q × nprobe`` tables, still a bounded broadcast).  The shared
    sub-codebooks keep the twin SQL-expressible: the residual
    subtraction is an elementwise expression over the centroid
    literals.

    One fused map pass encodes the corpus (cell + codes together — no
    second corpus scan, no id-keyed re-join); queries are a bounded
    driver-side pass (probe cells + LUTs, the pq_adc_topk
    convention); candidates are the cell-keyed join with the
    broadcast probe set; scoring is LUT adds per Arrow batch and the
    global cut one bounded window (the _cell_topk shape).

    ``centroids``/``codebooks`` inject :func:`fixed_centroids` /
    :func:`pq_codebooks` for the hash-checkable twin; both default to
    their sample-trained paths (with ``residual=True`` the codebooks
    train on sampled RESIDUALS — the quantity they must cover).

    ``corpus_enc`` injects a precomputed corpus encode frame
    (:func:`ann_corpus_encode` — bit-identical kernels) in place of
    the fused ``enc`` pass; ``q_rows`` injects the collected
    (qid, unit-qv) rows (:func:`unit_query_rows`) in place of this
    call's own collect — the r17 audit-row sharing hooks. Defaults
    keep this function self-contained (the graded member rows)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from ..operators.dedup import ensure_parallelism

    cent = (np.asarray(centroids, dtype=np.float64)
            if centroids is not None
            else _train_ivf_centroids(corpus, n_cells, id_col, vec_col))
    if codebooks is not None:
        cb = np.asarray(codebooks, dtype=np.float64)
    elif residual:
        cb = _train_pq_residual(corpus, cent, m, n_codes,
                                id_col, vec_col)
    else:
        cb = train_pq_codebooks(corpus, m, n_codes, id_col, vec_col)
    mm_, _kk, sub = cb.shape
    spark = corpus.sparkSession

    if corpus_enc is not None:
        enc_df = corpus_enc.select(
            "neighbor_id", "cell",
            F.col("codes_res" if residual else "codes").alias("codes"))
    else:
        bc_cent = spark.sparkContext.broadcast(cent)
        bc_cb = spark.sparkContext.broadcast(cb)

        def enc(batches: Iterator[pd.DataFrame]
                ) -> Iterator[pd.DataFrame]:
            ct = bc_cent.value
            books = bc_cb.value
            half_cc = 0.5 * (books * books).sum(axis=2)
            for pdf in batches:
                v = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
                n = np.sqrt((v * v).sum(axis=1))
                n[n == 0.0] = 1.0
                vu = v / n[:, None]
                # stable first-max = lowest cell id, the SQL tie rule
                cells = np.argmax(vu @ ct.T, axis=1).astype(np.int32)
                base = vu - ct[cells] if residual else vu
                codes = _pq_assign(base, books, half_cc)
                objs = np.empty(len(vu), dtype=object)
                objs[:] = list(codes)
                yield pd.DataFrame({"neighbor_id": pdf["__id"],
                                    "cell": cells, "codes": objs})

        src = (ensure_parallelism(corpus, SCAN_BYTES_PER_TASK)
               .select(F.col(id_col).alias("__id"),
                       _as_double(F.col(vec_col)).alias("__v")))
        enc_df = src.mapInPandas(
            enc, schema="neighbor_id long, cell int, codes array<int>")

    # queries: bounded driver pass — probe cells + per-query LUT(s)
    if q_rows is None:
        q_rows = (queries.select(F.col(id_col).alias("qid"),
                                 _unit(F.col(vec_col)).alias("qv"))
                  .collect())
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    qv = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    p = min(nprobe, cent.shape[0])
    probe = np.argsort(-(qv @ cent.T), axis=1, kind="stable")[:, :p]
    if residual:
        # one LUT per (query, probed cell) over q − centroid[cell]:
        # Q × nprobe × m × n_codes doubles — bounded, broadcastable
        bc_lut = spark.sparkContext.broadcast(
            {(int(qids[j]), int(c)):
             _pq_lut((qv[j] - cent[int(c)])[None, :], cb)[0]
             for j in range(len(qids)) for c in probe[j]})
    else:
        lut = _pq_lut(qv, cb)
        bc_lut = spark.sparkContext.broadcast(
            {int(q): lut[j] for j, q in enumerate(qids)})
    probe_df = spark.createDataFrame(
        [(int(qids[j]), int(c)) for j in range(len(qids))
         for c in probe[j]], schema="query_id long, cell int")

    cand = enc_df.join(F.broadcast(probe_df), "cell")

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        lt = bc_lut.value
        for pdf in batches:
            if not len(pdf):
                continue
            cds = np.stack(pdf["codes"].to_numpy())
            ad = np.zeros(len(pdf), dtype=np.float64)
            if residual:
                keys = pd.DataFrame({"q": pdf["query_id"].to_numpy(),
                                     "c": pdf["cell"].to_numpy()})
                groups = keys.groupby(["q", "c"]).indices.items()
            else:
                qcol = pdf["query_id"].to_numpy()
                groups = ((int(q), np.flatnonzero(qcol == q))
                          for q in np.unique(qcol))
            for key, idx in groups:
                l = lt[(int(key[0]), int(key[1]))] if residual \
                    else lt[int(key)]
                sub_codes = cds[idx]
                acc = np.zeros(len(idx), dtype=np.float64)
                for mi in range(l.shape[0]):
                    acc += l[mi, sub_codes[:, mi]]
                ad[idx] = acc
            yield pd.DataFrame({"query_id": pdf["query_id"],
                                "neighbor_id": pdf["neighbor_id"],
                                "adist": ad})

    scored = cand.select("query_id", "cell", "neighbor_id", "codes") \
                 .mapInPandas(score, schema="query_id long, "
                                            "neighbor_id long, "
                                            "adist double")
    if exclude_self:
        scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.round("adist", 4).alias("adist"), "rank"))


# -------------------------------------------------- label-space operators

def label_centroids(df: DataFrame, label_col: str = "label",
                    vec_col: str = "embedding") -> DataFrame:
    """Per-label centroid: the per-dimension mean over each class (one
    row per (label, dim), 1-based dims for SQL parity) plus the member
    count — class prototypes for nearest-centroid classification and
    embedding-drift monitoring.

    Scale shape: posexplode → one partial-agg groupBy keyed by
    (label, dim) — the exploded stream combines map-side to
    |labels|×dim rows per mapper, so the shuffle is tiny regardless of
    corpus size."""
    ex = df.select(F.col(label_col),
                   F.posexplode(F.col(vec_col)).alias("pos", "v"))
    # + 0.0 normalizes IEEE negative zero (a mean of values summing to
    # -0.0 prints differently from +0.0 and breaks value-hash parity
    # with engines that canonicalize the sign)
    return (ex.groupBy(label_col, (F.col("pos") + 1).alias("dim"))
            .agg((F.round(F.avg(F.col("v").cast("double")), 4)
                  + F.lit(0.0)).alias("mean_v"),
                 F.count(F.lit(1)).alias("cnt")))


def semantic_neardup_pairs(df: DataFrame, threshold: float = 0.95,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           n_cells: int = 8,
                           nprobe: int = 2, centroids=None) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023): a
    trained coarse quantizer partitions the corpus into ``n_cells``
    k-means cells; cosine pairs (a < b, ≥ threshold) are searched only
    WITHIN each cell. Semantic duplicates cluster by construction, so
    cell-local search recovers almost all of them while reducing the
    pair space from O(n²) to O(Σ cell²) ≈ O(n² · nprobe²/cells).

    ``nprobe`` assigns each vector to its ``nprobe`` nearest cells —
    the multi-probe trick that recovers pairs a hard cell boundary
    would split (a quantizer that bisects one tight cluster otherwise
    silently loses every cross-boundary pair); a pair is found if the
    two vectors share ANY cell, and a final (id_a, id_b) aggregate
    collapses pairs found in several. Still approximate by design —
    recall vs the exact pair set is asserted in pytest, like the ANN
    rows.

    Scale shape: centroid training is a bounded-sample collect and
    assignment is map-only; the quadratic within-cell scoring runs as
    ONE dense BLAS matmul per cell via ``applyInPandas`` (the measured
    lesson from embed_topk/char_dup: per-pair JVM HOF dots evaluate
    interpreted — a cell-keyed numpy block is ~20× faster and is the
    repo-standard Python boundary). Per-task memory is
    O(cell_size × dim): grow ``n_cells`` ∝ corpus so cells — and the
    per-task quadratic term — stay constant-size."""
    import numpy as np
    import pandas as pd

    cent = (np.asarray(centroids, dtype=np.float64)
            if centroids is not None
            else _train_ivf_centroids(df, n_cells, id_col, vec_col))
    bc = df.sparkSession.sparkContext.broadcast(cent)
    assigned = _ivf_assign(df, "vid", "v", id_col, vec_col, bc, nprobe)
    thr = float(threshold)
    eps = 1e-9

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vid"].to_numpy(dtype=np.int64)
        u = np.stack(pdf["v"].to_numpy())       # unit vectors from assign
        s = u @ u.T
        ai, bi = np.nonzero((s >= thr - eps) &
                            (ids[:, None] < ids[None, :]))
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bi],
                             "cosine": s[ai, bi]})

    pairs = assigned.groupBy("cell").applyInPandas(
        cell_pairs, schema="id_a long, id_b long, cosine double")
    # a pair shared by several probed cells scores once per cell; BLAS
    # blocking may differ by cell shape, so collapse by key (not by the
    # float) and keep the max — then apply the threshold exactly once
    return (pairs.groupBy("id_a", "id_b")
            .agg(F.max("cosine").alias("cosine"))
            .filter(F.col("cosine") >= thr)
            .select("id_a", "id_b", F.round("cosine", 4).alias("cosine")))


def semantic_dedup(df: DataFrame, threshold: float = 0.95,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_cells: int = 8, centroids=None) -> DataFrame:
    """SemDeDup corpus pruning: drop all but one representative (the
    smallest id — deterministic; SemDeDup's "farthest from centroid"
    choice is a quality heuristic, not a correctness property) of each
    connected semantic-duplicate group found by
    :func:`semantic_neardup_pairs`. Composes the cell-partitioned pair
    search with :func:`~..operators.dedup.connected_components` (the
    same bounded-driver/distributed routing the text dedup family
    uses)."""
    from .dedup import neardup_canonicalize
    pairs = semantic_neardup_pairs(df, threshold, id_col, vec_col, n_cells,
                                   centroids=centroids)
    return neardup_canonicalize(df, pairs, id_col, "id_a", "id_b")


def knn_label_vote(corpus: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """k-NN classification by majority vote: each query's label is the
    most frequent label among its top-``k`` exact cosine neighbors
    (ties → smaller label; both the neighbor ranking and the vote
    tie-break are deterministic, so the result is oracle-checkable).

    Composes :func:`cosine_topk` (broadcast queries, single corpus
    scan) with a label join keyed on the neighbor id (the top-k frame
    is ``|queries|·k`` rows — AQE broadcasts it against the corpus
    label projection) and a per-query vote count."""
    topk = cosine_topk(corpus, queries, k=k, id_col=id_col,
                       vec_col=vec_col)
    labels = corpus.select(F.col(id_col).alias("neighbor_id"),
                           F.col(label_col).alias("neighbor_label"))
    votes = (topk.join(labels, "neighbor_id")
             .groupBy("query_id", "neighbor_label")
             .agg(F.count(F.lit(1)).alias("votes")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("votes").desc(), F.col("neighbor_label").asc())
    return (votes.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("query_id",
                    F.col("neighbor_label").alias("pred_label"),
                    "votes"))


# ------------------------------------------- quantized k-means trainer (r16)

#: centroid-update offset: shifts the division numerator non-negative
#: (components are bounded by scale·max|x| ≪ this), where floor and
#: truncating integer division coincide across engines
_KM_OFF = 1 << 22


def _km_dist_expr(cents: dict[int, list[int]], cids: list[int]) -> str:
    """Integer squared distances of an ``xq`` column to every centroid
    (literal arrays) — shared by the trainer and the serving assign."""
    arrs = ", ".join(
        "array(" + ", ".join(str(v) for v in cents[c]) + ")"
        for c in cids)
    return (f"transform(array({arrs}), c -> "
            f"aggregate(zip_with(xq, c, (a, b) -> "
            f"(a - b) * (a - b)), 0L, (s, v) -> s + v))")


def _km_cid_expr(cids: list[int]) -> str:
    """Map the 1-based argmin index ``__best`` back to the centroid id."""
    return ("CAST(" + " ".join(
        f"CASE WHEN __best = {i + 1} THEN {c} ELSE"
        for i, c in enumerate(cids))
        + " -1 " + "END " * len(cids) + "AS BIGINT)")


def kmeans_fit(embeds: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               scale: int = 1000):
    """The fit loop of :func:`kmeans_quantized`, exposed for
    composition (the IVF-with-trained-centroids row): returns
    ``(cents, assigned)`` — the trained integer centroid dict and the
    final-iteration assignment frame (vid, xq, cid, dist; lazy, built
    against the PRE-update centroids, as Lloyd defines it).

    DISTRIBUTED Lloyd k-means, trained in EXACT integer arithmetic
    (r16 — the quantize-before-cross-partition-aggregation discipline
    that made the unigram-EM and NB trainers oracle-exact, applied to
    clustering): vectors quantize per-component to integer
    milli-units (``floor(x·scale + 0.5)`` — per-element, order-free),
    so centroid updates are INTEGER sums + one floor division
    (``(2·Σ + n) // (2·n)``, round-half-up), assignments are integer
    squared distances with a smallest-id tie-break, and the whole
    trainer is a pure function of the input multiset — partition-
    invariant, bit-identical across engines, SQL-unrollable.

    Float k-means (numpy, the PQ codebook path above) remains the
    serving default for quality; THIS trainer is the graded/auditable
    variant — at milli-unit resolution on unit-scale embeddings the
    quantization error is ~1e-3 per component, far below cluster
    separation in any realistic corpus.

    Scale shape: per iteration, assignment is a map-only pass (the
    k×dim centroid table rides into the plan as LITERALS — broadcast
    folded into codegen; no join, no shuffle), and the update is ONE
    (cid, dim)-keyed partial-agg shuffle of k·dim·mappers rows
    followed by a BOUNDED k·dim driver collect (the model is the
    driver artifact, same as every trainer here). Empty clusters keep
    their previous centroid (deterministic; the oracle mirrors it).

    Seeds: the quantized vectors of the ``k`` smallest ids — data
    seeds, derivable by the oracle without literal injection.

    Returns one row per (cid, j): the trained centroid component
    after the LAST update, with the final assignment's member count
    and exact integer inertia — k·dim rows pinning the whole
    trajectory (a drift at any iteration moves later centroids)."""
    q = embeds.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(floor(CAST(x AS "
               f"DOUBLE) * {scale} + CAST(0.5 AS DOUBLE)) AS BIGINT))"
               ).alias("xq"))
    seed_rows = (q.filter(F.col("vid") < k)
                 .orderBy("vid").collect())  # bounded: k rows
    cents: dict[int, list[int]] = {int(r["vid"]): list(r["xq"])
                                   for r in seed_rows}
    cids = sorted(cents)

    def assign(frame):
        return (frame
                .withColumn("__d", F.expr(_km_dist_expr(cents, cids)))
                .withColumn("__best",
                            F.expr("array_position(__d, "
                                   "array_min(__d))").cast("int"))
                .withColumn("cid", F.expr(_km_cid_expr(cids)))
                .withColumn("dist", F.expr("element_at(__d, __best)")))

    assigned = None
    for _ in range(iters):
        assigned = assign(q)
        sums = (assigned
                .select("cid", F.posexplode("xq").alias("j0", "v"))
                .groupBy("cid", "j0")
                .agg(F.sum("v").alias("s"),
                     F.count(F.lit(1)).alias("n"))
                .collect())  # bounded: k·dim rows
        new = {c: list(cents[c]) for c in cids}  # empty-cluster rule
        for r in sums:
            s, n = int(r["s"]), int(r["n"])
            # round-half-up mean with an offset keeping the numerator
            # non-negative: Python's // floors but SQL '//' dialects
            # disagree on negatives (DuckDB truncates toward zero) —
            # with a non-negative numerator the two coincide, so the
            # IDENTICAL expression runs in the oracle
            assert s + n * _KM_OFF >= 0, "component below -_KM_OFF"
            new[int(r["cid"])][int(r["j0"])] = \
                (2 * (s + n * _KM_OFF) + n) // (2 * n) - _KM_OFF
        cents = new
    return cents, assigned


def kmeans_quantized(embeds: DataFrame, k: int = 8, iters: int = 2,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     scale: int = 1000) -> DataFrame:
    """The graded trainer surface over :func:`kmeans_fit`: one row per
    (cid, j) — trained centroid component + final-assignment member
    count + exact integer inertia (see kmeans_fit's docstring and the
    q_kmeans_trained row for the full contract and scale shape)."""
    spark = embeds.sparkSession
    cents, assigned = kmeans_fit(embeds, k=k, iters=iters,
                                 id_col=id_col, vec_col=vec_col,
                                 scale=scale)
    cids = sorted(cents)
    stats = (assigned.groupBy("cid")
             .agg(F.count(F.lit(1)).alias("n_members"),
                  F.sum("dist").alias("inertia")))
    cent_rows = [(c, j + 1, cents[c][j])
                 for c in cids for j in range(len(cents[c]))]
    cent_df = spark.createDataFrame(
        cent_rows, "cid long, j int, c_j long")
    return (cent_df.join(stats, "cid", "left")
            .withColumn("n_members",
                        F.coalesce("n_members", F.lit(0)).cast("long"))
            .withColumn("inertia",
                        F.coalesce("inertia", F.lit(0)).cast("long")))


def kmeans_assign(embeds: DataFrame, cents: dict[int, list[int]],
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  scale: int = 1000) -> DataFrame:
    """The serving half of :func:`kmeans_quantized`: assign vectors to
    trained integer centroids — the same milli-unit quantization,
    integer squared distance, and smallest-id tie-break as the
    trainer, as a map-only pass (centroids ride as literals; no join,
    no shuffle). Returns the input ids with ``cid`` and the exact
    integer ``dist``."""
    cids = sorted(cents)
    return (embeds
            .select(F.col(id_col),
                    F.expr(f"transform({vec_col}, x -> CAST(floor("
                           f"CAST(x AS DOUBLE) * {scale} + CAST(0.5 "
                           f"AS DOUBLE)) AS BIGINT))").alias("xq"))
            .withColumn("__d", F.expr(_km_dist_expr(cents, cids)))
            .withColumn("__best", F.expr(
                "array_position(__d, array_min(__d))").cast("int"))
            .select(id_col,
                    F.expr(_km_cid_expr(cids)).alias("cid"),
                    F.expr("element_at(__d, __best)").alias("dist")))


def ivf_trained_topk(embeds: DataFrame, k_clusters: int = 8,
                     iters: int = 2, n_queries: int = 5,
                     nprobe: int = 2, topk: int = 5,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     scale: int = 1000) -> DataFrame:
    """IVF approximate nearest neighbors over SELF-TRAINED centroids
    (r16 — the trained-index composition: every other ANN row probes
    injected-constant structures; this one trains its coarse
    quantizer ON the corpus via :func:`kmeans_fit` and is still
    exactly oracle-checkable, because the whole chain — training,
    cell assignment, probe selection, candidate re-rank — runs in the
    quantized integer space with total tie-breaks).

    Pipeline: fit k centroids (two integer Lloyd iterations) → assign
    every corpus vector to its cell (map-only; centroids are
    literals) → for each query (the ``n_queries`` smallest ids),
    probe the ``nprobe`` nearest cells by centroid distance →
    exact integer re-rank of the probed cells' members (dist, id
    tie-break) → top-``topk`` per query, self-matches excluded.

    Scale shape: the corpus never shuffles for assignment (literal
    centroids fold into codegen); the probe table is Q·nprobe rows
    BROADCAST into the candidate join, so the corpus-side join is
    map-only too; the only exchange carries the candidate sliver to
    the per-query top-k window — the IVF contract (probed cells'
    members, not the corpus)."""
    cents, _ = kmeans_fit(embeds, k=k_clusters, iters=iters,
                          id_col=id_col, vec_col=vec_col, scale=scale)
    cids = sorted(cents)
    q = embeds.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(floor(CAST(x AS "
               f"DOUBLE) * {scale} + CAST(0.5 AS DOUBLE)) AS BIGINT))"
               ).alias("xq"))
    corpus = (q.withColumn("__d", F.expr(_km_dist_expr(cents, cids)))
              .withColumn("__best", F.expr(
                  "array_position(__d, array_min(__d))").cast("int"))
              .select("vid", "xq",
                      F.expr(_km_cid_expr(cids)).alias("cid")))
    cid_arr = "array(" + ", ".join(str(c) for c in cids) + ")"
    probes = (q.filter(F.col("vid") < n_queries)
              .withColumn("__d", F.expr(_km_dist_expr(cents, cids)))
              .select(F.col("vid").alias("qid"),
                      F.col("xq").alias("qxq"),
                      F.posexplode("__d").alias("ci", "cdist"))
              .withColumn("cid", F.expr(
                  f"element_at({cid_arr}, ci + 1)").cast("long"))
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("qid")
                  .orderBy("cdist", "cid")))
              .filter(F.col("rn") <= nprobe)
              .select("qid", "qxq", "cid"))
    cand = (corpus.join(F.broadcast(probes), "cid")
            .filter(F.col("vid") != F.col("qid"))
            .withColumn("dist", F.expr(
                "aggregate(zip_with(qxq, xq, (a, b) -> "
                "(a - b) * (a - b)), 0L, (s, v) -> s + v)")))
    ranked = cand.withColumn("rank", F.row_number().over(
        Window.partitionBy("qid").orderBy("dist", "vid")))
    return (ranked.filter(F.col("rank") <= topk)
            .select("qid", F.col("rank").cast("int").alias("rank"),
                    F.col("vid").alias(id_col), "dist"))

"""Deduplication operators for the LLM-data-pipeline surface (SURVEY §7
slice 6): exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine.

Scale design notes (the point of each implementation):

* **exact_dedup** — one hash-partitioned ``groupBy(key)`` with ``min_by``;
  single shuffle on the dedup key, map-side partial aggregation, no sort.
* **ngram_jaccard_pairs** — exact pairwise Jaccard via an inverted index
  (explode shingles → self-join on shingle → count co-occurrences). The
  join key is the *shingle*, so only documents sharing a shingle ever meet
  — at 100 TB this is the classic "similarity join via token index", not
  an O(n²) cross join. Hot shingles are the skew risk: ``df`` filter on
  document frequency caps them (stopword-shingle blowup control).
* **minhash_signatures / minhash_lsh_pairs** — deterministic MinHash from
  ``xxhash64(shingle, seed)`` (JVM-side, no UDF), banded LSH: candidates
  meet only within a (band_idx, band_hash) bucket → shuffle is
  O(docs × bands), independent of corpus pair count.
* **simhash** — 64-bit sign-sum fingerprint, all Column algebra
  (transform/aggregate over bit positions); near-dups = bucket collisions
  on rotated prefixes or hamming distance on candidate pairs.
* **embedding_cosine_pairs** — near-dup by cosine over ``array<float>``;
  brute pairs at test scale, LSH-bucketed at 100 TB (similarity.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------- exact dedup

def exact_dedup(df: DataFrame, key_cols: list[str],
                order_col: str) -> DataFrame:
    """Keep exactly one row per distinct ``key_cols`` — the one with the
    smallest ``order_col`` (deterministic, unlike ``dropDuplicates``).

    Implementation: ``min_by(struct(*), order)`` under a single groupBy —
    one shuffle, partial agg on the map side, no window sort."""
    all_cols = df.columns
    keep = F.min_by(F.struct(*[F.col(c) for c in all_cols]), F.col(order_col))
    out = df.groupBy(*[F.col(c) for c in key_cols]).agg(keep.alias("__keep"))
    return out.select(*[F.col(f"__keep.{c}").alias(c) for c in all_cols])


# ---------------------------------------------------------------- shingling

def _shingles(text_col: Column, n: int) -> Column:
    """Distinct word n-gram shingles from lowercase alpha tokens —
    pure Column algebra (transform over a token-index sequence)."""
    toks = F.regexp_extract_all(F.lower(text_col), F.lit("[a-z]+"), 0)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.array_distinct(F.filter(grams, lambda g: F.length(g) > 0))


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3,
                  out_col: str = "shingles") -> DataFrame:
    return df.withColumn(out_col, _shingles(F.col(text_col), n))


# ----------------------------------------------------- exact n-gram Jaccard

def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.5,
                        max_shingle_df: int | None = None) -> DataFrame:
    """Exact n-gram-Jaccard similarity join: pairs (a < b) with
    |A∩B| / |A∪B| ≥ threshold. Inverted-index plan (see module docstring).

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    (stop-shingle skew control — at scale a ubiquitous shingle would
    otherwise fan out quadratically)."""
    sh = (df.select(F.col(id_col).alias("id"),
                    _shingles(F.col(text_col), n).alias("sh"))
            .withColumn("sz", F.size("sh")))
    sizes = sh.select("id", "sz")
    inv = sh.select("id", F.explode("sh").alias("shingle"))
    if max_shingle_df is not None:
        hot = (inv.groupBy("shingle").count()
               .filter(F.col("count") > max_shingle_df).select("shingle"))
        inv = inv.join(hot, "shingle", "left_anti")
    a, b = inv.alias("a"), inv.alias("b")
    inter = (a.join(b, (F.col("a.shingle") == F.col("b.shingle")) &
                    (F.col("a.id") < F.col("b.id")))
             .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    out = (inter
           .join(sizes.toDF("id_a", "sz_a"), "id_a")
           .join(sizes.toDF("id_b", "sz_b"), "id_b")
           .withColumn("jaccard",
                       F.col("inter") /
                       (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard")))
    return out


# ------------------------------------------------------------- MinHash + LSH

def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_perm: int = 64) -> DataFrame:
    """Deterministic MinHash signature per document: for seed i,
    sig[i] = min over shingles of xxhash64(shingle, i). All JVM-side
    (xxhash64 + array_min under transform) — no Python in the loop."""
    sh = _shingles(F.col(text_col), n)
    seeds = F.sequence(F.lit(0), F.lit(num_perm - 1))
    sig = F.transform(
        seeds,
        lambda i: F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))))
    return df.select(F.col(id_col).alias("id"), sig.alias("sig"),
                     F.size(sh).alias("sz"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5) -> DataFrame:
    """Banded-LSH candidate generation + MinHash-estimated Jaccard.

    rows_per_band = num_perm // bands; two docs collide if any band of
    their signatures hashes equal. Candidates are verified by the full
    signature agreement fraction (the MinHash estimate of Jaccard), and
    kept if ≥ threshold. Shuffle cost: O(docs × bands) bucket rows, then
    joins only inside buckets — the 100 TB-safe shape."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm).cache()
    buckets = sigs.select(
        "id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.transform(F.slice(F.col("sig"),
                                             b * rows_per_band + 1,
                                             rows_per_band),
                                     lambda h: h.cast("string")))
                           ).alias("bucket")))).alias("bb"))
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (a.join(b, (F.col("a.bb") == F.col("b.bb")) &
                   (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct())
    sig_a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    sig_b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    est = (cand.join(sig_a, "id_a").join(sig_b, "id_b")
           .withColumn(
               "est_jaccard",
               F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                          lambda x, y: x == y),
                               lambda eq: eq)) / F.lit(float(num_perm)))
           .filter(F.col("est_jaccard") >= threshold)
           .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard")))
    return est


# ------------------------------------------------------------------- SimHash

def with_simhash(df: DataFrame, text_col: str = "text",
                 out_col: str = "simhash", bits: int = 64) -> DataFrame:
    """SimHash over word tokens: bit j of the fingerprint is the sign of
    Σ_tokens (2·bit_j(xxhash64(token)) − 1). Bit positions are unrolled in
    Python (they're compile-time constants); per-token work stays pure
    Column algebra under whole-stage codegen.

    To avoid 64 separate passes over the token array, the per-token ±1
    contributions are accumulated in one ``aggregate`` over an array of
    ``bits`` counters."""
    toks = F.array_distinct(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0))
    zeros = F.array_repeat(F.lit(0).cast("long"), bits)
    # one pass: counters[j] += 2*bit_j(hash(tok)) - 1
    counters = F.aggregate(
        toks, zeros,
        lambda acc, t: F.zip_with(
            acc,
            F.transform(F.sequence(F.lit(0), F.lit(bits - 1)),
                        lambda j: F.floor(F.xxhash64(t) / F.pow(F.lit(2.0), j))
                                   .cast("long").bitwiseAND(F.lit(1)) * 2 - 1),
            lambda a, d: a + d))
    fingerprint = F.lit(0).cast("long")
    for j in range(bits):
        bit_val = -(1 << 63) if j == 63 else (1 << j)  # top bit = long sign bit
        fingerprint = fingerprint.bitwiseOR(
            F.when(F.element_at(counters, j + 1) > 0,
                   F.lit(bit_val).cast("long")).otherwise(F.lit(0).cast("long")))
    return df.withColumn(out_col, fingerprint)


def simhash_hamming(col_a: Column, col_b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints = popcount(xor)."""
    x = col_a.bitwiseXOR(col_b)
    return F.bit_count(x)

"""Deterministic sampling for training-data pipelines.

Production corpus sampling must be *reproducible* (same subset on every
run, on any cluster layout) and *consistent* (a document's fate never
depends on partitioning or row order) — ``df.sample()`` is neither. The
standard construction is hash-bucket sampling: bucket a stable key by a
cryptographic hash, keep the rows whose bucket falls under the rate.

Scale shape: map-only Column algebra (md5 + hex parse + modulus) fully
pipelined with the scan, zero shuffle, and trivially pushdown-friendly.
The hash is md5 so an external SQL engine reproduces the exact subset
(DuckDB: ``CAST('0x' || substr(md5(k), 1, 8) AS BIGINT)`` — verified
identical to Spark's ``conv(substring(md5(k), 1, 8), 16, 10)``), which
also makes every sampling operator an oracle-checkable correctness row.

A ``salt`` decorrelates independent samples over the same keys (e.g.
train/eval splits: disjoint salts → independent buckets).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bucket space; rates are expressed in basis points of this (1/10000)
BUCKETS = 10_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS) from the md5 of ``salt || key``.
    First 8 hex digits → 32-bit int → modulus: uniform, deterministic,
    engine-portable."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % BUCKETS


def bucket_sql(key_expr: str, salt: str = "") -> str:
    """DuckDB twin of :func:`hash_bucket` (same bytes, same bucket)."""
    return ("CAST('0x' || substr(md5('" + salt + "' || "
            f"CAST({key_expr} AS VARCHAR)), 1, 8) AS BIGINT) % {BUCKETS}")


def deterministic_sample(df: DataFrame, key_col: str, rate_bp: int,
                         salt: str = "") -> DataFrame:
    """Keep rows whose key hashes under ``rate_bp`` basis points
    (rate_bp=2000 → a stable, reproducible 20% of distinct keys)."""
    return df.filter(hash_bucket(F.col(key_col), salt) < rate_bp)


def cap_per_group(df: DataFrame, group_cols: list[str],
                  order_by: list[Column], cap: int) -> DataFrame:
    """Keep at most ``cap`` rows per group, best-first by ``order_by`` —
    the per-domain/source cap of web-corpus pipelines (a handful of hot
    domains must not dominate the training mix; C4 and RefinedWeb both
    apply this shape). Emits ``rank_in_group`` (1-based) so callers can
    audit how full each group's quota ran.

    Scale shape: one hash shuffle on the group key, and the rank limit
    is pushed below the exchange as a partial WindowGroupLimit (each map
    task pre-prunes to its local top-``cap``), so the shuffle carries at
    most ``cap`` rows per group per mapper — never the full corpus sort
    a global ORDER BY would cost. Skewed groups (one giant domain) are
    exactly the rows the partial limit prunes hardest."""
    from pyspark.sql import Window
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (df.withColumn("rank_in_group", F.row_number().over(w))
            .filter(F.col("rank_in_group") <= cap))


def mixture_sample(df: DataFrame, strata_col: str, key_col: str,
                   alpha: float = 0.5, target_frac: float = 0.5,
                   salt: str = "", weight_col: str | None = None) -> DataFrame:
    """Temperature-scaled mixture reweighting: sample stratum ``s`` at a
    rate making its share of the output ∝ ``mass_s ** alpha`` (the
    multilingual/multi-source temperature-sampling rule — alpha < 1
    upsamples rare strata relative to their natural frequency), with the
    overall output sized at ``target_frac`` of the input. Rates are
    clamped to 1 (a stratum cannot be upsampled beyond keeping all of
    it) and quantized to basis points; membership is the deterministic
    md5 bucket, so the subset is reproducible and engine-portable.

    ``mass_s`` is row count by default; pass ``weight_col`` to budget
    in a different unit — most usefully a per-row TOKEN count, since
    real pretraining mixes are budgeted in tokens, not documents, and
    a doc-count mix silently overweights short-doc sources. Membership
    stays per-key (whole documents are kept or dropped); the kept
    token mass per stratum converges to ``rate × mass_s`` because the
    hash bucket is independent of document length.

    Adds ``stratum_cnt`` (the stratum's mass in the chosen unit) and
    ``rate_bp`` to the kept rows for auditing.

    Scale shape: one partial-agg groupBy to weigh strata, a
    single-partition window over the (tiny: one row per stratum) count
    frame to total it, then a BROADCAST join of the rate table back onto
    the corpus and a map-only bucket filter. The corpus itself is
    scanned twice but never shuffled."""
    from pyspark.sql import Window
    mass = (F.sum(F.col(weight_col)) if weight_col
            else F.count(F.lit(1)))
    counts = (df.groupBy(strata_col)
              .agg(mass.alias("stratum_cnt")))
    w = Window.partitionBy()
    rates = (counts
             .withColumn("w", F.pow(F.col("stratum_cnt").cast("double"),
                                    F.lit(float(alpha))))
             .withColumn("tot_cnt", F.sum("stratum_cnt").over(w))
             .withColumn("tot_w", F.sum("w").over(w))
             .withColumn(
                 "rate_bp",
                 F.least(
                     F.lit(BUCKETS).cast("long"),
                     F.floor(F.lit(float(target_frac)) * F.col("tot_cnt")
                             * F.col("w") / F.col("tot_w")
                             / F.col("stratum_cnt") * BUCKETS)
                     .cast("long"))))
    joined = df.join(
        F.broadcast(rates.select(strata_col, "stratum_cnt", "rate_bp")),
        strata_col)
    return joined.filter(hash_bucket(F.col(key_col), salt)
                         < F.col("rate_bp"))


def stratified_sample(df: DataFrame, key_col: str, strata_col: str,
                      rates_bp: dict[str, int],
                      default_bp: int = 0, salt: str = "") -> DataFrame:
    """Per-stratum deterministic rates — the training-data mixing
    primitive (e.g. keep 100% of rare high-quality strata, 5% of the
    bulk). Unlisted strata fall back to ``default_bp``."""
    rate: Column = F.lit(default_bp)
    for value, bp in rates_bp.items():
        rate = F.when(F.col(strata_col) == value, F.lit(bp)).otherwise(rate)
    return df.filter(hash_bucket(F.col(key_col), salt) < rate)


def train_eval_split(df: DataFrame, key_col: str,
                     splits: dict[str, int] | None = None,
                     salt: str = "split1") -> DataFrame:
    """Deterministic disjoint train/val/test assignment: contiguous
    md5-bucket ranges (basis points of BUCKETS) per split name, so (a)
    every key lands in exactly one split, (b) the assignment is stable
    across runs/engines/cluster layouts, and (c) growing one split
    keeps its existing members (ranges only extend). Keys hash with a
    dedicated ``salt`` so split membership is independent of any other
    sampling decision on the same corpus.

    Map-only Column algebra — zero shuffle, oracle-exact."""
    splits = splits or {"train": 9000, "val": 500, "test": 500}
    if sum(splits.values()) != BUCKETS:
        raise ValueError(f"split basis points must sum to {BUCKETS}")
    bucket = hash_bucket(F.col(key_col), salt)
    edge = 0
    expr: Column | None = None
    for name, width in splits.items():
        edge += width
        cond = bucket < edge
        expr = (F.when(cond, F.lit(name)) if expr is None
                else expr.when(cond, F.lit(name)))
    return df.withColumn("split", expr)


def quality_budget_fill(df: DataFrame, by: str, budget: int,
                        quality_col: str = "quality",
                        token_col: str = "tok",
                        id_col: str = "doc_id") -> DataFrame:
    """Greedy token-budget curation: per ``by`` group, admit documents
    in (``quality_col`` desc, ``id_col``) order until the NEXT document
    would push the group's running token total past ``budget`` — "fill
    1B tokens per source with its best documents", the selection step
    between scoring and training-set materialization. Greedy-by-quality
    is the standard practice (the knapsack optimum is NP-hard and the
    per-document token counts are small relative to the budget, so the
    greedy gap is at most one document's tokens).

    Deterministic: the admission order ties on ``id_col``; the running
    total is an exact integer prefix sum, so membership is bit-exact on
    any engine sorting the same values — every piece is
    oracle-checkable SQL (one window per group, same construction as
    the SQL twin).

    Scale shape: ONE window pass partitioned by the group (sort by
    quality within group — the same shuffle+sort an exact per-group
    ranking needs anyway), then a map-only filter. No second shuffle,
    no driver state. Skewed groups sort-spill gracefully; if a single
    group outgrows executor sort memory, pre-aggregate candidates with
    a coarse quality-band filter first (the band gate is
    :func:`activecube_graphql_spark.operators.robust.percentile_filter`).

    NULL contract (ADVICE r06): rows with a NULL ``token_col`` are
    EXCLUDED before the window — a document of unknown token cost
    cannot be admitted against a token budget (the previous behavior
    admitted them at zero cost and counted them in the output, because
    window SUM skips NULLs on every engine — consistent, but silently
    wrong semantics). Same explicit-exclusion shape as winsorize's
    NULL contract.

    Output: the admitted rows with ``cum_tok`` (running total including
    the row) for auditing."""
    from pyspark.sql import Window

    w = (Window.partitionBy(by)
         .orderBy(F.col(quality_col).desc(), F.col(id_col))
         .rowsBetween(Window.unboundedPreceding, 0))
    return (df.filter(F.col(token_col).isNotNull())
            .withColumn("cum_tok",
                        F.sum(F.col(token_col).cast("long")).over(w))
            .filter(F.col("cum_tok") <= F.lit(int(budget))))

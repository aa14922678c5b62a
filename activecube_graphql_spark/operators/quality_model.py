"""Model-based quality filtering: train a lightweight classifier on
cheap text signals and score the corpus with it — the second stage of
the standard two-stage curation pattern (hard rules first, a learned
scorer for the gray zone; the CCNet/"quality classifier" family).

The model here is a shallow decision tree over the SAME portable
signal columns the rule filter uses (word count, mean word length,
token diversity, stopword count, punctuation ratio) — axis-aligned
threshold splits are exactly the function family quality rules live in
(a conjunction of range checks is NOT linearly separable, so a
logistic baseline caps out ~70% on the rule boundary; a depth-5 tree
recovers it). The point of this module is the *distributed plumbing*
(featurize → fit → broadcast the model → score as a map-only stage):
swap in any `pyspark.ml` classifier, or score with an external model
via a Pandas UDF, without touching callers.

Scale shape: featurization is the existing codegen'd column algebra
(zero UDFs); the tree fit aggregates split statistics over the corpus
(one pass per depth level, partial-aggregated map-side); the fitted
model broadcasts into a map-only scoring stage. Nothing here shuffles
the corpus.

Determinism: featurization and scoring are deterministic; the tree fit
is deterministic for a fixed seed (binned split search, no sampling at
these sizes). Validated by pytest against the rule labels (this is by
design not an SQL-oracle row: a trained model is not SQL-expressible —
SURVEY §5.2 item 4's weaker contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import (MEAN_WORD_LEN, PUNCT_COUNT, STOPWORD_COUNT,
                   TOKEN_COUNT, TOKEN_DIVERSITY, _col)

#: (name, portable fragment) — the feature basis, shared with the rules
FEATURES = [
    ("f_word_count", TOKEN_COUNT),
    ("f_mean_word_len", MEAN_WORD_LEN),
    ("f_token_diversity", TOKEN_DIVERSITY),
    ("f_stopword_count", STOPWORD_COUNT),
    ("f_punct_count", PUNCT_COUNT),
]


def featurize(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add the numeric feature columns (map-only, codegen'd)."""
    for name, frag in FEATURES:
        df = df.withColumn(name, _col(frag, text_col).cast("double"))
    return df


def train_quality_model(df: DataFrame, label_col: str,
                        text_col: str = "text", max_depth: int = 5):
    """Fit a shallow decision tree predicting ``label_col`` (0/1) from
    the text signals; returns the fitted PipelineModel (assembler +
    classifier)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import DecisionTreeClassifier
    from pyspark.ml.feature import VectorAssembler

    feats = featurize(df, text_col)
    asm = VectorAssembler(inputCols=[n for n, _ in FEATURES],
                          outputCol="features")
    tree = DecisionTreeClassifier(featuresCol="features",
                                  labelCol=label_col,
                                  maxDepth=max_depth, seed=42)
    return Pipeline(stages=[asm, tree]).fit(feats)


def score_quality(df: DataFrame, model, text_col: str = "text",
                  out_col: str = "quality_prob") -> DataFrame:
    """Score a corpus with a fitted model: adds ``out_col`` (P(label=1))
    — a broadcast-coefficients map-only stage."""
    from pyspark.ml.functions import vector_to_array
    scored = model.transform(featurize(df, text_col))
    keep = [c for c in df.columns]
    return (scored.withColumn(
        out_col, F.round(vector_to_array("probability")[1], 4))
        .select(*keep, out_col))

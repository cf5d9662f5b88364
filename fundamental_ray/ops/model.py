"""Distributed logistic-regression training — the model-based quality
classifier of the LLM-data-pipeline family (the learned upgrade of the
heuristic gopher_filter: train a classifier ON the corpus's own cheap
labels, as fastText/CCNet-style quality scoring does at web scale).

Scale shape (mergeable-statistics gradient descent, the kmeans pattern):
every iteration is ONE streaming ``map_batches`` pass that folds per-batch
partial gradient sums (3 floats + a count per block); only those constants
leave the workers, the driver reduces them to the next weight vector and
re-broadcasts it as plain task args. The corpus never crosses an exchange
and is never materialized. The final accuracy pass is the same shape
(per-batch correct-count partials).

Determinism contract (what makes iterative float training
oracle-checkable, same convention as ops/cluster.py kmeans):
- features are standardized with FIXED constants (not data-dependent
  stats): x1 = (n_words − 55)/20, x2 = (mean_word_len − 6.5)/3;
- labels are the deterministic gopher_filter conjunction;
- the logit is evaluated with explicit scalar association
  ``w0 + w1*x1 + w2*x2`` on both sides (never a dot product whose
  reduction order could differ);
- weights are ROUNDED half-away-from-zero to 6 decimals after every
  update, quantizing away gradient-summation-order ulps (grad components
  are O(N)-sums of O(1) terms: drift ~1e-13 ≪ 0.5e-6);
- the update is ``w − (lr·g)/n`` with the same operation order in SQL.

Token-length sums are integers, so mean word length is bit-identical
across engines regardless of summation order — the same property
gopher_filter's hash-green status already rests on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..pipelines.analytics import r2
from .corpus_stats import _read_docs, gopher_metrics, gopher_rules
from .text import WORD_RE

LOGREG_ITERS = 3
LOGREG_LR = 0.5
W_DECIMALS = 6


def _features(df: pd.DataFrame):
    toks = df["text"].fillna("").str.lower().str.findall(WORD_RE)
    n_words, mwl, dr = gopher_metrics(toks)
    x1 = (n_words - 55.0) / 20.0
    x2 = (mwl - 6.5) / 3.0
    y = gopher_rules(n_words, mwl, dr).astype(np.float64)
    return x1, x2, y


def _sigmoid(w, x1, x2):
    z = w[0] + w[1] * x1 + w[2] * x2
    return 1.0 / (1.0 + np.exp(-z))


def logreg_train(
    sf_dir: str, iters: int = LOGREG_ITERS, lr: float = LOGREG_LR
) -> pd.DataFrame:
    """(feature, value) rows: trained weights + the training-set correct
    count under the final (rounded) weights."""

    def grad_partial(df: pd.DataFrame, w) -> pd.DataFrame:
        x1, x2, y = _features(df)
        e = _sigmoid(w, x1, x2) - y
        return pd.DataFrame(
            [{"g0": e.sum(), "g1": (e * x1).sum(), "g2": (e * x2).sum(),
              "cnt": np.int64(len(df))}]
        )

    docs = _read_docs(sf_dir)
    w = (0.0, 0.0, 0.0)
    n = None
    for _ in range(iters):
        parts = docs.map_batches(
            grad_partial, fn_kwargs={"w": w}, batch_format="pandas"
        ).to_pandas()  # n_blocks rows of 4 scalars — constant-bounded
        if n is None:
            n = float(parts["cnt"].sum())
        g = (parts["g0"].sum(), parts["g1"].sum(), parts["g2"].sum())
        w = tuple(float(r2(w[j] - (lr * g[j]) / n, W_DECIMALS)) for j in range(3))

    def correct_partial(df: pd.DataFrame, w) -> pd.DataFrame:
        x1, x2, y = _features(df)
        p = _sigmoid(w, x1, x2)
        return pd.DataFrame([{"c": np.int64(((p > 0.5) == (y == 1.0)).sum())}])

    n_correct = float(
        docs.map_batches(
            correct_partial, fn_kwargs={"w": w}, batch_format="pandas"
        ).to_pandas()["c"].sum()
    )
    return pd.DataFrame(
        {
            "feature": ["bias", "x_words", "x_mwl", "n_correct"],
            "value": [w[0], w[1], w[2], n_correct],
        }
    )


def logreg_train_sql(iters: int = LOGREG_ITERS, lr: float = LOGREG_LR) -> str:
    """Unrolled-CTE DuckDB mirror: same features, labels, logit
    association, update order and per-iteration rounding."""
    from .corpus_stats import (
        G_MAX_MWL, G_MAX_WORDS, G_MIN_DISTINCT_RATIO, G_MIN_MWL, G_MIN_WORDS,
    )

    nd = W_DECIMALS
    ctes = [
        rf"""t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents
), m AS (
  SELECT doc_id, len(toks)::BIGINT AS n_words,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE list_sum(list_transform(toks, x -> length(x)))::DOUBLE
                   / len(toks) END AS mwl,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_distinct(toks))::DOUBLE / len(toks) END AS dr
  FROM t
), f AS (
  SELECT (n_words - 55.0) / 20.0 AS x1, (mwl - 6.5) / 3.0 AS x2,
         CASE WHEN (n_words BETWEEN {G_MIN_WORDS} AND {G_MAX_WORDS})
                   AND mwl >= {G_MIN_MWL} AND mwl <= {G_MAX_MWL}
                   AND dr >= {G_MIN_DISTINCT_RATIO}
              THEN 1.0 ELSE 0.0 END AS y
  FROM m
), nn AS (SELECT count(*)::DOUBLE AS n FROM f),
w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2)"""
    ]
    for i in range(1, iters + 1):
        ctes.append(f"""g{i} AS (
  SELECT SUM(e) AS g0, SUM(e * x1) AS g1, SUM(e * x2) AS g2
  FROM (
    SELECT x1, x2,
           1.0 / (1.0 + exp(-(w.w0 + w.w1 * x1 + w.w2 * x2))) - y AS e
    FROM f, w{i - 1} w
  )
), w{i} AS (
  SELECT ROUND(w.w0 - ({lr} * g.g0) / (SELECT n FROM nn), {nd}) AS w0,
         ROUND(w.w1 - ({lr} * g.g1) / (SELECT n FROM nn), {nd}) AS w1,
         ROUND(w.w2 - ({lr} * g.g2) / (SELECT n FROM nn), {nd}) AS w2
  FROM w{i - 1} w, g{i} g
)""")
    last = f"w{iters}"
    return (
        "WITH " + ",\n".join(ctes) + f"""
SELECT 'bias' AS feature, w0 AS value FROM {last}
UNION ALL SELECT 'x_words', w1 FROM {last}
UNION ALL SELECT 'x_mwl', w2 FROM {last}
UNION ALL SELECT 'n_correct', (
  SELECT COUNT(*)::DOUBLE FROM f, {last} w
  WHERE (1.0 / (1.0 + exp(-(w.w0 + w.w1 * x1 + w.w2 * x2))) > 0.5) = (y = 1.0)
)"""
    )


LOGREG_TRAIN_SQL = logreg_train_sql()

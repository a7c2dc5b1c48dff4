"""Distributed logistic-regression training (IRLS / Newton) for the
learned-quality-filter loop: ``doc_quality_features`` exports signals,
this trains the classifier, ``quality_classifier_score`` is the
map-only inference shape the trained weights deploy into (the
CCNet / FineWeb recipe's train-then-filter step).

Design for 100 TB:
- Each Newton iteration is ONE scan of the (checkpointed, narrow)
  feature frame producing fixed-size partials: the d x d weighted Gram
  X'WX and the d-vector gradient X'(y-p). Rows never leave executors;
  the driver sees d*(d+1) numbers per iteration (the same
  "driver-sized abelian partials" discipline as the PCA Gram).
- DETERMINISM: every per-row contribution is quantized to integer
  micros BEFORE summation, so the total is an exact int64 sum —
  independent of row order, partitioning, and Arrow batch boundaries.
  A float sum would drift with partial-sum order and make the learned
  weights (and anything gated on them) nondeterministic run-to-run.
  ``tests/test_logreg.py`` exploits this: a pure-numpy reference doing
  the identical quantized updates matches the distributed trainer
  EXACTLY, not to a tolerance.

Reference basis: extension tier — quality family (SURVEY.md §7 M7);
the reference engine has no trainer, its analyze scripts stop at fixed
thresholds (``/root/reference/analyze/common_utils.py``)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # integer-micro quantum for partials and weights


def _quantized_partials(X: np.ndarray, y: np.ndarray, w: np.ndarray):
    """Per-row quantized IRLS partials: int64 (A, g) where
    A ~ X'WX * 1e6 and g ~ X'(y-p) * 1e6, each row's contribution
    rounded independently (batch-composition invariant)."""
    z = X @ w
    p = 1.0 / (1.0 + np.exp(-z))
    wt = p * (1.0 - p) + 1e-9
    # n x d x d per-row outer products, rounded per row then summed
    contrib_A = (X * wt[:, None])[:, :, None] * X[:, None, :]
    A = np.round(contrib_A * SCALE).astype(np.int64).sum(axis=0)
    contrib_g = X * (y - p)[:, None]
    g = np.round(contrib_g * SCALE).astype(np.int64).sum(axis=0)
    return A, g


def newton_step(A_int: np.ndarray, g_int: np.ndarray, w: np.ndarray,
                ridge: float) -> np.ndarray:
    """Solve (A + ridge*I) dw = g - ridge*w on the exact integer
    totals, then re-quantize the weights to integer micros so the next
    iteration's scoring expression is identical however it is
    replayed."""
    d = len(w)
    A = A_int.astype(np.float64) / SCALE + ridge * np.eye(d)
    g = g_int.astype(np.float64) / SCALE - ridge * w
    w_new = w + np.linalg.solve(A, g)
    return np.round(w_new * SCALE) / SCALE


def irls_train(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 8,
    ridge: float = 10.0,
) -> np.ndarray:
    """Train logistic regression on a DataFrame of double features and
    a 0/1 label. Returns the weight vector (bias first), each weight
    an exact multiple of 1e-6.

    ``feats`` is scanned once per iteration — checkpoint/cache the
    narrow projection before calling (the registered query does)."""
    d = len(feature_cols) + 1
    w = np.zeros(d)
    cols = list(feature_cols)
    n_entries = d * d + d
    for _ in range(iters):
        w_iter = w.copy()  # bind per-iteration value into the closure

        def partials(it, w_iter=w_iter):
            for pdf in it:
                if not len(pdf):
                    continue
                X = np.column_stack(
                    [np.ones(len(pdf))]
                    + [pdf[c].to_numpy(np.float64) for c in cols]
                )
                y = pdf[label_col].to_numpy(np.float64)
                A, g = _quantized_partials(X, y, w_iter)
                flat = np.concatenate([A.ravel(), g])
                yield pd.DataFrame(
                    {"idx": np.arange(n_entries), "v": flat}
                )

        totals = (
            feats.mapInPandas(partials, schema="idx int, v long")
            .groupBy("idx")
            .agg(F.sum("v").alias("v"))
            .collect()
        )
        flat = np.zeros(n_entries, dtype=np.int64)
        for r in totals:
            flat[r.idx] = r.v
        A_int = flat[: d * d].reshape(d, d)
        g_int = flat[d * d :]
        w = newton_step(A_int, g_int, w, ridge)
    return w

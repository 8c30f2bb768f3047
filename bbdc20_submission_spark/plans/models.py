"""L2-L4: seeded model ensemble + majority vote.

The reference trains 2 arms x 11 LightGBM boosters with hyperparams
drawn from a seeded RNG and majority-votes per window
(generate_submission.py:47-130, 479-502). LightGBM is not available in
this container, so the ensemble is pluggable:

- ``lightgbm`` present -> boosters with the reference's param draws
  (seed 1337+i, rounds 600-800, leaves 15-60, bins 8-16, ...);
- otherwise -> a deterministic numpy closed-form ridge one-vs-rest
  classifier per ensemble member (seed-varied l2 + feature subset),
  preserving the ensemble/seeding/votes semantics exactly.

All randomness stays on the driver (SURVEY L4); executors only ever see
broadcast coefficient matrices through a pandas UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - exercised only where lightgbm exists
    import lightgbm as lgb

    HAS_LIGHTGBM = True
except ImportError:
    lgb = None
    HAS_LIGHTGBM = False


@dataclass
class RidgeOVRModel:
    """Closed-form ridge one-vs-rest: scores = [1|X[:, cols]] @ W."""

    cols: np.ndarray  # feature subset indices
    weights: np.ndarray  # (1 + len(cols), n_classes)

    def predict_scores(self, x: np.ndarray) -> np.ndarray:
        xa = np.hstack([np.ones((len(x), 1)), x[:, self.cols]])
        return xa @ self.weights


def _fit_ridge_ovr(
    x: np.ndarray,
    y: np.ndarray,
    n_classes: int,
    sample_weight: np.ndarray,
    l2: float,
    cols: np.ndarray,
) -> RidgeOVRModel:
    xa = np.hstack([np.ones((len(x), 1)), x[:, cols]])
    yh = np.zeros((len(x), n_classes))
    yh[np.arange(len(x)), y] = 1.0
    w = sample_weight[:, None]
    xtx = xa.T @ (xa * w)
    xtx[np.arange(1, xtx.shape[0]), np.arange(1, xtx.shape[0])] += l2
    xty = xa.T @ (yh * w)
    weights = np.linalg.solve(xtx, xty)
    return RidgeOVRModel(cols=cols, weights=weights)


def train_ensemble(
    x: np.ndarray,
    y: np.ndarray,
    sample_weight: np.ndarray,
    n_classes: int = 6,
    n_models: int = 11,
    seed: int = 1337,
) -> list:
    """Train the seeded ensemble (driver-side; the collected feature
    matrix is small by design — thousands of rows x ~416)."""
    models = []
    for i in range(n_models):
        rng = np.random.default_rng(seed + i)
        if HAS_LIGHTGBM:  # pragma: no cover
            params = {
                "objective": "multiclass",
                "num_class": n_classes,
                "num_leaves": int(rng.integers(15, 60)),
                "min_data_in_leaf": int(rng.integers(5, 25)),
                "learning_rate": int(rng.integers(8, 12)) / 1000,
                "max_bin": int(rng.integers(8, 16)),
                "feature_fraction": 0.2,
                "bagging_fraction": 0.1,
                "bagging_freq": 3,
                "n_jobs": 4,
                "seed": seed + i,
                "verbosity": -1,
            }
            rounds = int(rng.integers(600, 800))
            ds = lgb.Dataset(x, y, weight=sample_weight)
            models.append(lgb.train(params, num_boost_round=rounds, train_set=ds))
        else:
            d = x.shape[1]
            k = max(1, int(d * 0.6))
            cols = np.sort(rng.choice(d, size=k, replace=False))
            l2 = 10.0 ** rng.uniform(-2, 1)
            models.append(_fit_ridge_ovr(x, y, n_classes, sample_weight, l2, cols))
    return models


def _model_scores(model, x: np.ndarray) -> np.ndarray:
    if HAS_LIGHTGBM and not isinstance(model, RidgeOVRModel):  # pragma: no cover
        return model.predict(x)
    return model.predict_scores(x)


def predict_vote(
    features: DataFrame,
    models: list,
    out_col: str = "pred_code",
) -> DataFrame:
    """L3 + A12/A13: per model argmax (ties -> first), then per-row
    majority vote (ties -> lowest class id, np.bincount.argmax rule).

    The models ride to executors inside the pandas UDF closure (small
    coefficient matrices); scoring is numpy-vectorized per Arrow batch.
    Expects [subject, trial, win_end, features]."""

    @F.pandas_udf(T.LongType())
    def vote(batch: pd.Series) -> pd.Series:
        vals = batch.tolist()
        # fail with row context instead of numpy's opaque "setting an
        # array element with a sequence" deep in an executor task
        bad = [i for i, v in enumerate(vals) if v is None]
        if bad:
            raise ValueError(
                f"predict_vote: null features at batch rows {bad[:5]}"
                " (feature-build join miss?)"
            )
        lens = {len(v) for v in vals}
        if len(lens) > 1:
            raise ValueError(
                f"predict_vote: ragged feature lengths {sorted(lens)[:5]}"
            )
        x = np.array(vals, dtype=np.float64)
        if len(x) == 0:
            return pd.Series([], dtype="int64")
        votes = np.stack(
            [np.argmax(_model_scores(m, x), axis=1) for m in models], axis=1
        )
        out = [int(np.bincount(row).argmax()) for row in votes]
        return pd.Series(out, dtype="int64")

    return features.withColumn(out_col, vote(F.col("features")))

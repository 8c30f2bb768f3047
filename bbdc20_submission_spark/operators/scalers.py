"""Per-group scaling operators (SURVEY A7/A8): the reference's four
scaler modes (load_data.py:98-114 trial-scoped, 66-82 global via
partial_fit) as window-function compositions.

standard:  (x - mean) / stddev_pop        (sklearn StandardScaler)
zero_mean: x - mean                       (StandardScaler(with_std=False))
minmax:    (x - min) / (max - min)        (MinMaxScaler)
robust:    (x - median) / (q_hi - q_lo)   (RobustScaler(quantile_range))

Zero-scale groups (constant values, or quantiles that coincide)
divide by 1 instead of 0 — sklearn's ``_handle_zeros_in_scale`` rule,
so a constant group scales to 0.0 exactly as the reference's scalers
do, never to null.

The "global scaler" variant is the same with an empty key list — and
Spark's partial+final aggregation IS the reference's partial_fit
accumulation (SURVEY §4), so one code path covers both.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALER_MODES = ("standard", "zero_mean", "minmax", "robust")


def scale_group(
    df: DataFrame,
    keys: Sequence[str],
    value_cols: Sequence[str],
    mode: str = "standard",
    q_low: float = 0.25,
    q_high: float = 0.75,
    suffix: str = "_scaled",
) -> DataFrame:
    """Fit-and-transform per key group (empty keys = global)."""
    if mode not in SCALER_MODES:
        raise ValueError(f"unknown scaler mode {mode}")
    w = Window.partitionBy(*keys) if keys else Window.partitionBy(F.lit(1))

    def _safe(scale):  # sklearn _handle_zeros_in_scale: 0 -> 1
        return F.when(scale == 0, F.lit(1.0)).otherwise(scale)

    out = df
    for c in value_cols:
        v = F.col(c)
        if mode == "standard":
            expr = (v - F.avg(c).over(w)) / _safe(F.stddev_pop(c).over(w))
        elif mode == "zero_mean":
            expr = v - F.avg(c).over(w)
        elif mode == "minmax":
            expr = (v - F.min(c).over(w)) / _safe(
                F.max(c).over(w) - F.min(c).over(w)
            )
        else:  # robust
            med = F.expr(f"percentile({c}, 0.5)").over(w)
            lo = F.expr(f"percentile({c}, {q_low})").over(w)
            hi = F.expr(f"percentile({c}, {q_high})").over(w)
            expr = (v - med) / _safe(hi - lo)
        out = out.withColumn(f"{c}{suffix}", expr)
    return out

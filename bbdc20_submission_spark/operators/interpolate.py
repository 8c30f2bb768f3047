"""Linear interpolation of missing values (SURVEY.md §2.5 W7).

Reference: ``df.interpolate(method="linear", axis=0).fillna(0)`` at
``/root/reference/load_data.py:95,171`` (pandas 1.0 semantics):
- interior nulls: linear in ROW POSITION between nearest valid rows;
- trailing nulls: carry the last valid value forward (pandas default
  forward fill inside interpolate);
- leading nulls: left as NaN by interpolate, then the chained
  ``fillna(0)`` turns them into 0.

Pure window-function composition — no Python UDF, one shuffle on the
group keys shared by all four windows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_cols: Sequence[str],
    leading_fill: float = 0.0,
) -> DataFrame:
    """Interpolate nulls in each of ``value_cols`` per key group."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    pos = F.row_number().over(w)
    df = df.withColumn("_pos", pos)

    prev_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    def interp_expr(c: str):
        v = F.col(c)
        valid_pos = F.when(v.isNotNull(), F.col("_pos"))
        prev_val = F.last(v, ignorenulls=True).over(prev_w)
        prev_pos = F.last(valid_pos, ignorenulls=True).over(prev_w)
        next_val = F.first(v, ignorenulls=True).over(next_w)
        next_pos = F.first(valid_pos, ignorenulls=True).over(next_w)
        frac = (F.col("_pos") - prev_pos) / (next_pos - prev_pos)
        interp = prev_val + (next_val - prev_val) * frac
        return (
            F.when(v.isNotNull(), v)
            .when(prev_pos.isNull(), F.lit(leading_fill))  # leading: fillna(0)
            .when(next_pos.isNull(), prev_val)  # trailing: ffill
            .otherwise(interp)
            .alias(c)
        )

    # single select: all columns interpolated in one projection so the
    # shared windows are planned once (withColumn chains re-analyze
    # the plan per column)
    out_cols = [
        interp_expr(c) if c in value_cols else F.col(c) for c in df.columns
    ]
    return df.select(*out_cols).drop("_pos")


def interpolate_linear_pandas(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_cols: Sequence[str],
    leading_fill: float = 0.0,
) -> DataFrame:
    """Exact-compat escape hatch (SURVEY §5): per-key pandas
    ``Series.interpolate("linear").fillna(leading_fill)`` via
    applyInPandas — bit-equal to the reference's pandas call by
    construction (ref load_data.py:95,171), for auditing the window
    form on pathological null patterns. The window form is the scale
    path (no Python, no per-group materialization); this one ships a
    whole group into a pandas frame per key, which is fine for audit
    runs and wrong for 100 TB."""
    import pandas as pd  # noqa: F401 — executor-side dependency

    order_cols = list(order_by)
    vcols = list(value_cols)

    def fn(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        for c in vcols:
            pdf[c] = (
                pdf[c].interpolate(method="linear").fillna(leading_fill)
            )
        return pdf

    return df.groupBy(*[F.col(k) for k in keys]).applyInPandas(fn, schema=df.schema)

"""Join operators (SURVEY.md §2.3).

Strategy notes for 100 TB: dimension joins are explicitly broadcast;
the interval->grid expansion is a generator (explode) not a join, so it
never shuffles the big side; the as-of join is a union + window trick —
one shuffle on the partition key instead of a non-equi nested loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_dim_join(
    fact: DataFrame, dim: DataFrame, on: Sequence[str] | Column, how: str = "inner"
) -> DataFrame:
    """Equi join with the dimension side broadcast (SURVEY J4).

    Ref analog: label-code inverse lookup at
    ``generate_submission.py:508-509``.
    """
    return fact.join(F.broadcast(dim), on, how)


def interval_grid_expand(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    step: Column,
    out_col: str = "grid_ts",
) -> DataFrame:
    """Expand [start, end] intervals onto a regular grid (SURVEY J2).

    Ref: ``load_data.py:34-42`` walks each interval emitting every
    200 ms grid point. Spark-first form: ``explode(sequence(...))`` —
    a narrow per-row generator, no shuffle, distributes perfectly.
    ``step`` e.g. ``F.expr("interval 1 hour")`` for timestamps or a
    numeric literal for numeric grids. Bounds inclusive (as sequence()).
    """
    return intervals.withColumn(
        out_col, F.explode(F.sequence(F.col(start_col), F.col(end_col), step))
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    strict: bool = False,
) -> DataFrame:
    """As-of join: each left row takes the latest right row with
    ``right_ts <= left_ts`` (``<`` when strict) within its key group.

    Spark-first: instead of a non-equi join (nested-loop at scale),
    union both sides tagged, sort once per key on (ts, side), and
    carry the right payload forward with ``last(..., ignorenulls)``.
    One shuffle on ``keys``, linear work — survives 100x scale-up
    where a range join would not. Ref analog: grid-point -> interval
    alignment in ``load_data.py:34-42`` (SURVEY J2/J5).

    The right payload rides as ONE struct, carried forward whole —
    per-column carry would silently resurrect an older row's value
    wherever the latest right row holds a null in that column, and
    could mix columns from different right rows (row tearing). The
    struct form is exactly ASOF-join row semantics: every output
    payload column comes from the same (latest) right row, nulls
    included.
    """
    from pyspark.sql import types as T

    lcols = left.columns
    # side flag orders right rows BEFORE left rows at equal ts unless strict
    side = 0 if not strict else 2
    pay_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.lit(None).cast(pay_type).alias("_rpay"),
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.struct(*[F.col(c).alias(c) for c in right_cols]).alias("_rpay"),
        F.col(right_ts).alias("_ats"),
        F.lit(side).alias("_side"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pay = F.last("_rpay", ignorenulls=True).over(w)
    filled = unioned.select(
        *lcols,
        "_side",
        *[pay[c].alias(f"{c}_asof") for c in right_cols],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")


def range_join_bucketed(
    fact: DataFrame,
    dim: DataFrame,
    fact_val: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to dim rows where lo <= val < hi (SURVEY §2.3 note).

    The dim side (bins) is small by contract -> broadcast nested loop
    with the range predicate; Catalyst picks BroadcastNestedLoopJoin.
    For a big-big range join, pre-bucketize both sides on
    floor(val/width) and equi-join on the bucket first.
    """
    cond = (F.col(fact_val) >= F.col(lo_col)) & (F.col(fact_val) < F.col(hi_col))
    return fact.join(F.broadcast(dim), cond, how)


def _row_salt(n_salts: int) -> Column:
    """Row-unique round-robin salt in [0, n_salts): pmod over
    ``monotonically_increasing_id()``. Unlike a content hash, identical
    duplicate rows (the common hot-key shape) still land on DIFFERENT
    salts, so the skew actually spreads."""
    return F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small.

    A hot key on the big side lands all its rows in one shuffle
    partition; salting spreads each key over ``n_salts`` partitions
    via a per-row round-robin salt (see below — layout-dependent, NOT
    content-based), while the small side is replicated ``n_salts`` times so
    every (key, salt) bucket still finds its match. Shuffle volume:
    big unchanged, small x n_salts — use when the small side is too
    big to broadcast AND the key distribution is heavy-tailed. For
    plain sort-merge skew, AQE's skewJoin (enabled in session.py)
    already splits oversized partitions at runtime; this operator is
    for pre-AQE shuffles and for engines/stages AQE cannot re-plan.

    Only ``inner`` / ``left`` / ``left_semi`` / ``left_anti`` are
    supported: with ``right``/``full``, an unmatched small-side row
    survives the join once per salt replica (n_salts duplicate output
    rows), so those modes are rejected. The salt is a per-row
    round-robin over ``monotonically_increasing_id()`` — row-unique,
    so even a hot key made of IDENTICAL duplicate rows (the common
    skew case) is spread across all ``n_salts`` partitions; a
    content-hash salt would send them all to one. The salt only
    routes rows and is dropped before return, so its partition-layout
    dependence never reaches the output.
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti, got {how!r}: "
            "right/full would emit each unmatched small-side row n_salts times"
        )
    salt = _row_salt(n_salts)
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)]).cast("array<int>")),
    )
    return b.join(s, [*keys, "_salt"], how).drop("_salt")


def range_join_big(
    fact: DataFrame,
    intervals: DataFrame,
    fact_val: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Big-big range join (lo <= val < hi) without a nested loop.

    Both sides are bucketized on ``floor(val / bucket_width)``: each
    interval row is replicated to every bucket it overlaps (a bounded
    explode — at most ceil(span/width)+1 copies), the fact side gets
    its single bucket, and the join becomes a hash equi-join on the
    bucket id followed by the residual range predicate. Shuffle volume
    is O(fact + interval*overlap) and fully partition-parallel — the
    shape that survives when BOTH sides are too big to broadcast.
    Pick ``bucket_width`` near the typical interval span so the
    replication factor stays ~1-2.
    """
    bucket = lambda c: F.floor(c / F.lit(bucket_width)).cast("long")  # noqa: E731
    f = fact.withColumn("_bucket", bucket(F.col(fact_val)))
    iv = intervals.withColumn(
        "_bucket",
        # sequence(bucket(lo), bucket(hi)) may include one bucket past
        # the exclusive hi (when hi sits exactly on a boundary); the
        # residual range predicate below filters it. No float epsilon:
        # an absolute nudge would drop fact rows in [boundary, hi) when
        # hi lies within eps above a boundary, and underflows to a
        # no-op at |hi| >~ 2^40.
        F.explode(F.sequence(bucket(F.col(lo_col)), bucket(F.col(hi_col)))),
    )
    return (
        f.join(iv, "_bucket")
        .filter(
            (F.col(fact_val) >= F.col(lo_col)) & (F.col(fact_val) < F.col(hi_col))
        )
        .drop("_bucket")
    )

"""Structured Streaming join patterns (SURVEY §2.3 streaming notes).

The two shapes a streaming training-data pipeline needs:

- stream–static enrichment: the streaming fact joined to a batch
  dimension (label vocab, config, per-entity metadata). The static
  side is re-resolved every micro-batch, so slowly-changing dims pick
  up updates without restarts; Catalyst broadcasts it when small —
  no streaming state at all.
- stream–stream interval join: two event streams joined on a key
  within an event-time band (impressions↔clicks, sensor↔label). Both
  sides carry watermarks and the time band is part of the join
  condition, so each side's buffered state is evicted once the
  watermark passes the band — bounded memory at any stream length.

Both return streaming DataFrames; tests drive them file-source →
memory-sink and cross-check against the equivalent batch join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: Sequence[str] | Column,
    how: str = "left",
    broadcast: bool = True,
) -> DataFrame:
    """Enrich a streaming fact with a batch dimension (stream–static
    join). Stateless: no watermark needed — each micro-batch joins
    against the CURRENT contents of ``dim`` (re-read per batch for
    file/table sources, so dim updates flow through). With
    ``broadcast=True`` (default) the dim side is explicitly broadcast
    so the fact never shuffles at any stream rate — correct for the
    usual small-dimension case, an OOM hazard for a huge dim: pass
    ``broadcast=False`` there and let Catalyst pick the strategy from
    its size estimate.

    Only stream-side-preserving joins make streaming sense here
    (inner / left); right/full would need the unmatched-dim set,
    which is unknowable mid-stream."""
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"):
        raise ValueError(
            f"stream_static_enrich supports inner/left/left_semi/left_anti, got {how!r}"
        )
    return stream.join(F.broadcast(dim) if broadcast else dim, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower: str = "0 seconds",
    upper: str = "1 hour",
    watermark: str = "2 hours",
    right_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Stream–stream inner join: rows match when keys are equal and
    ``right_ts`` lies in [left_ts - lower, left_ts + upper]. Both
    inputs get event-time watermarks; because the join condition
    time-bounds each side relative to the other, Spark evicts buffered
    rows as soon as the watermark clears the band — state is bounded
    by (watermark + band) regardless of stream length.

    ``right_cols`` selects which right-side payload columns to keep
    (default: all non-key, non-ts columns), aliased with an ``r_``
    prefix so the output schema never collides."""
    rcols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c not in (key, right_ts)]
    )
    r = right.select(
        F.col(key).alias("_rkey"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"r_{c}") for c in rcols],
    ).withWatermark("_rts", watermark)
    l_wm = left.withWatermark(left_ts, watermark)
    cond = (
        (l_wm[key] == r["_rkey"])
        & (r["_rts"] >= F.col(left_ts) - F.expr(f"INTERVAL {lower}"))
        & (r["_rts"] <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return l_wm.join(r, cond, "inner").drop("_rkey", "_rts")

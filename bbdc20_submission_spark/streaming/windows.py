"""Structured Streaming variants of the windowed operators (SURVEY
§2.5 note: the reference is batch, but its tumbling windows (W1),
session/RLE (W6) and grid semantics map 1:1 onto Structured Streaming
— these are those mappings, fed by any streaming source).

All operators take/return streaming DataFrames; tests drive them with
a parquet file source and a memory sink (processAllAvailable), which
is also the local smoke pattern for a Kafka-backed deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_tumbling_agg(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """W1 as a streaming tumbling-window aggregation with a watermark
    bounding state for late data. Append-able after watermark close."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            key_col,
            "n_events",
            "avg_value",
        )
    )


def stream_sliding_agg(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window variant (the streaming analog of the J3 context
    gathers: each row contributes to window/slide overlapping frames)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


def stream_session_windows(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """W6's sessionization as native ``session_window`` (gap-based):
    a session closes when no event arrives for ``gap``. State is
    bounded by the watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
        )
    )


def stream_rle_islands(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "event_type",
) -> DataFrame:
    """W6's value-change RLE as a custom stateful streaming operator
    (``applyInPandasWithState``): per key, carry (current value, run
    start, run count) across micro-batches; emit a finished run row
    whenever the value changes. The final open run stays in state
    (exactly the reference's open segment) until timeout/stream end.

    This is the applyInPandasWithState pattern the reference's island
    scan (generate_submission.py:522-562) would need as a stream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    # output/state schemas follow the ACTUAL key and value column types
    # (a long key + string value is only the default harness shape)
    field_types = {f.name: f.dataType.simpleString() for f in events.schema.fields}
    key_type = field_types[key_col]
    value_type = field_types[value_col]
    out_schema = (
        f"{key_col} {key_type}, {value_col} {value_type}, start_ts timestamp, "
        "end_ts timestamp, n_rows long"
    )
    state_schema = (
        f"value {value_type}, start_ts timestamp, last_ts timestamp, n long"
    )

    def fn(key, pdf_iter, state: GroupState):
        (k,) = key
        if state.exists:
            cur_val, cur_start, cur_last, cur_n = state.get
        else:
            cur_val, cur_start, cur_last, cur_n = None, None, None, 0
        finished = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values([ts_col])
            for _, row in pdf.iterrows():
                v, t = row[value_col], row[ts_col]
                if cur_val is None:
                    cur_val, cur_start, cur_last, cur_n = v, t, t, 1
                elif v == cur_val:
                    cur_last, cur_n = t, cur_n + 1
                else:
                    finished.append((k, cur_val, cur_start, cur_last, cur_n))
                    cur_val, cur_start, cur_last, cur_n = v, t, t, 1
        state.update((cur_val, cur_start, cur_last, cur_n))
        if finished:
            yield pd.DataFrame(
                finished,
                columns=[key_col, value_col, "start_ts", "end_ts", "n_rows"],
            )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: dropDuplicates over the key columns with
    a watermark bounding the dedup state — the streaming form of the
    exact-dedup operator (state evicts keys older than the watermark,
    so memory is bounded at any stream length)."""
    keys = keys or ["user_id", "event_type"]
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)

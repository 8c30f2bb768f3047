"""Time-series / windowed declared queries (SURVEY.md §2.5) over `events`.

`events` (event_id bigint, ts timestamp, user_id bigint, event_type
string, value double, props json-string) stands in for the reference's
sensor streams: user_id ~ (subject, trial), ts ~ sample time, value ~
channel, event_type ~ action label (FIXTURES.md §2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bbdc20_submission_spark.operators.sessionize import sessionize
from bbdc20_submission_spark.registry import query
from bbdc20_submission_spark.sources.harness import load_table


# --- W6: gaps-and-islands RLE (flagship; ref generate_submission.py:522-562)
@query(
    "w6_sessionize_rle",
    oracle="""
    WITH flagged AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN event_type IS DISTINCT FROM
                    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                    THEN 1 ELSE 0 END AS chg
        FROM events
    ), islands AS (
        SELECT user_id, event_id, ts, event_type,
               sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    )
    SELECT user_id,
           island,
           event_type,
           epoch_ms(min(ts)) AS start_ms,
           epoch_ms(max(ts)) AS end_ms,
           count(*) AS n_rows
    FROM islands
    GROUP BY user_id, island, event_type
    """,
)
def w6_sessionize_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse consecutive equal event_type per user into runs.

    Ties on ts broken by event_id (deterministic). Ref semantics:
    generate_submission.py:522-562 (SURVEY W6).
    """
    events = load_table(spark, "events", sf_dir)
    runs = sessionize(
        events,
        keys=["user_id"],
        ts_col="ts",
        value_col="event_type",
        order_by=["ts", "event_id"],
    )
    return runs.select(
        "user_id",
        F.col("island").cast("long").alias("island"),
        "event_type",
        F.unix_millis("start_ts").alias("start_ms"),
        F.unix_millis("end_ts").alias("end_ms"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )

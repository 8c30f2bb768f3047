"""Streaming operators driven by a file source into a memory sink;
results cross-checked against the equivalent batch computation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bbdc20_submission_spark.sources.harness import load_table
from bbdc20_submission_spark.streaming.windows import (
    stream_rle_islands,
    stream_session_windows,
    stream_tumbling_agg,
)


@pytest.fixture(scope="module")
def events_stream(spark, sf_dir, tmp_path_factory):
    # re-stage events as a timestamp-typed parquet dir for readStream
    staged = str(tmp_path_factory.mktemp("events_stream"))
    batch = load_table(spark, "events", sf_dir)
    batch.write.mode("overwrite").parquet(staged)
    schema = spark.read.parquet(staged).schema
    return (
        spark.readStream.schema(schema).parquet(staged),
        spark.read.parquet(staged),
    )


def _run_to_memory(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stream_tumbling_matches_batch(spark, events_stream):
    stream, batch = events_stream
    _run_to_memory(stream_tumbling_agg(stream), "t_tumbling")
    got = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    want = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in (
            batch.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.avg("value"), 6).alias("avg_value"),
            )
            .select(F.col("win.start").alias("win_start"), "event_type", "n_events", "avg_value")
            .collect()
        )
    }
    # watermark may hold back the open tail; everything emitted must match
    assert len(got) > 0
    for k, v in got.items():
        assert want[k] == v


def test_stream_sessions_nonempty_and_bounded(spark, events_stream):
    stream, batch = events_stream
    _run_to_memory(stream_session_windows(stream), "t_sessions")
    rows = spark.sql("SELECT * FROM t_sessions").collect()
    assert len(rows) > 0
    for r in rows:
        assert r["sess_end"] >= r["sess_start"]
        assert r["n_events"] >= 1


def test_stream_rle_matches_batch_islands(spark, events_stream):
    stream, batch = events_stream
    _run_to_memory(stream_rle_islands(stream), "t_rle")
    got = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["event_type"], r["n_rows"])
        for r in spark.sql("SELECT * FROM t_rle").collect()
    }
    from bbdc20_submission_spark.operators.sessionize import sessionize

    want_all = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["event_type"], r["n_rows"])
        for r in sessionize(
            batch, ["user_id"], "ts", "event_type", order_by=["ts", "event_id"]
        ).collect()
    }
    # stream emits only FINISHED runs (the last run per key stays open)
    assert len(got) > 0
    assert got <= want_all
    # every batch run except each key's final one must be emitted
    finals = {}
    for uid, s, e, et, n in want_all:
        if uid not in finals or s > finals[uid][1]:
            finals[uid] = (uid, s, e, et, n)
    expected_closed = want_all - {
        (u, s, e, et, n) for (u, (u2, s, e, et, n)) in finals.items()
    }
    assert got == expected_closed


def test_stream_rle_respects_custom_key_and_value_cols(spark, events_stream):
    """The output/state schemas must follow the actual key/value column
    names and types (regression: they were hardcoded to a long key and
    a string column literally named event_type)."""
    stream, batch = events_stream
    renamed = stream.select(
        F.col("event_type").alias("channel"),  # string key
        F.col("ts"),
        F.col("user_id").alias("level"),  # long value
    )
    out = stream_rle_islands(renamed, key_col="channel", value_col="level")
    assert dict((f.name, f.dataType.simpleString()) for f in out.schema.fields) == {
        "channel": "string",
        "level": "bigint",
        "start_ts": "timestamp",
        "end_ts": "timestamp",
        "n_rows": "bigint",
    }
    _run_to_memory(out, "t_rle_custom")
    rows = spark.sql("SELECT * FROM t_rle_custom").collect()
    assert len(rows) > 0
    assert all(r["n_rows"] >= 1 for r in rows)


def test_stream_static_enrich_matches_batch(spark, events_stream, sf_dir):
    """Stream-static broadcast enrichment must equal the batch join and
    reject stream-side-destroying modes."""
    from bbdc20_submission_spark.streaming.joins import stream_static_enrich

    stream, batch = events_stream
    dim = (
        batch.select("event_type").distinct()
        .withColumn("type_tag", F.concat(F.lit("tag_"), F.col("event_type")))
    )
    _run_to_memory(stream_static_enrich(stream, dim, "event_type"), "t_enrich")
    got = spark.sql("SELECT count(*) AS n, count(type_tag) AS tagged FROM t_enrich").collect()[0]
    want = batch.join(dim, "event_type", "left")
    assert got["n"] == want.count() == batch.count()
    assert got["tagged"] == got["n"]  # every type is in the dim

    import pytest as _pytest

    with _pytest.raises(ValueError, match="stream_static_enrich supports"):
        stream_static_enrich(stream, dim, "event_type", how="full")


def test_stream_stream_interval_join_matches_batch(spark, events_stream):
    """Stream-stream interval join (watermarked both sides) must emit
    exactly the batch interval-join pairs."""
    from bbdc20_submission_spark.streaming.joins import stream_stream_interval_join

    stream, batch = events_stream
    left = stream.select("user_id", "ts", "event_id")
    right = stream.select("user_id", "ts", F.col("event_id").alias("rid"))
    out = stream_stream_interval_join(
        left, right, key="user_id", lower="0 seconds", upper="30 minutes",
        right_cols=["rid"],
    )
    _run_to_memory(out, "t_ssjoin")
    got = {
        (r["user_id"], r["event_id"], r["r_rid"])
        for r in spark.sql("SELECT * FROM t_ssjoin").collect()
    }
    b_l = batch.select("user_id", "ts", "event_id")
    b_r = batch.select(
        F.col("user_id").alias("u2"), F.col("ts").alias("ts2"),
        F.col("event_id").alias("rid"),
    )
    want = {
        (r["user_id"], r["event_id"], r["rid"])
        for r in b_l.join(
            b_r,
            (b_l.user_id == b_r.u2)
            & (b_r.ts2 >= b_l.ts)
            & (b_r.ts2 <= b_l.ts + F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert len(got) > 0
    assert got == want
    # docstring contract: internal join plumbing never leaks — output is
    # the left schema plus r_-prefixed right payload only
    assert set(out.columns) == {"user_id", "ts", "event_id", "r_rid"}


def test_stream_dedup_bounded_state(spark, events_stream):
    from bbdc20_submission_spark.streaming.windows import stream_dedup

    stream, batch = events_stream
    _run_to_memory(stream_dedup(stream), "t_dedup")
    got = spark.sql("SELECT count(*) AS n FROM t_dedup").collect()[0]["n"]
    want = batch.dropDuplicates(["user_id", "event_type"]).count()
    assert got == want


def test_stream_rle_state_carries_across_microbatches(spark, events_stream, tmp_path):
    """Force one file per micro-batch (maxFilesPerTrigger=1) over
    time-contiguous files: runs spanning file boundaries must merge
    via the state carried in applyInPandasWithState, reproducing the
    single-batch closed-run set exactly."""
    from pyspark.sql import Window

    stream, batch = events_stream
    sub = batch.filter(F.col("user_id") < 50)
    n = sub.count()
    # contiguous ts blocks -> files are discovered/processed in ts
    # order (the operator's in-order-arrival contract)
    blocked = sub.withColumn(
        "_rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    ).withColumn("_bucket", ((F.col("_rn") - 1) / ((n // 6) + 1)).cast("int"))
    staged = str(tmp_path / "mb")
    for b in range(6):
        blocked.filter(F.col("_bucket") == b).drop("_rn", "_bucket").coalesce(
            1
        ).write.mode("append").parquet(staged)

    schema = spark.read.parquet(staged).schema
    many = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    _run_to_memory(stream_rle_islands(many), "t_rle_mb")
    got = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["event_type"], r["n_rows"])
        for r in spark.sql("SELECT * FROM t_rle_mb").collect()
    }
    from bbdc20_submission_spark.operators.sessionize import sessionize

    want_all = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["event_type"], r["n_rows"])
        for r in sessionize(
            sub, ["user_id"], "ts", "event_type", order_by=["ts", "event_id"]
        ).collect()
    }
    finals = {}
    for uid, s, e, et, nr in want_all:
        if uid not in finals or s > finals[uid][0]:
            finals[uid] = (s, e, et, nr)
    expected_closed = want_all - {
        (u, s, e, et, nr) for u, (s, e, et, nr) in finals.items()
    }
    assert len(got) > 0
    assert got == expected_closed


def test_repetition_filter_runs_on_streams(spark, sf_dir, tmp_path):
    """repetition_stats is a pure narrow map, so the SAME operator must
    run unchanged on a streaming source and agree with batch — the
    design property that makes the quality-filter stage usable in a
    continuous ingestion pipeline."""
    from bbdc20_submission_spark.operators.text import repetition_stats

    staged = str(tmp_path / "docs")
    batch = load_table(spark, "documents", sf_dir).limit(200)
    batch.write.mode("overwrite").parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    _run_to_memory(repetition_stats(stream), "t_repstats")
    got = {
        r["doc_id"]: (r["top_word_frac"], r["repetition_ok"])
        for r in spark.sql("SELECT * FROM t_repstats").collect()
    }
    want = {
        r["doc_id"]: (r["top_word_frac"], r["repetition_ok"])
        for r in repetition_stats(spark.read.parquet(staged)).collect()
    }
    assert got == want and len(got) > 0


def test_stream_curate_matches_batch_and_is_stateless(spark, sf_dir, tmp_path):
    """The stateless curation chain must produce IDENTICAL chunks on a
    stream and on the same data as a batch, and its streaming plan must
    need no state store (no watermark, no stateful operator) — the
    property that lets it run at any ingestion rate."""
    from bbdc20_submission_spark.streaming.curation import stream_curate

    staged = str(tmp_path / "docs")
    load_table(spark, "documents", sf_dir).limit(300).write.mode(
        "overwrite"
    ).parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    _run_to_memory(stream_curate(stream), "t_scurate")
    got = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"],
                                       r["lang_pred"], r["quality"])
        for r in spark.sql("SELECT * FROM t_scurate").collect()
    }
    want = {
        (r["doc_id"], r["chunk_id"]): (r["chunk_text"], r["n_tokens"],
                                       r["lang_pred"], r["quality"])
        for r in stream_curate(spark.read.parquet(staged)).collect()
    }
    assert len(got) > 0
    assert got == want
    # stateless: the batch plan of the same chain has no Exchange at all
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        stream_curate(spark.read.parquet(staged)).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_stream_curate_blocklist_matches_batch(spark, sf_dir, tmp_path):
    """The stage-0 source blocklist must behave identically on a
    stream and a batch, stay stateless, and drop every blocked doc."""
    from bbdc20_submission_spark.streaming.curation import stream_curate

    staged = str(tmp_path / "docs")
    load_table(spark, "documents", sf_dir).limit(300).write.mode(
        "overwrite"
    ).parquet(staged)
    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    _run_to_memory(
        stream_curate(stream, blocked_sources=("src0", "src1")), "t_scb"
    )
    got = {
        (r["doc_id"], r["chunk_id"]) for r in spark.sql("SELECT * FROM t_scb").collect()
    }
    batch = stream_curate(
        spark.read.parquet(staged), blocked_sources=("src0", "src1")
    )
    want = {(r["doc_id"], r["chunk_id"]) for r in batch.collect()}
    assert len(got) > 0 and got == want
    blocked = {
        r["doc_id"]
        for r in spark.read.parquet(staged)
        .filter("source IN ('src0','src1')")
        .collect()
    }
    assert blocked and not ({d for d, _ in got} & blocked)


def test_stream_rle_idle_flush_emits_open_runs(spark, events_stream, tmp_path):
    """Production form (watermark + idle_flush): a key idle past the
    flush horizon has its OPEN run emitted as final when a later
    micro-batch advances the watermark — the run the NoTimeout default
    holds in state forever."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    early = [(1, t0 + dt.timedelta(minutes=i), "a", 100 + i) for i in range(3)]
    # 10h later, a different key: watermark (max ts - 2h) lands 8h past
    # key 1's last event — far beyond the 1h idle flush
    late = [
        (2, t0 + dt.timedelta(hours=10, minutes=i), "b", 200 + i)
        for i in range(3)
    ]
    staged = str(tmp_path / "flush")
    for block in (early, late):
        spark.createDataFrame(
            block, "user_id long, ts timestamp, event_type string, event_id long"
        ).coalesce(1).write.mode("append").parquet(staged)

    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    from bbdc20_submission_spark.streaming.windows import stream_rle_islands

    out = stream_rle_islands(
        stream, watermark="2 hours", idle_flush="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("t_rle_flush")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["event_type"], r["n_rows"])
        for r in spark.sql("SELECT * FROM t_rle_flush").collect()
    }
    # key 1's single 3-row run must have been flushed by the timeout
    assert (1, "a", 3) in got


def test_statestore_reader_exposes_open_runs(spark, events_stream, tmp_path):
    """Spark 4 statestore source: after a run of the stateful RLE, the
    checkpoint's state must hold EXACTLY each key's open (final) run —
    the complement of the emitted closed runs — certifying both the
    operator's state invariant and the introspection path."""
    from bbdc20_submission_spark.operators.sessionize import sessionize
    from bbdc20_submission_spark.streaming.state import read_group_state
    from bbdc20_submission_spark.streaming.windows import stream_rle_islands

    stream, batch = events_stream
    sub_stream = stream.filter(F.col("user_id") < 30)
    sub_batch = batch.filter(F.col("user_id") < 30)
    ck = str(tmp_path / "ck_state")
    q = (
        stream_rle_islands(sub_stream)
        .writeStream.format("memory")
        .queryName("t_rle_state")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    state = {
        (r["user_id"], r["value"], r["start_ts"], r["last_ts"], r["n"])
        for r in read_group_state(spark, ck).collect()
    }
    runs = sessionize(
        sub_batch, ["user_id"], "ts", "event_type", order_by=["ts", "event_id"]
    ).collect()
    finals = {}
    for r in runs:
        cur = finals.get(r["user_id"])
        if cur is None or r["start_ts"] > cur[2]:
            finals[r["user_id"]] = (
                r["user_id"], r["event_type"], r["start_ts"], r["end_ts"],
                r["n_rows"],
            )
    assert state == set(finals.values())


def test_interval_ms_compound_and_errors():
    """r6 advice: _interval_ms accepts the compound forms Spark does
    elsewhere and names the accepted format on bad input."""
    import pytest

    from bbdc20_submission_spark.streaming.windows import _interval_ms

    assert _interval_ms("1 hour") == 3_600_000
    assert _interval_ms("1 hour 30 minutes") == 5_400_000
    assert _interval_ms("1 day 2 hours 3 seconds") == 93_603_000
    with pytest.raises(ValueError, match="N unit"):
        _interval_ms("90")
    with pytest.raises(ValueError, match="N unit"):
        _interval_ms("1 fortnight")

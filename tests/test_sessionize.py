"""W6 RLE property tests: roundtrip, half-open boundaries, and the
reference's dropped-final-segment rule (generate_submission.py:522-562)."""

from __future__ import annotations

import random

import pytest

from bbdc20_submission_spark.operators.sessionize import rle_intervals, sessionize


def _reference_rle(rows):
    """Pandas-free re-derivation of the reference's island scan
    (generate_submission.py:522-562): walk ts-ordered rows; when the
    value changes emit (start, change_ts, prev_value); at the end emit
    the open segment closed at the last ts, dropped if empty."""
    out = []
    seg_start, prev = None, None
    last_ts = None
    for ts, val in rows:
        if prev is None:
            seg_start, prev = ts, val
        elif val != prev:
            out.append((seg_start, ts, prev))
            seg_start, prev = ts, val
        last_ts = ts
    if prev is not None and last_ts > seg_start:
        out.append((seg_start, last_ts, prev))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rle_intervals_matches_reference_scan(spark, seed):
    rng = random.Random(seed)
    data = []
    for key in ["a", "b"]:
        ts = 0.0
        for _ in range(rng.randrange(5, 40)):
            ts += round(rng.uniform(0.1, 1.0), 3)
            data.append((key, ts, rng.choice(["x", "y", "z"])))
    df = spark.createDataFrame(data, "key string, ts double, action string")
    got = {
        (r["key"], r["start"], r["end"], r["action"])
        for r in rle_intervals(df, ["key"], "ts", "action").collect()
    }
    want = set()
    for key in ["a", "b"]:
        rows = sorted((ts, v) for k, ts, v in data if k == key)
        for s, e, v in _reference_rle(rows):
            want.add((key, s, e, v))
    assert got == want


def test_sessionize_roundtrip(spark):
    """decode(encode(x)) == x: expanding runs back over their member
    rows reproduces the original value sequence."""
    data = [("k", float(i), "abba"[i % 4]) for i in range(40)]
    df = spark.createDataFrame(data, "key string, ts double, action string")
    runs = sessionize(df, ["key"], "ts", "action").collect()
    # reconstruct: for each original row find its covering run
    for key, ts, action in data:
        covering = [
            r for r in runs if r["key"] == key and r["start_ts"] <= ts <= r["end_ts"]
        ]
        assert any(r["event_type" if False else "action"] == action for r in covering)


def test_single_run_key_dropped_only_when_empty(spark):
    # one row -> zero-length segment -> dropped (reference rule)
    df = spark.createDataFrame([("k", 1.0, "x")], "key string, ts double, action string")
    assert rle_intervals(df, ["key"], "ts", "action").count() == 0
    # two rows same value -> non-empty single segment kept
    df2 = spark.createDataFrame(
        [("k", 1.0, "x"), ("k", 2.0, "x")], "key string, ts double, action string"
    )
    out = rle_intervals(df2, ["key"], "ts", "action").collect()
    assert len(out) == 1 and out[0]["start"] == 1.0 and out[0]["end"] == 2.0

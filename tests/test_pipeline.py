"""M3 pipeline tests: stage-level golden checks against independent
pandas/numpy re-derivations of the reference semantics, plus
end-to-end invariants and determinism."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bbdc20_submission_spark.plans import bbdc
from bbdc20_submission_spark.plans.pipeline import run_pipeline
from tests.fixture_bbdc import MOCAP_COLS, fixture_dfs, make_fixture

STEP = 200


# ------------------------------------------------- golden: target expansion

def _expand_targets_golden(labels_rows):
    """Independent cursor re-derivation (semantics of
    load_data.py:34-42: win_end starts at 200; each interval consumes
    all grid points < end*1000)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for key, start, end, action in labels_rows:
        s, t, arm = key[:3], key[3:6], key.split(".")[1]
        by_key[(s, t, arm)].append((start, end, action))
    out = {}
    for (s, t, arm), ivs in by_key.items():
        win_end = STEP
        for start, end, action in sorted(ivs):
            while win_end < end * 1000:
                out[(s, t, arm, win_end)] = action
                win_end += STEP
    return out


def test_expand_targets_matches_cursor_semantics(spark):
    labels_rows, _, _ = make_fixture(subjects=("s01", "s02"))
    labels_df, _, _ = fixture_dfs(spark, subjects=("s01", "s02"))
    got = {
        (r["subject"], r["trial"], r["arm"], r["win_end"]): r["action"]
        for r in bbdc.expand_targets(labels_df).collect()
    }
    want = _expand_targets_golden(labels_rows)
    assert got == want


# ------------------------------------------------- golden: mocap features

def _prep_mocap_pandas(mocap_rows):
    """pandas re-derivation of load_mocap prep: interpolate + fillna(0),
    chest-relative hands (Y exempt), window key."""
    cols = ["subject", "trial", "ts", *MOCAP_COLS]
    pdf = pd.DataFrame(mocap_rows, columns=cols)
    out = {}
    for (s, t), grp in pdf.groupby(["subject", "trial"]):
        g = grp.sort_values("ts").reset_index(drop=True)
        g[MOCAP_COLS] = g[MOCAP_COLS].interpolate(method="linear", axis=0).fillna(0)
        for hand in ("LHand", "RHand"):
            for ax in ("X", "Z"):  # Y exempt (Chest_Position_Y rule)
                g[f"{hand}_Position_{ax}"] -= g[f"Chest_Position_{ax}"]
        g["window"] = (g["ts"] * 1000).astype(np.int64) // STEP * STEP
        use = bbdc.MOCAP_USE
        out[(s, t)] = {
            int(w): wg[use].to_numpy()
            for w, wg in g.groupby("window", sort=True)
        }
    return out


def _gather_stats_golden(win_dict, anchor, left_s, right_s):
    """Independent re-derivation of get_data_around_time_step +
    build_all_features (utils.py:56-76, generate_submission.py:29-36)."""
    lo = int(anchor - left_s * 1000)
    hi = int(anchor + right_s * 1000)
    max_key = max(win_dict)
    shape = win_dict[max_key - STEP].shape
    blocks = []
    for ix in range(lo, hi, STEP):
        if ix < 0 or ix >= max_key:
            pad = np.empty(shape)
            pad[:] = np.nan
            blocks.append(pad)
        else:
            blocks.append(win_dict[ix])
    block = np.concatenate(blocks, axis=0)
    k = 7
    feats = [
        block.mean(axis=0),
        np.diff(block, axis=0).mean(axis=0),
        block[-k:].sum(axis=0) - block[:k].sum(axis=0),
        block.max(axis=0),
        block.min(axis=0),
    ]
    return np.nan_to_num(np.concatenate(feats))


def test_mocap_gather_features_match_reference_math(spark):
    subjects = ("s01",)
    _, _, mocap_rows = make_fixture(subjects=subjects)
    labels_df, _, mocap_df = fixture_dfs(spark, subjects=subjects)
    mocap_p = bbdc.prepare_mocap(mocap_df)
    targets = bbdc.expand_targets(labels_df)
    anchors = targets.filter("arm = 'la'").select(
        "subject", "trial", "win_end"
    ).distinct()
    got_df = bbdc.mocap_gather_features(mocap_p, anchors).toPandas()

    win_dicts = _prep_mocap_pandas(mocap_rows)
    feat_cols = [c for c in got_df.columns if c.startswith("g")]
    # reference column order: per gather gi: stat-major then channel
    for _, row in got_df.sample(n=min(25, len(got_df)), random_state=0).iterrows():
        wd = win_dicts[(row["subject"], row["trial"])]
        expected = np.concatenate(
            [
                _gather_stats_golden(wd, row["win_end"], ls, rs)
                for (ls, rs) in bbdc.MOCAP_GATHERS
            ]
        )
        got = row[feat_cols].to_numpy(dtype=np.float64)
        np.testing.assert_allclose(got, expected, rtol=1e-9, atol=1e-9)


# ------------------------------------------------- end-to-end invariants

E2E_KW = dict(span_s=3.2)


@pytest.fixture(scope="module")
def submission(spark):
    labels_df, emg_df, mocap_df = fixture_dfs(spark, **E2E_KW)
    _, emg_t, mocap_t = fixture_dfs(spark, subjects=("s06",), seed=7, **E2E_KW)
    out = run_pipeline(
        labels_df, emg_df, mocap_df, emg_t, mocap_t, n_models=3
    )
    return out.collect()


def test_pipeline_runs_and_produces_intervals(submission):
    assert len(submission) > 0
    vocab = {
        a for arms in
        (["la-nothing", "la-lift", "la-pour"], ["ra-nothing", "ra-hold", "ra-stir"])
        for a in arms
    }
    keys = {r["key"] for r in submission}
    assert all(k.startswith("s06t01.") for k in keys)
    assert keys == {"s06t01.la", "s06t01.ra"}
    for r in submission:
        assert r["action"] in vocab
        assert r["end"] > r["start"]


def test_pipeline_segments_are_contiguous(submission):
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in submission:
        by_key[r["key"]].append((r["start"], r["end"], r["action"]))
    for key, segs in by_key.items():
        segs.sort()
        for (s1, e1, a1), (s2, e2, a2) in zip(segs, segs[1:]):
            assert math.isclose(e1, s2), f"{key}: gap {e1} -> {s2}"
            assert a1 != a2, f"{key}: unmerged adjacent runs"


def test_pipeline_deterministic(spark, submission):
    labels_df, emg_df, mocap_df = fixture_dfs(spark, **E2E_KW)
    _, emg_t, mocap_t = fixture_dfs(spark, subjects=("s06",), seed=7, **E2E_KW)
    again = run_pipeline(
        labels_df, emg_df, mocap_df, emg_t, mocap_t, n_models=3
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, submission))


def test_pipeline_from_csv_sources(spark, tmp_path):
    """S1-S5 integration: fixture written as reference-native CSVs,
    loaded through sources/native.py, run through the pipeline, sunk
    as a headerless submission CSV."""
    import glob
    import os

    from bbdc20_submission_spark.sources.native import (
        load_labels,
        load_sensor_csv_dir,
        write_submission_csv,
    )
    from tests.fixture_bbdc import MOCAP_COLS, make_fixture

    def dump(rows, cols, d):
        os.makedirs(d, exist_ok=True)
        by_key = {}
        for row in rows:
            by_key.setdefault((row[0], row[1]), []).append(row[2:])
        for (s, t), rs in by_key.items():
            with open(os.path.join(d, f"{s}{t}.csv"), "w") as f:
                f.write(",".join(cols) + "\n")
                for r in rs:
                    f.write(",".join("" if v is None else repr(v) for v in r) + "\n")

    labels, emg, mocap = make_fixture(subjects=("s01", "s02", "s03", "s04", "s05"), span_s=1.6)
    with open(tmp_path / "labels.csv", "w") as f:
        for k, s, e, a in labels:
            f.write(f"{k},{s},{e},{a}\n")
    dump(emg, ["ts", *[f"c{i}" for i in range(8)]], str(tmp_path / "emg"))
    dump(mocap, ["ts", *MOCAP_COLS], str(tmp_path / "mocap"))
    _, emg_t, mocap_t = make_fixture(subjects=("s06",), seed=9, span_s=1.6)
    dump(emg_t, ["ts", *[f"c{i}" for i in range(8)]], str(tmp_path / "emg_t"))
    dump(mocap_t, ["ts", *MOCAP_COLS], str(tmp_path / "mocap_t"))

    labels_df = load_labels(spark, str(tmp_path / "labels.csv"))
    emg_df = load_sensor_csv_dir(spark, str(tmp_path / "emg"))
    mocap_df = load_sensor_csv_dir(spark, str(tmp_path / "mocap"))
    emg_t_df = load_sensor_csv_dir(spark, str(tmp_path / "emg_t"))
    mocap_t_df = load_sensor_csv_dir(spark, str(tmp_path / "mocap_t"))

    from bbdc20_submission_spark.plans.pipeline import run_pipeline

    sub = run_pipeline(labels_df, emg_df, mocap_df, emg_t_df, mocap_t_df, n_models=2)
    out = str(tmp_path / "submission")
    write_submission_csv(sub, out)
    part = glob.glob(os.path.join(out, "part-*.csv"))
    assert len(part) == 1
    lines = open(part[0]).read().strip().splitlines()
    assert len(lines) > 0
    for line in lines:
        key, start, end, action = line.split(",")
        assert key.startswith("s06t01.")
        assert float(end) > float(start)


def test_fit_ols_matches_spark_ml_normal_solver(spark):
    """_fit_ols (distributed normal equations) == pyspark.ml
    LinearRegression(solver='normal', regParam=0) == sklearn OLS."""
    import random

    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from bbdc20_submission_spark.plans.bbdc import _fit_ols

    rng = random.Random(3)
    rows = []
    true_w = [2.0, -1.5, 0.5]
    for _ in range(300):
        x = [rng.gauss(0, 1) for _ in range(3)]
        y = 4.0 + sum(w * v for w, v in zip(true_w, x)) + rng.gauss(0, 0.1)
        rows.append((*x, y))
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double, y double")

    b0, coefs = _fit_ols(df, ["x1", "x2", "x3"], "y")

    assembled = VectorAssembler(
        inputCols=["x1", "x2", "x3"], outputCol="features"
    ).transform(df)
    model = LinearRegression(
        featuresCol="features", labelCol="y", solver="normal", regParam=0.0
    ).fit(assembled)
    assert b0 == pytest.approx(model.intercept, abs=1e-8)
    for got, want in zip(coefs, model.coefficients):
        assert got == pytest.approx(want, abs=1e-8)


@pytest.mark.skipif(
    not __import__(
        "bbdc20_submission_spark.plans.models", fromlist=["HAS_LIGHTGBM"]
    ).HAS_LIGHTGBM,
    reason="lightgbm not installed — booster branch is env-gated",
)
def test_lightgbm_ensemble_branch_deterministic(spark):
    """When lightgbm IS importable, the real booster path (reference
    param draws, seed 1337+i) must train, vote, and be run-to-run
    deterministic — so L2 isn't certified by the ridge fallback only."""
    from bbdc20_submission_spark.plans.models import predict_vote, train_ensemble

    rng = np.random.default_rng(0)
    x = rng.normal(size=(300, 20))
    y = (x[:, 0] + x[:, 1] > 0).astype(np.int64) + 2 * (x[:, 2] > 0).astype(np.int64)
    w = np.ones(len(y))
    models_a = train_ensemble(x, y, w, n_classes=4, n_models=3)
    models_b = train_ensemble(x, y, w, n_classes=4, n_models=3)
    feats = spark.createDataFrame(
        [(int(i), [float(v) for v in row]) for i, row in enumerate(x[:50])],
        "row_id long, features array<double>",
    )
    pa = {r["row_id"]: r["pred_code"] for r in predict_vote(feats, models_a).collect()}
    pb = {r["row_id"]: r["pred_code"] for r in predict_vote(feats, models_b).collect()}
    assert pa == pb
    # the ensemble must actually learn the separable structure
    acc = sum(1 for i, p in pa.items() if p == y[i]) / len(pa)
    assert acc >= 0.7, acc

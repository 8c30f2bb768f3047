"""Deterministic reference-native fixture (FIXTURES.md §1): labels,
EMG (600 Hz, 8 ch, NaN runs), mocap (100 Hz, hand/chest positions,
NaN runs) for train subjects s01-s05 and test subject s06."""

from __future__ import annotations

import random

ARM_ACTIONS = {
    "la": ["la-nothing", "la-lift", "la-pour"],
    "ra": ["ra-nothing", "ra-hold", "ra-stir"],
}
MOCAP_COLS = [
    "LHand_Position_X", "LHand_Position_Y", "LHand_Position_Z",
    "RHand_Position_X", "RHand_Position_Y", "RHand_Position_Z",
    "Chest_Position_X", "Chest_Position_Y", "Chest_Position_Z",
]


def make_fixture(subjects=("s01", "s02", "s03", "s04", "s05"), trials=("t01",),
                 span_s=6.4, emg_hz=600, mocap_hz=100, seed=42):
    rng = random.Random(seed)
    labels, emg, mocap = [], [], []
    for s in subjects:
        for t in trials:
            for arm in ("la", "ra"):
                bounds = sorted(
                    rng.uniform(0.5, span_s - 0.5) for _ in range(4)
                )
                edges = [0.0, *bounds, span_s]
                for i in range(len(edges) - 1):
                    labels.append(
                        (
                            f"{s}{t}.{arm}",
                            round(edges[i], 3),
                            round(edges[i + 1], 3),
                            rng.choice(ARM_ACTIONS[arm]),
                        )
                    )
            n_emg = int(span_s * emg_hz)
            for i in range(n_emg):
                ts = i / emg_hz
                row = [s, t, ts]
                for c in range(8):
                    v = rng.gauss(c * 0.5, 1.0)
                    if rng.random() < 0.02:
                        v = None
                    row.append(v)
                emg.append(tuple(row))
            n_mc = int(span_s * mocap_hz)
            for i in range(n_mc):
                ts = i / mocap_hz
                row = [s, t, ts]
                for ci, _ in enumerate(MOCAP_COLS):
                    v = rng.gauss(ci * 0.1, 0.5)
                    if rng.random() < 0.02:
                        v = None
                    row.append(v)
                mocap.append(tuple(row))
    return labels, emg, mocap


def fixture_dfs(spark, subjects=("s01", "s02", "s03", "s04", "s05"), **kw):
    labels, emg, mocap = make_fixture(subjects=subjects, **kw)
    labels_df = spark.createDataFrame(
        labels, "key string, start double, end double, action string"
    ).selectExpr(
        "substr(key, 1, 3) AS subject",
        "substr(key, 4, 3) AS trial",
        "split_part(key, '.', 2) AS arm",
        "start", "end", "action",
    )
    emg_df = spark.createDataFrame(
        emg,
        "subject string, trial string, ts double, "
        + ", ".join(f"c{i} double" for i in range(8)),
    )
    mocap_df = spark.createDataFrame(
        mocap,
        "subject string, trial string, ts double, "
        + ", ".join(f"{c} double" for c in MOCAP_COLS),
    )
    return labels_df, emg_df, mocap_df

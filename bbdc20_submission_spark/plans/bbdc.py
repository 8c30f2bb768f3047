"""The BBDC pipeline recomposed as a lazy Spark job (SURVEY §7 M3).

Stage map (reference -> here):
- target expansion  generate_submission.py:146 / load_data.py:34-42 -> expand_targets
- sensor prep       load_data.py:95,122-129,202-212              -> prepare_emg / prepare_mocap
- channel repair    generate_submission.py:162-302 (L1)          -> repair_channels
- robust scaling    generate_submission.py:304-313 (A9)          -> subject_scaler_stats
- features          generate_submission.py:315-379 (W9)          -> build_features
- train/predict     generate_submission.py:47-130, 479-502       -> plans.models
- decode+RLE+sink   generate_submission.py:505-569 (W6/S5)       -> predictions_to_intervals

Scale design: every stage is a DataFrame graph. The feature stage does
NOT gather raw samples per anchor; it pre-aggregates per-window
partials (sum/cnt/min/max/first/last/head7/tail7 per channel) once,
then combines partials per (anchor, context-frame) — all five
reference statistics decompose over window blocks:
    mean            = sum(sums)/sum(cnts)
    mean(diff)      = (last sample of last block - first of first) / (n-1)
    start_end_diff  = tail7-sum of last block - head7-sum of first block
    min / max       = min/max of block minima/maxima
so shuffle volume is O(windows), independent of sample rate — the
property that makes the plan hold at 100 TB of sensor data (samples
shrink ~120x at the first aggregation).

Reference padding semantics preserved: a context frame that sticks out
below 0 or at/after the trial's max window key contains a NaN pad
block, which poisons every stat of that gather; nan_to_num then zeroes
them (generate_submission.py:36 + utils.py:66-73). We implement that
as: out-of-range gather -> all five stats 0. EMG frames pad with
0-VALUED samples instead (missing_value=0 at call site :370), which
DO flow through scaling — also preserved.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bbdc20_submission_spark.caching import managed_persist
from bbdc20_submission_spark.operators.aggregates import label_encode
from bbdc20_submission_spark.operators.interpolate import interpolate_linear
from bbdc20_submission_spark.operators.sessionize import rle_intervals
from bbdc20_submission_spark.plans.sensors_config import subtraction_pairs

STEP_MS = 200
EMG_CHANNELS = [f"c{i}" for i in range(8)]
# (left_s, right_s) context gathers, reference order
# (generate_submission.py:344-366)
MOCAP_GATHERS = [
    (0.4, 0.0), (0.0, 0.4), (1.2, 0.0), (0.0, 1.2),
    (2.0, 0.0), (0.0, 2.0), (3.4, 0.0), (0.0, 3.4),
]
MOCAP_USE = [
    "LHand_Position_X", "LHand_Position_Y", "LHand_Position_Z",
    "RHand_Position_X", "RHand_Position_Y", "RHand_Position_Z",
    "Chest_Position_X", "Chest_Position_Z",
]
PIPELINE_USE_SENSORS = {
    "LHand": "position",
    "RHand": "position",
    "Chest": ["Position_X", "Position_Z"],
}


def window_key(ts_col: str = "ts", step_ms: int = STEP_MS) -> F.Column:
    """``int(ts*1000) // step * step`` (load_data.py:122-123) —
    ``//`` floors, so the quotient uses F.floor (a long cast truncates
    toward zero, off by one window for negative timestamps)."""
    ms = (F.col(ts_col) * 1000).cast("long")
    return (F.floor(ms / F.lit(step_ms)) * step_ms).cast("long")


def expand_targets(labels: DataFrame, step_ms: int = STEP_MS) -> DataFrame:
    """Interval -> 200 ms grid expansion with the reference's running
    cursor (load_data.py:34-42): win_end starts at step and consumes
    every grid point strictly below end*1000 before moving to the next
    interval. Output: [subject, trial, arm, win_end, action].

    Spark form: per interval, hi = smallest grid >= end*1000 minus one
    step; lo = previous interval's hi + step (cursor continuity) via a
    running max; explode(sequence) generates the grid — no shuffle
    beyond the per-key window."""
    w = Window.partitionBy("subject", "trial", "arm").orderBy("start")
    hi = (F.ceil(F.col("end") * 1000 / step_ms) * step_ms - step_ms).cast("long")
    prev_hi = F.max("hi").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    lo = F.greatest(F.coalesce(prev_hi + step_ms, F.lit(step_ms)), F.lit(step_ms))
    tagged = labels.withColumn("hi", hi).withColumn("lo", lo)
    return (
        tagged.filter(F.col("hi") >= F.col("lo"))
        .withColumn("win_end", F.explode(F.sequence("lo", "hi", F.lit(step_ms))))
        .select("subject", "trial", "arm", "win_end", "action")
    )


def arm_label_dims(labels: DataFrame) -> tuple[DataFrame, DataFrame]:
    """A10: per-arm sorted-distinct label dimension tables
    [action, code] (sklearn LabelEncoder semantics)."""
    left = label_encode(labels.filter(F.col("arm") == "la"), "action")
    right = label_encode(labels.filter(F.col("arm") == "ra"), "action")
    return left, right


def prepare_emg(emg: DataFrame, step_ms: int = STEP_MS) -> DataFrame:
    """Interpolate nulls per trial (W7), add window key (W1).

    Expects [subject, trial, ts, c0..c7]. Sample order inside a trial
    is ts order (the reference's file order)."""
    out = interpolate_linear(
        emg, ["subject", "trial"], ["ts"], EMG_CHANNELS
    )
    return out.withColumn("window", window_key("ts", step_ms))


def prepare_mocap(
    mocap: DataFrame,
    use_sensors: dict | None = None,
    step_ms: int = STEP_MS,
) -> DataFrame:
    """Interpolate, make configured sensors reference-relative (P5),
    add window key. Expects wide [subject, trial, ts, <sensor cols>]."""
    use_sensors = use_sensors or PIPELINE_USE_SENSORS
    value_cols = [c for c in mocap.columns if c not in ("subject", "trial", "ts")]
    out = interpolate_linear(mocap, ["subject", "trial"], ["ts"], value_cols)
    for col, ref_col in subtraction_pairs(use_sensors):
        if col in out.columns and ref_col in out.columns:
            out = out.withColumn(col, F.col(col) - F.col(ref_col))
    return out.withColumn("window", window_key("ts", step_ms))


# --------------------------------------------------------------- L1 repair

def _sample_label_alignment(
    emg: DataFrame, targets: DataFrame, step_ms: int = STEP_MS
) -> DataFrame:
    """J5: align each EMG sample with the window labels by the
    reference's repeat-120 rule (generate_submission.py:179-191):
    sample i of a trial takes the label of grid slot floor(i/120)+1,
    clamped to the last labeled slot (tail padded with last label).
    Adds ``la_action`` / ``ra_action`` columns."""
    w = Window.partitionBy("subject", "trial").orderBy("ts")
    tagged = emg.withColumn(
        "_win_end",
        (F.floor((F.row_number().over(w) - 1) / 120) + 1) * step_ms,
    )
    per_arm = (
        targets.groupBy("subject", "trial", "win_end")
        .pivot("arm", ["la", "ra"])
        .agg(F.first("action"))
        .withColumnRenamed("la", "la_action")
        .withColumnRenamed("ra", "ra_action")
    )
    max_we = per_arm.groupBy("subject", "trial").agg(
        F.max("win_end").alias("_max_we")
    )
    lookup = per_arm.select(
        F.col("subject").alias("_s"),
        F.col("trial").alias("_t"),
        F.col("win_end").alias("_we"),
        "la_action",
        "ra_action",
    )
    joined = (
        tagged.join(max_we, ["subject", "trial"], "left")
        .withColumn("_win_end", F.least("_win_end", "_max_we"))
        .join(
            lookup,
            (F.col("subject") == F.col("_s"))
            & (F.col("trial") == F.col("_t"))
            & (F.col("_win_end") == F.col("_we")),
            "left",
        )
        .drop("_s", "_t", "_we", "_win_end", "_max_we")
    )
    return joined


def _onehot_label_cols(df: DataFrame, left_dim, right_dim) -> tuple[DataFrame, list[str]]:
    """12 one-hot columns (6 left + 6 right classes, code order) from
    la_action/ra_action (LabelBinarizer semantics, :163-168)."""
    left_classes = [r["action"] for r in left_dim.orderBy("code").collect()]
    right_classes = [r["action"] for r in right_dim.orderBy("code").collect()]
    # one select, not a withColumn chain (each withColumn re-analyzes
    # the whole plan — quadratic in column count)
    exprs = [
        (F.col("la_action") == c).cast("double").alias(f"oh_l{i}")
        for i, c in enumerate(left_classes)
    ] + [
        (F.col("ra_action") == c).cast("double").alias(f"oh_r{i}")
        for i, c in enumerate(right_classes)
    ]
    cols = [f"oh_l{i}" for i in range(len(left_classes))] + [
        f"oh_r{i}" for i in range(len(right_classes))
    ]
    return df.select("*", *exprs), cols


def _fit_ols(df: DataFrame, feature_cols: list[str], target_col: str):
    """Exact least squares via the normal equations on Spark-computed
    X'X / X'y (one aggregation pass — distributed, collect is
    O(d^2)). Returns (intercept, coefs list). Mirrors sklearn
    LinearRegression (generate_submission.py:214)."""
    import numpy as np

    d = len(feature_cols)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(
                F.sum(F.col(feature_cols[i]) * F.col(feature_cols[j])).alias(f"xx_{i}_{j}")
            )
        aggs.append(F.sum(F.col(feature_cols[i]) * F.col(target_col)).alias(f"xy_{i}"))
        aggs.append(F.sum(F.col(feature_cols[i])).alias(f"xs_{i}"))
    aggs.append(F.sum(target_col).alias("ys"))
    aggs.append(F.count(F.lit(1)).alias("n"))
    row = df.agg(*aggs).collect()[0]

    n = row["n"]
    xs = np.array([row[f"xs_{i}"] for i in range(d)])
    xtx = np.zeros((d, d))
    for i in range(d):
        for j in range(i, d):
            xtx[i, j] = xtx[j, i] = row[f"xx_{i}_{j}"]
    xty = np.array([row[f"xy_{i}"] for i in range(d)])
    # centered normal equations == OLS with intercept
    xm = xs / n
    ym = row["ys"] / n
    cov = xtx - np.outer(xm, xs) - np.outer(xs, xm) + n * np.outer(xm, xm)
    rhs = xty - xs * ym - xm * row["ys"] + n * xm * ym
    coefs, *_ = np.linalg.lstsq(cov, rhs, rcond=None)
    intercept = ym - float(np.dot(coefs, xm))
    return float(intercept), [float(c) for c in coefs]


def _apply_linear(df: DataFrame, feature_cols: list[str], intercept: float, coefs: list[float]) -> F.Column:
    expr = F.lit(intercept)
    for c, w in zip(feature_cols, coefs):
        expr = expr + F.col(c) * F.lit(w)
    return expr


def repair_channels(
    emg: DataFrame,
    targets: DataFrame,
    left_dim: DataFrame,
    right_dim: DataFrame,
) -> DataFrame:
    """L1: regression repair of EMG channels, bug-for-bug with the
    reference (generate_submission.py:162-302):

    - ch4 model: features = channels [0,1,2,3,5,6,7] ⊕ 12 one-hot
      labels, trained on s01/s03/s05; overwrites ch4 for s02 AND s04.
    - ch0 model: trained on s01/s02/s03/s05 with the ODD channel order
      [1,2,4,3,5,6,7] (:268) — s02's already-repaired ch4 feeds it;
      applied with the DIFFERENT order [1,2,3,4,5,6,7] (:296), and to
      s02+s04 (loop iterates emg_4_fix_subjects — the unused
      emg_0_fix_subjects list is :284). Both quirks preserved.

    The apply path labels windows by win_end = window+200 when labeled
    else '<arm>-nothing' (:221-226) — reproduced via join + coalesce.
    """
    aligned = _sample_label_alignment(emg, targets)
    aligned, oh_cols = _onehot_label_cols(aligned, left_dim, right_dim)
    aligned = managed_persist(aligned)

    # ---- ch4 model (train: repeat-120 alignment; s01/s03/s05)
    ch4_feats = [f"c{i}" for i in [0, 1, 2, 3, 5, 6, 7]] + oh_cols
    fit_df = aligned.filter(F.col("subject").isin("s01", "s03", "s05"))
    b0_4, coefs_4 = _fit_ols(fit_df, ch4_feats, "c4")

    # apply: window labeled by win_end = window + 200 (apply-path rule)
    per_arm = (
        targets.groupBy("subject", "trial", "win_end")
        .pivot("arm", ["la", "ra"])
        .agg(F.first("action"))
    )
    def with_apply_labels(df: DataFrame) -> DataFrame:
        out = df.join(
            per_arm.select(
                "subject", "trial",
                (F.col("win_end") - STEP_MS).alias("window"),
                F.col("la").alias("_la"), F.col("ra").alias("_ra"),
            ),
            ["subject", "trial", "window"],
            "left",
        )
        out = out.withColumn("la_action", F.coalesce("_la", F.lit("la-nothing")))
        out = out.withColumn("ra_action", F.coalesce("_ra", F.lit("ra-nothing")))
        return out.drop("_la", "_ra")

    repaired = with_apply_labels(emg)
    repaired, _ = _onehot_label_cols(repaired, left_dim, right_dim)
    repaired = repaired.withColumn(
        "c4",
        F.when(
            F.col("subject").isin("s02", "s04"),
            _apply_linear(repaired, ch4_feats, b0_4, coefs_4),
        ).otherwise(F.col("c4")),
    )
    # consumed by the ch0 fit, the ch0 apply and the output
    repaired = managed_persist(repaired)

    # ---- ch0 model: trained on the ch4-REPAIRED data (order matters)
    aligned2 = _sample_label_alignment(
        repaired.select("subject", "trial", "ts", "window", *EMG_CHANNELS), targets
    )
    aligned2, _ = _onehot_label_cols(aligned2, left_dim, right_dim)
    ch0_train_feats = [f"c{i}" for i in [1, 2, 4, 3, 5, 6, 7]] + oh_cols
    fit0 = aligned2.filter(F.col("subject").isin("s01", "s02", "s03", "s05"))
    b0_0, coefs_0 = _fit_ols(fit0, ch0_train_feats, "c0")

    # applied with channel order [1,2,3,4,5,6,7] (reference bug)
    ch0_apply_feats = [f"c{i}" for i in [1, 2, 3, 4, 5, 6, 7]] + oh_cols
    repaired = repaired.withColumn(
        "c0",
        F.when(
            F.col("subject").isin("s02", "s04"),  # bug: s02 included
            _apply_linear(repaired, ch0_apply_feats, b0_0, coefs_0),
        ).otherwise(F.col("c0")),
    )
    return repaired.select("subject", "trial", "ts", "window", *EMG_CHANNELS)


# ------------------------------------------------------------- A9 scalers

def subject_scaler_stats(emg: DataFrame) -> DataFrame:
    """RobustScaler(25-75) stats per subject per channel
    (generate_submission.py:304-313): center = median, scale = IQR.
    Output: [subject, <c>_med, <c>_iqr ...]. Exact percentiles."""
    aggs = []
    for c in EMG_CHANNELS:
        aggs.append(F.expr(f"percentile({c}, 0.5)").alias(f"{c}_med"))
        aggs.append(
            (F.expr(f"percentile({c}, 0.75)") - F.expr(f"percentile({c}, 0.25)")).alias(f"{c}_iqr")
        )
    return emg.groupBy("subject").agg(*aggs)


# ------------------------------------------------------------- W9 features

def _window_partials(df: DataFrame, value_cols: Sequence[str]) -> DataFrame:
    """Per (subject, trial, window) partial aggregates that all five
    reference stats decompose into. first/last/head7/tail7 are in
    ts order within the window."""
    w_asc = Window.partitionBy("subject", "trial", "window").orderBy("ts")
    w_desc = Window.partitionBy("subject", "trial", "window").orderBy(F.col("ts").desc())
    tagged = df.withColumn("_ra", F.row_number().over(w_asc)).withColumn(
        "_rd", F.row_number().over(w_desc)
    )
    aggs = [F.count(F.lit(1)).alias("_cnt")]
    for c in value_cols:
        aggs += [
            F.sum(c).alias(f"{c}_sum"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
            F.min_by(c, "_ra").alias(f"{c}_first"),
            F.max_by(c, "_ra").alias(f"{c}_last"),
            F.sum(F.when(F.col("_ra") <= 7, F.col(c)).otherwise(0.0)).alias(f"{c}_head7"),
            F.sum(F.when(F.col("_rd") <= 7, F.col(c)).otherwise(0.0)).alias(f"{c}_tail7"),
        ]
    return tagged.groupBy("subject", "trial", "window").agg(*aggs)


def mocap_gather_features(
    mocap: DataFrame,
    anchors: DataFrame,
    value_cols: Sequence[str] = tuple(MOCAP_USE),
    gathers: Sequence[tuple[float, float]] = tuple(MOCAP_GATHERS),
    step_ms: int = STEP_MS,
) -> DataFrame:
    """The 8-gather x 5-stat x 8-channel mocap feature block
    (generate_submission.py:330-366), computed from window partials.

    anchors: [subject, trial, win_end]. Output: one row per anchor with
    columns g{gi}_{stat}_{ch} in reference order. A gather whose slot
    range leaves [0, max_window) is zeroed wholesale (NaN-pad +
    nan_to_num semantics)."""
    partials = _window_partials(mocap, value_cols)
    max_win = mocap.groupBy("subject", "trial").agg(
        F.max("window").alias("_max_win")
    )

    # anchor x gather x slot expansion (slot counts are small constants)
    slot_rows = []
    for gi, (left_s, right_s) in enumerate(gathers):
        lo_off = -int(left_s * 1000)
        hi_off = int(right_s * 1000)
        for slot_off in range(lo_off, hi_off, step_ms):
            slot_rows.append((gi, slot_off))
    slots = F.array(
        *[
            F.struct(F.lit(gi).alias("g"), F.lit(off).alias("off"))
            for gi, off in slot_rows
        ]
    )
    exploded = (
        anchors.join(max_win, ["subject", "trial"], "inner")
        .withColumn("_s", F.explode(slots))
        .select(
            "subject", "trial", "win_end", "_max_win",
            F.col("_s.g").alias("g"),
            (F.col("win_end") + F.col("_s.off")).cast("long").alias("window"),
        )
    )
    joined = exploded.join(partials, ["subject", "trial", "window"], "left")

    pad = (F.col("window") < 0) | (F.col("window") >= F.col("_max_win"))
    grp = joined.groupBy("subject", "trial", "win_end", "g").agg(
        F.max(pad.cast("int")).alias("_padded"),
        F.sum("_cnt").alias("_n"),
        F.min("window").alias("_first_win"),
        F.max("window").alias("_last_win"),
        *[
            a
            for c in value_cols
            for a in (
                F.sum(f"{c}_sum").alias(f"{c}_sum"),
                F.min(f"{c}_min").alias(f"{c}_min"),
                F.max(f"{c}_max").alias(f"{c}_max"),
                F.min_by(f"{c}_first", "window").alias(f"{c}_first"),
                F.max_by(f"{c}_last", "window").alias(f"{c}_last"),
                F.min_by(f"{c}_head7", "window").alias(f"{c}_head7"),
                F.max_by(f"{c}_tail7", "window").alias(f"{c}_tail7"),
            )
        ],
    )

    # pack the 5x|channels| stats of a (anchor, gather) row into one
    # array, then ONE conditional aggregation per gather — no 8-way
    # self-join (which would recompute the upstream agg per branch).
    zero = F.col("_padded") == 1
    stat_exprs = []
    stat_names = []
    # reference stat order: mean, mean_diff, start_end_diff, max, min
    for stat in ("mean", "meandiff", "sediff", "max", "min"):
        for c in value_cols:
            if stat == "mean":
                e = F.col(f"{c}_sum") / F.col("_n")
            elif stat == "meandiff":
                e = (F.col(f"{c}_last") - F.col(f"{c}_first")) / (F.col("_n") - 1)
            elif stat == "sediff":
                e = F.col(f"{c}_tail7") - F.col(f"{c}_head7")
            elif stat == "max":
                e = F.col(f"{c}_max")
            else:
                e = F.col(f"{c}_min")
            # NaN-pad + nan_to_num: zero the whole gather when padded or
            # when the stat itself is NaN/null (e.g. n=1 meandiff)
            e = F.when(zero, 0.0).otherwise(
                F.coalesce(F.nanvl(e, F.lit(0.0)), F.lit(0.0))
            )
            stat_exprs.append(e)
            stat_names.append(f"{stat}_{c}")

    packed = grp.select(
        "subject", "trial", "win_end", "g", F.array(*stat_exprs).alias("_st")
    )
    agg = packed.groupBy("subject", "trial", "win_end").agg(
        *[
            F.max(F.when(F.col("g") == gi, F.col("_st"))).alias(f"_st{gi}")
            for gi in range(len(gathers))
        ]
    )
    return agg.select(
        "subject", "trial", "win_end",
        *[
            F.element_at(f"_st{gi}", j + 1).alias(f"g{gi}_{n}")
            for gi in range(len(gathers))
            for j, n in enumerate(stat_names)
        ],
    )


def emg_frame_features(
    emg: DataFrame,
    anchors: DataFrame,
    scaler_stats: DataFrame,
    left_s: float = 2.0,
    right_s: float = 2.0,
    frame_rows: int = 200,
    nominal_win_rows: int = 120,
    step_ms: int = STEP_MS,
) -> DataFrame:
    """EMG context block -> robust scale -> 200-sample frames ->
    mean(|x|) per frame per channel (generate_submission.py:368-376).

    Pad slots (outside [0, max_window)) contribute ``nominal_win_rows``
    zero-valued samples, which DO pass through the scaler — reference
    missing_value=0 semantics. Output: [subject, trial, win_end,
    emg_feats array<double>] with frame-major layout
    (emg_win_means.reshape(-1))."""
    n_slots = int((left_s + right_s) * 1000) // step_ms
    offsets = [(-int(left_s * 1000)) + i * step_ms for i in range(n_slots)]
    max_win = emg.groupBy("subject", "trial").agg(F.max("window").alias("_max_win"))

    slots = (
        anchors.join(max_win, ["subject", "trial"], "inner")
        .withColumn("_off", F.explode(F.array(*[F.lit(o) for o in offsets])))
        .select(
            "subject", "trial", "win_end", "_max_win",
            (F.col("win_end") + F.col("_off")).cast("long").alias("window"),
            F.col("_off").alias("_slot_off"),
        )
    )
    pad = (F.col("window") < 0) | (F.col("window") >= F.col("_max_win"))

    real = slots.filter(~pad).join(
        emg.select("subject", "trial", "window", "ts", *EMG_CHANNELS),
        ["subject", "trial", "window"],
        "inner",
    )
    pad_rows = (
        slots.filter(pad)
        .withColumn("_i", F.explode(F.sequence(F.lit(1), F.lit(nominal_win_rows))))
        .select(
            "subject", "trial", "win_end", "window",
            (F.col("_i").cast("double") / 1e9 + F.col("window") / 1000.0).alias("ts"),
            *[F.lit(0.0).alias(c) for c in EMG_CHANNELS],
            "_slot_off",
        )
    )
    block = real.select(
        "subject", "trial", "win_end", "window", "ts", *EMG_CHANNELS, "_slot_off"
    ).unionByName(pad_rows)

    # robust scale (x - med) / iqr, then nan_to_num
    block = block.join(F.broadcast(scaler_stats), "subject", "left")
    scaled = [
        F.coalesce(
            F.nanvl((F.col(c) - F.col(f"{c}_med")) / F.col(f"{c}_iqr"), F.lit(0.0)),
            F.lit(0.0),
        ).alias(c)
        for c in EMG_CHANNELS
    ]
    block = block.select(
        "subject", "trial", "win_end", "_slot_off", "ts", *scaled
    )

    w = Window.partitionBy("subject", "trial", "win_end").orderBy("_slot_off", "ts")
    framed = block.withColumn(
        "_frame", F.floor((F.row_number().over(w) - 1) / frame_rows)
    )
    frame_means = framed.groupBy("subject", "trial", "win_end", "_frame").agg(
        *[F.avg(F.abs(F.col(c))).alias(f"m_{c}") for c in EMG_CHANNELS]
    )
    # frame-major flatten: [f0c0..f0c7, f1c0, ...]
    per_frame = F.array(*[F.col(f"m_{c}") for c in EMG_CHANNELS])
    return (
        frame_means.groupBy("subject", "trial", "win_end")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_frame"), per_frame.alias("fm")))
                    ),
                    lambda s: s["fm"],
                )
            ).alias("emg_feats")
        )
    )


def build_features(
    mocap: DataFrame,
    emg: DataFrame,
    anchors: DataFrame,
    scaler_stats: DataFrame,
) -> DataFrame:
    """Full ~416-wide feature vector per anchor: 8 gathers x 5 stats x
    8 mocap channels (320) ++ EMG frame means (generate_submission.py:
    315-379). Output: [subject, trial, win_end, features array<double>]."""
    mg = mocap_gather_features(mocap, anchors)
    eg = emg_frame_features(emg, anchors, scaler_stats)
    mocap_cols = [c for c in mg.columns if c.startswith("g")]
    return (
        mg.join(eg, ["subject", "trial", "win_end"], "inner")
        .select(
            "subject", "trial", "win_end",
            F.concat(F.array(*[F.col(c) for c in mocap_cols]), F.col("emg_feats")).alias("features"),
        )
    )


# --------------------------------------------------------- decode + sink

def predictions_to_intervals(preds: DataFrame) -> DataFrame:
    """W6/P9/P10: per (subject, trial, arm) RLE of window predictions
    into half-open second-unit intervals (generate_submission.py:
    505-562): segment end = next change's ts; final segment kept only
    if non-empty. Expects [subject, trial, arm, win_end, action]."""
    with_key = preds.withColumn(
        "key", F.concat(F.col("subject"), F.col("trial"), F.lit("."), F.col("arm"))
    )
    runs = rle_intervals(
        with_key, keys=["key"], ts_col="win_end", value_col="action"
    )
    return runs.select(
        "key",
        (F.col("start") / 1000.0).alias("start"),
        (F.col("end") / 1000.0).alias("end"),
        "action",
    )

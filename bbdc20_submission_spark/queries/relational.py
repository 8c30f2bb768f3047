"""Relational declared queries (SURVEY.md §2.2/2.3/2.4/2.6) over the
TPC-H-ish harness tables.

Each query certifies one operator row from the SURVEY §2 inventory;
docstrings cite the reference lines whose semantics the operator
re-expresses. Authoring follows registry.py's float-stability rules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bbdc20_submission_spark.functions.keys import concat_key, split_part, substr_key
from bbdc20_submission_spark.operators.aggregates import (
    argmax_array,
    block_sum_diff,
    label_encode,
    mode_lowest,
    one_hot,
    robust_scale,
    signed_abs_max,
    telescoping_mean_diff,
)
from bbdc20_submission_spark.operators.joins import (
    broadcast_dim_join,
    range_join_bucketed,
)
from bbdc20_submission_spark.registry import query
from bbdc20_submission_spark.sources.harness import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------- §2.2 scalar

@query(
    "p1_p2_key_parse",
    oracle="""
    SELECT c_custkey,
           substr(c_name, 1, 8) AS name_prefix,
           split_part(c_name, '#', 2) AS name_num,
           c_name || '.' || c_mktsegment AS composite_key
    FROM customer
    """,
)
def p1_p2_key_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2/P10: fixed-offset substring, split+pick, concat key.

    Ref: load_data.py:17-19 (subject/trial/arm parse), generate_
    submission.py:526 (key concat).
    """
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        substr_key("c_name", 1, 8).alias("name_prefix"),
        split_part("c_name", "#", 2).alias("name_num"),
        concat_key("c_name", "c_mktsegment", sep=".").alias("composite_key"),
    )


@query(
    "p4_filter_project",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 1000.0
    """,
)
def p4_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: equality filter + projection (ref load_data.py:25-26).

    Both predicates push down to the parquet scan."""
    c = load_table(spark, "customer", sf_dir)
    return (
        c.filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 1000.0))
        .select("c_custkey", "c_name")
    )


@query(
    "p5_p6_arith_abs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS net_price,
           round(abs(l_extendedprice - 1000.0), 6) AS abs_dev
    FROM lineitem
    """,
)
def p5_p6_arith_abs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P6: column arithmetic + abs (ref load_data.py:202-212,
    generate_submission.py:375)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net_price"),
        F.round(F.abs(F.col("l_extendedprice") - 1000.0), 6).alias("abs_dev"),
    )


@query(
    "p7_null_normalize",
    oracle="""
    SELECT event_id,
           coalesce(CASE WHEN value < 20.0 THEN NULL ELSE value END, 0.0) AS value_filled
    FROM events
    """,
)
def p7_null_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: NaN/null -> 0 normalization (ref fillna(0)/nan_to_num,
    load_data.py:95, generate_submission.py:36). Nulls are synthesized
    by masking small values since the harness table has none."""
    e = load_table(spark, "events", sf_dir)
    masked = F.when(F.col("value") < 20.0, F.lit(None)).otherwise(F.col("value"))
    return e.select(
        "event_id", F.coalesce(masked, F.lit(0.0)).alias("value_filled")
    )


@query(
    "p13_case_weight",
    oracle="""
    SELECT c_custkey,
           CAST(CASE WHEN c_mktsegment = 'MACHINERY' THEN 2 ELSE 1 END AS BIGINT) AS weight
    FROM customer
    """,
)
def p13_case_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: conditional constant (ref sample-weight-2-for-s05,
    generate_submission.py:61-64)."""
    c = load_table(spark, "customer", sf_dir)
    return c.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "MACHINERY", F.lit(2))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("weight"),
    )


@query(
    "p_regexp_extract",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
           regexp_extract(p_brand, '([0-9]+)', 1) AS brand_num
    FROM part
    """,
)
def p_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2 note: regex surface beyond the reference's key parsing."""
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+)", 1).alias("first_word"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
    )


@query(
    "p_json_extract",
    oracle="""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS prop_k
    FROM events
    """,
)
def p_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2 note: JSON extraction on events.props."""
    e = load_table(spark, "events", sf_dir)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("prop_k"),
    )


@query(
    "p_date_functions",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           CAST(dayofweek(o_orderdate) AS BIGINT) AS o_dow,
           epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms
    FROM orders
    """,
)
def p_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2 note: date/time functions on orders.o_orderdate.

    dayofweek: Spark 1=Sunday..7=Saturday vs DuckDB 0=Sunday..6 —
    normalized by subtracting 1 on the Spark side.
    """
    o = load_table(spark, "orders", sf_dir)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("o_dow"),
        F.unix_millis(F.date_trunc("month", F.col("o_orderdate"))).alias("month_start_ms"),
    )


# ---------------------------------------------------------------- §2.3 joins

@query(
    "j1_equi_join_revenue",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def j1_equi_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: multi-table equi join + agg (ref feature<->target key-aligned
    join, generate_submission.py:53-64). nation is broadcast (J4);
    customer/orders/lineitem shuffle on their join keys and AQE picks
    broadcast for the small sides at low SF."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "j4_broadcast_dim",
    oracle="""
    SELECT r_name, count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def j4_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: broadcast dimension join (ref label decode,
    generate_submission.py:508-509)."""
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    return (
        broadcast_dim_join(n, r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@query(
    "j_semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderstatus = 'O')
    """,
)
def j_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 note: left-semi join (EXISTS)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "j_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 note: left-anti join (NOT EXISTS)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "j_range_join_bins",
    oracle="""
    WITH bins(lo, hi, bin_name) AS (
        VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'), (25.0, 1e9, 'high')
    )
    SELECT bin_name, count(*) AS n_rows,
           round(sum(l_quantity), 6) AS sum_qty
    FROM lineitem JOIN bins ON l_quantity >= lo AND l_quantity < hi
    GROUP BY bin_name
    """,
)
def j_range_join_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.3 note: non-equi range join against a broadcast bin dim.

    BroadcastNestedLoopJoin on a 3-row dim — the scalable shape for
    fact-to-bins banding (a big-big range join would pre-bucketize)."""
    li = load_table(spark, "lineitem", sf_dir)
    bins = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 1e9, "high")],
        "lo double, hi double, bin_name string",
    )
    return (
        range_join_bucketed(li, bins, "l_quantity", "lo", "hi")
        .groupBy("bin_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        )
    )


# ----------------------------------------------------------- §2.4 aggregates

@query(
    "a2_grouped_stats_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           round(min(l_extendedprice), 6) AS min_price,
           round(max(l_extendedprice), 6) AS max_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def a2_grouped_stats_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: grouped mean/min/max/sum/count — TPC-H Q1 shape
    (ref per-frame stats, generate_submission.py:20-27)."""
    li = load_table(spark, "lineitem", sf_dir)
    price = F.col("l_extendedprice")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum(price), 4).alias("sum_price"),
            F.round(
                F.sum(price * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 4
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.round(F.min(price), 6).alias("min_price"),
            F.round(F.max(price), 6).alias("max_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "a1_distinct_keys",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def a1_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: distinct group keys (ref unique key sets, load_data.py:31-32)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "a3_telescoping_mean_diff",
    oracle="""
    SELECT user_id,
           round((last(value ORDER BY ts, event_id)
                  - first(value ORDER BY ts, event_id))
                 / (count(value) - 1), 6) AS mean_diff
    FROM events
    GROUP BY user_id
    HAVING count(value) > 1
    """,
)
def a3_telescoping_mean_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: mean of first differences == (last-first)/(n-1)
    (ref generate_submission.py:14-15; telescoping identity)."""
    e = load_table(spark, "events", sf_dir)
    order = F.struct(F.col("ts"), F.col("event_id"))
    return (
        e.groupBy("user_id")
        .agg(
            F.round(telescoping_mean_diff("value", order), 6).alias("mean_diff"),
            F.count("value").alias("_n"),
        )
        .filter(F.col("_n") > 1)
        .drop("_n")
    )


@query(
    "a4_block_sum_diff",
    oracle="""
    WITH tagged AS (
        SELECT l_orderkey, l_extendedprice,
               row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber ASC, l_extendedprice ASC, l_partkey ASC, l_suppkey ASC)  AS rn_asc,
               row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber DESC, l_extendedprice DESC, l_partkey DESC, l_suppkey DESC) AS rn_desc
        FROM lineitem
    )
    SELECT l_orderkey,
           round(sum(CASE WHEN rn_desc <= 2 THEN l_extendedprice ELSE 0.0 END)
                 - sum(CASE WHEN rn_asc <= 2 THEN l_extendedprice ELSE 0.0 END), 6)
               AS block_sum_diff
    FROM tagged GROUP BY l_orderkey
    """,
)
def a4_block_sum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: sum(last k) - sum(first k) per group, k=2
    (ref start/end block-sum diff, generate_submission.py:17-18)."""
    li = load_table(spark, "lineitem", sf_dir)
    out = block_sum_diff(
        li,
        ["l_orderkey"],
        "l_extendedprice",
        ["l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey"],
        k=2,
    )
    return out.select(
        "l_orderkey", F.round("block_sum_diff", 6).alias("block_sum_diff")
    )


@query(
    "a6_signed_abs_max",
    oracle="""
    SELECT user_id,
           round(arg_max(value - 100.0, abs(value - 100.0)), 6) AS signed_abs_max
    FROM events GROUP BY user_id
    """,
)
def a6_signed_abs_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: signed abs-max (ref _abs_max_orig, utils.py:38-45).

    Centered at 100 so both signs occur; harness values are distinct
    in |x| so the tie rule is not exercised by the hash."""
    e = load_table(spark, "events", sf_dir)
    return e.groupBy("user_id").agg(
        F.round(signed_abs_max(F.col("value") - 100.0), 6).alias("signed_abs_max")
    )


@query(
    "a7_global_stats",
    oracle="""
    SELECT round(avg(l_extendedprice), 6) AS avg_price,
           round(stddev_samp(l_extendedprice), 6) AS std_price,
           round(min(l_extendedprice), 6) AS min_price,
           round(max(l_extendedprice), 6) AS max_price,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS med_price,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def a7_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: global one-pass stats — Spark's partial+final aggregation is
    the reference's hand-rolled partial_fit (load_data.py:66-82).
    Exact percentile, not approx (SURVEY §4)."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.agg(
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("std_price"),
        F.round(F.min("l_extendedprice"), 6).alias("min_price"),
        F.round(F.max("l_extendedprice"), 6).alias("max_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias("med_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "a8_robust_scale",
    oracle="""
    WITH stats AS (
        SELECT user_id,
               quantile_cont(value, 0.5)  AS med,
               quantile_cont(value, 0.25) AS q1,
               quantile_cont(value, 0.75) AS q3
        FROM events GROUP BY user_id
    )
    SELECT event_id, round((value - med) / (q3 - q1), 6) AS scaled
    FROM events JOIN stats USING (user_id)
    """,
)
def a8_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8/A9: per-group robust scaling, exact quantiles
    (ref RobustScaler per subject, generate_submission.py:304-313)."""
    e = load_table(spark, "events", sf_dir)
    return robust_scale(e, ["user_id"], "value").select(
        "event_id", F.round("scaled", 6).alias("scaled")
    )


@query(
    "a10_label_encode",
    oracle="""
    SELECT event_type,
           CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS BIGINT) AS code
    FROM (SELECT DISTINCT event_type FROM events)
    """,
)
def a10_label_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: sklearn-LabelEncoder (sorted-distinct rank) dim table
    (ref load_data.py:25-28)."""
    e = load_table(spark, "events", sf_dir)
    return label_encode(e, "event_type")


@query(
    "a11_one_hot",
    oracle="""
    SELECT event_id,
           CAST(event_type = 'click'    AS BIGINT) AS is_click,
           CAST(event_type = 'error'    AS BIGINT) AS is_error,
           CAST(event_type = 'purchase' AS BIGINT) AS is_purchase,
           CAST(event_type = 'signup'   AS BIGINT) AS is_signup,
           CAST(event_type = 'view'     AS BIGINT) AS is_view
    FROM events
    """,
)
def a11_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: LabelBinarizer one-hot over a fixed vocabulary
    (ref generate_submission.py:163-168)."""
    e = load_table(spark, "events", sf_dir)
    return one_hot(e, "event_type", EVENT_TYPES).select(
        "event_id", *[f"is_{c}" for c in EVENT_TYPES]
    )


@query(
    "a12_mode_majority",
    oracle="""
    WITH counted AS (
        SELECT user_id, event_type, count(*) AS cnt FROM events
        GROUP BY user_id, event_type
    ), ranked AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type ASC) AS rn
        FROM counted
    )
    SELECT user_id, event_type AS mode FROM ranked WHERE rn = 1
    """,
)
def a12_mode_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: majority vote / mode with ties -> lowest value
    (ref np.bincount().argmax(), generate_submission.py:496-502)."""
    e = load_table(spark, "events", sf_dir)
    return mode_lowest(e, ["user_id"], "event_type")


@query(
    "a13_argmax_array",
    oracle="""
    SELECT vec_id,
           CAST(list_position(embedding, list_max(embedding)) - 1 AS BIGINT) AS argmax_idx
    FROM embeddings
    """,
)
def a13_argmax_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13: argmax over an array column, ties -> first
    (ref probs.argmax(axis=1), generate_submission.py:487)."""
    em = load_table(spark, "embeddings", sf_dir)
    return em.select("vec_id", argmax_array("embedding").alias("argmax_idx"))


@query(
    "a_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 note: COUNT(DISTINCT) certification."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@query(
    "a_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS exact_parts,
           CAST(1 AS BIGINT) AS approx_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 note: HLL sketch, self-validating. The sketch estimate is
    engine-specific (no DuckDB HLL with identical seeds), so the hashed
    output carries the exact distinct count plus a deterministic
    bounded-error flag (|approx-exact|/exact <= 0.15 at rsd=0.02,
    ~7.5 sigma) — the flag certifies the sketch without hashing it."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.approx_count_distinct("l_partkey", 0.02).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                / F.col("exact_parts")
                <= F.lit(0.15)
            )
            .cast("long")
            .alias("approx_within_tol"),
        )
    )


@query(
    "a_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 6) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 note: rollup grouping sets certification."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "a_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 note: cube grouping sets certification."""
    o = load_table(spark, "orders", sf_dir)
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "a_pivot",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0.0), 6) AS qty_O,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0.0), 6) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 note: pivot (wide one-hot aggregation, A11's agg cousin)."""
    li = load_table(spark, "lineitem", sf_dir)
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return out.select(
        "l_returnflag",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 6).alias("qty_O"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 6).alias("qty_F"),
    )


# ------------------------------------------------------ §2.6 sort/limit/sets

@query(
    "o2_union_all",
    oracle="""
    SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
    """,
)
def o2_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: union/concat rows (ref np stacking, generate_submission.py:178)."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return c.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    ).unionByName(
        s.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("side"))
    )


@query(
    "o_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def o_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 note: INTERSECT (distinct) certification."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return c.select(F.col("c_nationkey").alias("nationkey")).intersect(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "o_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier
    """,
)
def o_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 note: EXCEPT (distinct) certification."""
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    return c.select(F.col("c_nationkey").alias("nationkey")).subtract(
        s.select(F.col("s_nationkey").alias("nationkey"))
    )


@query(
    "o_topk_global",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 6) AS total
    FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def o_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6 note: global top-k (TakeOrderedAndProject — no full sort).

    Tie-break on orderkey makes the k-boundary deterministic."""
    o = load_table(spark, "orders", sf_dir)
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", F.round("o_totalprice", 6).alias("total"))
    )


@query(
    "o_topk_per_group",
    oracle="""
    WITH ranked AS (
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        FROM lineitem
    )
    SELECT l_returnflag, l_orderkey, l_linenumber,
           round(l_extendedprice, 6) AS price, rn
    FROM ranked WHERE rn <= 3
    """,
)
def o_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/W5: per-group top-k via ranked window (ref head/tail slicing,
    generate_submission.py:18,183-184)."""
    li = load_table(spark, "lineitem", sf_dir)
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "l_returnflag",
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 6).alias("price"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


# ------------------------------------------------- composite certifications

@query(
    "q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           epoch_ms(o_orderdate) AS orderdate_ms,
           o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01'
      AND l_shipdate > TIMESTAMP '1999-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate_ms ASC, l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective joins + agg + global top-k, the
    composite form of J1+A2+O-topk. Fully deterministic order."""
    c = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            # o_orderdate reads as TIMESTAMP_NTZ; session TZ is UTC so
            # the cast is identity and matches DuckDB's naive epoch_ms
            F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("orderdate_ms"),
            "o_orderpriority",
        )
        .orderBy(
            F.col("revenue").desc(), F.col("orderdate_ms").asc(), F.col("l_orderkey").asc()
        )
        .limit(10)
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT round(
             100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_share
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregate ratio over a join (the
    composite of J4+P13+A2)."""
    li = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", net).otherwise(0.0))
                / F.sum(net),
                6,
            ).alias("promo_share")
        )
    )


@query(
    "a_approx_quantile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS median_exact,
           CAST(1 AS BIGINT) AS approx_within_tol
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 note: quantile sketch, self-validating. The KLL/GK estimate
    is engine-specific, so the hashed output carries the exact
    interpolated median plus a deterministic bounded-error flag
    (|approx-exact|/exact <= 0.01 at accuracy=10000) — certifies the
    sketch without hashing its raw value."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 6).alias(
                "median_exact"
            ),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("_approx"),
        )
        .select(
            "l_returnflag",
            "median_exact",
            (
                F.abs(F.col("_approx") - F.col("median_exact"))
                / F.col("median_exact")
                <= F.lit(0.01)
            )
            .cast("long")
            .alias("approx_within_tol"),
        )
    )


@query(
    "sql_top_spender_per_nation",
    oracle="""
    WITH spend AS (
        SELECT c_custkey, c_name, c_nationkey,
               sum(o_totalprice) AS total_spend
        FROM customer JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey, c_name, c_nationkey
    ), ranked AS (
        SELECT n_name, c_custkey, c_name,
               round(total_spend, 4) AS total_spend,
               row_number() OVER (PARTITION BY n_name
                                  ORDER BY total_spend DESC, c_custkey ASC) AS rn
        FROM spend JOIN nation ON n_nationkey = c_nationkey
    )
    SELECT n_name, c_custkey, c_name, total_spend FROM ranked WHERE rn = 1
    """,
)
def sql_top_spender_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-API certification: the same engine surface via spark.sql
    text over temp views (Catalyst produces the identical plan as the
    DataFrame form — both front-ends are first-class)."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("v_customer")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("v_orders")
    load_table(spark, "nation", sf_dir).createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        WITH spend AS (
            SELECT c_custkey, c_name, c_nationkey,
                   sum(o_totalprice) AS total_spend
            FROM v_customer JOIN v_orders ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name, c_nationkey
        ), ranked AS (
            SELECT n_name, c_custkey, c_name,
                   round(total_spend, 4) AS total_spend,
                   row_number() OVER (PARTITION BY n_name
                                      ORDER BY total_spend DESC, c_custkey ASC) AS rn
            FROM spend JOIN v_nation ON n_nationkey = c_nationkey
        )
        SELECT n_name, c_custkey, c_name, total_spend FROM ranked WHERE rn = 1
        """
    )


@query(
    "sq_correlated_scalar",
    oracle="""
    SELECT p_partkey, p_name, round(p_retailprice, 6) AS price
    FROM part p
    WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                           WHERE p2.p_brand = p.p_brand)
    """,
)
def sq_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (parts above their brand's average
    price) — Catalyst decorrelates it into an aggregate + join; written
    in SQL to exercise exactly that rewrite path."""
    load_table(spark, "part", sf_dir).createOrReplaceTempView("v_part")
    return spark.sql(
        """
        SELECT p_partkey, p_name, round(p_retailprice, 6) AS price
        FROM v_part p
        WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM v_part p2
                               WHERE p2.p_brand = p.p_brand)
        """
    )


@query(
    "sq_exists_daterange",
    oracle="""
    SELECT o_orderkey, o_orderpriority
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1999-01-01'
      AND o_orderdate < TIMESTAMP '2000-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    """,
)
def sq_exists_daterange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a non-equi condition
    inside -> decorrelated to a left-semi join with the extra
    predicate."""
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("v_orders")
    load_table(spark, "lineitem", sf_dir).createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority
        FROM v_orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate < TIMESTAMP '2000-01-01'
          AND EXISTS (SELECT 1 FROM v_lineitem
                      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        """
    )


@query(
    "sq_in_having",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (
        SELECT o_custkey FROM orders
        GROUP BY o_custkey HAVING count(*) >= 15
    )
    """,
)
def sq_in_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a grouped-HAVING subquery -> semi join
    against the aggregate."""
    load_table(spark, "customer", sf_dir).createOrReplaceTempView("v_customer")
    load_table(spark, "orders", sf_dir).createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM v_customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM v_orders
            GROUP BY o_custkey HAVING count(*) >= 15
        )
        """
    )


@query(
    "p_string_functions",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lowered,
           upper(p_brand) AS uppered,
           trim(p_type) AS trimmed,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS padded,
           replace(p_name, ' ', '_') AS replaced,
           levenshtein(p_name, p_brand) AS edit_dist,
           CAST(length(p_name) AS BIGINT) AS name_len
    FROM part
    """,
)
def p_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2 breadth: string-function battery (case, trim, pad, replace,
    edit distance) — all JVM built-ins."""
    p = load_table(spark, "part", sf_dir)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("lowered"),
        F.upper("p_brand").alias("uppered"),
        F.trim("p_type").alias("trimmed"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("padded"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("replaced"),
        F.levenshtein("p_name", "p_brand").cast("long").alias("edit_dist"),
        F.length("p_name").cast("long").alias("name_len"),
    )

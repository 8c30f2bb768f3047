"""SQL-callable function surface: registrations resolve, and every
sg_* function agrees exactly with its certified DataFrame-side twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from bbdc20_submission_spark.functions.sqlfns import register_sql_functions
from bbdc20_submission_spark.sources.harness import load_table


def test_sql_functions_match_dataframe_twins(spark, sf_dir):
    names = register_sql_functions(spark)
    assert set(names) >= {
        "sg_ws_tokens", "sg_bpe_tokens", "sg_quality", "sg_fingerprint",
        "sg_cosine", "sg_hamming64", "sg_micro",
    }
    docs = load_table(spark, "documents", sf_dir)
    docs.createOrReplaceTempView("t_docs")

    from bbdc20_submission_spark.operators.text import (
        portable_fingerprint,
        quality_score,
        token_count,
        ws_tokens,
    )

    df_side = quality_score(docs).select(
        "doc_id",
        token_count("text", "ws").alias("nt"),
        token_count("text", "bpe").alias("nb"),
        F.col("quality"),
        portable_fingerprint(ws_tokens("text")).alias("fp"),
    )
    sql_side = spark.sql(
        """
        SELECT doc_id, sg_ws_tokens(text) AS nt, sg_bpe_tokens(text) AS nb,
               sg_quality(text) AS quality, sg_fingerprint(text) AS fp
        FROM t_docs
        """
    )
    a = {r["doc_id"]: (r["nt"], r["nb"], r["quality"], r["fp"]) for r in df_side.collect()}
    b = {r["doc_id"]: (r["nt"], r["nb"], r["quality"], r["fp"]) for r in sql_side.collect()}
    assert a == b and len(a) > 0


def test_sql_similarity_scalars(spark):
    register_sql_functions(spark)
    row = spark.sql(
        """
        SELECT round(sg_cosine(array(1.0D, 0.0D, 2.0D), array(2.0D, 0.0D, 4.0D)), 9) AS c,
               sg_hamming64(11, 8) AS h,
               sg_micro(1.0000005) AS m,
               sg_micro(-33.2609375) AS mneg
        """
    ).collect()[0]
    assert row["c"] == 1.0
    assert row["h"] == 2  # 1011 ^ 1000 = 0011
    assert row["m"] == 1000001  # round-half-up at the tie
    assert row["mneg"] == -33260937  # floor(x*1e6 + 0.5): half rounds UP (toward +inf)


def test_arrow_udf_cosine_within_one_ulp(spark, sf_dir):
    """Spark 4.1 arrow-native UDF: arrow_cosine agrees with the
    expression-path cosine to 1 ulp on real embeddings (pairwise vs
    left-fold summation — documented contract), nulls pass through."""
    from pyspark.sql import functions as F

    from bbdc20_submission_spark.functions.arrowfns import arrow_cosine
    from bbdc20_submission_spark.operators.similarity import cosine
    from bbdc20_submission_spark.sources.harness import load_table

    em = load_table(spark, "embeddings", sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    two = (
        em.select("vec_id", v.alias("a"))
        .limit(300)
        .withColumn("b", F.reverse(F.col("a")))
        .withColumn(
            "a", F.when(F.col("vec_id") % 97 == 0, F.lit(None)).otherwise(F.col("a"))
        )
    )
    # null ELEMENTS and length mismatches must also agree (the
    # expression path's zip_with/aggregate null propagation)
    two = two.withColumn(
        "a",
        F.when(
            F.col("vec_id") % 89 == 0,
            F.concat(F.slice("a", 1, 63), F.array(F.lit(None).cast("double"))),
        )
        .when(F.col("vec_id") % 83 == 0, F.slice("a", 1, 10))
        .otherwise(F.col("a")),
    )
    rows = two.select(
        "vec_id",
        cosine(F.col("a"), F.col("b")).alias("e"),
        arrow_cosine(F.col("a"), F.col("b")).alias("g"),
    ).collect()
    assert len(rows) == 300
    nulls = [r for r in rows if r["e"] is None]
    # whole-array nulls + null-element rows + short-array rows
    assert len(nulls) >= 6 and all(r["g"] is None for r in nulls)
    diffs = [abs(r["e"] - r["g"]) for r in rows if r["e"] is not None]
    assert max(diffs) <= 5e-16, max(diffs)


def test_arrow_udf_cosine_fast_path_pure_batches(spark, sf_dir):
    """All-valid equal-length batches take the vectorized reduceat
    fast path — results must still match the expression twin."""
    from pyspark.sql import functions as F

    from bbdc20_submission_spark.functions.arrowfns import arrow_cosine
    from bbdc20_submission_spark.operators.similarity import cosine
    from bbdc20_submission_spark.sources.harness import load_table

    em = load_table(spark, "embeddings", sf_dir)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    two = em.select(v.alias("a")).limit(500).withColumn("b", F.reverse("a"))
    rows = two.select(
        cosine(F.col("a"), F.col("b")).alias("e"),
        arrow_cosine(F.col("a"), F.col("b")).alias("g"),
    ).collect()
    assert len(rows) == 500
    assert all(r["e"] is not None and r["g"] is not None for r in rows)
    assert max(abs(r["e"] - r["g"]) for r in rows) <= 5e-16

"""Deterministic curation sampling: reproducibility, per-stratum rates,
exact-k reservoirs, partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from bbdc20_submission_spark.operators.sampling import (
    reservoir_per_stratum,
    stratified_sample,
)


def _corpus(spark, n=4000):
    langs = ["en", "de", "es", "fr"]
    rows = [(i, langs[i % 4]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_rates_and_determinism(spark):
    df = _corpus(spark)
    fr = {"en": 0.5, "de": 0.1}
    a = {r["doc_id"] for r in stratified_sample(df, "lang", fr).collect()}
    b = {r["doc_id"] for r in stratified_sample(df, "lang", fr).collect()}
    assert a == b, "same data + seed must pick the same rows"
    by_lang = (
        stratified_sample(df, "lang", fr)
        .groupBy("lang")
        .count()
        .collect()
    )
    counts = {r["lang"]: r["count"] for r in by_lang}
    # 1000 docs per lang; hash-threshold keeps ~fraction of them
    assert 400 <= counts["en"] <= 600
    assert 50 <= counts.get("de", 0) <= 170
    assert "es" not in counts and "fr" not in counts  # default 0.0


def test_stratified_sample_partitioning_invariant(spark):
    df = _corpus(spark)
    fr = {"en": 0.25, "es": 0.75}
    one = {r["doc_id"] for r in stratified_sample(df.coalesce(1), "lang", fr).collect()}
    many = {r["doc_id"] for r in stratified_sample(df.repartition(13), "lang", fr).collect()}
    assert one == many, "membership must not depend on the physical layout"


def test_reservoir_exact_k_and_determinism(spark):
    df = _corpus(spark, n=1000)
    a = reservoir_per_stratum(df, ["lang"], k=25)
    counts = {r["lang"]: r["count"] for r in a.groupBy("lang").count().collect()}
    assert counts == {"en": 25, "de": 25, "es": 25, "fr": 25}
    ids_a = {r["doc_id"] for r in a.collect()}
    ids_b = {r["doc_id"] for r in reservoir_per_stratum(df.repartition(7), ["lang"], k=25).collect()}
    assert ids_a == ids_b


def test_reservoir_small_stratum_keeps_all(spark):
    rows = [(1, "en"), (2, "en"), (3, "zz")]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = reservoir_per_stratum(df, ["lang"], k=10)
    assert out.count() == 3


def test_seed_changes_selection(spark):
    df = _corpus(spark)
    a = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.5}, seed=1).collect()}
    b = {r["doc_id"] for r in stratified_sample(df, "lang", {"en": 0.5}, seed=2).collect()}
    assert a != b


def test_no_shuffle_in_stratified_sample(spark):
    """The Bernoulli form must stay a narrow filter (no Exchange)."""
    import contextlib
    import io

    df = _corpus(spark)
    out = stratified_sample(df, "lang", {"en": 0.5})
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue().split("\n\n")[0]
    assert "Exchange" not in plan

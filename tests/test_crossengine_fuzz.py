"""Cross-engine fuzz: randomized inputs through the engine-portable
expression operators on BOTH Spark and DuckDB, compared bit-for-bit.

The driver's oracle gate certifies the fixed harness corpus; these
pins certify the same formulas on adversarial inputs it doesn't
contain (unicode, empty tokens, punctuation runs, duplicate-heavy
numerics). One DataFrame per property — a single Spark job and one
DuckDB query per assertion batch, not per example.
"""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from bbdc20_submission_spark.operators.text import (
    classifier_quality_score,
    classifier_score_sql,
    portable_fingerprint,
    ws_tokens,
)

_WORDS = [
    "the", "data", "Straße", "naïve", "query", "a", "", "x1",
    "hash!", "…", "3.14", "über", "big-table", "zh中文", "e",
    "spark", "%", "token123", "l'étoile", "__", "ñ", ",",
]


def _random_texts(n: int, seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    out = []
    for i in range(n):
        k = rng.randint(1, 24)
        out.append((i, " ".join(rng.choice(_WORDS) for _ in range(k))))
    return out


def _duck(rows: list[tuple[int, str]], select: str):
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join("(?, ?)" for _ in rows)
            + ") AS v(doc_id, text)",
            [x for r in rows for x in r],
        )
        return dict(con.execute(select).fetchall())
    finally:
        con.close()


def test_fuzz_classifier_score_cross_engine(spark):
    rows = _random_texts(40, seed=7)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["s"]
        for r in classifier_quality_score(df)
        .select("doc_id", F.round("clf_score", 6).alias("s"))
        .collect()
    }
    want = _duck(
        rows,
        f"SELECT doc_id, round({classifier_score_sql()}, 6) FROM t",
    )
    assert got == want


def test_fuzz_portable_fingerprint_cross_engine(spark):
    rows = _random_texts(40, seed=11)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in df.select(
            "doc_id", portable_fingerprint(ws_tokens("text")).alias("fp")
        ).collect()
    }
    want = _duck(
        rows,
        """
        SELECT doc_id,
               list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                   list_transform(str_split(text, ' '),
                     x -> CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) % 1000000007)),
                 (acc, x) -> (acc * 257 + x) % 1000000007)
        FROM t
        """,
    )
    assert got == want


def test_fuzz_quality_score_cross_engine(spark):
    from bbdc20_submission_spark.operators.text import quality_score

    rows = _random_texts(40, seed=13)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["quality"]
        for r in quality_score(df).select("doc_id", "quality").collect()
    }
    want = _duck(
        rows,
        """
        WITH s AS (
            SELECT doc_id,
                   length(text) AS n_chars,
                   len(str_split(text, ' ')) AS n_tokens,
                   length(regexp_replace(text, '[^0-9]', '', 'g')) AS digits,
                   length(text)
                     - length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                     - length(regexp_replace(text, '[^0-9]', '', 'g'))
                     - length(regexp_replace(text, '[^ ]', '', 'g')) AS punct,
                   len(list_filter(str_split(text, ' '),
                       x -> x IN ('the','a','of','and','is','to','in','that'))) AS sw
            FROM t
        )
        SELECT doc_id,
               round(least(n_tokens / 32.0, 1.0) * 0.4
                     + least(sw / n_tokens * 4.0, 1.0) * 0.3
                     + (1.0 - least(punct / n_chars * 4.0, 1.0)) * 0.2
                     + (1.0 - least(digits / n_chars * 4.0, 1.0)) * 0.1, 6)
        FROM s
        """,
    )
    assert got == want

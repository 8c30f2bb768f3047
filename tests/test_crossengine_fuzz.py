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


def test_fuzz_bigram_lm_cross_engine(spark):
    """The corpus bigram LM on adversarial texts (unicode, empties,
    punctuation) must match DuckDB at the operator's 6dp rounding."""
    from bbdc20_submission_spark.operators.text import bigram_lm_scores

    rows = _random_texts(40, seed=17)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_logp"])
        for r in bigram_lm_scores(df).collect()
    }
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join("(?, ?)" for _ in rows)
            + ") AS v(doc_id, text)",
            [x for r in rows for x in r],
        )
        want = {
            r[0]: (r[1], r[2])
            for r in con.execute(
                """
            WITH toks AS (SELECT doc_id, str_split(text, ' ') AS t FROM t),
            dbi AS (
                SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
                FROM (SELECT doc_id, t,
                             unnest(generate_series(1, len(t) - 1)) AS i
                      FROM toks)
            ),
            uni AS (SELECT w, count(*) AS c1
                    FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
            bi AS (SELECT w1, w2, count(*) AS c2 FROM dbi GROUP BY w1, w2),
            vv AS (SELECT CAST(count(*) AS DOUBLE) AS V FROM uni),
            lm AS (
                SELECT d.doc_id, count(*) AS n,
                       round(avg(ln((b.c2 + CAST('0.5' AS DOUBLE))
                               / (u.c1 + CAST('0.5' AS DOUBLE) * v.V))), 6) AS lp
                FROM dbi d
                JOIN uni u ON d.w1 = u.w
                JOIN bi b ON d.w1 = b.w1 AND d.w2 = b.w2
                CROSS JOIN vv v GROUP BY d.doc_id
            )
            SELECT t.doc_id,
                   CAST(COALESCE(lm.n, 0) AS BIGINT),
                   COALESCE(lm.lp, CAST('0.0' AS DOUBLE))
            FROM t LEFT JOIN lm ON lm.doc_id = t.doc_id
            """
            ).fetchall()
        }
    finally:
        con.close()
    assert got == want


def test_fuzz_mixture_thresholds_cross_engine(spark):
    """Mixture-sample membership on a random stratified frame must
    match the DuckDB re-derivation of rates AND membership exactly."""
    import random

    from bbdc20_submission_spark.operators.sampling import mixture_sample

    rng = random.Random(29)
    langs = ["aa", "bb", "cc", "dd"]
    rows = [(i, rng.choice(langs)) for i in range(700)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = sorted(
        r["doc_id"]
        for r in mixture_sample(
            df, "lang", {"aa": 0.5, "bb": 0.35, "cc": 0.15},
            total_fraction=0.45, seed=7, portable=True,
        ).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join("(?, ?)" for _ in rows)
            + ") AS v(doc_id, lang)",
            [x for r in rows for x in r],
        )
        want = sorted(
            r[0]
            for r in con.execute(
                """
            WITH dim AS (
                SELECT lang,
                       CAST(floor(least(CAST(1048576 AS DOUBLE),
                           CAST('0.45' AS DOUBLE)
                           * (SELECT CAST(count(*) AS DOUBLE) FROM t)
                           * (CASE lang WHEN 'aa' THEN CAST('0.5' AS DOUBLE)
                                        WHEN 'bb' THEN CAST('0.35' AS DOUBLE)
                                        WHEN 'cc' THEN CAST('0.15' AS DOUBLE)
                                        ELSE CAST('0.0' AS DOUBLE) END)
                           / CAST(count(*) AS DOUBLE) * 1048576)) AS BIGINT) AS thr
                FROM t GROUP BY lang
            )
            SELECT t.doc_id FROM t JOIN dim d ON d.lang = t.lang
            WHERE CAST(('0x' || substr(md5(CAST(t.doc_id AS VARCHAR) || ':7'),
                       1, 8)) AS BIGINT) % 1048576 < d.thr
            """
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want and len(got) > 0

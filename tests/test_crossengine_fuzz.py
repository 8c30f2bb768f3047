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


def test_fuzz_ranking_eval_cross_engine(spark):
    """ranking_eval vs a DuckDB re-derivation on randomized runs and
    graded qrels: duplicate scores (tie-breaks), unjudged docs,
    never-retrieved relevant docs, rel grades 0..3, k smaller and
    larger than the run length."""
    import duckdb as _dd

    from bbdc20_submission_spark.operators.ranking import ranking_eval

    rng = random.Random(23)
    runs_rows, qrel_rows = [], []
    for q in range(6):
        n = rng.randint(1, 12)
        docs = rng.sample(range(40), n)
        for d in docs:
            # coarse score grid => frequent exact ties
            runs_rows.append((q, d, float(rng.randint(0, 5)) / 2))
        judged = rng.sample(range(40), rng.randint(1, 12))
        for d in judged:
            qrel_rows.append((q, d, rng.randint(0, 3)))
        # guarantee >=1 relevant doc so the query survives the ideal join
        qrel_rows.append((q, 99, rng.randint(1, 3)))
    # query 6: judged (with relevant docs) but the run retrieved
    # NOTHING — must report zeroed metrics, not vanish
    qrel_rows.append((6, 5, 2))
    qrel_rows.append((6, 7, 1))
    for k in (3, 20):
        runs = spark.createDataFrame(
            runs_rows, "query_id int, doc_id long, score double"
        )
        qrels = spark.createDataFrame(
            qrel_rows, "query_id int, doc_id long, rel int"
        )
        got = {
            r["query_id"]: (
                r["ndcg_at_k"], r["mrr"], r["precision_at_k"],
                r["recall_at_k"], r["n_rel"],
            )
            for r in ranking_eval(runs, qrels, k=k).collect()
        }
        con = _dd.connect()
        try:
            con.execute(
                "CREATE TABLE runs AS SELECT * FROM (VALUES "
                + ", ".join("(?, ?, ?)" for _ in runs_rows)
                + ") v(query_id, doc_id, score)",
                [x for r in runs_rows for x in r],
            )
            con.execute(
                "CREATE TABLE qrels AS SELECT * FROM (VALUES "
                + ", ".join("(?, ?, ?)" for _ in qrel_rows)
                + ") v(query_id, doc_id, rel)",
                [x for r in qrel_rows for x in r],
            )
            want = {
                row[0]: tuple(row[1:])
                for row in con.execute(f"""
                WITH ranked AS (
                    SELECT r.query_id, r.doc_id, coalesce(q.rel, 0) AS rel,
                           row_number() OVER (
                               PARTITION BY r.query_id
                               ORDER BY r.score DESC, r.doc_id ASC
                           ) AS rnk
                    FROM runs r LEFT JOIN qrels q
                      ON q.query_id = r.query_id AND q.doc_id = r.doc_id
                ), got AS (
                    SELECT query_id,
                           sum(CASE WHEN rnk <= {k}
                               THEN (pow(2.0, rel) - 1)
                                    / (ln(rnk + 1.0) / ln(2.0))
                               ELSE 0 END) AS dcg,
                           min(CASE WHEN rel > 0 THEN rnk END) AS first_rel,
                           sum(CASE WHEN rnk <= {k} AND rel > 0
                               THEN 1 ELSE 0 END) AS hits
                    FROM ranked GROUP BY query_id
                ), ideal AS (
                    SELECT query_id,
                           sum(CASE WHEN irank <= {k}
                               THEN (pow(2.0, rel) - 1)
                                    / (ln(irank + 1.0) / ln(2.0))
                               ELSE 0 END) AS idcg,
                           count(*) AS nrel
                    FROM (SELECT query_id, rel,
                                 row_number() OVER (
                                     PARTITION BY query_id
                                     ORDER BY rel DESC, doc_id ASC
                                 ) AS irank
                          FROM qrels WHERE rel > 0)
                    GROUP BY query_id
                )
                SELECT i.query_id, round(coalesce(g.dcg, 0) / i.idcg, 6),
                       round(coalesce(1.0 / g.first_rel, 0), 6),
                       round(coalesce(g.hits, 0) / {float(k)}, 6),
                       round(coalesce(g.hits, 0) * 1.0 / i.nrel, 6),
                       CAST(i.nrel AS BIGINT)
                FROM ideal i LEFT JOIN got g ON g.query_id = i.query_id
                """).fetchall()
            }
        finally:
            con.close()
        assert got == want, k


def test_fuzz_reselect_keepers_cross_engine(spark):
    """Keeper reselection (argmax score, tie -> lowest id, singleton
    self-keep) on randomized cluster structures vs a DuckDB window
    re-derivation — heavy score ties and mixed cluster sizes (1..8)
    exercise exactly the tie-break and fallback paths the curation DAG
    oracle relies on."""
    from bbdc20_submission_spark.operators.chunking import reselect_keepers

    rng = random.Random(1234)
    rows = []  # (doc_id, cluster, score)
    nxt = 0
    for _ in range(60):
        size = rng.choice([1, 1, 1, 2, 2, 3, 5, 8])
        members = list(range(nxt, nxt + size))
        nxt += size
        label = min(members)  # dedup_clusters invariant
        for m in members:
            rows.append((m, label, rng.randint(0, 3)))  # few values → ties

    clusters = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "doc_id long, keep_id long"
    )
    scores = spark.createDataFrame(
        [(r[0], float(r[2])) for r in rows], "doc_id long, score double"
    )
    got = {
        r["doc_id"]: (r["keep_id"], r["is_duplicate"])
        for r in reselect_keepers(clusters, scores).collect()
    }

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE m AS SELECT * FROM (VALUES "
            + ", ".join("(?, ?, ?)" for _ in rows)
            + ") AS v(doc_id, cluster, score)",
            [x for r in rows for x in r],
        )
        want = dict(
            (d, (k, dup))
            for d, k, dup in con.execute(
                """
                WITH best AS (
                    SELECT cluster, doc_id AS b FROM (
                        SELECT cluster, doc_id,
                               row_number() OVER (PARTITION BY cluster
                                   ORDER BY score DESC, doc_id ASC) AS rn
                        FROM m) WHERE rn = 1
                )
                SELECT m.doc_id, best.b, best.b <> m.doc_id
                FROM m JOIN best USING (cluster)
                """
            ).fetchall()
        )
    finally:
        con.close()
    assert got == want

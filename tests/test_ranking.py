"""TF-IDF / BM25: exact agreement with a hand/pure-python reference on
a small corpus, ranking sanity on planted relevant docs, and the
query-filtered scale shape (no full-vocab state in the BM25 plan)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bbdc20_submission_spark.operators.ranking import bm25_score, tf_idf

CORPUS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "cats and dogs and cats"),
    (3, "completely unrelated words here"),
]


def _py_tfidf(corpus):
    n = len(corpus)
    docs = {i: t.split(" ") for i, t in corpus}
    df = {}
    for toks in docs.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for i, toks in docs.items():
        for t in set(toks):
            tf = toks.count(t)
            out[(i, t)] = round(tf / len(toks) * math.log(n / df[t]), 6)
    return out


def test_tf_idf_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["token"]): r["tfidf"] for r in tf_idf(docs).collect()
    }
    want = _py_tfidf(CORPUS)
    assert got == want


def _py_bm25(corpus, query, k1=1.2, b=0.75):
    n = len(corpus)
    docs = {i: t.split(" ") for i, t in corpus}
    avg_dl = sum(len(t) for t in docs.values()) / n
    df = {
        q: sum(1 for toks in docs.values() if q in toks) for q in set(query)
    }
    out = {}
    for i, toks in docs.items():
        s = 0.0
        for q in sorted(set(query)):
            tf = toks.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avg_dl))
        if s > 0:
            out[i] = round(s, 6)
    return out


def test_bm25_matches_reference_and_ranks_relevant_first(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    query = ["cats", "dogs"]
    got = {r["doc_id"]: r["score"] for r in bm25_score(docs, query).collect()}
    assert got == _py_bm25(CORPUS, query)
    ranked = [r["doc_id"] for r in bm25_score(docs, query).collect()]
    assert ranked[0] == 2  # the cats-and-dogs doc
    assert 3 not in got  # no shared term -> omitted


def test_bm25_plan_filters_before_aggregation(spark):
    """The scale contract: tokens are filtered to the query set before
    any aggregate, and the df dim is broadcast — no full-vocabulary
    shuffle appears in the plan."""
    import contextlib
    import io

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bm25_score(docs, ["cat"]).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "array_contains" in plan  # the pre-aggregation query filter


def test_bm25_rejects_empty_query(spark):
    import pytest

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError, match="at least one query token"):
        bm25_score(docs, [])

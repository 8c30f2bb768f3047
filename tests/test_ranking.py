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


def test_bm25_multi_matches_single_per_query(spark):
    """bm25_score_multi must reproduce bm25_score exactly for each
    query in the dim (same idf variant, same rounding)."""
    from bbdc20_submission_spark.operators.ranking import bm25_score_multi

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qd = spark.createDataFrame(
        [(1, ["cats", "dogs"]), (2, ["cat"])],
        "query_id int, tokens array<string>",
    )
    multi = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_score_multi(docs, qd).collect()
    }
    for qid, toks in [(1, ["cats", "dogs"]), (2, ["cat"])]:
        single = {
            r["doc_id"]: r["score"] for r in bm25_score(docs, toks).collect()
        }
        got = {d: s for (q, d), s in multi.items() if q == qid}
        assert got == single, qid


def test_bm25_precomputed_corpus_stats_identical(spark):
    """Passing corpus_stats (the suite's fused-aggregate cache) must
    change NOTHING about the scores — single and multi form — and the
    helper must equal the per-call stats exactly."""
    from bbdc20_submission_spark.operators.ranking import (
        bm25_corpus_stats,
        bm25_score_multi,
    )

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    stats = bm25_corpus_stats(docs, "text")
    assert stats[0] == docs.count()
    base = {r["doc_id"]: r["score"] for r in bm25_score(docs, ["cat"]).collect()}
    cached = {
        r["doc_id"]: r["score"]
        for r in bm25_score(docs, ["cat"], corpus_stats=stats).collect()
    }
    assert base == cached
    qd = spark.createDataFrame([(1, ["cat"])], "query_id int, tokens array<string>")
    multi = {
        r["doc_id"]: r["score"]
        for r in bm25_score_multi(docs, qd, corpus_stats=stats).collect()
    }
    assert multi == base


def test_bm25_corpus_stats_rejects_empty_corpus(spark):
    import pytest

    from bbdc20_submission_spark.operators.ranking import bm25_corpus_stats

    docs = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty corpus"):
        bm25_corpus_stats(docs, "text")


def test_ranking_eval_hand_computed(spark):
    """nDCG/MRR/precision/recall on a tiny hand-worked example.

    Run (scores force rank order d1 > d2 > d3 > d4), k=3:
      d1 rel 3, d2 rel 0, d3 rel 1, d4 rel 2 (rank 4, outside k).
      DCG@3  = (2^3-1)/log2(2) + 0 + (2^1-1)/log2(4) = 7 + 0.5 = 7.5
      IDCG@3 = 7/log2(2) + 3/log2(3) + 1/log2(4)
      MRR = 1/1; P@3 = 2/3; R@3 = 2/3 (3 relevant docs total).
    """
    import math

    from bbdc20_submission_spark.operators.ranking import ranking_eval

    runs = spark.createDataFrame(
        [(1, 1, 4.0), (1, 2, 3.0), (1, 3, 2.0), (1, 4, 1.0)],
        "query_id int, doc_id long, score double",
    )
    qrels = spark.createDataFrame(
        [(1, 1, 3), (1, 3, 1), (1, 4, 2)],
        "query_id int, doc_id long, rel int",
    )
    row = ranking_eval(runs, qrels, k=3).collect()[0]
    idcg = 7.0 + 3.0 / math.log2(3) + 1.0 / math.log2(4)
    assert row["ndcg_at_k"] == round(7.5 / idcg, 6)
    assert row["mrr"] == 1.0
    assert row["precision_at_k"] == round(2 / 3, 6)
    assert row["recall_at_k"] == round(2 / 3, 6)
    assert row["n_rel"] == 3


def test_ranking_eval_unjudged_and_missing_first_hit(spark):
    """Docs absent from qrels count rel=0; a query whose run has no
    relevant doc in ANY rank gets mrr=0 but still joins via ideal."""
    from bbdc20_submission_spark.operators.ranking import ranking_eval

    runs = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 1.0)],
        "query_id int, doc_id long, score double",
    )
    # the only relevant doc (99) was never retrieved
    qrels = spark.createDataFrame(
        [(1, 99, 2)], "query_id int, doc_id long, rel int"
    )
    row = ranking_eval(runs, qrels, k=2).collect()[0]
    assert row["ndcg_at_k"] == 0.0
    assert row["mrr"] == 0.0
    assert row["precision_at_k"] == 0.0
    assert row["recall_at_k"] == 0.0
    assert row["n_rel"] == 1

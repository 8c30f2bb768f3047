"""Lexical relevance scoring over document corpora: TF-IDF and BM25.

Training-data curation uses these constantly — query-targeted corpus
slicing, boilerplate down-ranking, nearest-neighbor text retrieval
baselines. Both are pure DataFrame aggregations:

- ``tf_idf``: explode tokens once, two hash aggregates (term counts
  per doc, document frequency per term), one join on the term. The
  per-term IDF frame is small for natural vocabularies (heavy-tailed)
  but CAN be huge for synthetic/ngram vocabularies — it is joined on
  the token key (shuffle join), and Catalyst/AQE broadcasts it when it
  measures small. Map-side partial aggregation applies to both aggs.
- ``bm25_score``: scores every document against ONE query token set.
  The document-frequency stats are computed ONLY for the query's
  terms (filter before the aggregate — the df scan reduces to a
  semi-join against a handful of tokens), so the whole scoring pass
  is: one filtered explode, one partial-aggregated df dim (broadcast,
  it has |query| rows), one per-doc aggregate. No full-vocabulary
  state anywhere — this is the shape that holds at 100 TB.

Okapi BM25 with the standard parameters (k1 term-frequency
saturation, b length normalization) and the non-negative idf variant
ln(1 + (N - df + 0.5)/(df + 0.5)).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbdc20_submission_spark.operators.text import ws_tokens


def _exploded_tokens(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """[_id, _dl, _tok] — one row per token. The doc length and the
    token array are computed in a projection BELOW the explode, so the
    tokenizer runs once per DOCUMENT. The previous single-select form
    (size(split) next to explode(split)) left the Generate over the
    raw text and re-evaluated size(split(text)) in the Project above
    it — once per TOKEN row, O(tokens^2) character work per document
    with no plan-level shuffle tell."""
    # _dl derives from the PROJECTED array (size of a materialized
    # array is O(1)), so the tokenizer truly runs once per document —
    # the previous lower projection evaluated split(text) twice per
    # doc (once under size(), once for the alias; advice item r14)
    return docs.select(
        F.col(id_col).alias("_id"),
        ws_tokens(text_col).alias("_tk"),
    ).select("_id", F.size("_tk").alias("_dl"), F.explode("_tk").alias("_tok"))


def _doc_terms(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """[id, token, tf (count in doc), dl (doc token length)]."""
    toks = _exploded_tokens(docs, id_col, text_col)
    return toks.groupBy("_id", "_tok").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_docs: int | None = None,
) -> DataFrame:
    """Full TF-IDF matrix: [id_col, token, tf, df, tfidf] with
    tfidf = (tf / dl) * ln(N / df). One token explode, two aggregates,
    one join on the token. Pass ``n_docs`` to skip the corpus count
    when the caller already has it (e.g. from bm25_corpus_stats)."""
    if n_docs is None:
        n_docs = docs.count()
    terms = _doc_terms(docs, id_col, text_col)
    df_dim = terms.groupBy("_tok").agg(
        F.count(F.lit(1)).alias("_df")  # one row per (doc, token) => df
    )
    return (
        terms.join(df_dim, "_tok")
        .select(
            F.col("_id").alias(id_col),
            F.col("_tok").alias("token"),
            F.col("_tf").cast("long").alias("tf"),
            F.col("_df").cast("long").alias("df"),
            F.round(
                (F.col("_tf") / F.col("_dl"))
                * F.log(F.lit(float(n_docs)) / F.col("_df")),
                6,
            ).alias("tfidf"),
        )
    )


def bm25_corpus_stats(docs: DataFrame, text_col: str) -> tuple[int, float]:
    """(n_docs, avg_dl) in ONE aggregate job (the earlier separate
    count() + avg() pair cost two full corpus scans per score build).
    Raises on an empty corpus — BM25's idf/avgdl are undefined there."""
    row = docs.select(
        F.count(F.lit(1)).alias("_n"),
        F.avg(F.size(ws_tokens(text_col))).alias("_avgdl"),
    ).collect()[0]
    if not row["_n"]:
        raise ValueError(
            "bm25: empty corpus — idf/avgdl are undefined over zero"
            " documents"
        )
    return int(row["_n"]), float(row["_avgdl"])


def bm25_score(
    docs: DataFrame,
    query_tokens: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    corpus_stats: tuple[int, float] | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Okapi BM25 of every document against ``query_tokens``:
    [id_col, score], descending relevance. Documents sharing no query
    term score 0 and are omitted (standard sparse behavior).
    ``ordered=False`` skips the final global sort (a range-partitioned
    exchange plus its bounds-sampling job) — pass it whenever the
    consumer destroys order anyway (a union, a join, an aggregation).

    Scale shape: tokens are filtered to the query set BEFORE any
    aggregation, the per-term df dim has |query| rows and is
    broadcast, and the final score is one per-doc aggregate. The
    (n_docs, avg_dl) corpus stats are one fused aggregate job; pass
    ``corpus_stats`` to reuse stats already computed for the same
    corpus (the standard cache of any retrieval deployment — a batch
    of differently-tokenized probes should not re-scan the corpus per
    probe)."""
    if not query_tokens:
        raise ValueError("bm25_score needs at least one query token")
    qset = sorted(set(query_tokens))
    n_docs, avg_dl = corpus_stats or bm25_corpus_stats(docs, text_col)

    q_arr = F.array(*[F.lit(t) for t in qset])
    toks = _exploded_tokens(docs, id_col, text_col).filter(
        F.array_contains(q_arr, F.col("_tok"))
    )
    terms = toks.groupBy("_id", "_tok").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    df_dim = terms.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        1.0
        + (F.lit(float(n_docs)) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    tf_part = (F.col("_tf") * (k1 + 1)) / (
        F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.lit(float(avg_dl)))
    )
    out = (
        terms.join(F.broadcast(df_dim), "_tok")
        .select("_id", (idf * tf_part).alias("_s"))
        .groupBy("_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .select(F.col("_id").alias(id_col), "score")
    )
    if ordered:
        out = out.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return out


def bm25_score_multi(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    tokens_col: str = "tokens",
    k1: float = 1.2,
    b: float = 0.75,
    corpus_stats: tuple[int, float] | None = None,
    union_tokens: Sequence[str] | None = None,
) -> DataFrame:
    """Okapi BM25 of every document against EVERY query in a query
    dim: [query_id_col, id_col, score]. The multi-query retrieval
    shape (batch scoring for eval sets, decontamination probes,
    query-targeted corpus slicing at scale).

    ``union_tokens``: the distinct union of all query tokens, when the
    caller already knows it (a literal query dim) — skips the
    plan-time distinct+collect job over the query frame (r13; the dim
    is tiny, but the job's fixed cost is paid per score build). Must
    equal the true union: a superset merely weakens the scan filter,
    but a MISSING token silently drops its contribution.

    Scale shape: corpus tokens are semi-joined against the broadcast
    union of all query tokens BEFORE any aggregation, so the explode
    pays only for matching tokens; the per-term df dim and the
    (query, token) pairs are both broadcast (they have O(|queries| *
    |query len|) rows); the only big shuffles are the (doc, token)
    partial-aggregated count and the final (query, doc) sum. Zero-
    overlap (query, doc) pairs are omitted (sparse semantics).
    Reference parity: same non-negative idf variant as
    ``bm25_score`` — ln(1 + (N - df + 0.5)/(df + 0.5))."""
    qtok = (
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.explode(F.array_distinct(F.col(tokens_col))).alias("_tok"),
        )
    )
    # the query dim is small BY DEFINITION (an eval set / probe
    # batch), so its union token set is collected once and applied as
    # a literal array_contains predicate — a scan-side filter with no
    # join build, exactly like the single-query operator. The
    # per-(query, token) pairs still ride a broadcast join for the
    # scoring fan-out.
    union_toks = (
        sorted(set(union_tokens))
        if union_tokens is not None
        else sorted(
            r["_tok"] for r in qtok.select("_tok").distinct().collect()
        )
    )
    if not union_toks:
        raise ValueError("bm25_score_multi needs at least one query token")
    n_docs, avg_dl = corpus_stats or bm25_corpus_stats(docs, text_col)

    q_arr = F.array(*[F.lit(t) for t in union_toks])
    toks = _exploded_tokens(docs, id_col, text_col).filter(
        F.array_contains(q_arr, F.col("_tok"))
    )
    terms = toks.groupBy("_id", "_tok").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )
    df_dim = terms.groupBy("_tok").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        1.0
        + (F.lit(float(n_docs)) - F.col("_df") + 0.5) / (F.col("_df") + 0.5)
    )
    tf_part = (F.col("_tf") * (k1 + 1)) / (
        F.col("_tf") + k1 * (1 - b + b * F.col("_dl") / F.lit(avg_dl))
    )
    return (
        terms.join(F.broadcast(df_dim), "_tok")
        .select("_id", "_tok", (idf * tf_part).alias("_s"))
        .join(F.broadcast(qtok), "_tok")
        .groupBy("_qid", "_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            "score",
        )
    )


def ranking_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    score_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Retrieval-quality metrics per query over a run (ranked results)
    and graded relevance judgments: [query_col, ndcg_at_k, mrr,
    precision_at_k, recall_at_k, n_rel].

    The evaluator every retrieval/dedup component needs once it ships:
    nDCG@k with graded gains (2^rel - 1) and ln(rank+1)/ln(2)
    discounts, reciprocal rank of the first relevant hit, and
    binary precision/recall@k. Ranks are row_number over
    (score desc, id asc) — the score should already be rounded so the
    tie order is engine-portable. All of it is two windows plus one
    aggregate per side, keyed on the query id: JVM-side expressions
    only, shuffles bounded by O(|runs|), no driver state — the same
    plan at 100 TB of run rows."""
    from pyspark.sql import Window

    ln2 = F.log(F.lit(2.0))
    run_rank = Window.partitionBy("_q").orderBy(
        F.col("_s").desc(), F.col("_d").asc()
    )
    joined = (
        runs.select(
            F.col(query_col).alias("_q"),
            F.col(id_col).alias("_d"),
            F.col(score_col).alias("_s"),
        )
        .join(
            qrels.select(
                F.col(query_col).alias("_q"),
                F.col(id_col).alias("_d"),
                F.col(rel_col).alias("_rel"),
            ),
            ["_q", "_d"],
            "left",
        )
        .fillna(0, subset=["_rel"])
        .withColumn("_rank", F.row_number().over(run_rank))
    )
    gain = F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0)
    disc = F.log(F.col("_rank") + F.lit(1.0)) / ln2
    got = joined.groupBy("_q").agg(
        F.sum(
            F.when(F.col("_rank") <= k, gain / disc).otherwise(F.lit(0.0))
        ).alias("_dcg"),
        F.min(F.when(F.col("_rel") > 0, F.col("_rank"))).alias("_first"),
        F.sum(
            ((F.col("_rank") <= k) & (F.col("_rel") > 0)).cast("long")
        ).alias("_hits"),
    )

    ideal_rank = Window.partitionBy("_q").orderBy(
        F.col("_rel").desc(), F.col("_d").asc()
    )
    rel_only = qrels.select(
        F.col(query_col).alias("_q"),
        F.col(id_col).alias("_d"),
        F.col(rel_col).alias("_rel"),
    ).filter(F.col("_rel") > 0)
    ideal = (
        rel_only.withColumn("_irank", F.row_number().over(ideal_rank))
        .groupBy("_q")
        .agg(
            F.sum(
                F.when(
                    F.col("_irank") <= k,
                    (F.pow(F.lit(2.0), F.col("_rel")) - F.lit(1.0))
                    / (F.log(F.col("_irank") + F.lit(1.0)) / ln2),
                ).otherwise(F.lit(0.0))
            ).alias("_idcg"),
            F.count(F.lit(1)).alias("_nrel"),
        )
    )
    # universe = queries with >=1 relevant judgment (trec_eval's rule:
    # queries with no relevant docs are excluded — their ideal DCG is
    # undefined). LEFT join from that universe: a judged query the run
    # retrieved NOTHING for must report zeros, not vanish — an inner
    # join here made total retrieval failures IMPROVE the averages.
    return (
        ideal.join(got, "_q", "left")
        .select(
            F.col("_q").alias(query_col),
            F.round(
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.col("_idcg"), 6
            ).alias("ndcg_at_k"),
            F.round(
                F.coalesce(F.lit(1.0) / F.col("_first"), F.lit(0.0)), 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("_hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("precision_at_k"),
            F.round(
                F.coalesce(F.col("_hits"), F.lit(0)) / F.col("_nrel"), 6
            ).alias("recall_at_k"),
            F.col("_nrel").cast("long").alias("n_rel"),
        )
    )

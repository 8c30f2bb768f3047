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


def _doc_terms(
    docs: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """[id, token, tf (count in doc), dl (doc token length)]."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.size(ws_tokens(text_col)).alias("_dl"),
        F.explode(ws_tokens(text_col)).alias("_tok"),
    )
    return toks.groupBy("_id", "_tok").agg(
        F.count(F.lit(1)).alias("_tf"), F.first("_dl").alias("_dl")
    )


def tf_idf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Full TF-IDF matrix: [id_col, token, tf, df, tfidf] with
    tfidf = (tf / dl) * ln(N / df). One token explode, two aggregates,
    one join on the token."""
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


def bm25_score(
    docs: DataFrame,
    query_tokens: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 of every document against ``query_tokens``:
    [id_col, score], descending relevance. Documents sharing no query
    term score 0 and are omitted (standard sparse behavior).

    Scale shape: tokens are filtered to the query set BEFORE any
    aggregation, the per-term df dim has |query| rows and is
    broadcast, and the final score is one per-doc aggregate."""
    if not query_tokens:
        raise ValueError("bm25_score needs at least one query token")
    qset = sorted(set(query_tokens))
    n_docs = docs.count()
    avg_dl = docs.select(
        F.avg(F.size(ws_tokens(text_col))).alias("a")
    ).collect()[0]["a"]

    q_arr = F.array(*[F.lit(t) for t in qset])
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.size(ws_tokens(text_col)).alias("_dl"),
        F.explode(ws_tokens(text_col)).alias("_tok"),
    ).filter(F.array_contains(q_arr, F.col("_tok")))
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
    return (
        terms.join(F.broadcast(df_dim), "_tok")
        .select("_id", (idf * tf_part).alias("_s"))
        .groupBy("_id")
        .agg(F.round(F.sum("_s"), 6).alias("score"))
        .select(F.col("_id").alias(id_col), "score")
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
    )

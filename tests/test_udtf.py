"""Python UDTF certification (Spark 4 surface)."""

from __future__ import annotations


def test_split_sentences_udtf(spark):
    from bbdc20_submission_spark.functions.udtf_ops import SplitSentences

    spark.udtf.register("split_sentences", SplitSentences)
    df = spark.createDataFrame(
        [(1, "Hello there. How are you? Fine!"), (2, "no terminator")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("docs")
    rows = spark.sql(
        """
        SELECT doc_id, s.sent_idx, s.sentence
        FROM docs, LATERAL split_sentences(text) AS s
        ORDER BY doc_id, sent_idx
        """
    ).collect()
    got = [(r["doc_id"], r["sent_idx"], r["sentence"]) for r in rows]
    assert got == [
        (1, 0, "Hello there."),
        (1, 1, "How are you?"),
        (1, 2, "Fine!"),
        (2, 0, "no terminator"),
    ]

"""Streaming curation: the stateless slice of the batch curation DAG
applied to an unbounded document stream.

Quality scoring, language ID, repetition filtering, PII scrubbing and
token chunking are all NARROW operations, so the exact same operator
functions compose over a streaming DataFrame with no watermarks, no
joins and no state store — each micro-batch is a pure map. The
stateful stages of the batch DAG (exact/near dedup, cross-document
boilerplate) are deliberately excluded: unbounded exact dedup belongs
to ``streaming.windows.stream_dedup`` (keyed state with watermark
eviction), and near-dup/boilerplate detection over an infinite corpus
needs a bounded reference index — at scale that is a periodically
rebuilt BATCH artifact joined stream-static
(``streaming.joins.stream_static_enrich``), not stream state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbdc20_submission_spark.operators.chunking import chunk_by_tokens, scrub_text
from bbdc20_submission_spark.operators.text import (
    language_id,
    quality_score,
    with_repetition_flag,
)


def stream_curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    keep_langs: tuple[str, ...] = ("en", "de", "es", "fr"),
    chunk_tokens: int = 32,
    apply_repetition_filter: bool = True,
    blocked_sources: tuple[str, ...] | None = None,
    source_col: str = "source",
) -> DataFrame:
    """(Source blocklist ->) quality + language (+ repetition) filter
    -> PII scrub -> token chunking as ONE stateless plan: projections,
    filters and a generator explode — zero joins, zero shuffles, zero
    state. ``blocked_sources`` mirrors the batch DAG's stage 0 (one
    more narrow predicate; on a file-source stream it still pushes to
    the scan).

    Output: [id_col, chunk_id, chunk_text, n_tokens, lang_pred,
    quality]. The function is agnostic to the input being a stream or
    a batch frame (the operators don't know the difference), so tests
    certify stream output == batch output on identical data.

    Scale note (r10, measured in SCALING.md): the plan is a pure map,
    so a micro-batch's wall clock is (fixed trigger cost) + (per-doc
    work) / (input splits in the trigger) — parallelism comes ONLY
    from the file/split count of the batch, since there is no shuffle
    to rebalance behind. Two sizing rules follow for a file-source
    deployment: (1) scale the trigger budget with arrival volume
    (``maxBytesPerTrigger``, or ``maxFilesPerTrigger`` proportional to
    files-per-interval) so trigger count — and its fixed cost — stays
    constant as the corpus grows; a budget frozen while volume grows
    16x pays 16x the fixed cost. (2) keep upstream files at (or split
    oversized files via ``spark.sql.files.maxPartitionBytes``) a size
    that yields at least one split per core per trigger — a trigger
    whose batch is one small file runs the whole map on one core no
    matter how large the cluster."""
    if blocked_sources:
        from bbdc20_submission_spark.plans.curation import (
            source_blocklist_filter,
        )

        docs = source_blocklist_filter(docs, blocked_sources, source_col)
    scored = language_id(quality_score(docs, text_col), text_col)
    filtered = scored.filter(
        (F.col("quality") >= min_quality)
        & F.col("lang_pred").isin(*keep_langs)
    )
    if apply_repetition_filter:
        filtered = (
            with_repetition_flag(filtered, text_col)
            .filter(F.col("repetition_ok") == 1)
            .drop("repetition_ok")
        )
    scrubbed = scrub_text(filtered, text_col, out_col="_scrubbed").select(
        id_col,
        F.col("_scrubbed").alias(text_col),
        "lang_pred",
        "quality",
    )
    return chunk_by_tokens(
        scrubbed,
        text_col,
        id_col,
        chunk_tokens=chunk_tokens,
        keep_cols=["lang_pred", "quality"],
    )

"""Data-layout control for scan pruning at scale.

At 100 TB the cheapest query is the one that never reads the bytes:
parquet readers skip whole row groups whose column min/max statistics
exclude the predicate. Those statistics only help if the writer
CLUSTERS values — a randomly-ordered table has every row group
spanning the full value range, and min/max pruning does nothing.

``write_range_sorted`` lays a table out as
``repartitionByRange(sort_cols)`` + ``sortWithinPartitions`` before
the parquet write: globally range-partitioned files, internally sorted
row groups, so both file-level and row-group-level stats become tight,
disjoint intervals. A predicate on the sort prefix then prunes most of
the table at scan time (PushedFilters do the skipping JVM-side; no
extra index service needed). This is the single biggest scan lever
for time-series fact tables — sort by (ts) or (key, ts) once at
ingest, and every downstream window/as-of/interval query reads only
its slice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_cols: Sequence[str],
    n_files: int | None = None,
) -> None:
    """Write ``df`` as parquet range-clustered on ``sort_cols``.

    ``n_files`` bounds the output file count (defaults to the session
    shuffle parallelism). Files cover disjoint sort-key ranges; rows
    inside each file are sorted, so row-group min/max stats are tight."""
    cols = [df[c] for c in sort_cols]
    part = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Plain parquet read of a range-sorted table; filters on the sort
    prefix prune files/row groups via the written statistics."""
    return spark.read.parquet(path)


def write_training_shards(
    chunks: DataFrame,
    path: str,
    budget_tokens: int = 1024,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    tokens_col: str = "n_tokens",
) -> None:
    """The trainer-ready SINK: pack curated chunks into fixed-budget
    training sequences (``operators.chunking.pack_sequences``) and lay
    them out as one parquet partition directory per pack bucket, rows
    sorted by (seq_id, seq_pos) inside each file — so a data loader
    streams each shard front to back and sees whole sequences in
    order, with no shuffle or sort at training time.

    Layout mechanics: ``repartition(pack_bucket)`` puts each bucket in
    exactly one task -> exactly one file under its
    ``pack_bucket=<b>/`` directory; ``sortWithinPartitions`` orders
    the file physically; ``partitionBy`` makes bucket selection a
    directory prune. ``n_buckets`` is simultaneously the shard count,
    the write parallelism, and the trainer's data-parallel fan-out —
    at cluster scale set it to a multiple of the reader count.
    Everything upstream of the write is the deterministic
    pack_sequences assignment, so re-running produces byte-identical
    shard membership (reproducible training order)."""
    from bbdc20_submission_spark.operators.chunking import pack_sequences

    packed = pack_sequences(
        chunks,
        budget_tokens=budget_tokens,
        n_buckets=n_buckets,
        id_col=id_col,
        chunk_col=chunk_col,
        tokens_col=tokens_col,
    )
    (
        packed.repartition(n_buckets, "pack_bucket")
        .sortWithinPartitions("seq_id", "seq_pos")
        .write.mode("overwrite")
        .partitionBy("pack_bucket")
        .parquet(path)
    )

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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


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


def _quantile_bucket(col: str, bounds: list[float]) -> Column:
    """Bucket index of ``col`` in rank space: the count of quantile
    boundaries <= value. A pure JVM-side fold over the (2^bits - 1)-
    element literal boundary array — O(2^bits) comparisons per row in
    whole-stage codegen, no shuffle, no UDF. Quantile (not uniform
    width_bucket) buckets keep the z-curve balanced under skew: each
    bucket holds ~the same row count, so every output file covers a
    comparably-sized data rectangle."""
    arr = F.array(*[F.lit(float(b)) for b in bounds])
    v = F.col(col).cast("double")
    return F.size(F.filter(arr, lambda b: b <= v))


def _interleave_bits(buckets: Sequence[Column], bits: int) -> Column:
    """Morton/Z-value of k ``bits``-bit bucket indices: bit i of
    bucket j lands at position i*k + (k-1-j) — round-robin interleave,
    highest-order bits first, column order = priority within a round.
    Built as a fold of shift/mask expressions — stays inside codegen.
    k*bits must fit a signed long (<= 62)."""
    k = len(buckets)
    # cast to LONG before shifting: an INT bucket shifted to position
    # >= 31 overflows into the int sign bit and sign-extends through
    # the OR (k=4 x bits=8 reaches exactly position 31)
    buckets = [b.cast("long") for b in buckets]
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1).cast("long")),
                    i * k + (k - 1 - j),
                )
            )
    return z


def _reservoir_sample_rows(df: DataFrame, cap: int, seed: int = 0x5EED) -> list:
    """Collect at most ~``cap`` rows drawn UNIFORMLY from each
    partition via a seeded reservoir (Algorithm R with a
    ``random.Random((seed << 16) ^ partition_index)`` RNG):

    - unbiased within every partition, unlike a per-partition head —
      an input sorted within partitions (the typical time-axis layout
      this module writes) contributes rows from its WHOLE range;
    - deterministic for a fixed input layout (pure function of the
      partition contents + seed), unlike LIMIT/sample-free paths
      whose result depends on task completion order;
    - bounded: exactly ``cap // num_partitions`` rows of driver and
      per-task memory, one narrow pass, no prior ``count()`` job.

    The RDD hop deserializes only the projected columns (callers
    project to the 2–4 z-columns first), so the pass stays cheap even
    where the table itself is wide."""
    n_parts = max(df.rdd.getNumPartitions(), 1)
    per = max(1, cap // n_parts)

    def _part(idx, it):
        import random

        rng = random.Random((seed << 16) ^ idx)
        buf: list = []
        for i, row in enumerate(it):
            if i < per:
                buf.append(row)
            else:
                j = rng.randint(0, i)
                if j < per:
                    buf[j] = row
        return iter(buf)

    return df.rdd.mapPartitionsWithIndex(_part).collect()


def write_zorder(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 32,
    bits: int = 8,
    quantile_error: float = 0.001,
) -> None:
    """Write ``df`` parquet Z-ORDERED on 2..4 columns: multi-
    dimensional clustering, so min/max footer stats prune scans
    filtered on ANY of the z-columns (or several at once).

    ``write_range_sorted`` makes one dimension prunable and leaves the
    others useless (every file spans the full range of a non-prefix
    column). Interleaving the bits of the columns' quantile-bucket
    indices (a Morton curve) makes each range-partitioned output file
    cover a small HYPER-RECTANGLE in value space — with ``n_files``
    files over k columns, a point predicate on any single column
    intersects only ~n_files^((k-1)/k) of them instead of all. This
    is the standard lakehouse layout for fact tables queried along
    independent axes (e.g. time + key + tenant).

    Scale shape: the per-column boundary arrays (2^bits - 1 doubles
    each, constant size regardless of row count) are fit DRIVER-side
    as exact quantiles of a bounded sample drawn by a SEEDED
    PER-PARTITION RESERVOIR (``_reservoir_sample_rows``) — uniform
    over each partition's rows, deterministic for a fixed input
    layout, and exactly ``cap // num_partitions`` rows of driver
    memory per partition with no prior ``count()`` job. A
    per-partition HEAD here would be wrong in exactly the case this
    writer targets: fact tables arriving sorted within partitions by
    a z-column (time axes), where the head sees only the low end of
    that column and collapses its boundaries so most rows interleave
    into one extreme bucket. ``df.approxQuantile`` was the earliest
    fit; its Greenwald-Khanna summaries merge in task-completion
    order, so the boundaries (and therefore the whole file layout)
    differed run to run under load — a layout writer must be
    reproducible. Bucketing + bit interleave are narrow codegen
    expressions; then exactly the same repartitionByRange +
    sortWithinPartitions write as the 1-D layout. No UDFs, no second
    shuffle, no index service. (``quantile_error`` is kept for API
    compatibility; sampling error replaces summary error as the
    approximation term, and equi-depth boundaries only need to be
    roughly balanced.)"""
    cols = list(cols)
    if not 2 <= len(cols) <= 4:
        raise ValueError(f"write_zorder needs 2..4 columns, got {len(cols)}")
    if len(cols) * bits > 62:
        raise ValueError(
            f"{len(cols)} cols x {bits} bits = {len(cols) * bits} z-bits"
            " exceeds a signed long (max 62)"
        )
    import numpy as np

    probs = [i / (1 << bits) for i in range(1, 1 << bits)]
    sample = _reservoir_sample_rows(
        df.select(*[F.col(c).cast("double").alias(c) for c in cols]).na.drop(),
        262_144,
    )
    if not sample:
        raise ValueError("write_zorder: no non-null rows to fit boundaries on")
    X = np.asarray([[r[c] for c in cols] for r in sample], dtype=np.float64)
    qs = [np.quantile(X[:, i], probs).tolist() for i in range(len(cols))]
    z = _interleave_bits(
        [_quantile_bucket(c, q) for c, q in zip(cols, qs)], bits
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


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
    epoch: int | None = None,
    seed: int = 7,
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
    shard membership (reproducible training order).

    ``epoch``: write the EPOCH-SHUFFLED layout instead — sequences are
    redistributed across ``epoch_shard=<s>/`` directories and ordered
    inside each file by their seeded per-epoch key
    (:func:`operators.chunking.epoch_order`), so every epoch's full
    pseudorandom training order is a fresh directory a loader streams
    front to back, sequences kept whole (the shard and the in-file
    position both derive from the sequence-level key). Deterministic
    per (seed, epoch) — re-materializing any epoch reproduces its
    exact order, which is what makes a run resumable mid-epoch."""
    from bbdc20_submission_spark.operators.chunking import (
        epoch_order,
        pack_sequences,
    )

    packed = pack_sequences(
        chunks,
        budget_tokens=budget_tokens,
        n_buckets=n_buckets,
        id_col=id_col,
        chunk_col=chunk_col,
        tokens_col=tokens_col,
    )
    if epoch is None:
        (
            packed.repartition(n_buckets, "pack_bucket")
            # leading partition column: see the epoch branch — the
            # writer would otherwise insert its own (not-promised-
            # stable) pack_bucket sort above this one
            .sortWithinPartitions("pack_bucket", "seq_id", "seq_pos")
            .write.mode("overwrite")
            .partitionBy("pack_bucket")
            .parquet(path)
        )
        return
    keyed = epoch_order(packed, epoch, seed=seed).withColumn(
        "epoch_shard", F.pmod(F.col("epoch_key"), F.lit(n_buckets))
    )
    (
        keyed.repartition(n_buckets, "epoch_shard")
        # the sort LEADS with the partition column: FileFormatWriter
        # requires rows sorted by partitionBy columns and would insert
        # its own epoch_shard-only sort otherwise — which does not
        # promise stability, so the within-shard (epoch_key, seq_pos)
        # order could scramble (observed). With the prefix in place
        # the incoming order satisfies the writer and is preserved.
        .sortWithinPartitions("epoch_shard", "epoch_key", "seq_pos")
        .write.mode("overwrite")
        .partitionBy("epoch_shard")
        .parquet(path)
    )

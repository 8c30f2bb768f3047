"""Incremental ingest dedup: deduplicate a NEW batch of documents
against an existing corpus INDEX — the daily-ingestion shape of a
training-data pipeline, where re-reading (or re-shuffling) the 100 TB
historical corpus per batch is off the table.

The index is one compact frame per historical doc:

    [_id, content_hash, h0..h{n-1}]

i.e. the md5 content hash plus the MinHash signature — a few dozen
bytes per document regardless of text size. ``build_dedup_index``
produces it (callers persist it to storage between batches);
``incremental_dedup`` consumes it and returns the surviving new docs
plus the updated index for the next batch.

Semantics notes:
  * exact dedup vs the index and within the batch is EXACT (md5);
  * near-dup vs the index is decided on the SIGNATURE-ESTIMATED
    Jaccard (fraction of agreeing MinHash slots — the unbiased
    estimator; the historical text is gone, so exact verification is
    impossible by design and the estimator's variance is the standard
    trade of index-based incremental dedup);
  * near-dup WITHIN the batch uses the full exact-verify path
    (banded candidates from the batch's OWN index signatures ->
    exact Jaccard -> connected components), since the batch text is
    on hand; reusing the index signatures means one signature pass
    per batch, and in portable mode the candidate set is an exact
    function of md5 (externally reproducible, no recall assumption).

Scale shape: everything joins on hashes/band buckets — text never
enters a shuffle; index-side banding is a narrow transform over the
fixed-width signature columns; the per-batch cost is O(batch) plus
one signature-width join against the (hash-partitioned) index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbdc20_submission_spark.caching import managed_persist
from bbdc20_submission_spark.operators.chunking import dedup_clusters
from bbdc20_submission_spark.operators.dedup import (
    hashed_shingle_sets,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures_df,
)


def build_dedup_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 16,
    portable: bool = False,
) -> DataFrame:
    """Build the per-doc dedup index frame: [_id, content_hash,
    h0..h{n-1}]. One pass over the corpus (hash + the signature
    aggregation); the output is what a deployment persists between
    ingestion batches.

    ``portable=True``: md5-based signatures (engine-reproducible —
    the certification mode; see ``minhash_signatures_df``). An index
    must be consumed with the same mode it was built with."""
    hashes = df.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("content_hash")
    )
    sigs = minhash_signatures_df(
        df, id_col, text_col, shingle_k, num_hashes, portable=portable
    )
    return hashes.join(sigs, "_id")


def _banded(index: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Band the signature columns: [_id, band, bucket]."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}); a remainder would silently drop the trailing "
            "signature columns and lower recall"
        )
    rows_per_band = num_hashes // bands
    # ONE parsed SQL expression (r13 build sweep): the per-band
    # struct/lit/xxhash Column assembly cost ~40+ py4j round trips per
    # call and _dedup_batch bands three frames per batch; the string
    # is sameSemantics-identical (xxhash64's default seed 42 both ways)
    structs = ",".join(
        "named_struct('band', %d, 'bucket', xxhash64(concat_ws(',', %s)))"
        % (
            b,
            ",".join(
                f"h{b * rows_per_band + r}" for r in range(rows_per_band)
            ),
        )
        for b in range(bands)
    )
    # inline() explodes the struct array straight to (band, bucket) —
    # one projection instead of explode + unpack (r14)
    return index.selectExpr("_id", f"inline(array({structs}))")


def incremental_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
    portable: bool = False,
    batch_index: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Dedup ``new_docs`` against ``index`` (from
    :func:`build_dedup_index`, same shingle/signature params) AND
    within itself. Returns ``(kept_new_docs, updated_index)`` where
    the updated index covers the historical corpus plus the survivors.

    ``batch_index``: a pre-built, ALREADY-MATERIALIZED
    ``build_dedup_index(new_docs)`` frame (same params/mode) — pass it
    when the caller overlapped the history- and batch-index builds as
    concurrent jobs (guide §2.6 back-fill; the two builds are
    independent, so running them serially leaves the cluster idle
    through each one's straggler tail). Skips the internal build +
    checkpoint; decisions are identical because the frame is the same
    computation.

    Order of elimination (cheapest first): exact-vs-index anti-join,
    exact-within-batch (keep lowest id), near-vs-index (band-bucket
    join + signature-estimated Jaccard >= ``min_jaccard``),
    near-within-batch (exact-verified LSH + components, keep each
    cluster's representative).

    ``portable=True``: the batch's index rows use the md5-based
    engine-portable signatures — REQUIRED when ``index`` was built
    with ``build_dedup_index(portable=True)`` (slot agreement across
    mixed hash families is meaningless). The within-batch verify path
    is mode-independent: its candidates are exact-Jaccard-verified,
    so the emitted decisions depend only on text."""
    kept, appended = _dedup_batch(
        new_docs, index, id_col, text_col, shingle_k, num_hashes,
        bands, min_jaccard, portable=portable, batch_index=batch_index,
    )
    return kept, index.unionByName(appended)


def _dedup_batch(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str,
    text_col: str,
    shingle_k: int,
    num_hashes: int,
    bands: int,
    min_jaccard: float,
    portable: bool = False,
    batch_index: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Core of :func:`incremental_dedup`: returns ``(kept_new_docs,
    appended_index_rows)`` — the survivors plus exactly their index
    rows, sliced from the ALREADY-COMPUTED batch index (checkpointed
    below unless the caller pre-built it), so no caller pays a second
    md5 + MinHash pass to persist the updated index."""
    if batch_index is not None:
        # r14 (advice): a pre-built frame produced with different
        # num_hashes (or not an index at all) would yield silently
        # wrong dedup decisions — catch param drift on the column set,
        # the cheapest check that distinguishes every such mismatch
        expected = {"_id", "content_hash", *(f"h{s}" for s in range(num_hashes))}
        got = set(batch_index.columns)
        if got != expected:
            raise ValueError(
                "incremental_dedup: batch_index columns do not match "
                f"num_hashes={num_hashes} "
                f"(missing {sorted(expected - got)}, "
                f"unexpected {sorted(got - expected)}); it must be "
                "build_dedup_index(new_docs) with the caller's params"
            )
    if batch_index is None:
        batch_index = build_dedup_index(
            new_docs, id_col, text_col, shingle_k, num_hashes,
            portable=portable,
        )
        # one row per batch doc, a few dozen bytes each; consumed by
        # the exact filter, the banding, the estimate join, AND the
        # appended slice — materialize once instead of re-running the
        # signature aggregation per consumer
        batch_index = batch_index.localCheckpoint()

    # 1. exact vs index (hash-only anti-join)
    fresh = batch_index.join(
        index.select("content_hash"), "content_hash", "left_anti"
    )
    # 2. exact within batch: lowest id per content group (the index
    # frame already carries the content key, so this is a direct
    # groupBy — the same keep-lowest rule as exact_dedup_groups)
    keep = fresh.groupBy("content_hash").agg(F.min("_id").alias("_id"))
    fresh = fresh.join(keep.select("_id"), "_id", "left_semi")

    # 3. near-dup vs index: band join, then estimated Jaccard
    nb = _banded(fresh, num_hashes, bands).withColumnRenamed("_id", "_new")
    ob = _banded(index, num_hashes, bands).withColumnRenamed("_id", "_old")
    cand = (
        nb.join(ob, ["band", "bucket"])
        .select("_new", "_old")
        .distinct()
    )
    # selectExpr strings (r13 build sweep): the 2*num_hashes aliased
    # renames plus the agreement sum cost ~150 py4j round trips as
    # Column ops; integer adds are exact, so dropping Python sum()'s
    # leading 0 literal changes no value
    est = (
        cand.join(
            fresh.selectExpr(
                "_id AS _new",
                *[f"h{s} AS a{s}" for s in range(num_hashes)],
            ),
            "_new",
        )
        .join(
            index.selectExpr(
                "_id AS _old",
                *[f"h{s} AS b{s}" for s in range(num_hashes)],
            ),
            "_old",
        )
        .selectExpr(
            "_new",
            "(%s) / %rD AS _est_j"
            % (
                " + ".join(
                    f"(CASE WHEN a{s} = b{s} THEN 1 ELSE 0 END)"
                    for s in range(num_hashes)
                ),
                float(num_hashes),
            ),
        )
    )
    near_old = est.filter(F.col("_est_j") >= min_jaccard).select("_new").distinct()
    fresh = fresh.join(near_old, fresh["_id"] == near_old["_new"], "left_anti")
    # fresh feeds FOUR consumers below (both band sides of the
    # within-batch candidate self-join, the survivor semi-join, and —
    # via kept — the appended-index slice); without a checkpoint each
    # re-derives the keep/anti join chain above, and under AQE every
    # re-derived exchange is its own stage job — the flow's cost is
    # driver round-trips, not data (63 jobs / ~7.8 s at sf0.1 before,
    # ~2/3 of it planning gaps)
    fresh = fresh.localCheckpoint()

    # 4. near-dup within the batch: exact-verified path on the text.
    # Candidates come from banding the BATCH INDEX signatures the
    # survivors already carry (fresh is a slice of batch_index) — one
    # signature pass per batch instead of a second from-scratch
    # MinHash, and in portable mode the candidate set is an exact
    # function of md5, so an external engine reproduces it without
    # any recall assumption (the certification need behind the
    # r8 rewrite; the old path re-derived xxhash64 signatures via
    # minhash_lsh_candidates).
    surv_docs = new_docs.join(
        fresh.select(F.col("_id").alias(id_col)), id_col, "left_semi"
    )
    sbl = _banded(fresh, num_hashes, bands)
    sbr = sbl.withColumnRenamed("_id", "_id2")
    cands = (
        sbl.join(sbr, ["band", "bucket"])
        .filter(F.col("_id") < F.col("_id2"))
        .select(F.col("_id").alias("id_a"), F.col("_id2").alias("id_b"))
        .distinct()
    )
    sets = managed_persist(
        hashed_shingle_sets(surv_docs, id_col, text_col, shingle_k)
    )
    # shingle_k MUST flow through: verifying at a different k than the
    # candidates/signatures silently shifts the effective threshold
    pairs = jaccard_pairs(
        surv_docs, cands, id_col, text_col, shingle_k=shingle_k,
        min_jaccard=min_jaccard, sets=sets,
    ).filter(F.col("jaccard") >= min_jaccard)
    # the id spine handed to dedup_clusters is the CHECKPOINTED fresh
    # frame's ids (identical to surv_docs' id set by construction) —
    # the cluster-label frame and everything derived from it then
    # re-reads a materialized slice instead of re-running the
    # new_docs scan + fresh semi-join under every reference. The
    # expensive decisions (LSH verify + components) are all collapsed
    # into dedup_clusters' one bounded edge job, so rep_ids is cheap
    # by construction (checkpoint scan + broadcast label join on the
    # driver path; checkpoint-backed CC labels above the edge bound)
    # and the earlier eager `kept` checkpoint became pure overhead:
    # both downstream consumers (the survivor frame and the
    # appended-index slice) now hang off rep_ids directly (r14,
    # guide §5 — one fewer full-text materialization per batch).
    rep_ids = dedup_clusters(
        fresh.select(F.col("_id").alias(id_col)), pairs, id_col
    ).filter(~F.col("is_duplicate")).select(id_col)
    kept = surv_docs.join(rep_ids, id_col, "left_semi")
    appended = batch_index.join(
        rep_ids.select(F.col(id_col).alias("_id")), "_id", "left_semi"
    )
    return kept, appended


def build_semantic_index(
    df: DataFrame,
    model,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The embedding-side ingest-dedup index: [_id, _v, cluster] —
    every vector cell-assigned with a PRE-FIT coarse quantizer
    (:class:`clustering.CentroidQuantizer`; fit once per corpus, load
    per batch — the same fit-once artifact the IVF operators reuse).
    One narrow assignment pass; NULL vectors carry no geometry and are
    excluded (they can never be near-duplicates). Callers persist the
    frame between ingestion batches."""
    from bbdc20_submission_spark.operators.clustering import _with_cluster

    arr = F.col(vec_col).cast("array<double>")
    return _with_cluster(
        df.select(F.col(id_col).alias("_id"), arr.alias("_v")).filter(
            F.col("_v").isNotNull()
        ),
        model.centers,
        "_v",
    )


def incremental_semantic_dedup(
    new_vecs: DataFrame,
    index: DataFrame,
    model,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cap: int = 4096,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup for the DAILY-INGEST shape: semantically deduplicate a
    NEW embedding batch against a historical vector ``index`` (from
    :func:`build_semantic_index`, SAME quantizer) AND within itself,
    without re-shuffling the historical corpus — only the index cells
    the batch actually touches do any pair work.

    Keeper preference: any historical cell-mate with cosine >=
    ``threshold`` beats the batch (lowest historical id reported);
    otherwise the lowest-id new cell-mate keeps (the batch-internal
    SemDeDup rule). Returns ``(kept_new_vecs, updated_index)`` where
    the updated index covers the historical vectors plus the
    survivors' index rows (sliced from the batch assignment — no
    second assignment pass).

    Scale shape: the batch is assigned with the pre-fit quantizer
    (one narrow pass), the per-cell pair work runs as the same blocked
    numpy Gram applyInPandas as :func:`clustering.semantic_dedup`
    (vectors shuffle once, by cell), and hot cells are hash-split at
    ``cap`` members with the usual recall trade. The historical side
    shuffles only the touched cells' rows; at 100 TB the index is
    stored cell-partitioned so that shuffle is a partition-pruned
    read, not a reshuffle."""
    kept, appended = _semantic_dedup_batch(
        new_vecs, index, model, threshold, id_col, vec_col, cap
    )
    return kept, index.unionByName(appended)


def _semantic_dedup_batch(
    new_vecs: DataFrame,
    index: DataFrame,
    model,
    threshold: float,
    id_col: str,
    vec_col: str,
    cap: int,
) -> tuple[DataFrame, DataFrame]:
    """Core of :func:`incremental_semantic_dedup`: returns
    ``(kept_new_vecs, appended_index_rows)`` — the survivors plus
    exactly their index rows, sliced from the ALREADY-COMPUTED batch
    assignment (checkpointed below), so no caller pays a second
    assignment pass to persist the updated index."""
    from bbdc20_submission_spark.operators.dedup import _cap_buckets

    batch_index = build_semantic_index(
        new_vecs, model, id_col=id_col, vec_col=vec_col
    ).localCheckpoint()

    touched = batch_index.select("cluster").distinct()
    old = index.join(F.broadcast(touched), "cluster", "left_semi").withColumn(
        "_is_new", F.lit(False)
    )
    both = _cap_buckets(
        old.unionByName(batch_index.withColumn("_is_new", F.lit(True))),
        ["cluster"], "_id", cap,
    )

    id_type = batch_index.schema["_id"].dataType.simpleString()
    thr = float(threshold)

    def _cell_prune(pdf):
        import numpy as np
        import pandas as pd

        new_mask_all = pdf["_is_new"].to_numpy()
        if len(pdf) < 2 or not new_mask_all.any():
            empty = pdf["_id"][:0]
            return pd.DataFrame({"_ida": empty, "keeper_id": empty})
        ids_all = pdf["_id"].to_numpy()
        vecs = pdf["_v"].to_numpy()
        out_i: list = []
        out_k: list = []
        # same degenerate-vector contract as clustering._cell_keepers:
        # group by vector length (ragged pairs are never similar —
        # zip_with cosine is NULL) and drop non-finite vectors (their
        # cosine is undefined; they are never pruned, never keepers)
        lens = np.fromiter((len(v) for v in vecs), dtype=np.int64, count=len(vecs))
        for L in np.unique(lens):
            sub = np.flatnonzero(lens == L)
            if len(sub) < 2:
                continue
            X = np.asarray([np.asarray(vecs[i], dtype=np.float64) for i in sub])
            finite = np.isfinite(X).all(axis=1)
            sub, X = sub[finite], X[finite]
            if len(sub) < 2:
                continue
            ids = ids_all[sub]
            is_new_g = new_mask_all[sub]
            # historical rows first (lowest id first), then new rows
            # by id: "first match" below is the keeper preference
            order = sorted(
                range(len(sub)), key=lambda i: (bool(is_new_g[i]), ids[i])
            )
            ids = ids[order]
            is_new = is_new_g[order]
            X = X[order]
            norms = np.sqrt((X * X).sum(axis=1))
            n = len(ids)
            B = 1024
            for s in range(1, n, B):
                e = min(s + B, n)
                with np.errstate(divide="ignore", invalid="ignore"):
                    S = (X[s:e] @ X[:e].T) / np.outer(norms[s:e], norms[:e])
                rows_abs = np.arange(s, e)
                # a NEW row is pruned by anything EARLIER in the order
                # (historical rows and lower-id new rows); historical
                # rows are never pruned
                mask = (
                    (S >= thr)
                    & (np.arange(e)[None, :] < rows_abs[:, None])
                    & is_new[s:e][:, None]
                )
                hit = mask.any(axis=1)
                first = mask.argmax(axis=1)
                out_i.extend(ids[rows_abs[hit]])
                out_k.extend(ids[first[hit]])
        if not out_i:
            empty = pdf["_id"][:0]
            return pd.DataFrame({"_ida": empty, "keeper_id": empty})
        return pd.DataFrame({"_ida": out_i, "keeper_id": out_k})

    pruned = both.groupBy("cluster", "sub_bucket").applyInPandas(
        _cell_prune, schema=f"_ida {id_type}, keeper_id {id_type}"
    )
    kept = new_vecs.join(
        pruned.select(F.col("_ida").alias(id_col)), id_col, "left_anti"
    ).localCheckpoint()
    appended = batch_index.join(
        kept.select(F.col(id_col).alias("_id")), "_id", "left_semi"
    )
    return kept, appended


def stream_incremental_exact_filter(
    stream: DataFrame,
    index: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """STREAMING ingest dedup against the historical index: drop any
    streamed doc whose content hash already exists in the index — a
    stateless stream-static anti-join on md5 (the index's hash column
    rides as a broadcast dim; the stream never shuffles and needs no
    state store). Near-dup filtering on a stream follows the same
    shape with the banded signature columns; exact-hash is the
    always-on first line. The index is re-read per micro-batch for
    file/table sources, so a concurrently-updated index flows
    through."""
    from bbdc20_submission_spark.streaming.joins import stream_static_enrich

    hashed = stream.withColumn("content_hash", F.md5(F.col(text_col)))
    return stream_static_enrich(
        hashed,
        index.select("content_hash").distinct(),
        "content_hash",
        how="left_anti",
    )


# partition column for the EXACTLY-ONCE ingest layout. Not
# underscore-prefixed: Spark's file index treats _-prefixed paths as
# hidden metadata (like _SUCCESS) and would skip the partition dirs.
INGEST_BATCH_COL = "ingest_batch_id"


def seed_ingest_index(index: DataFrame, index_path: str) -> None:
    """Seed an exactly-once ingest index directory with the HISTORICAL
    index as partition ``ingest_batch_id=-1``, so the seed and every
    later micro-batch partition share one uniform partitioned layout
    (mixing unpartitioned root files with partition dirs breaks
    Spark's partition discovery). Use instead of a plain
    ``index.write.parquet(index_path)`` when the streaming form will
    run with ``exactly_once=True``."""
    (
        index.withColumn(INGEST_BATCH_COL, F.lit(-1).cast("long"))
        .write.mode("overwrite")
        .partitionBy(INGEST_BATCH_COL)
        .parquet(index_path)
    )


def _write_ingest_partition(df: DataFrame, batch_id: int, path: str) -> None:
    """Idempotent keyed write: the batch lands in its own
    ``ingest_batch_id=<n>`` partition under DYNAMIC partition
    overwrite, so a replayed batch REWRITES its partition instead of
    appending a duplicate copy — plain-parquet exactly-once with no
    transactional table format."""
    (
        df.withColumn(INGEST_BATCH_COL, F.lit(batch_id).cast("long"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(INGEST_BATCH_COL)
        .parquet(path)
    )


def _read_ingest_index(spark, index_path: str, batch_id: int):
    """Read the exactly-once index AS OF this batch: partitions
    ``ingest_batch_id < batch_id`` only. Excluding the in-flight
    batch's own partition makes replays deterministic — a batch that
    failed AFTER writing its index partition recomputes against
    exactly the index state its first attempt saw, then overwrites
    the same partitions. Returns None when no index dir exists yet
    (day-0 bootstrap)."""
    from pyspark.errors import AnalysisException

    try:
        return (
            spark.read.parquet(index_path)
            .filter(F.col(INGEST_BATCH_COL) < batch_id)
            .drop(INGEST_BATCH_COL)
        )
    except AnalysisException:
        return None


def compact_ingest_index(
    spark, index_path: str, upto_batch: int, num_files: int = 8
) -> int:
    """Fold every ``ingest_batch_id < upto_batch`` partition of an
    exactly-once ingest layout into the ``-1`` seed partition — the
    maintenance companion to :func:`_write_ingest_partition`. Without
    it the layout grows one partition directory per micro-batch
    forever, and ``_read_ingest_index`` re-lists and re-reads ALL of
    them every batch: at production cadence (10^4+ batches) partition
    discovery and tiny-file read amplification dominate the as-of
    read. Returns the number of batch partitions folded (0 when only
    the seed is below the watermark — see the return contract below).

    Replay-safety contract: ``upto_batch`` must not exceed the
    stream's last COMMITTED batch id + 1. Structured Streaming only
    ever replays the in-flight (uncommitted) batch, and for any batch
    id >= ``upto_batch`` the as-of filter ``ingest_batch_id <
    batch_id`` selects the folded seed in full — so the replay sees
    byte-identical index state before and after compaction. Folding a
    batch that could still replay WOULD change its as-of view (the
    seed absorbs later batches' rows); the watermark rule prevents
    that by construction.

    Crash safety on plain parquet (no transactional table format):
    the fold is written to a sibling temp dir, renamed into the table
    root as a hidden ``.compact-staged-<n>`` dir (complete by the
    time it appears, and invisible to partition discovery), and only
    then are the folded partitions dropped and the staged dir renamed
    to the seed. A crash before staging leaves the layout untouched;
    a crash after staging is finished by the NEXT compaction call,
    which first completes any staged swap it finds. Run compaction
    from the ingest driver between micro-batches (not concurrently
    with a batch's index read).

    The staged dir carries an explicit ``_COMPACT_COMPLETE`` marker
    (written after the parquet job, before the rename; underscore
    files are invisible to Spark's file index), and a swap is only
    ever finished for a marker-bearing dir: on filesystems where
    directory rename is NOT atomic (S3A is a copy+delete), a crash
    mid-rename can leave a partial staged dir, and the marker check
    makes recovery delete that partial instead of installing it as
    the seed. Every Hadoop ``rename`` return value is checked —
    Hadoop reports most failures by returning false, not raising —
    and a false aborts BEFORE any destructive step, so the staged
    copy is never the only copy at deletion time.

    Returns the number of BATCH partition directories absorbed
    (``ingest_batch_id >= 0``); an existing seed that participates in
    the fold does not count toward the total."""
    if upto_batch < 0:
        raise ValueError(
            f"upto_batch must be >= 0, got {upto_batch} (the seed "
            "partition is -1; there is nothing below it to fold)"
        )
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    HPath = jvm.org.apache.hadoop.fs.Path
    root = HPath(index_path)
    fs = root.getFileSystem(hconf)
    if not fs.exists(root):
        return 0
    prefix = INGEST_BATCH_COL + "="
    staged_prefix = ".compact-staged-"
    _COMPACT_MARKER = "_COMPACT_COMPLETE"

    def _partition_dirs():
        out = []
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith(prefix):
                try:
                    out.append((int(name[len(prefix):]), st.getPath()))
                except ValueError:
                    continue
        return out

    def _finish_swap(staged, watermark: int) -> None:
        # destructive steps are gated on the completeness marker: a
        # marker-bearing staged dir holds the FULL fold, so dropping
        # the source partitions and renaming it to the seed is safe
        # to re-run from any interruption point. A marker-less staged
        # dir is a partial from a crashed non-atomic rename (object
        # stores) — drop the partial, the sources are still intact.
        if not fs.exists(HPath(staged, _COMPACT_MARKER)):
            fs.delete(staged, True)
            return
        for bid, p in _partition_dirs():
            if bid < watermark:
                fs.delete(p, True)
        if not fs.rename(staged, HPath(root, prefix + "-1")):
            raise IOError(
                f"compact_ingest_index: rename {staged} -> seed partition "
                "returned false; the fold survives in the staged dir and "
                "the next compaction call will retry the swap"
            )

    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith(staged_prefix):
            _finish_swap(st.getPath(), int(name[len(staged_prefix):]))

    folded = [(b, p) for b, p in _partition_dirs() if b < upto_batch]
    if not any(b >= 0 for b, _ in folded):
        return 0
    rows = (
        spark.read.parquet(index_path)
        .filter(F.col(INGEST_BATCH_COL) < upto_batch)
        .drop(INGEST_BATCH_COL)
    )
    tmp = HPath(index_path.rstrip("/") + ".compact-tmp")
    if fs.exists(tmp):
        fs.delete(tmp, True)
    writer = rows.coalesce(num_files) if num_files else rows
    writer.write.mode("overwrite").parquet(tmp.toString())
    fs.create(HPath(tmp, _COMPACT_MARKER), True).close()
    staged = HPath(root, staged_prefix + str(upto_batch))
    if not fs.rename(tmp, staged):
        raise IOError(
            f"compact_ingest_index: rename {tmp} -> {staged} returned "
            "false; layout left untouched (fold not installed)"
        )
    _finish_swap(staged, upto_batch)
    return sum(1 for b, _ in folded if b >= 0)


def ingest_dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    kept_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    exactly_once: bool = False,
    **dedup_kwargs,
) -> None:
    """One micro-batch of the streaming incremental dedup (the
    ``foreachBatch`` body of :func:`stream_incremental_dedup`,
    module-level so replay semantics are directly testable): read the
    index as of this batch, run :func:`incremental_dedup`, persist the
    survivors and their index rows.

    ``exactly_once=False`` (default): plain appends — Structured
    Streaming's at-least-once contract for side-effecting sinks, where
    a failed-then-replayed batch can append twice (and, worse, re-read
    an index already containing its own first attempt's rows, so the
    replay dedups the batch against itself and admits nothing).

    ``exactly_once=True``: both outputs land in per-batch
    ``ingest_batch_id=<n>`` partitions via dynamic partition
    overwrite, and the index read excludes partitions >= this batch —
    replays rewrite the same partitions from the same inputs, so the
    final state is exactly-once no matter how many times a batch
    retries. Seed a pre-existing historical index with
    :func:`seed_ingest_index`; readers of ``kept_path`` see one extra
    ``ingest_batch_id`` partition column.

    ``dedup_kwargs`` accepts exactly the :func:`incremental_dedup`
    tuning knobs (shingle_k / num_hashes / bands / min_jaccard /
    portable); an unrecognized key raises rather than silently doing
    nothing. ``portable`` MUST match the mode the persisted index was
    built with (``build_dedup_index(portable=...)`` /
    :func:`seed_ingest_index` of such an index) — mixed hash families
    make the near-vs-index slot-agreement estimate meaningless and
    would poison every later batch through the appended rows."""
    from pyspark.errors import AnalysisException

    unknown = set(dedup_kwargs) - {
        "shingle_k", "num_hashes", "bands", "min_jaccard", "portable"
    }
    if unknown:
        raise TypeError(
            f"ingest_dedup_batch: unrecognized dedup_kwargs {sorted(unknown)}; "
            "accepted: shingle_k, num_hashes, bands, min_jaccard, portable "
            "(a silently-ignored knob here would desynchronize the stream "
            "from its persisted index)"
        )
    portable = dedup_kwargs.get("portable", False)
    spark = batch_df.sparkSession
    index = None
    if exactly_once:
        index = _read_ingest_index(spark, index_path, batch_id)
    else:
        try:
            index = spark.read.parquet(index_path)
        except AnalysisException:
            index = None
    if index is None:
        # day-0 bootstrap: no index persisted yet — an empty frame
        # with the index schema (limit(0) never touches the data)
        index = build_dedup_index(
            batch_df.limit(0),
            id_col=id_col,
            text_col=text_col,
            shingle_k=dedup_kwargs.get("shingle_k", 3),
            num_hashes=dedup_kwargs.get("num_hashes", 16),
            portable=portable,
        )
    kept, appended = _dedup_batch(
        batch_df,
        index,
        id_col,
        text_col,
        dedup_kwargs.get("shingle_k", 3),
        dedup_kwargs.get("num_hashes", 16),
        dedup_kwargs.get("bands", 4),
        dedup_kwargs.get("min_jaccard", 0.5),
        portable=portable,
    )
    if exactly_once:
        _write_ingest_partition(kept, batch_id, kept_path)
        # the survivors' index rows are a slice of the checkpointed
        # batch index — no second md5 + MinHash pass per micro-batch
        _write_ingest_partition(appended, batch_id, index_path)
    else:
        kept.write.mode("append").parquet(kept_path)
        appended.write.mode("append").parquet(index_path)


def stream_incremental_dedup(
    stream_docs: DataFrame,
    index_path: str,
    kept_path: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    exactly_once: bool = False,
    compact_every_n_batches: int | None = None,
    **dedup_kwargs,
):
    """FULL incremental dedup on a stream — exact + near, vs the
    persisted index AND within each micro-batch — via ``foreachBatch``:
    each micro-batch reads the CURRENT index, runs the batch
    :func:`incremental_dedup`, persists the survivors to ``kept_path``
    and their index rows to ``index_path`` (append-only is equivalent
    to the updated-index union). Later micro-batches therefore dedup
    against everything earlier ones admitted — the sequential-ingest
    semantics of a production feed.

    Returns the unstarted ``DataStreamWriter`` (caller picks the
    trigger and calls ``start()``). Delivery: at-least-once by default
    (a failed-then-replayed batch can append twice);
    ``exactly_once=True`` switches both outputs to per-batch-keyed
    partitions with replay-deterministic index reads — see
    :func:`ingest_dedup_batch` — at the cost of an ``ingest_batch_id``
    partition column in the output layout (seed pre-existing history
    with :func:`seed_ingest_index`; fold old partitions periodically
    with :func:`compact_ingest_index`).

    ``compact_every_n_batches=N`` (exactly-once only) folds the index
    automatically: every N-th batch runs :func:`compact_ingest_index`
    with ``upto_batch = batch_id`` — strictly below the in-flight
    batch, which is the watermark rule's maximum (everything < the
    current id is committed; only the current batch can replay, and
    its as-of view of a fold below it is byte-identical). The fold
    runs at the START of the batch body, BEFORE the index read: the
    foreachBatch loop is sequential, so this is the documented
    "between micro-batches" slot, and — critically — the call's
    built-in staged-swap recovery runs before any read, so a replay
    after a crash mid-fold never reads the half-swapped layout. A
    compaction failure fails the micro-batch; the replay re-enters
    recovery first, then rewrites deterministically (latency, not
    data loss). Live partition-dir count stays <= N + 1 (seed).

    Failure-mode note: ``_dedup_batch`` localCheckpoints its
    intermediate frames, which are non-replicated executor-local
    blocks — on a cluster with dynamic allocation, losing an executor
    mid-batch fails that micro-batch. Under ``exactly_once=True`` the
    retry is a deterministic rewrite, so this only costs latency; in
    default append mode a failure between the kept write and the index
    append double-appends on retry (the standard at-least-once window
    — prefer ``exactly_once=True`` wherever executors can be
    deallocated mid-batch)."""

    if compact_every_n_batches is not None:
        if not exactly_once:
            raise ValueError(
                "compact_every_n_batches requires exactly_once=True: the "
                "append-mode layout has no ingest_batch_id partitions to fold"
            )
        if int(compact_every_n_batches) < 1:
            raise ValueError(
                f"compact_every_n_batches must be >= 1, got {compact_every_n_batches}"
            )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if (
            compact_every_n_batches
            and batch_id > 0
            and batch_id % int(compact_every_n_batches) == 0
        ):
            compact_ingest_index(
                batch_df.sparkSession, index_path, upto_batch=batch_id
            )
        ingest_dedup_batch(
            batch_df,
            batch_id,
            index_path,
            kept_path,
            id_col=id_col,
            text_col=text_col,
            exactly_once=exactly_once,
            **dedup_kwargs,
        )

    return stream_docs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )


def stream_incremental_semantic_dedup(
    stream_vecs: DataFrame,
    index_path: str,
    kept_path: str,
    checkpoint_dir: str,
    model,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cap: int = 4096,
    exactly_once: bool = False,
):
    """Embedding-side ingest dedup on a STREAM via ``foreachBatch``:
    each micro-batch reads the CURRENT vector index (cell-assigned
    under the shared pre-fit quantizer), runs
    :func:`incremental_semantic_dedup`, appends the survivors to
    ``kept_path`` and their index rows to ``index_path`` — so later
    micro-batches dedup against everything earlier ones admitted,
    the sequential-ingest semantics of a production embedding feed.
    Day-0 bootstrap: an empty index frame with the index schema.

    Returns the unstarted ``DataStreamWriter`` (caller picks the
    trigger and calls ``start()``). Delivery: at-least-once by
    default; ``exactly_once=True`` keys both outputs by batch into
    ``ingest_batch_id=<n>`` partitions with replay-deterministic index
    reads, same mechanics as :func:`ingest_dedup_batch` (seed
    pre-existing history with :func:`seed_ingest_index`)."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        ingest_semantic_batch(
            batch_df,
            batch_id,
            index_path,
            kept_path,
            model,
            threshold=threshold,
            id_col=id_col,
            vec_col=vec_col,
            cap=cap,
            exactly_once=exactly_once,
        )

    return stream_vecs.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )


def ingest_semantic_batch(
    batch_df: DataFrame,
    batch_id: int,
    index_path: str,
    kept_path: str,
    model,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cap: int = 4096,
    exactly_once: bool = False,
) -> None:
    """One micro-batch of the streaming semantic ingest dedup (the
    ``foreachBatch`` body of :func:`stream_incremental_semantic_dedup`,
    module-level so replay semantics are directly testable). Delivery
    modes are identical to :func:`ingest_dedup_batch`: plain appends
    (at-least-once) or per-batch ``ingest_batch_id`` partitions with
    as-of index reads (exactly-once under replay)."""
    from pyspark.errors import AnalysisException

    spark = batch_df.sparkSession
    index = None
    if exactly_once:
        index = _read_ingest_index(spark, index_path, batch_id)
    else:
        try:
            index = spark.read.parquet(index_path)
        except AnalysisException:
            index = None
    if index is None:
        index = build_semantic_index(
            batch_df.limit(0), model, id_col=id_col, vec_col=vec_col
        )
    kept, appended = _semantic_dedup_batch(
        batch_df, index, model, threshold, id_col, vec_col, cap
    )
    if exactly_once:
        _write_ingest_partition(kept, batch_id, kept_path)
        _write_ingest_partition(appended, batch_id, index_path)
    else:
        kept.write.mode("append").parquet(kept_path)
        # append-only is equivalent to rewriting the updated union —
        # the survivors' rows are a slice of the checkpointed batch
        # assignment, so no second assignment pass per micro-batch
        appended.write.mode("append").parquet(index_path)


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    match_renames: bool | str = False,
    shingle_k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    min_jaccard: float = 0.5,
    max_churn_fraction: float = 0.5,
) -> DataFrame:
    """Snapshot diff between two corpus versions — the dataset-release
    audit every training-data pipeline runs before shipping a refresh:
    which documents were ADDED, REMOVED, MODIFIED (same id, different
    content), or UNCHANGED.

    Output: ``[id_col, status, matched_old_id, match_jaccard]`` — one
    row per id present in either version; ``status`` in
    {'added', 'removed', 'modified', 'unchanged'}.

    ``match_renames=True`` additionally cross-matches the ADDED set
    against the REMOVED set by near-duplicate content (LSH candidates
    + exact Jaccard >= ``min_jaccard``): an added doc that near-matches
    a removed doc is a rename / re-ingest / light edit, not new data —
    its ``matched_old_id``/``match_jaccard`` columns carry the best
    (max-Jaccard, tie -> lowest old id) removed match, NULL for true
    additions. Diff sets are usually small relative to the corpus, so
    the near-dup pass pays only for the churn, never the snapshot.

    Churn guard: the rename pass is a release-audit tool, not a dedup
    job — when the churn fraction (added + removed over all ids)
    exceeds ``max_churn_fraction``, matching everything against
    everything is the wrong machinery, so the pass is SKIPPED with a
    warning (``matched_old_id``/``match_jaccard`` come back NULL).
    ``match_renames="force"`` runs it anyway; past the threshold the
    forced pass drops the broadcast hints on the churn-id sets so a
    corpus-sized id set degrades to a shuffle join instead of blowing
    the broadcast limit / driver memory. The guard itself is an
    ID-ONLY action: added/removed status is pure id presence, so the
    guard join reads and shuffles just the id columns (parquet prunes
    the text entirely) and the md5 status frame stays lazy until the
    caller's first real action.

    Scale shape: the status join exchanges ONLY (id, md5) pairs — text
    never shuffles for the diff itself; the rename pass runs the same
    banded-LSH + verify machinery as the dedup family over the tagged
    union of the two (small) diff sets, keeping cross-version pairs.
    The rename pass encodes version-disjoint ids as 2*id / 2*id+1, so
    it requires non-negative integer ids below 2^62 (any production
    doc-id scheme)."""
    from pyspark.sql.window import Window

    o = old.select(F.col(id_col).alias("_id"), F.md5(text_col).alias("_oh"))
    n = new.select(F.col(id_col).alias("_id"), F.md5(text_col).alias("_nh"))
    st = (
        o.join(n, "_id", "full_outer")
        .select(
            "_id",
            F.when(F.col("_oh").isNull(), F.lit("added"))
            .when(F.col("_nh").isNull(), F.lit("removed"))
            .when(F.col("_oh") == F.col("_nh"), F.lit("unchanged"))
            .otherwise(F.lit("modified"))
            .alias("status"),
        )
    )
    base = st.select(
        F.col("_id").alias(id_col),
        "status",
        F.lit(None).cast(old.schema[id_col].dataType).alias("matched_old_id"),
        F.lit(None).cast("double").alias("match_jaccard"),
    )
    if not match_renames:
        return base
    st_p = managed_persist(st)
    # guard action on ids ONLY: status 'added'/'removed' is pure id
    # presence, so the fraction never needs the md5 hashes — this join
    # shuffles 8-byte ids (text column pruned at the scan) instead of
    # forcing the full text-hashing status frame to materialize as a
    # dedicated blocking job before the caller's own action runs
    def _guard_counts():
        return (
            old.select(F.col(id_col).alias("_id"), F.lit(True).alias("_o"))
            .join(
                new.select(
                    F.col(id_col).alias("_id"), F.lit(True).alias("_n")
                ),
                "_id",
                "full_outer",
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(
                    F.when(
                        F.col("_o").isNull() | F.col("_n").isNull(), 1
                    ).otherwise(0)
                ).alias("churn"),
            )
            .collect()[0]
        )

    def _rename_pairs(hint):
        # churn-id sets are BROADCAST (8 bytes/id, small by this
        # pass's contract — "the near-dup pass pays only for the
        # churn"), so the text-carrying snapshots are filtered
        # map-side: without the hint these left-semi joins plan as
        # SortMergeJoins that shuffle the WHOLE corpus with its text
        # by id — the one text exchange in the operator, and the
        # first thing to blow up at 100 TB.
        added = new.join(
            hint(
                st_p.filter(F.col("status") == "added").select(
                    F.col("_id").alias(id_col)
                )
            ),
            id_col,
            "left_semi",
        )
        removed = old.join(
            hint(
                st_p.filter(F.col("status") == "removed").select(
                    F.col("_id").alias(id_col)
                )
            ),
            id_col,
            "left_semi",
        )
        # tagged union: ids are made side-disjoint for the LSH
        # machinery by an odd/even encoding (2*id for removed,
        # 2*id+1 for added), so a cross-version id collision cannot
        # alias; decoded after verify
        tagged = removed.select(
            (F.col(id_col) * 2).alias("_did"), F.col(text_col).alias("_t")
        ).unionByName(
            added.select(
                (F.col(id_col) * 2 + 1).alias("_did"),
                F.col(text_col).alias("_t"),
            )
        )
        sets = managed_persist(
            hashed_shingle_sets(tagged, "_did", "_t", shingle_k)
        )
        cands = minhash_lsh_candidates(
            tagged, "_did", "_t", shingle_k, num_hashes, bands, sets=sets
        )
        return jaccard_pairs(
            tagged, cands, "_did", "_t", shingle_k=shingle_k,
            min_jaccard=min_jaccard, sets=sets,
        ).filter(F.col("jaccard") >= min_jaccard)

    # The churn-guard action and the rename pass's (sizeable) plan
    # assembly are independent until the hint decision, so run the
    # guard job in a worker thread and OPTIMISTICALLY assemble the
    # broadcast-hinted plan (the in-contract case) on the main thread
    # (guide §2.6). Over the threshold the optimistic plan is simply
    # dropped — the skip path returns base, and the rare
    # match_renames='force' corner re-assembles hint-free.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(1) as _pool:
        counts_future = _pool.submit(_guard_counts)
        pairs = _rename_pairs(F.broadcast)
        counts = counts_future.result()
    churn_frac = counts["churn"] / counts["n"] if counts["n"] else 0.0
    if churn_frac > max_churn_fraction:
        if match_renames != "force":
            import warnings

            warnings.warn(
                f"corpus_diff: churn fraction {churn_frac:.2f} exceeds "
                f"max_churn_fraction={max_churn_fraction}; skipping the "
                "rename pass (matching near-disjoint snapshots is a dedup "
                "job, not a release audit). Pass match_renames='force' to "
                "run it anyway.",
                stacklevel=2,
            )
            return base
        # forced past the threshold: the churn-id sets may be
        # corpus-sized, so let Spark plan a shuffle join rather than
        # erroring on the broadcast limit
        pairs = _rename_pairs(lambda d: d)
    # keep cross-side pairs only, oriented (removed old, added new)
    cross = pairs.select(
        F.when(F.col("id_a") % 2 == 1, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("_aid"),
        F.when(F.col("id_a") % 2 == 0, F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("_rid"),
        "jaccard",
    ).filter((F.col("_aid") % 2 == 1) & (F.col("_rid") % 2 == 0))
    best = (
        # decode with a shift, not floor(x / 2.0): double division
        # loses exactness past 2^53 while the precondition allows 2^62
        cross.select(
            F.shiftright(F.col("_aid"), 1).alias(id_col),
            F.shiftright(F.col("_rid"), 1).alias("matched_old_id"),
            F.col("jaccard").alias("match_jaccard"),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("match_jaccard").desc(),
                    F.col("matched_old_id").asc(),
                )
            ),
        )
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
    return (
        base.drop("matched_old_id", "match_jaccard")
        .join(best, id_col, "left")
        .select(id_col, "status", "matched_old_id", "match_jaccard")
    )

"""Incremental ingest dedup: new batches against a persisted index."""

from __future__ import annotations

from pyspark.sql import functions as F

from bbdc20_submission_spark.operators.incremental import (
    build_dedup_index,
    incremental_dedup,
)
from bbdc20_submission_spark.sources.harness import load_table


def _near_variant(text: str) -> str:
    toks = text.split(" ")
    return " ".join(toks[:-1]) if len(toks) > 8 else text + " extra"


def test_incremental_dedup_batches(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    batch1 = docs.filter("doc_id < 120")
    index = build_dedup_index(batch1)
    n_index = index.count()
    assert n_index == 120

    b1 = {r["doc_id"]: r["text"] for r in batch1.limit(20).collect()}
    b1_ids = sorted(b1)
    rows = []
    # 5 exact dups of batch1, 5 near dups of batch1, 5 fresh docs,
    # and a within-batch dup pair
    for i, did in enumerate(b1_ids[:5]):
        rows.append((9000 + i, b1[did]))
    for i, did in enumerate(b1_ids[5:10]):
        rows.append((9100 + i, _near_variant(b1[did])))
    for i in range(5):
        rows.append((9200 + i, f"totally novel document body {i} " + " ".join(
            f"tok{i}_{j}" for j in range(30))))
    rows.append((9300, "a brand new within batch duplicate " + " ".join(
        f"w{j}" for j in range(30))))
    rows.append((9301, "a brand new within batch duplicate " + " ".join(
        f"w{j}" for j in range(30))))
    batch2 = spark.createDataFrame(rows, "doc_id long, text string")

    kept, updated = incremental_dedup(batch2, index)
    kept_ids = sorted(r["doc_id"] for r in kept.collect())

    # exact dups of the corpus are gone
    assert not any(9000 <= i < 9100 for i in kept_ids)
    # near dups of the corpus are gone (signature-estimated jaccard)
    assert not any(9100 <= i < 9200 for i in kept_ids)
    # fresh docs survive
    assert [i for i in kept_ids if 9200 <= i < 9300] == [9200 + i for i in range(5)]
    # within-batch dup pair keeps exactly the lowest id
    assert 9300 in kept_ids and 9301 not in kept_ids

    # updated index = historical + survivors, ready for batch 3
    assert updated.count() == n_index + len(kept_ids)
    kept3, _ = incremental_dedup(batch2, updated)
    assert kept3.count() == 0  # re-ingesting the same batch is a no-op


def test_index_is_compact_and_text_free(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    index = build_dedup_index(docs.limit(50))
    assert "text" not in index.columns
    assert set(index.columns) == {"_id", "content_hash"} | {
        f"h{s}" for s in range(16)
    }


def test_stream_incremental_exact_filter(spark, sf_dir, tmp_path):
    """Streaming ingest dedup: docs whose content is already in the
    historical index are dropped from the stream; fresh docs pass.
    Stream output == batch output of the same filter."""
    from bbdc20_submission_spark.operators.incremental import (
        stream_incremental_exact_filter,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    hist = docs.filter("doc_id < 100")
    index = build_dedup_index(hist)

    # batch 2: 10 exact dups of history + everything else fresh
    batch = docs.filter("doc_id >= 90 AND doc_id < 140")
    staged = str(tmp_path / "batch")
    batch.write.mode("overwrite").parquet(staged)

    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    out = stream_incremental_exact_filter(stream, index)
    q = (
        out.writeStream.format("memory")
        .queryName("t_sinc")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM t_sinc").collect()}
    want = {
        r["doc_id"]
        for r in stream_incremental_exact_filter(
            spark.read.parquet(staged), index
        ).collect()
    }
    assert got == want
    assert got == set(range(100, 140))  # 90..99 are historical dups


def test_stream_incremental_dedup_updates_index(spark, sf_dir, tmp_path):
    """foreachBatch incremental dedup: micro-batches dedup against the
    persisted index AND earlier batches' admissions; the index grows
    by exactly the kept docs."""
    import os

    from bbdc20_submission_spark.operators.incremental import (
        stream_incremental_dedup,
    )

    # fully synthetic docs (disjoint per-doc vocab) so the ONLY
    # duplicate relations are the planted ones — the harness corpus
    # contains genuine near-dups that would make assertions orderful
    def _doc(i: int) -> str:
        return " ".join(f"d{i}w{j}" for j in range(30))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(80)], "doc_id long, text string"
    )
    index_path = str(tmp_path / "index")
    build_dedup_index(hist).write.mode("overwrite").parquet(index_path)

    # two staged files: A brings fresh docs 80..119; B brings exact
    # dups of history (0..9), dups of A (80..89), and fresh 120..139
    staged = str(tmp_path / "incoming")
    os.makedirs(staged, exist_ok=True)
    spark.createDataFrame(
        [(i, _doc(i)) for i in range(80, 120)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(staged)
    rows_b = (
        [(8000 + i, _doc(i)) for i in range(10)]
        + [(8100 + i, _doc(80 + i)) for i in range(10)]
        + [(i, _doc(i)) for i in range(120, 140)]
    )
    spark.createDataFrame(rows_b, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(staged)

    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(staged)
    kept_path = str(tmp_path / "kept")
    q = stream_incremental_dedup(
        stream,
        index_path,
        kept_path,
        str(tmp_path / "ckpt"),
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(kept_path).collect()
    )
    # all dups (of history or of admitted docs) are gone regardless of
    # how the files were micro-batched; all fresh docs survive
    assert not any(8000 <= i < 8200 for i in kept_ids)
    assert set(range(80, 140)) <= set(kept_ids)
    assert len(kept_ids) == 60
    # index grew by exactly the kept docs
    assert spark.read.parquet(index_path).count() == 80 + 60


def test_stream_incremental_dedup_bootstraps_empty_index(spark, tmp_path):
    """Day-0: no index exists yet at index_path — the first micro-batch
    must bootstrap an empty index (not crash with PATH_NOT_FOUND),
    dedup within itself, and seed the index with its survivors."""
    import os

    from bbdc20_submission_spark.operators.incremental import (
        stream_incremental_dedup,
    )

    def _doc(i: int) -> str:
        return " ".join(f"b{i}w{j}" for j in range(30))

    staged = str(tmp_path / "in")
    os.makedirs(staged, exist_ok=True)
    rows = [(i, _doc(i)) for i in range(20)] + [(900, _doc(0))]  # 1 dup
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(staged)

    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).parquet(staged)
    index_path = str(tmp_path / "idx")  # never created
    kept_path = str(tmp_path / "kept")
    q = stream_incremental_dedup(
        stream, index_path, kept_path, str(tmp_path / "ck")
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    kept = {r["doc_id"] for r in spark.read.parquet(kept_path).collect()}
    assert kept == set(range(20))  # 900 is an exact dup of 0
    idx = spark.read.parquet(index_path)
    assert {r["_id"] for r in idx.select("_id").collect()} == set(range(20))


def test_incremental_semantic_dedup_contract(spark):
    """Vector-side ingest dedup vs a brute-force reference: a new
    vector is pruned iff some same-cell mate EARLIER in (historical,
    id) order clears the threshold — historical mates beat the batch
    (lowest historical id reported), otherwise lowest-id new mate;
    survivors' index rows append; historical rows never change."""
    import random as _random

    import numpy as np

    from bbdc20_submission_spark.operators.clustering import fit_quantizer
    from bbdc20_submission_spark.operators.incremental import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    rng = _random.Random(7)
    dim = 16

    def vec():
        return [float(rng.gauss(0, 1)) for _ in range(dim)]

    hist_rows = [(i, vec()) for i in range(20)]
    hist = spark.createDataFrame(hist_rows, "vec_id long, embedding array<double>")
    model = fit_quantizer(hist, k=1, max_iter=3, seed=5)  # one cell => all pairs comparable
    index = build_semantic_index(hist, model)

    new_rows = []
    # exact copies of historical (must be pruned toward the historical id),
    # a batch-internal near-dup pair (higher id pruned toward lower),
    # and fresh vectors (kept)
    for j, (hid, hv) in enumerate(hist_rows[:4]):
        new_rows.append((1000 + j, list(hv)))
    shared = vec()
    new_rows.append((2000, list(shared)))
    new_rows.append((2001, [x + rng.gauss(0, 1e-4) for x in shared]))
    for j in range(3):
        new_rows.append((3000 + j, vec()))
    new = spark.createDataFrame(new_rows, "vec_id long, embedding array<double>")

    kept, updated = incremental_semantic_dedup(new, index, model, threshold=0.98)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}

    # brute-force reference (one cell, so all pairs are candidates)
    hv = {i: np.array(v) for i, v in hist_rows}
    nv = {i: np.array(v) for i, v in new_rows}

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    want_kept = set()
    for i in sorted(nv):
        hist_hit = any(cos(nv[i], h) >= 0.98 for h in hv.values())
        new_hit = any(j < i and cos(nv[i], nv[j]) >= 0.98 for j in nv)
        if not hist_hit and not new_hit:
            want_kept.add(i)
    assert kept_ids == want_kept
    # the copies of historical vectors were pruned, fresh ones kept
    assert {3000, 3001, 3002} <= kept_ids
    assert not any(1000 <= i < 1004 for i in kept_ids)
    assert 2000 in kept_ids and 2001 not in kept_ids

    # updated index = historical rows + survivors' rows, ids disjoint
    upd = {r["_id"] for r in updated.select("_id").collect()}
    assert upd == {i for i, _ in hist_rows} | kept_ids


def test_incremental_semantic_dedup_only_touched_cells_and_nulls(spark):
    """Cells the batch never touches contribute no pair work (their
    historical rows still ride into the updated index untouched), and
    NULL-embedding new rows pass through kept but never enter the
    index."""
    import random as _random

    from bbdc20_submission_spark.operators.clustering import fit_quantizer
    from bbdc20_submission_spark.operators.incremental import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    rng = _random.Random(3)
    dim = 8
    # two well-separated blobs -> 2 cells
    a = [(i, [float(10 + rng.gauss(0, 0.1)) for _ in range(dim)]) for i in range(5)]
    b = [(10 + i, [float(-10 + rng.gauss(0, 0.1)) for _ in range(dim)]) for i in range(5)]
    hist = spark.createDataFrame(a + b, "vec_id long, embedding array<double>")
    model = fit_quantizer(hist, k=2, max_iter=5, seed=9)
    index = build_semantic_index(hist, model)

    # batch touches only blob A's cell; one NULL row rides along
    new = spark.createDataFrame(
        [(100, a[0][1]), (101, None)],
        "vec_id long, embedding array<double>",
    )
    kept, updated = incremental_semantic_dedup(new, index, model, threshold=0.9)
    kept_ids = {r["vec_id"] for r in kept.select("vec_id").collect()}
    assert kept_ids == {101}  # 100 is a copy of a historical A vector
    upd = {r["_id"] for r in updated.select("_id").collect()}
    # NULL row kept but NOT indexed; historical rows all present
    assert upd == {i for i, _ in a + b}


def test_stream_incremental_semantic_dedup_updates_index(spark, tmp_path):
    """foreachBatch embedding ingest dedup: micro-batches dedup against
    the persisted vector index AND earlier batches' admissions; the
    index grows by exactly the kept vectors (NULL vectors kept but not
    indexed)."""
    import os
    import random as _random

    from bbdc20_submission_spark.operators.clustering import fit_quantizer
    from bbdc20_submission_spark.operators.incremental import (
        build_semantic_index,
        stream_incremental_semantic_dedup,
    )

    rng = _random.Random(19)
    dim = 8

    def vec():
        return [float(rng.gauss(0, 1)) for _ in range(dim)]

    hist_rows = [(i, vec()) for i in range(30)]
    hist = spark.createDataFrame(
        hist_rows, "vec_id long, embedding array<double>"
    )
    model = fit_quantizer(hist, k=2, max_iter=4, seed=11)
    index_path = str(tmp_path / "vindex")
    build_semantic_index(hist, model).write.mode("overwrite").parquet(index_path)

    # file A: fresh vectors 100..109; file B: copies of history (0..4),
    # copies of A (100..104), fresh 200..204, one NULL
    staged = str(tmp_path / "vin")
    os.makedirs(staged, exist_ok=True)
    a_rows = [(100 + j, vec()) for j in range(10)]
    spark.createDataFrame(
        a_rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("append").parquet(staged)
    b_rows = (
        [(8000 + i, list(hist_rows[i][1])) for i in range(5)]
        + [(8100 + j, list(a_rows[j][1])) for j in range(5)]
        + [(200 + j, vec()) for j in range(5)]
        + [(9999, None)]
    )
    spark.createDataFrame(
        b_rows, "vec_id long, embedding array<double>"
    ).coalesce(1).write.mode("append").parquet(staged)

    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(staged)
    kept_path = str(tmp_path / "vkept")
    q = stream_incremental_semantic_dedup(
        stream,
        index_path,
        kept_path,
        str(tmp_path / "vckpt"),
        model,
        threshold=0.98,
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    kept_ids = sorted(
        r["vec_id"] for r in spark.read.parquet(kept_path).collect()
    )
    assert not any(8000 <= i < 8200 for i in kept_ids)
    assert set(range(100, 110)) <= set(kept_ids)
    assert set(range(200, 205)) <= set(kept_ids)
    assert 9999 in kept_ids  # NULL vector passes through kept
    assert len(kept_ids) == 16
    # index grew by exactly the kept GEOMETRIC vectors (not the NULL)
    assert spark.read.parquet(index_path).count() == 30 + 15


def test_banded_rejects_indivisible_bands(spark):
    """r6 advice: num_hashes % bands != 0 silently dropped trailing
    signature columns (recall loss) — must raise instead."""
    import pytest

    from bbdc20_submission_spark.operators.incremental import (
        incremental_dedup,
    )

    docs = spark.createDataFrame(
        [(i, f"doc body {i} " + " ".join(f"t{i}{j}" for j in range(20)))
         for i in range(4)],
        "doc_id long, text string",
    )
    index = build_dedup_index(docs, num_hashes=16)
    with pytest.raises(ValueError, match="divisible"):
        incremental_dedup(docs, index, num_hashes=16, bands=5)


def test_incremental_semantic_dedup_degenerate_vectors_inert(spark):
    """Batch vectors with NaN/inf elements or ragged lengths are INERT
    (kept, never pruned — same contract as clustering._cell_keepers);
    a finite exact copy of a historical vector is still pruned."""
    from bbdc20_submission_spark.operators.clustering import CentroidQuantizer
    from bbdc20_submission_spark.operators.incremental import (
        build_semantic_index,
        incremental_semantic_dedup,
    )

    base = [float(i + 1) for i in range(8)]
    hist = spark.createDataFrame(
        [(0, base)], "vec_id long, embedding array<double>"
    )
    model = CentroidQuantizer([[0.0] * 8])
    index = build_semantic_index(hist, model)
    new = spark.createDataFrame(
        [
            (100, [x * 1.000001 for x in base]),  # dup of historical 0
            (101, [float("nan")] * 8),
            (102, [float("inf")] + [1.0] * 7),
            (103, base + [1.0]),  # ragged vs historical dim 8
        ],
        "vec_id long, embedding array<double>",
    )
    kept, updated = incremental_semantic_dedup(new, index, model, threshold=0.99)
    assert {r["vec_id"] for r in kept.select("vec_id").collect()} == {101, 102, 103}
    assert {r["_id"] for r in updated.select("_id").collect()} == {0, 101, 102, 103}


def test_corpus_diff_statuses_and_renames(spark):
    """corpus_diff: full status matrix (added/removed/modified/
    unchanged) from content hashes, and match_renames cross-matches
    added docs to near-duplicate removed docs (best match by jaccard,
    NULL for true additions; removed/modified/unchanged rows never
    carry a match)."""
    from bbdc20_submission_spark.operators.incremental import corpus_diff

    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old = spark.createDataFrame(
        [
            (1, f"{body} one"),        # unchanged
            (2, f"{body} two"),        # modified in new
            (3, f"{body} three"),      # removed, near-dup of added 30
            (4, "totally different words entirely distinct content"),
        ],                             # removed, no match
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (1, f"{body} one"),                       # unchanged
            (2, f"{body} two EDITED"),                # modified
            (30, f"{body} three"),                    # renamed from 3
            (31, "fresh unrelated document body with new tokens"),
        ],                                            # true addition
        "doc_id long, text string",
    )
    plain = {
        r["doc_id"]: (r["status"], r["matched_old_id"])
        for r in corpus_diff(old, new).collect()
    }
    assert plain == {
        1: ("unchanged", None),
        2: ("modified", None),
        3: ("removed", None),
        4: ("removed", None),
        30: ("added", None),
        31: ("added", None),
    }
    rich = {
        r["doc_id"]: (r["status"], r["matched_old_id"], r["match_jaccard"])
        # the toy diff is 4/6 churn — raise the guard to exercise the
        # rename mechanics (the guard itself is tested separately)
        for r in corpus_diff(
            old, new, match_renames=True, max_churn_fraction=1.0
        ).collect()
    }
    assert {k: v[0] for k, v in rich.items()} == {
        k: v[0] for k, v in plain.items()
    }
    assert rich[30][1] == 3 and rich[30][2] == 1.0   # exact rename
    assert rich[31][1] is None                        # true addition
    assert all(
        rich[k][1] is None for k in (1, 2, 3, 4)
    )  # only added rows carry matches


def test_exactly_once_ingest_replay_is_idempotent(spark, tmp_path):
    """exactly_once=True: a REPLAYED micro-batch (Structured
    Streaming's at-least-once contract for side-effecting sinks) must
    leave kept/index state byte-identical — the keyed partition is
    rewritten, not appended, and the as-of index read excludes the
    batch's own first-attempt rows (in append mode a replay re-reads
    those rows and dedups the batch against itself). Sequencing across
    batches must still hold: batch 1 dedups against batch 0's
    admissions through the partitioned index."""
    from bbdc20_submission_spark.operators.incremental import (
        build_dedup_index,
        ingest_dedup_batch,
        seed_ingest_index,
    )

    def _doc(i: int) -> str:
        return " ".join(f"x{i}w{j}" for j in range(30))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(20)], "doc_id long, text string"
    )
    index_path = str(tmp_path / "idx")
    kept_path = str(tmp_path / "kept")
    seed_ingest_index(build_dedup_index(hist), index_path)

    # batch 0: one dup of history (doc 0) + fresh 20..29
    b0 = spark.createDataFrame(
        [(900, _doc(0))] + [(i, _doc(i)) for i in range(20, 30)],
        "doc_id long, text string",
    )
    ingest_dedup_batch(b0, 0, index_path, kept_path, exactly_once=True)

    def _state():
        kept = sorted(
            (r["doc_id"], r["ingest_batch_id"])
            for r in spark.read.parquet(kept_path).collect()
        )
        idx = sorted(
            (r["_id"], r["ingest_batch_id"])
            for r in spark.read.parquet(index_path).collect()
        )
        return kept, idx

    first = _state()
    kept0 = {i for i, _ in first[0]}
    assert kept0 == set(range(20, 30))  # 900 dropped vs history

    # REPLAY batch 0 (same content, same batch_id) — state unchanged.
    # The critical property: the replay's index read must NOT see the
    # first attempt's ingest_batch_id=0 rows, else 20..29 would dedup
    # against themselves and the partition would rewrite to empty.
    ingest_dedup_batch(b0, 0, index_path, kept_path, exactly_once=True)
    assert _state() == first

    # batch 1: dups of batch-0 admissions (20..24) + fresh 30..34 —
    # cross-batch sequencing rides the partitioned index
    b1 = spark.createDataFrame(
        [(8000 + i, _doc(20 + i)) for i in range(5)]
        + [(i, _doc(i)) for i in range(30, 35)],
        "doc_id long, text string",
    )
    ingest_dedup_batch(b1, 1, index_path, kept_path, exactly_once=True)
    kept, idx = _state()
    assert {i for i, b in kept if b == 1} == set(range(30, 35))
    # replaying batch 1 is also a no-op
    ingest_dedup_batch(b1, 1, index_path, kept_path, exactly_once=True)
    assert _state() == (kept, idx)
    # index = seed (-1) + batch survivors, exactly once each
    assert sorted(b for _, b in idx) == [-1] * 20 + [0] * 10 + [1] * 5


def test_exactly_once_semantic_ingest_replay(spark, tmp_path):
    """Semantic (embedding-side) exactly-once ingest: a replayed
    micro-batch leaves kept/index state identical, and cross-batch
    sequencing rides the partitioned index (batch 1 dedups against
    batch 0's admissions)."""
    import numpy as np

    from bbdc20_submission_spark.operators.clustering import fit_quantizer
    from bbdc20_submission_spark.operators.incremental import (
        build_semantic_index,
        ingest_semantic_batch,
        seed_ingest_index,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(24, 8)).astype("float64")
    hist_rows = [(i, [float(x) for x in base[i]]) for i in range(16)]
    hist = spark.createDataFrame(
        hist_rows, "vec_id long, embedding array<double>"
    )
    model = fit_quantizer(hist, k=4, max_iter=5, seed=3)
    index_path = str(tmp_path / "semidx")
    kept_path = str(tmp_path / "semkept")
    seed_ingest_index(build_semantic_index(hist, model), index_path)

    # batch 0: exact copies of history vecs 0,1 (pruned) + fresh 16..19
    b0_rows = [(1000, [float(x) for x in base[0]]),
               (1001, [float(x) for x in base[1]])] + [
        (i, [float(x) for x in base[i]]) for i in range(16, 20)
    ]
    b0 = spark.createDataFrame(b0_rows, "vec_id long, embedding array<double>")
    ingest_semantic_batch(
        b0, 0, index_path, kept_path, model, threshold=0.999,
        exactly_once=True,
    )

    def _kept():
        return sorted(
            (r["vec_id"], r["ingest_batch_id"])
            for r in spark.read.parquet(kept_path).collect()
        )

    first = _kept()
    assert {i for i, _ in first} == set(range(16, 20))
    ingest_semantic_batch(  # replay
        b0, 0, index_path, kept_path, model, threshold=0.999,
        exactly_once=True,
    )
    assert _kept() == first
    # batch 1: a copy of a batch-0 admission (16) + fresh 20..23
    b1_rows = [(2000, [float(x) for x in base[16]])] + [
        (i, [float(x) for x in base[i]]) for i in range(20, 24)
    ]
    b1 = spark.createDataFrame(b1_rows, "vec_id long, embedding array<double>")
    ingest_semantic_batch(
        b1, 1, index_path, kept_path, model, threshold=0.999,
        exactly_once=True,
    )
    assert {i for i, b in _kept() if b == 1} == set(range(20, 24))


def test_incremental_dedup_portable_mode_matches_fast_mode(spark):
    """portable=True (salted-md5 quartered 32-bit slot signatures,
    the certification mode)
    must make the SAME keep/drop decisions as the xxhash64 fast path
    on the planted scenario: exact duplicates estimate jaccard 1.0 and
    disjoint-vocab docs ~0 under ANY hash family, so mode changes the
    mechanism, never the outcome, away from the threshold."""
    from bbdc20_submission_spark.operators.incremental import (
        build_dedup_index,
        incremental_dedup,
    )

    def _doc(i: int) -> str:
        return " ".join(f"p{i}w{j}" for j in range(30))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(40)], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(900 + i, _doc(i)) for i in range(5)]       # exact dups of history
        + [(i, _doc(i)) for i in range(40, 60)]      # fresh
        + [(8000, _doc(40))],                        # within-batch dup
        "doc_id long, text string",
    )
    results = {}
    for portable in (False, True):
        idx = build_dedup_index(hist, portable=portable)
        kept, updated = incremental_dedup(batch, idx, portable=portable)
        results[portable] = (
            {r["doc_id"] for r in kept.select("doc_id").collect()},
            {r["_id"] for r in updated.select("_id").collect()},
        )
    assert results[False] == results[True]
    assert results[True][0] == set(range(40, 60))
    assert results[True][1] == set(range(60))


def test_stream_incremental_dedup_exactly_once_end_to_end(spark, tmp_path):
    """The foreachBatch wrapper with exactly_once=True: an availableNow
    run over a seeded partitioned index admits exactly the fresh docs
    (same decisions as the append-mode wiring), lays every output in
    ingest_batch_id partitions, and grows the index by exactly the
    survivors."""
    import os

    from bbdc20_submission_spark.operators.incremental import (
        build_dedup_index,
        seed_ingest_index,
        stream_incremental_dedup,
    )

    def _doc(i: int) -> str:
        return " ".join(f"e{i}w{j}" for j in range(30))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(80)], "doc_id long, text string"
    )
    index_path = str(tmp_path / "index")
    seed_ingest_index(build_dedup_index(hist), index_path)

    staged = str(tmp_path / "incoming")
    os.makedirs(staged, exist_ok=True)
    spark.createDataFrame(
        [(i, _doc(i)) for i in range(80, 120)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(staged)
    rows_b = (
        [(8000 + i, _doc(i)) for i in range(10)]        # dups of history
        + [(8100 + i, _doc(80 + i)) for i in range(10)]  # dups of batch A
        + [(i, _doc(i)) for i in range(120, 140)]        # fresh
    )
    spark.createDataFrame(rows_b, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(staged)

    schema = spark.read.parquet(staged).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(staged)
    kept_path = str(tmp_path / "kept")
    q = stream_incremental_dedup(
        stream,
        index_path,
        kept_path,
        str(tmp_path / "ckpt"),
        exactly_once=True,
    ).trigger(availableNow=True).start()
    q.awaitTermination()

    kept = spark.read.parquet(kept_path)
    assert "ingest_batch_id" in kept.columns
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    assert not any(8000 <= i < 8200 for i in kept_ids)
    assert set(range(80, 140)) <= set(kept_ids)
    assert len(kept_ids) == 60
    idx = spark.read.parquet(index_path)
    assert idx.count() == 80 + 60
    # the seed sits in partition -1, every admission in a batch >= 0
    parts = {r["ingest_batch_id"] for r in idx.select("ingest_batch_id").distinct().collect()}
    assert -1 in parts and all(p >= -1 for p in parts)


def test_stream_compaction_keeps_partition_count_bounded(spark, tmp_path):
    """compact_every_n_batches wired into the exactly-once stream: a
    6-batch availableNow run with N=2 must end with at most N+1 index
    partition dirs (seed + the unfolded tail) instead of 7, dedup
    decisions against FOLDED history must still hold (a dup of a
    batch-0 admission arriving later is dropped even after batch 0 was
    absorbed into the seed), and a continuation run from the same
    checkpoint stays green."""
    import os

    from bbdc20_submission_spark.operators.incremental import (
        build_dedup_index,
        seed_ingest_index,
        stream_incremental_dedup,
    )

    def _doc(i: int) -> str:
        return " ".join(f"s{i}w{j}" for j in range(30))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(20)], "doc_id long, text string"
    )
    index_path = str(tmp_path / "index")
    kept_path = str(tmp_path / "kept")
    seed_ingest_index(build_dedup_index(hist), index_path)

    staged = str(tmp_path / "incoming")
    os.makedirs(staged, exist_ok=True)
    # 6 single-file batches: 5 fresh docs each; the LAST file also
    # re-sends the content of a FIRST-file doc under a new id, and a
    # dup of seeded history — both must lose to the folded index
    nxt = 20
    for b in range(6):
        rows = [(i, _doc(i)) for i in range(nxt, nxt + 5)]
        if b == 5:
            rows += [(9001, _doc(20)), (9002, _doc(0))]
        nxt += 5
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(staged)

    schema = spark.read.parquet(staged).schema

    def _run():
        q = stream_incremental_dedup(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged),
            index_path,
            kept_path,
            str(tmp_path / "ckpt"),
            exactly_once=True,
            compact_every_n_batches=2,
        ).trigger(availableNow=True).start()
        q.awaitTermination()

    _run()

    def _dirs():
        return sorted(
            d for d in os.listdir(index_path)
            if d.startswith("ingest_batch_id=")
        )

    # folds fired at batch starts 2 and 4 -> seed + batches 4, 5 remain
    assert len(_dirs()) <= 3, _dirs()
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(kept_path).collect()
    )
    # FileStreamSource order isn't pinned, but exactly one of each dup
    # pair may survive; with single-file triggers the last file IS a
    # later batch than the first, so both re-sends must be dropped
    assert 9001 not in kept_ids and 9002 not in kept_ids
    assert kept_ids == list(range(20, 50))
    idx_ids = sorted(
        r["_id"] for r in spark.read.parquet(index_path).collect()
    )
    assert idx_ids == list(range(50))  # nothing lost to any fold

    # continuation from the same checkpoint: one more file -> batch 6;
    # the fold at its start absorbs 4 and 5, then batch 6 lands
    spark.createDataFrame(
        [(i, _doc(i)) for i in range(50, 53)] + [(9003, _doc(21))],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(staged)
    _run()
    assert _dirs() == ["ingest_batch_id=-1", "ingest_batch_id=6"]
    kept_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(kept_path).collect()
    )
    assert kept_ids == list(range(20, 53))


def test_stream_compaction_requires_exactly_once(spark, tmp_path):
    """compact_every_n_batches without exactly_once must raise: the
    append-mode layout has no batch partitions to fold, so accepting
    it would silently never compact."""
    import pytest as _pt

    from bbdc20_submission_spark.operators.incremental import (
        stream_incremental_dedup,
    )

    stream = spark.readStream.format("rate").load().selectExpr(
        "value AS doc_id", "CAST(value AS string) AS text"
    )
    with _pt.raises(ValueError, match="exactly_once"):
        stream_incremental_dedup(
            stream, str(tmp_path / "i"), str(tmp_path / "k"),
            str(tmp_path / "c"), compact_every_n_batches=2,
        )
    with _pt.raises(ValueError, match=">= 1"):
        stream_incremental_dedup(
            stream, str(tmp_path / "i"), str(tmp_path / "k"),
            str(tmp_path / "c"), exactly_once=True,
            compact_every_n_batches=0,
        )


def test_ingest_dedup_batch_portable_mode_end_to_end(spark, tmp_path):
    """The round-8 trap: a portable-seeded index consumed by the
    streaming batch body MUST build portable batch signatures too —
    with mixed hash families the near-vs-index slot agreement is
    random noise and near-dups of history silently pass. Here the
    near-dup of a historical doc (1 word changed out of 50, true
    Jaccard ~0.94) must be dropped by the vs-index ESTIMATE stage
    (exact-hash can't catch it), and a replay in portable mode must
    be a no-op."""
    from bbdc20_submission_spark.operators.incremental import (
        build_dedup_index,
        ingest_dedup_batch,
        seed_ingest_index,
    )

    def _doc(i: int) -> str:
        return " ".join(f"q{i}w{j}" for j in range(50))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(20)], "doc_id long, text string"
    )
    index_path = str(tmp_path / "idx")
    kept_path = str(tmp_path / "kept")
    seed_ingest_index(build_dedup_index(hist, portable=True), index_path)

    near_of_0 = _doc(0).rsplit(" ", 1)[0] + " CHANGED"
    b0 = spark.createDataFrame(
        [(900, _doc(1)), (901, near_of_0)]
        + [(i, _doc(i)) for i in range(20, 30)],
        "doc_id long, text string",
    )
    ingest_dedup_batch(
        b0, 0, index_path, kept_path, exactly_once=True, portable=True
    )

    def _state():
        kept = sorted(
            (r["doc_id"], r["ingest_batch_id"])
            for r in spark.read.parquet(kept_path).collect()
        )
        idx = sorted(
            (r["_id"], r["ingest_batch_id"])
            for r in spark.read.parquet(index_path).collect()
        )
        return kept, idx

    first = _state()
    kept0 = {i for i, _ in first[0]}
    assert 900 not in kept0          # exact dup of history
    assert 901 not in kept0          # NEAR dup of history — the trap
    assert kept0 == set(range(20, 30))
    # replay in portable mode is a no-op
    ingest_dedup_batch(
        b0, 0, index_path, kept_path, exactly_once=True, portable=True
    )
    assert _state() == first
    # appended index rows carry portable signatures: re-running a
    # later batch with a near-dup of a batch-0 ADMISSION also drops it
    near_of_20 = _doc(20).rsplit(" ", 1)[0] + " ALSO"
    b1 = spark.createDataFrame(
        [(8000, near_of_20), (30, _doc(30))], "doc_id long, text string"
    )
    ingest_dedup_batch(
        b1, 1, index_path, kept_path, exactly_once=True, portable=True
    )
    kept, _ = _state()
    assert {i for i, b in kept if b == 1} == {30}


def test_ingest_dedup_batch_rejects_unknown_kwargs(spark, tmp_path):
    """A typo'd / unsupported dedup knob must fail loudly — a silently
    ignored kwarg here is exactly how the portable drop slipped in."""
    import pytest

    from bbdc20_submission_spark.operators.incremental import (
        ingest_dedup_batch,
    )

    b = spark.createDataFrame([(1, "a b c d e f g h i j")],
                              "doc_id long, text string")
    with pytest.raises(TypeError, match="unrecognized dedup_kwargs"):
        ingest_dedup_batch(
            b, 0, str(tmp_path / "i"), str(tmp_path / "k"),
            portabel=True,  # the typo the guard exists for
        )


def test_compact_ingest_index_folds_and_preserves_asof(spark, tmp_path):
    """compact_ingest_index folds partitions < upto_batch into the -1
    seed: the directory count collapses, the as-of view of any batch
    >= the watermark is row-identical, and a replay of the in-flight
    batch after compaction is still a byte-identical no-op."""
    import os

    from bbdc20_submission_spark.operators.incremental import (
        _read_ingest_index,
        build_dedup_index,
        compact_ingest_index,
        ingest_dedup_batch,
        seed_ingest_index,
    )

    def _doc(i: int) -> str:
        return " ".join(f"c{i}w{j}" for j in range(30))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(10)], "doc_id long, text string"
    )
    index_path = str(tmp_path / "idx")
    kept_path = str(tmp_path / "kept")
    seed_ingest_index(build_dedup_index(hist), index_path)

    nxt = 10
    for b in range(3):  # batches 0..2: 5 fresh docs each + 1 dup
        rows = [(9000 + b, _doc(0))] + [
            (i, _doc(i)) for i in range(nxt, nxt + 5)
        ]
        nxt += 5
        ingest_dedup_batch(
            spark.createDataFrame(rows, "doc_id long, text string"),
            b, index_path, kept_path, exactly_once=True,
        )

    def _dirs():
        return sorted(
            d for d in os.listdir(index_path)
            if d.startswith("ingest_batch_id=")
        )

    def _asof(bid):
        return sorted(
            r["_id"]
            for r in _read_ingest_index(spark, index_path, bid).collect()
        )

    assert len(_dirs()) == 4  # seed + 3 batches
    before = _asof(3)
    n = compact_ingest_index(spark, index_path, upto_batch=3)
    assert n == 3  # batches 0, 1, 2 absorbed; the -1 seed doesn't count
    assert _dirs() == ["ingest_batch_id=-1"]
    assert _asof(3) == before  # as-of view of the next batch unchanged
    assert sorted(before) == list(range(25))

    # compaction again is a no-op (only the seed is below the mark)
    assert compact_ingest_index(spark, index_path, upto_batch=3) == 0

    # batch 3 runs against the compacted index; its replay is a no-op
    b3 = spark.createDataFrame(
        [(9100, _doc(1))] + [(i, _doc(i)) for i in range(25, 30)],
        "doc_id long, text string",
    )
    ingest_dedup_batch(b3, 3, index_path, kept_path, exactly_once=True)
    state = sorted(
        (r["_id"], r["ingest_batch_id"])
        for r in spark.read.parquet(index_path).collect()
    )
    assert {i for i, b in state if b == 3} == set(range(25, 30))
    ingest_dedup_batch(b3, 3, index_path, kept_path, exactly_once=True)
    assert state == sorted(
        (r["_id"], r["ingest_batch_id"])
        for r in spark.read.parquet(index_path).collect()
    )
    # partial fold: only batch 3 outstanding -> fold it too
    assert compact_ingest_index(spark, index_path, upto_batch=4) == 1
    assert _dirs() == ["ingest_batch_id=-1"]
    assert _asof(4) == sorted(list(range(30)))


def test_compact_ingest_index_crash_recovery(spark, tmp_path):
    """A compaction that crashed between staging and the final swap
    (the staged dir is in the root, folded dirs possibly half-deleted)
    is finished by the next compaction call — no rows lost."""
    import os

    from bbdc20_submission_spark.operators.incremental import (
        build_dedup_index,
        compact_ingest_index,
        ingest_dedup_batch,
        seed_ingest_index,
    )

    def _doc(i: int) -> str:
        return " ".join(f"r{i}w{j}" for j in range(30))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(8)], "doc_id long, text string"
    )
    index_path = str(tmp_path / "idx")
    seed_ingest_index(build_dedup_index(hist), index_path)
    ingest_dedup_batch(
        spark.createDataFrame(
            [(i, _doc(i)) for i in range(8, 12)], "doc_id long, text string"
        ),
        0, index_path, str(tmp_path / "kept"), exactly_once=True,
    )

    # run a real compaction, then simulate the crash window by
    # renaming the finished seed back to a staged dir (staged content
    # is by construction the complete fold)
    assert compact_ingest_index(spark, index_path, upto_batch=1) == 1
    os.rename(
        os.path.join(index_path, "ingest_batch_id=-1"),
        os.path.join(index_path, ".compact-staged-1"),
    )
    # recovery happens on the next call, even a no-op one
    assert compact_ingest_index(spark, index_path, upto_batch=1) == 0
    assert sorted(
        d for d in os.listdir(index_path) if d.startswith("ingest_batch_id=")
    ) == ["ingest_batch_id=-1"]
    ids = sorted(r["_id"] for r in spark.read.parquet(index_path).collect())
    assert ids == list(range(12))


def test_compact_ingest_index_drops_partial_staged_dir(spark, tmp_path):
    """A staged dir WITHOUT the _COMPACT_COMPLETE marker (the debris a
    crashed non-atomic rename leaves on an object store) must be
    deleted by recovery, NOT installed as the seed — and the source
    partitions it would have replaced must survive untouched."""
    import os

    from bbdc20_submission_spark.operators.incremental import (
        build_dedup_index,
        compact_ingest_index,
        ingest_dedup_batch,
        seed_ingest_index,
    )

    def _doc(i: int) -> str:
        return " ".join(f"q{i}w{j}" for j in range(30))

    hist = spark.createDataFrame(
        [(i, _doc(i)) for i in range(6)], "doc_id long, text string"
    )
    index_path = str(tmp_path / "idx")
    seed_ingest_index(build_dedup_index(hist), index_path)
    ingest_dedup_batch(
        spark.createDataFrame(
            [(i, _doc(i)) for i in range(6, 9)], "doc_id long, text string"
        ),
        0, index_path, str(tmp_path / "kept"), exactly_once=True,
    )

    # fabricate the partial: a staged dir with some bytes but no marker
    partial = os.path.join(index_path, ".compact-staged-1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as f:
        f.write(b"\x00" * 16)  # truncated garbage, never read

    # the fold proceeds from the intact sources; the partial is dropped
    assert compact_ingest_index(spark, index_path, upto_batch=1) == 1
    assert not os.path.exists(partial)
    assert sorted(
        d for d in os.listdir(index_path) if d.startswith("ingest_batch_id=")
    ) == ["ingest_batch_id=-1"]
    ids = sorted(r["_id"] for r in spark.read.parquet(index_path).collect())
    assert ids == list(range(9))


def test_corpus_diff_full_churn_guard(spark):
    """Disjoint snapshots (churn fraction 1.0) must SKIP the rename
    pass with a warning — matching everything against everything is a
    dedup job — while match_renames='force' still runs it (and
    degrades the broadcast hint rather than erroring)."""
    import warnings as _w

    from bbdc20_submission_spark.operators.incremental import corpus_diff

    def _doc(i: int) -> str:
        return " ".join(f"g{i}w{j}" for j in range(30))

    old = spark.createDataFrame(
        [(i, _doc(i)) for i in range(6)], "doc_id long, text string"
    )
    new = spark.createDataFrame(  # all renames of old, disjoint ids
        [(100 + i, _doc(i)) for i in range(6)], "doc_id long, text string"
    )
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        rows = corpus_diff(old, new, match_renames=True).collect()
    assert any("churn fraction" in str(c.message) for c in caught)
    got = {r["doc_id"]: r for r in rows}
    assert all(
        got[100 + i]["status"] == "added"
        and got[100 + i]["matched_old_id"] is None
        for i in range(6)
    )
    # forced: the rename pass runs and finds the exact matches
    forced = {
        r["doc_id"]: r
        for r in corpus_diff(old, new, match_renames="force").collect()
    }
    assert all(
        forced[100 + i]["matched_old_id"] == i
        and forced[100 + i]["match_jaccard"] == 1.0
        for i in range(6)
    )

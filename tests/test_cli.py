"""CLI surface: subcommands run in-process against the harness data."""

from __future__ import annotations

import json

from bbdc20_submission_spark.__main__ import main


def test_cli_query_writes_parquet(spark, sf_dir, tmp_path, capsys):
    out = str(tmp_path / "q")
    rc = main(["query", "a1_drop_duplicates", "--sf-dir", sf_dir, "--out", out])
    assert rc == 0
    assert spark.read.parquet(out).count() > 0


def test_cli_query_unknown_name(capsys):
    rc = main(["query", "no_such_query"])
    assert rc == 2
    assert "unknown query" in capsys.readouterr().err


def test_cli_curate_audit_json(sf_dir, tmp_path, capsys):
    rc = main(
        [
            "curate",
            "--documents",
            f"{sf_dir}/documents.parquet",
            "--out",
            str(tmp_path / "c"),
            "--audit",
        ]
    )
    assert rc == 0
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["raw"] >= audit["quality_lang_pass"] > 0
    assert audit["sampled"] == audit["chunks"] > 0  # chunks-per-doc >= 1


def test_cli_curate_pairs_in_matches_inline(spark, sf_dir, tmp_path, capsys):
    """--pairs-in: feeding a previously materialized verified edge set
    yields the same curated output as the inline LSH prefix."""
    from pyspark.sql import functions as F

    from bbdc20_submission_spark.operators.dedup import (
        exact_dedup_groups,
        jaccard_pairs,
        minhash_lsh_candidates,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keep = exact_dedup_groups(docs).select(F.col("keep_id").alias("doc_id"))
    eu = docs.join(keep, "doc_id", "left_semi")
    pairs = jaccard_pairs(eu, minhash_lsh_candidates(eu), min_jaccard=0.5).filter(
        F.col("jaccard") >= 0.5
    )
    pairs_path = str(tmp_path / "pairs")
    pairs.write.parquet(pairs_path)

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    base = ["curate", "--documents", f"{sf_dir}/documents.parquet", "--out"]
    assert main(base + [a]) == 0
    assert main(base + [b, "--pairs-in", pairs_path]) == 0
    want = sorted(map(tuple, spark.read.parquet(a).collect()))
    assert sorted(map(tuple, spark.read.parquet(b).collect())) == want


def test_cli_curate_stage_flags(sf_dir, tmp_path, capsys):
    """--block-source and --dedup-spans-min-count switch on their
    stages (audit keys present, counts consistent)."""
    rc = main(
        [
            "curate",
            "--documents",
            f"{sf_dir}/documents.parquet",
            "--block-source",
            "src19",
            "--dedup-spans-min-count",
            "2",
            "--audit",
        ]
    )
    assert rc == 0
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert audit["source_pass"] < audit["raw"]
    assert 0 < audit["span_deduped"] <= audit["near_unique"]


def test_cli_stream_curate_available_now(spark, sf_dir, tmp_path, capsys):
    """stream-curate runs a REAL Structured Streaming job (file source,
    AvailableNow trigger, parquet sink + checkpoint) and its output
    must equal the batch stream_curate over the same documents."""
    from bbdc20_submission_spark.sources.harness import load_table
    from bbdc20_submission_spark.streaming.curation import stream_curate

    out = str(tmp_path / "chunks")
    rc = main(
        [
            "stream-curate",
            "--documents", f"{sf_dir}/documents.parquet",
            "--out", out,
            "--checkpoint", str(tmp_path / "ckpt"),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    batch = stream_curate(load_table(spark, "documents", sf_dir))
    want = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in batch.collect()
    }
    got = {
        (r["doc_id"], r["chunk_id"], r["chunk_text"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
    assert summary["chunks"] == len(want) > 0


def test_cli_curate_mixture_flags(sf_dir, capsys):
    rc = main(
        [
            "curate",
            "--documents",
            f"{sf_dir}/documents.parquet",
            "--mixture-weight",
            "en=0.7",
            "--mixture-weight",
            "de=0.3",
            "--mixture-total-fraction",
            "0.5",
            "--audit",
        ]
    )
    assert rc == 0
    audit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < audit["sampled"] < audit["chunks"]


def test_cli_curate_shards_out(sf_dir, tmp_path, capsys):
    import glob
    import os

    rc = main(
        [
            "curate",
            "--documents",
            f"{sf_dir}/documents.parquet",
            "--shards-out",
            str(tmp_path / "shards"),
            "--shard-buckets",
            "4",
            "--shard-budget-tokens",
            "256",
        ]
    )
    assert rc == 0
    dirs = glob.glob(os.path.join(str(tmp_path / "shards"), "pack_bucket=*"))
    assert len(dirs) == 4


def test_cli_report(sf_dir, capsys):
    rc = main(["report", "--documents", f"{sf_dir}/documents.parquet"])
    assert rc == 0
    row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["n_docs"] > 0
    assert row["total_ws_tokens"] > row["n_docs"]
    assert "n_docs_en" in row

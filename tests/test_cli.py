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

"""CLI entry points: ``python -m bbdc20_submission_spark <cmd>``.

Subcommands:

- ``query NAME --sf-dir DIR [--out PATH] [--show N]`` — run one
  registered query against a harness parquet directory; write parquet
  or show rows.
- ``curate --documents PATH [--out PATH] [--audit] [...]`` — run the
  LLM-data curation DAG over a documents parquet (doc_id, text).
- ``stream-curate --documents PATH --out DIR [--checkpoint DIR]`` —
  the stateless streaming curation chain as a real Structured
  Streaming job: file-source readStream over the documents parquet,
  one ``Trigger.AvailableNow`` drain into a parquet sink with a
  checkpoint, then a summary count. The same entry a production
  deployment would run continuously (drop the trigger) — here it
  processes everything available and stops, which is what makes it
  smoke-testable by a driver.
- ``pipeline --labels CSV --emg DIR --mocap DIR --emg-test DIR
  --mocap-test DIR --out DIR`` — the full BBDC reference pipeline from
  native CSV layout to the submission CSV.

Every subcommand builds the session via ``session.get_spark`` (AQE,
UTC, package shipping), so the CLI behaves exactly like the driver
contract surface.
"""

from __future__ import annotations

import argparse
import os
import json
import sys


def _cmd_query(args: argparse.Namespace) -> int:
    from bbdc20_submission_spark import registry
    from bbdc20_submission_spark.session import get_spark

    registry.load_all()
    if args.name not in registry.QUERIES:
        print(
            f"unknown query {args.name!r}; available: "
            + ", ".join(sorted(registry.QUERIES)),
            file=sys.stderr,
        )
        return 2
    spark = get_spark(f"query-{args.name}")
    df = registry.QUERIES[args.name](spark, args.sf_dir)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.show, truncate=False)
    return 0


def _cmd_curate(args: argparse.Namespace) -> int:
    from bbdc20_submission_spark.plans.curation import CurationConfig, curate
    from bbdc20_submission_spark.session import get_spark

    spark = get_spark("curate")
    docs = spark.read.parquet(args.documents)
    mixture = None
    if args.mixture_weight:
        mixture = {}
        for spec in args.mixture_weight:
            lang, _, w = spec.partition("=")
            mixture[lang] = float(w)
    budgets = None
    if args.token_budget:
        bare = [s for s in args.token_budget if "=" not in s]
        keyed = [s for s in args.token_budget if "=" in s]
        if bare and keyed or len(bare) > 1:
            raise SystemExit(
                "--token-budget: pass EITHER one bare integer OR"
                f" repeated LANG=N specs, got {args.token_budget}"
            )
        if bare:  # one bare integer = same budget for every lang
            budgets = int(bare[0])
        else:
            budgets = {}
            for spec in keyed:
                lang, _, n = spec.partition("=")
                budgets[lang] = int(n)
    cfg = CurationConfig(
        blocked_sources=tuple(args.block_source) or None,
        dedup_spans_min_count=args.dedup_spans_min_count,
        mixture_weights=mixture,
        mixture_total_fraction=args.mixture_total_fraction,
        token_budgets=budgets,
        min_quality=args.min_quality,
        min_clf_score=args.min_clf_score,
        keep_langs=tuple(args.langs.split(",")),
        chunk_tokens=args.chunk_tokens,
        strip_boilerplate_min_docs=args.strip_boilerplate_min_docs,
    )
    pairs = (
        spark.read.parquet(args.pairs_in) if args.pairs_in else None
    )
    evalset = (
        spark.read.parquet(args.decontaminate_against)
        if args.decontaminate_against
        else None
    )
    out, audit = curate(
        docs, cfg, audit=args.audit, observe=args.observe,
        precomputed_pairs=pairs, eval_set=evalset,
    )
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
    if args.shards_out:
        from bbdc20_submission_spark.sources.layout import (
            write_training_shards,
        )

        write_training_shards(
            out,
            args.shards_out,
            budget_tokens=args.shard_budget_tokens,
            n_buckets=args.shard_buckets,
        )
    if args.audit:
        print(json.dumps(audit))
    if args.observe:
        from bbdc20_submission_spark.plans.curation import observed_counts

        if not (args.out or args.shards_out):
            # observations need one action on the curated frame
            out.write.mode("overwrite").format("noop").save()
        print(json.dumps(observed_counts(audit)))
    if not args.out and not args.shards_out and not args.audit and not args.observe:
        out.show(20, truncate=False)
    return 0


def _cmd_report(args: argparse.Namespace) -> int:
    from bbdc20_submission_spark.operators.text import corpus_report
    from bbdc20_submission_spark.session import get_spark

    spark = get_spark("report")
    docs = spark.read.parquet(args.documents)
    row = corpus_report(docs, text_col=args.text_col).collect()[0]
    print(json.dumps(row.asDict()))
    return 0


def _cmd_stream_curate(args: argparse.Namespace) -> int:
    from bbdc20_submission_spark.session import get_spark
    from bbdc20_submission_spark.streaming.curation import stream_curate

    spark = get_spark("stream-curate")
    # file-source streams need an explicit schema: peek it from the
    # parquet footer via a batch reader (no data pages scanned)
    schema = spark.read.parquet(args.documents).schema
    path = args.documents
    if os.path.isfile(path):
        # the file stream source requires a directory basePath and
        # force-sets it to the given path; a glob that matches only
        # this file makes the source infer the parent dir instead
        path = path + "*"
    stream = spark.readStream.schema(schema).parquet(path)
    out = stream_curate(
        stream,
        min_quality=args.min_quality,
        keep_langs=tuple(args.langs.split(",")),
        chunk_tokens=args.chunk_tokens,
    )
    query = (
        out.writeStream.format("parquet")
        .option("path", args.out)
        .option("checkpointLocation", args.checkpoint or args.out + "_ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"chunks": n, "out": args.out}))
    return 0


def _cmd_pipeline(args: argparse.Namespace) -> int:
    from bbdc20_submission_spark.plans.pipeline import run_pipeline
    from bbdc20_submission_spark.session import get_spark
    from bbdc20_submission_spark.sources.native import (
        load_labels,
        load_sensor_csv_dir,
        write_submission_csv,
    )

    spark = get_spark("bbdc-pipeline")
    submission = run_pipeline(
        load_labels(spark, args.labels),
        load_sensor_csv_dir(spark, args.emg),
        load_sensor_csv_dir(spark, args.mocap),
        load_sensor_csv_dir(spark, args.emg_test),
        load_sensor_csv_dir(spark, args.mocap_test),
        test_subject=args.test_subject,
        n_models=args.n_models,
        seed=args.seed,
    )
    write_submission_csv(submission, args.out)
    print(f"wrote {args.out}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="bbdc20_submission_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    q = sub.add_parser("query", help="run a registered query")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    q.add_argument("--out")
    q.add_argument("--show", type=int, default=20)
    q.set_defaults(fn=_cmd_query)

    c = sub.add_parser("curate", help="run the curation DAG")
    c.add_argument("--documents", required=True)
    c.add_argument("--out")
    c.add_argument("--audit", action="store_true")
    c.add_argument(
        "--observe",
        action="store_true",
        help="stage counts via Spark Observation metrics (production"
        " telemetry: no per-stage recount jobs)",
    )
    c.add_argument(
        "--block-source",
        action="append",
        default=[],
        help="source value to reject (repeatable; C4-style blocklist)",
    )
    c.add_argument("--min-quality", type=float, default=0.5)
    c.add_argument("--min-clf-score", type=float, default=None)
    c.add_argument("--langs", default="en,de,es,fr")
    c.add_argument("--chunk-tokens", type=int, default=32)
    c.add_argument("--strip-boilerplate-min-docs", type=int, default=None)
    c.add_argument(
        "--dedup-spans-min-count",
        type=int,
        default=None,
        help="enable substring span dedup (stage 2b) at this repeat count",
    )
    c.add_argument(
        "--mixture-weight",
        action="append",
        default=[],
        metavar="LANG=W",
        help="data-mixing target share (repeatable, e.g. en=0.6)",
    )
    c.add_argument("--mixture-total-fraction", type=float, default=1.0)
    c.add_argument(
        "--token-budget",
        action="append",
        default=[],
        metavar="LANG=N|N",
        help="token-budget sampling: per-lang token budgets"
        " (repeatable, e.g. en=100000) or one bare integer for all",
    )
    c.add_argument(
        "--shards-out",
        help="also write trainer-ready packed-sequence shards here",
    )
    c.add_argument("--shard-budget-tokens", type=int, default=1024)
    c.add_argument("--shard-buckets", type=int, default=64)
    c.add_argument(
        "--decontaminate-against",
        help="parquet of an eval/benchmark set (text column) — corpus"
        " spans matching its k-grams are EXCISED"
        " (curate(eval_set=...), k = CurationConfig.decontaminate_k)",
    )
    c.add_argument(
        "--pairs-in",
        help="parquet of a previously materialized verified near-dup"
        " edge set (id_a, id_b, ...) over THIS corpus' post-blocklist"
        " exact-unique ids — skips the whole LSH prefix"
        " (curate(precomputed_pairs=...))",
    )
    c.set_defaults(fn=_cmd_curate)

    s = sub.add_parser(
        "stream-curate",
        help="run the streaming curation chain once (Trigger.AvailableNow)",
    )
    s.add_argument("--documents", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--checkpoint")
    s.add_argument("--min-quality", type=float, default=0.5)
    s.add_argument("--langs", default="en,de,es,fr")
    s.add_argument("--chunk-tokens", type=int, default=32)
    s.set_defaults(fn=_cmd_stream_curate)

    rp = sub.add_parser("report", help="one-row corpus diagnostics")
    rp.add_argument("--documents", required=True)
    rp.add_argument("--text-col", default="text")
    rp.set_defaults(fn=_cmd_report)

    pl = sub.add_parser("pipeline", help="run the BBDC reference pipeline")
    pl.add_argument("--labels", required=True)
    pl.add_argument("--emg", required=True)
    pl.add_argument("--mocap", required=True)
    pl.add_argument("--emg-test", required=True)
    pl.add_argument("--mocap-test", required=True)
    pl.add_argument("--out", required=True)
    pl.add_argument("--test-subject", default="s06")
    pl.add_argument("--n-models", type=int, default=11)
    pl.add_argument("--seed", type=int, default=1337)
    pl.set_defaults(fn=_cmd_pipeline)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

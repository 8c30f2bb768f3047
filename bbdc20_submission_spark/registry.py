"""Declared-query registry: name -> (PySpark builder, DuckDB oracle SQL).

Every operator claimed in SURVEY.md §2 registers a named query here via
the ``@query`` decorator; ``__spark_entry__.py`` exposes the dict to
the driver, which hash-compares the Spark result against the oracle SQL
on the same parquet tables.

Authoring rules (SURVEY.md §5.1 — cross-engine float stability):
- alias every computed column identically in Spark and SQL;
- round double aggregates to 6 decimals;
- timestamps leave the query as ``unix_millis`` bigints
  (DuckDB: ``epoch_ms``) — never raw timestamp values; and ALWAYS via
  ``load_table``'s normalized ``ts`` (never a raw spark.read of
  events.parquet — its physical layout varies across testdata
  generations and only ``load_table`` guarantees TIMESTAMP/UTC);
- exact ``percentile``, never ``percentile_approx``, when hashed;
- integer sums cast to bigint in SQL (DuckDB sums ints to HUGEINT);
- deterministic tie-breaks documented per query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query; ``oracle=None`` -> rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # Python-UDF queries need the package importable on workers
            # regardless of the driver process's cwd/sys.path.
            from bbdc20_submission_spark.session import ensure_package_shipped

            ensure_package_shipped(spark)
            # Operators persist intermediates (LSH signatures, simhash
            # fingerprints, kmeans feature vectors) that the RETURNED
            # lazy plan still references, so they cannot unpersist
            # before the caller's action. Releasing the LIBRARY's own
            # tracked frames here bounds cached-block accumulation to
            # one query at a time across a 50-query driver/bench run —
            # without touching caches the caller owns.
            from bbdc20_submission_spark.caching import release_managed

            release_managed(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = " ".join(oracle.split())
        return fn

    return deco


def load_all() -> None:
    """Import every query module (side effect: registry population)."""
    from bbdc20_submission_spark.queries import (  # noqa: F401
        relational,
        timeseries,
        llmdata,
    )

"""Local re-implementation of the driver's Spark-vs-DuckDB compare.

Runs a declared query and its oracle SQL, canonicalizes both results
(columns sorted by name, rows sorted by all values, floats rounded),
and asserts equality. Stricter than a hash: on mismatch it shows the
differing rows.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

HARNESS_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in HARNESS_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.round(6)
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: round(v, 6)
                if isinstance(v, float) and not math.isnan(v)
                else (
                    tuple(np.round(np.asarray(v, dtype="float64"), 5))
                    if isinstance(v, (list, np.ndarray))
                    else v
                )
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare_frames(
    spark_pdf: pd.DataFrame,
    oracle_pdf: pd.DataFrame,
    name: str,
    atol: float = 0.0,
) -> None:
    """Compare canonicalized frames. ``atol`` defaults to 0 — EXACT
    float equality — because the driver's correctness gate hashes raw
    values: a 1e-6 tolerance here let three value-correct-but-hash-red
    queries ship in round 2. A query that cannot hold bit-exactness
    cross-engine must integerize or re-author its outputs (see
    registry.py authoring rules), not loosen this comparator."""
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} (spark) != {len(oracle_pdf)} (oracle)"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            af, bf = av.astype("float64"), bv.astype("float64")
            if atol:
                ok = np.isclose(af, bf, rtol=0, atol=atol, equal_nan=True)
            else:
                ok = (af == bf) | (np.isnan(af) & np.isnan(bf))
        else:
            ok = (a[c].astype(str) == b[c].astype(str)).to_numpy()
        if not ok.all():
            bad = np.flatnonzero(~ok)[:5]
            raise AssertionError(
                f"{name}: column {c} differs at rows {bad.tolist()}:\n"
                f"spark : {av[bad]}\noracle: {bv[bad]}"
            )


def check_query(spark, sf_dir: str, name: str) -> int:
    """Run query `name` both ways and compare; returns row count."""
    from bbdc20_submission_spark import registry

    registry.load_all()
    sdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(registry.ORACLE[name]).fetchdf()
    finally:
        con.close()
    compare_frames(sdf, odf, name)
    return len(sdf)

"""Deterministic sampling operators for training-data curation.

Corpus curation samples by stratum (language, quality bucket, source)
with reproducibility requirements PRNG-based `df.sample` cannot give:
re-running the pipeline — or running it on a different partitioning —
must pick the SAME rows. Both operators key the decision on a hash of
the row's own id, so membership is a pure function of the data:

- ``stratified_sample``: per-stratum Bernoulli sampling at per-stratum
  rates (hash-threshold — one narrow pass, no shuffle);
- ``reservoir_per_stratum``: exactly k rows per stratum, chosen by
  hash order (one shuffle on the stratum key — the distributed,
  deterministic analog of reservoir sampling).

Both are scale-shape: membership needs no global state, so they run
identically on 500 rows or 100 TB of splits.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# hash-threshold resolution: fractions are quantized to 1/2^20
_BUCKETS = 1 << 20


def _hash_bucket(id_col: Column, seed: int) -> Column:
    """Uniform bucket in [0, _BUCKETS) as a pure function of (id, seed)."""
    return F.pmod(F.xxhash64(id_col, F.lit(seed)), F.lit(_BUCKETS))


def portable_hash_bucket(id_col: Column, seed: int) -> Column:
    """Engine-portable variant of ``_hash_bucket``: first 8 hex chars of
    md5(f"{id}:{seed}") mod 2^20. Any engine with md5 reproduces the
    SAME sample membership (DuckDB:
    ``CAST(('0x'||substr(md5(id||':s'),1,8)) AS BIGINT) % 1048576``) —
    the property that makes a curation sample auditable outside Spark.
    ~3x the per-row hash cost of xxhash64; both are narrow."""
    from bbdc20_submission_spark.operators.text import portable_md5_prefix64

    h = portable_md5_prefix64(
        F.concat(id_col.cast("string"), F.lit(f":{seed}"))
    )
    return F.pmod(h, F.lit(_BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: int = 7,
    portable: bool = False,
) -> DataFrame:
    """Keep each row with its stratum's fraction, deterministically.

    ``fractions`` maps stratum value -> keep fraction (e.g.
    ``{"en": 0.1, "de": 0.5}``); unlisted strata use
    ``default_fraction``. The keep decision is
    ``hash(id, seed) mod 2^20 < fraction * 2^20`` — reproducible across
    runs, partitionings, and engines, and a pushdown-friendly narrow
    filter (no shuffle, no state). Same shape as `sampleBy`, minus the
    PRNG nondeterminism. ``portable=True`` swaps xxhash64 for the
    md5-based ``portable_hash_bucket`` so the membership is
    reproducible OUTSIDE Spark too (audits, oracles)."""
    bucket = portable_hash_bucket if portable else _hash_bucket
    thresholds = F.create_map(
        *[
            x
            for value, frac in sorted(fractions.items())
            for x in (F.lit(value), F.lit(int(frac * _BUCKETS)))
        ]
    )
    thr = F.coalesce(
        thresholds.getItem(F.col(strata_col)),
        F.lit(int(default_fraction * _BUCKETS)),
    )
    return df.filter(bucket(F.col(id_col), seed) < thr)


def reservoir_per_stratum(
    df: DataFrame,
    strata_cols: Sequence[str],
    k: int,
    id_col: str = "doc_id",
    seed: int = 7,
    portable: bool = False,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, by hash order.

    Ranking on ``(hash(id, seed), id)`` inside each stratum gives a
    uniform-without-replacement sample that is a pure function of the
    data — the distributed analog of reservoir sampling, as one ranked
    window (single shuffle on the strata columns). Ties are impossible
    (id is unique), so the result is total-order deterministic.
    ``portable=True`` uses the md5-based engine-portable hash."""
    if "_rk" in df.columns:
        raise ValueError(
            "reservoir_per_stratum reserves the working column '_rk';"
            " rename it on the input frame"
        )
    bucket = portable_hash_bucket if portable else _hash_bucket
    w = Window.partitionBy(*strata_cols).orderBy(
        bucket(F.col(id_col), seed), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def mixture_sample(
    df: DataFrame,
    strata_col: str,
    target_weights: Mapping[str, float],
    total_fraction: float,
    id_col: str = "doc_id",
    seed: int = 7,
    portable: bool = False,
) -> DataFrame:
    """Data MIXING (the DoReMi / Pile-weights stage): sample the corpus
    down to ``total_fraction`` of its rows with the surviving set
    distributed across strata according to ``target_weights`` — e.g.
    resample a web-heavy corpus to 60% web / 30% code / 10% books.

    Per stratum s with observed count N_s, the target take is
    ``n_s = total_fraction * N * w_s`` rows, so the per-stratum keep
    rate is ``min(1, n_s / N_s)`` (a stratum smaller than its target
    is kept whole — rates never exceed 1; strata absent from
    ``target_weights`` get weight 0 and are dropped). Membership is
    the same hash-threshold decision as ``stratified_sample``, so the
    sample is a pure function of the data: reproducible across runs,
    partitionings, and (with ``portable=True``) engines.

    Scale shape: ONE tiny aggregation (stratum counts — map-side
    partials, output rows = |strata|) broadcast back onto a narrow
    filter; no shuffle of the corpus, no global sort, no state. The
    rate arithmetic stays in IEEE doubles with the weights as exact
    literals, so any engine derives bit-identical thresholds."""
    bucket = portable_hash_bucket if portable else _hash_bucket
    if "_strata_d" in df.columns or "_thr" in df.columns:
        raise ValueError(
            "mixture_sample reserves the working columns '_strata_d'"
            " and '_thr'; rename them on the input frame"
        )
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n_s"))
    # N derives from the stratum counts — a df.agg(count(*)) here
    # would be a second full-corpus scan for a number the tiny counts
    # frame already holds
    total = counts.agg(F.sum("_n_s").alias("_n"))
    wmap = F.create_map(
        *[
            x
            for value, w in sorted(target_weights.items())
            for x in (F.lit(value), F.lit(float(w)))
        ]
    )
    dim = (
        counts.crossJoin(F.broadcast(total))
        .withColumn("_w", F.coalesce(wmap.getItem(F.col(strata_col)), F.lit(0.0)))
        .withColumn(
            # floor, not cast: Spark's double->long cast truncates but
            # DuckDB's ROUNDS — an explicit floor is the form both
            # engines agree on (thresholds are non-negative)
            "_thr",
            F.floor(
                F.least(
                    F.lit(_BUCKETS).cast("double"),
                    F.lit(float(total_fraction))
                    * F.col("_n").cast("double")
                    * F.col("_w")
                    / F.col("_n_s").cast("double")
                    * F.lit(_BUCKETS),
                )
            ),
        )
        .select(strata_col, "_thr")
    )
    # eqNullSafe, matching token_budget_sample: a NULL stratum is a
    # legitimate group and must take the unlisted-stratum weight-0
    # path (dropped by rate), not vanish by equi-join mechanics
    d = dim.withColumnRenamed(strata_col, "_strata_d")
    return (
        df.join(
            F.broadcast(d), F.col(strata_col).eqNullSafe(F.col("_strata_d"))
        )
        .filter(bucket(F.col(id_col), seed) < F.col("_thr"))
        .select(*df.columns)
    )


def split_assign(
    df: DataFrame,
    weights: Sequence[float] = (0.8, 0.1, 0.1),
    names: Sequence[str] = ("train", "val", "test"),
    id_col: str = "doc_id",
    seed: int = 7,
    out_col: str = "split",
    portable: bool = False,
) -> DataFrame:
    """Deterministic disjoint train/val/test assignment: one extra
    column mapping each row to a named split by hash-bucket threshold.

    The splits are a pure function of (id, seed) — disjoint and
    exhaustive by construction, stable under repartitioning, appends,
    or reordering (a row keeps its split forever), and reproducible in
    any engine when ``portable=True`` (md5 bucket; DuckDB formula in
    ``portable_hash_bucket``). Weights are quantized to 1/2^20 like
    every sampler here; the last split absorbs the remainder so the
    assignment is total. Zero shuffles — one narrow projection."""
    if len(weights) != len(names) or not names:
        raise ValueError("weights and names must be equal-length, non-empty")
    if any(w < 0 for w in weights) or sum(weights) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    total = float(sum(weights))
    bucket = portable_hash_bucket if portable else _hash_bucket
    b = bucket(F.col(id_col), seed)
    # cumulative integer thresholds; the final edge is forced to
    # _BUCKETS so rounding can never leave a bucket unassigned
    edges: list[int] = []
    acc = 0.0
    for w in weights[:-1]:
        acc += float(w) / total
        edges.append(int(acc * _BUCKETS))
    expr = F.lit(names[-1])
    for name, edge in zip(reversed(names[:-1]), reversed(edges)):
        expr = F.when(b < edge, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    budgets: Mapping[str, int] | int,
    tokens_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
    portable: bool = False,
    n_coarse: int = 4096,
) -> DataFrame:
    """TOKEN-budget sampling: per stratum, keep documents in
    deterministic hash order until the cumulative ``tokens_col`` sum
    reaches the stratum's budget (training mixtures are specified in
    TOKENS, not row rates — a rate-based sampler over/undershoots
    whenever document lengths differ across strata).

    Semantics (the engine-portable spec any oracle can re-derive):
    order each stratum by (hash_bucket(id, seed), id); a doc is kept
    iff the token sum of the docs strictly BEFORE it is < budget — so
    the first doc to cross the budget is still kept (its budget slot
    was open when reached) and every stratum with a positive budget
    keeps at least one doc. Strata absent from a ``budgets`` mapping
    get budget 0 and are dropped (mixture_sample's weight-0 rule); an
    int budget applies to every stratum — including a NULL stratum,
    which is one group like any other (null-safe join; under a
    mapping, NULL counts as absent and is dropped).

    Scale shape — the naive form (one cumulative-sum window per
    stratum) serializes each stratum through a single task, the same
    trap ``exact_percentile``'s two-pass bracket avoids, so this uses
    the identical trick: (1) ONE aggregation to per-(stratum, coarse
    hash bucket) token sums (<= ``n_coarse`` rows per stratum — the
    bounded state); (2) a cumulative sum over that tiny dim classifies
    every coarse bucket as fully-kept / straddling / dropped — at most
    ONE straddling bucket per stratum; (3) the dim broadcasts back
    onto the corpus (no corpus shuffle for the keep/drop decision) and
    only the ~N_s/n_coarse docs of the straddling bucket pay a
    doc-level ordered window. The corpus text never shuffles."""
    bucket = portable_hash_bucket if portable else _hash_bucket
    if _BUCKETS % n_coarse:
        raise ValueError(f"n_coarse={n_coarse} must divide {_BUCKETS}")
    clash = {"_fb", "_cb", "_t", "_cls", "_cum0", "_budget", "_cumd", "_ds",
             "_dcb"} & set(df.columns)
    if clash:
        raise ValueError(
            f"token_budget_sample reserves working columns {sorted(clash)};"
            " rename them on the input frame"
        )
    fine = bucket(F.col(id_col), seed)
    coarse = F.floor(fine / F.lit(_BUCKETS // n_coarse)).cast("long")

    if isinstance(budgets, Mapping):
        bmap = F.create_map(
            *[
                x
                for value, n in sorted(budgets.items())
                for x in (F.lit(value), F.lit(int(n)))
            ]
        )
        budget = F.coalesce(bmap.getItem(F.col(strata_col)), F.lit(0))
    else:
        budget = F.lit(int(budgets))
    budget = budget.cast("double")

    per = (
        df.groupBy(F.col(strata_col), coarse.alias("_cb"))
        .agg(F.sum(F.col(tokens_col).cast("double")).alias("_t"))
    )
    w = Window.partitionBy(strata_col).orderBy("_cb").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    dim = (
        per.withColumn("_cum0", F.sum("_t").over(w) - F.col("_t"))
        .withColumn("_budget", budget)
        .withColumn(
            "_cls",
            F.when(F.col("_cum0") >= F.col("_budget"), F.lit(0))
            .when(F.col("_cum0") + F.col("_t") < F.col("_budget"), F.lit(2))
            .otherwise(F.lit(1)),
        )
        .filter(F.col("_cls") > 0)
        .select(
            F.col(strata_col).alias("_ds"),
            F.col("_cb").alias("_dcb"),
            "_cls",
            "_cum0",
            "_budget",
        )
    )

    # null-safe equality on the stratum key: a NULL stratum is a
    # stratum like any other (groupBy and the window already treat it
    # as one group; a plain equi-join would silently drop its rows)
    tagged = (
        df.withColumn("_fb", fine)
        .withColumn("_cb", coarse)
        .join(
            F.broadcast(dim),
            F.col(strata_col).eqNullSafe(F.col("_ds"))
            & (F.col("_cb") == F.col("_dcb")),
        )
        .drop("_ds", "_dcb")
    )
    full = tagged.filter(F.col("_cls") == 2)
    w2 = Window.partitionBy(strata_col, "_cb").orderBy(
        F.col("_fb").asc(), F.col(id_col).asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    part = (
        tagged.filter(F.col("_cls") == 1)
        .withColumn(
            "_cumd",
            F.sum(F.col(tokens_col).cast("double")).over(w2)
            - F.col(tokens_col).cast("double"),
        )
        .filter(F.col("_cum0") + F.col("_cumd") < F.col("_budget"))
        .drop("_cumd")
    )
    return full.unionByName(part).select(*df.columns)

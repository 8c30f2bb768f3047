"""Embedding clustering via Spark ML (IVF-style coarse quantization).

KMeans over the embedding column serves two roles in a training-data
pipeline: (a) corpus analysis/stratification, (b) the coarse quantizer
of an IVF ANN index — cluster centroids become the inverted-file
buckets that `similarity.cosine_topk_lsh` style pruning searches
within. Seeded -> deterministic assignments for a fixed partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bbdc20_submission_spark.caching import managed_persist


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 20,
    fit_fraction: float = 1.0,
) -> DataFrame:
    """Assign each vector a cluster id. Output: [id_col, cluster].

    ``fit_fraction`` < 1 trains the quantizer on a seeded sample and
    then assigns the full corpus — the standard IVF trick at scale
    (centroid quality needs a fraction of the data; assignment is one
    cheap pass). Random init avoids the extra kmeans|| passes."""
    model = fit_quantizer(
        df, k=k, vec_col=vec_col, seed=seed, max_iter=max_iter,
        fit_fraction=fit_fraction,
    )
    return assign_clusters(model, df, id_col=id_col, vec_col=vec_col)


def fit_quantizer(
    df: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 20,
    fit_fraction: float = 1.0,
):
    """Train the KMeans coarse quantizer and return the fitted model.

    Separated from assignment so callers at scale fit ONCE (on a
    seeded ``fit_fraction`` sample — centroid quality needs a fraction
    of the data) and reuse the model across corpora/queries/batches
    instead of re-training per invocation."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    fit_on = df if fit_fraction >= 1.0 else df.sample(fit_fraction, seed=seed)
    # cache the converted vectors: the fit re-reads them every iteration
    feats = managed_persist(
        fit_on.select(
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
        )
    )
    return KMeans(k=k, seed=seed, maxIter=max_iter, initMode="random").fit(feats)


def assign_clusters(
    model, df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """One narrow pass: nearest-centroid assignment with a pre-fit
    model. Output: [id_col, cluster]."""
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    return model.transform(feats).select(
        id_col, F.col("prediction").cast("long").alias("cluster")
    )


def kmeans_assign_checked(
    df: DataFrame,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 20,
    fit_fraction: float = 1.0,
) -> DataFrame:
    """KMeans assignment with a deterministic self-check column.

    Output: [id_col, cluster, nearest_ok] — nearest_ok = 1 iff the
    assigned centroid is the argmin squared distance among all k
    centroids, recomputed independently from the model's centers via
    array expressions. Cluster ids are engine/partitioning-specific
    (init samples depend on the physical layout), but nearest_ok is an
    invariant of a correct assignment — it certifies the operator on
    any engine without hashing the labels themselves."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = managed_persist(
        df.select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias("_arr"),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        )
    )
    fit_on = feats if fit_fraction >= 1.0 else feats.sample(fit_fraction, seed=seed)
    model = KMeans(k=k, seed=seed, maxIter=max_iter, initMode="random").fit(fit_on)
    centers = [c.tolist() for c in model.clusterCenters()]

    def dist2(center: list[float]):
        lit = F.array(*[F.lit(float(x)) for x in center])
        return F.aggregate(
            F.zip_with(F.col("_arr"), lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    dists = F.array(*[dist2(c) for c in centers])
    return (
        model.transform(feats)
        .select(
            id_col,
            F.col("prediction").cast("long").alias("cluster"),
            dists.alias("_d"),
        )
        .select(
            id_col,
            "cluster",
            (
                F.element_at("_d", (F.col("cluster") + 1).cast("int"))
                <= F.array_min("_d") + F.lit(1e-9)
            )
            .cast("long")
            .alias("nearest_ok"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 20,
    fit_fraction: float = 1.0,
    model=None,
    nprobe: int = 1,
) -> DataFrame:
    """IVF approximate top-k: exact cosine re-rank restricted to the
    query's ``nprobe`` nearest KMeans cells. The clustered variant of
    the LSH path — higher recall per candidate at the cost of training
    the quantizer. ``nprobe`` > 1 is the standard recall knob: near
    neighbors just across a cell boundary (the dominant single-probe
    miss mode) become candidates; candidate cost grows only on the
    small QUERY side of the join.

    Scale hygiene: the quantizer is fit ONCE on the corpus (or a seeded
    ``fit_fraction`` sample of it — pass a pre-fit ``model`` to skip
    training entirely, the right call for repeated query batches), and
    each side is assigned independently with that model — two narrow
    map passes, no union/distinct shuffle of wide vectors anywhere."""
    from bbdc20_submission_spark.operators.similarity import cosine

    from pyspark.sql import Window

    from pyspark.ml.functions import array_to_vector

    if model is None:
        model = fit_quantizer(
            corpus, k=n_clusters, vec_col=vec_col, seed=seed,
            max_iter=max_iter, fit_fraction=fit_fraction,
        )

    # corpus: single-cell assignment via the model's nearest-centroid
    # pass; transform preserves input columns, so the vector rides
    # along — no self-join back to ids
    c_feats = corpus.select(
        F.col(id_col).alias("match_id"),
        F.col(vec_col).alias("_cv"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    c = model.transform(c_feats).select(
        "match_id", "_cv", F.col("prediction").cast("long").alias("cluster")
    )

    # queries: rank all centroids by squared distance (centroids are a
    # tiny literal array — pure narrow expression) and explode the
    # nprobe nearest cells per query
    centers = [ctr.tolist() for ctr in model.clusterCenters()]

    def _dist2(center: list[float]):
        lit = F.array(*[F.lit(float(x)) for x in center])
        return F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"), lit,
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    ranked = F.array_sort(
        F.array(
            *[
                F.struct(_dist2(ctr).alias("d"), F.lit(i).cast("long").alias("i"))
                for i, ctr in enumerate(centers)
            ]
        )
    )
    probes = F.transform(
        F.slice(ranked, 1, min(nprobe, len(centers))), lambda s: s["i"]
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.explode(probes).alias("cluster"),
    )
    scored = (
        c.join(F.broadcast(q), "cluster")
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", cosine(F.col("_qv"), F.col("_cv")).alias("_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("match_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "match_id",
            F.round("_sim", 6).alias("cosine_sim"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    max_iter: int = 20,
    fit_fraction: float = 1.0,
    cap: int = 4096,
    target_cell_size: int = 300,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): KMeans
    the embedding space, then within each cell prune any vector that has
    a LOWER-id cell-mate with cosine >= ``threshold`` (keep-lowest-id —
    the same tie rule as the text dedup family).

    Output: [id_col, keeper_id (nullable), pruned] — one row per input
    vector; ``keeper_id`` is the lowest-id duplicate found, null when
    kept. Greedy pairwise by design: transitive chains are finished by
    ``chunking.dedup_clusters`` when full clusters are needed.

    Scale shape: within-cell pair generation is O(sum of cell^2), so k
    must GROW with the corpus — a fixed k makes the self-join quadratic
    in n (measured 9x wall-clock on 4x data at k=16). With
    ``n_clusters=None`` (default) k auto-scales to
    ``n / target_cell_size`` (clamped to [8, 65536]; the SemDeDup paper
    runs ~50k clusters for the same reason), keeping expected cell size
    constant -> pair volume LINEAR in n. The quantizer fits on a seeded
    sample (``fit_fraction``), assignment is one narrow pass, and
    skew-hot cells are still hash-split at ``cap`` members via the same
    sub-bucket trick as the LSH dedup, bounding the worst case at
    O(n * cap) with the documented recall trade."""
    from pyspark.ml.functions import array_to_vector

    from bbdc20_submission_spark.operators.dedup import _cap_buckets
    from bbdc20_submission_spark.operators.similarity import cosine

    if n_clusters is None:
        n_clusters = int(min(max(df.count() // target_cell_size, 8), 65536))
    model = fit_quantizer(
        df, k=n_clusters, vec_col=vec_col, seed=seed,
        max_iter=max_iter, fit_fraction=fit_fraction,
    )
    feats = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    tagged = managed_persist(
        _cap_buckets(
            model.transform(feats).select(
                "_id", "_v", F.col("prediction").cast("long").alias("cluster")
            ),
            ["cluster"], "_id", cap,
        )
    )
    a = tagged.select(
        "cluster", "sub_bucket",
        F.col("_id").alias("_ida"), F.col("_v").alias("_va"),
    )
    b = tagged.select(
        "cluster", "sub_bucket",
        F.col("_id").alias("_idb"), F.col("_v").alias("_vb"),
    )
    dup_pairs = (
        a.join(b, ["cluster", "sub_bucket"])
        .filter(F.col("_idb") < F.col("_ida"))
        .select(
            "_ida", "_idb", cosine(F.col("_va"), F.col("_vb")).alias("_sim")
        )
        .filter(F.col("_sim") >= threshold)
    )
    keepers = dup_pairs.groupBy("_ida").agg(F.min("_idb").alias("keeper_id"))
    return (
        df.select(F.col(id_col))
        .join(keepers.withColumnRenamed("_ida", id_col), id_col, "left")
        .select(
            id_col,
            "keeper_id",
            F.col("keeper_id").isNotNull().cast("long").alias("pruned"),
        )
    )

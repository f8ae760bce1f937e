"""Embedding similarity search: brute-force cosine baseline + LSH-bucketed
approximate path.

The dot products run as JVM higher-order functions (zip_with/aggregate) in
double precision — no Python, no UDF. The LSH path buckets vectors by the
sign pattern against deterministic ±1 hyperplanes, so at scale the
candidate set per query is one bucket (a groupBy-sized partition) instead
of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    # promote each element to double BEFORE the multiply: float*float
    # rounds the product to float32 first, which diverges from engines
    # (DuckDB list_dot_product on DOUBLE[]) that multiply in float64 —
    # at round-to-N a boundary value flips (round-1 e1 hash mismatch).
    # Callers on n²-pair paths cast the array to array<double> once per
    # ROW upfront; these per-element casts then simplify away
    # (SimplifyCasts), leaving a bare multiply-add fold — measured ~30%
    # faster than per-pair casting, and faster than an element_at index
    # fold (which re-pays bounds checks per element).
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda v: v.cast("double") * v.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine vs one stored vector. The query row is
    broadcast; the scan side never shuffles (TakeOrderedAndProject)."""
    vd = F.col(vec_col).cast("array<double>")
    q = df.where(F.col(id_col) == query_vec_id).select(vd.alias("_q"))
    scored = (
        df.where(F.col(id_col) != query_vec_id)
        .select(id_col, vd.alias("_v"))
        .crossJoin(F.broadcast(q))
        .select(
            id_col,
            F.round(cosine(F.col("_v"), F.col("_q")), 6).alias("cosine_sim"),
        )
    )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def _plane_sign(j: int, i: int) -> int:
    """Deterministic ±1 hyperplane entries (seeded linear-congruential
    pattern; any fixed pseudo-random sign matrix works for SimHash-style
    rotation-free LSH)."""
    return 1 if ((j * 1000003 + i * 7919 + 12345) % 97) % 2 == 0 else -1


def lsh_bucket(vec_col: str, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-pattern bucket id: bit j = (v · plane_j) > 0."""
    bits = []
    for j in range(n_planes):
        signs = ", ".join(
            str(_plane_sign(j, i)) for i in range(dim)
        )
        bits.append(
            f"if(aggregate(zip_with({vec_col}, array({signs}),"
            " (v, s) -> cast(v as double) * s), 0D, (acc, x) -> acc + x) > 0,"
            f" shiftleft(1, {j}), 0)"
        )
    return F.expr(" + ".join(bits)).alias("bucket")


def lsh_ann_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: restrict the brute-force scan to the query's
    LSH bucket. At 10^12 rows the bucketed table is the precomputed index
    (partitioned by bucket → partition-pruned scan per query).

    Pass ``dim`` explicitly on hot paths — the ``None`` fallback probes
    the corpus with an extra driver job (convenience only)."""
    if dim is None:
        row = df.where(F.col(id_col) == query_vec_id).select(vec_col).first()
        if row is None:
            raise ValueError(f"query vec_id {query_vec_id} not found")
        dim = len(row[0])
    bucketed = df.withColumn(
        "bucket", lsh_bucket(vec_col, n_planes=n_planes, dim=dim)
    )
    q = bucketed.where(F.col(id_col) == query_vec_id).select(
        F.col(vec_col).alias("_q"), F.col("bucket").alias("_qb")
    )
    cands = bucketed.crossJoin(F.broadcast(q)).where(
        (F.col("bucket") == F.col("_qb")) & (F.col(id_col) != query_vec_id)
    )
    return (
        cands.select(
            id_col,
            F.round(cosine(F.col(vec_col), F.col("_q")), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its nearest centroid (squared-L2 argmin).
    Centroids are a small broadcast-style literal (n_lists × dim); the
    assignment is a map-only pass — at 10^12 rows this is the IVF
    build step, writable as a `list_id`-partitioned index table.

    Argmin shape matters: a when-chain that threads best_id/best_d
    through each step references the previous best TWICE per centroid —
    an exponentially-sized expression tree (2^n_lists copies of the
    first distance) that cost seconds of codegen per job. A dists ARRAY
    + array_position(array_min) is linear; ties keep the first (lowest)
    list id, same as the strict-< chain."""
    vd = F.col(vec_col).cast("array<double>")
    dist_exprs = []
    for c in centroids:
        arr = F.array(*[F.lit(float(v)) for v in c])
        dist_exprs.append(
            F.aggregate(
                F.zip_with(vd, arr, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    out = df.withColumn("_dists", F.array(*dist_exprs))
    return out.withColumn(
        "list_id",
        (F.array_position("_dists", F.array_min("_dists")) - 1).cast("int"),
    ).drop("_dists")


def ivf_train_centroids(
    df: DataFrame,
    n_lists: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Coarse quantizer: k-means via Spark ML, deterministic under the
    fixed seed. ``sample_mod=M`` trains on the deterministic 1/M hash
    sample of the corpus (rows with xxhash64(id) % M == 0) — at 100 TB
    the iterative k-means must never scan the full corpus; a hash sample
    is reproducible across retries, unlike ``df.sample``'s
    partition-order-dependent RNG."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if sample_mod is not None and sample_mod > 1:
        df = df.where(F.pmod(F.xxhash64(F.col(id_col)), sample_mod) == 0)
    feats = df.select(array_to_vector(F.col(vec_col)).alias("features"))
    # random init (seeded): k-means|| runs ~5 extra distributed passes to
    # seed centroids — the right call for clustering QUALITY on huge
    # data, pure overhead for a coarse 8-list quantizer on a sample
    # (measured 3x the fit time for identical planted-neighbor recall)
    model = KMeans(
        k=n_lists, seed=seed, maxIter=10, initMode="random"
    ).fit(feats)
    return [list(map(float, c)) for c in model.clusterCenters()]


def ivf_build_index(
    df: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
) -> None:
    """Materialize the IVF index: the corpus with its list assignment,
    written partitioned by ``list_id``. At 10^12 rows this is the
    one-time build; every query then scans only its probed lists via
    partition pruning (asserted in tests), not the corpus."""
    assigned = ivf_assign(df, centroids, vec_col)
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_query_index(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe a persisted IVF index: rank centroids driver-side (tiny),
    read ONLY the n_probe nearest lists (list_id partition pruning at
    the scan), brute-force within them."""
    dists = sorted(
        range(len(centroids)),
        key=lambda i: sum(
            (a - b) ** 2 for a, b in zip(centroids[i], query_vec)
        ),
    )
    probe = dists[:n_probe]
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    cands = spark.read.parquet(path).where(F.col("list_id").isin(probe))
    return (
        cands.select(
            id_col,
            F.round(cosine(F.col(vec_col), qcol), 6).alias("cosine_sim"),
            "list_id",
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def lsh_build_index(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
) -> None:
    """Materialize the LSH index: corpus + sign-pattern bucket, written
    partitioned by ``bucket`` — the persisted form of lsh_ann_topk's
    bucketing, giving partition-pruned single-bucket scans per query."""
    bucketed = df.withColumn(
        "bucket", lsh_bucket(vec_col, n_planes=n_planes, dim=dim)
    )
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)


def ivf_ann_topk(
    df: DataFrame,
    query_vec_id: int,
    k: int = 10,
    n_lists: int = 8,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: list[list[float]] | None = None,
    train_sample_mod: int | None = None,
) -> DataFrame:
    """IVF approximate top-k (the k-means sibling of lsh_ann_topk): brute
    force only inside the ``n_probe`` inverted lists whose centroids are
    nearest the query. At scale the assigned table is the precomputed
    index, partitioned by ``list_id`` → the probe is a partition-pruned
    scan of n_probe/n_lists of the corpus. Precomputed ``centroids`` are
    the primary path; inline training honors ``train_sample_mod`` so the
    k-means iterations run on a hash sample, never the full corpus."""
    if centroids is None:
        centroids = ivf_train_centroids(
            df, n_lists, vec_col, id_col=id_col, sample_mod=train_sample_mod
        )
    assigned = ivf_assign(df, centroids, vec_col)
    q = assigned.where(F.col(id_col) == query_vec_id).first()
    if q is None:
        raise ValueError(f"query vec_id {query_vec_id} not found")
    qv = list(q[vec_col])
    # driver-side: rank the (tiny) centroid table by distance to the query
    dists = sorted(
        range(len(centroids)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(centroids[i], qv)),
    )
    probe = dists[:n_probe]
    qcol = F.array(*[F.lit(float(v)) for v in qv])
    cands = assigned.where(
        F.col("list_id").isin(probe) & (F.col(id_col) != query_vec_id)
    )
    return (
        cands.select(
            id_col,
            F.round(cosine(F.col(vec_col), qcol), 6).alias("cosine_sim"),
            "list_id",
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )

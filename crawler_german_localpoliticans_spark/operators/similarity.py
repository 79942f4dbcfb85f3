"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with a JVM-side
zip_with/aggregate dot product (no UDF), then a global top-k (Spark's
TakeOrderedAndProject: per-partition heaps, no full sort).

Scale path: LSH-bucketed ANN — deterministic random-hyperplane signatures
assign every vector to a bucket; queries probe only their own bucket
(optionally multi-probe neighbors), turning a 10^10-row scan into a
bucket-pruned read (bucket column is a partition key in production).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import cosine_col


def cosine_topk_bruteforce(
    df: DataFrame, id_col: str, vec_col: str, query: list[float], k: int = 10
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector.
    Ties broken by id for full determinism."""
    qlit = F.array(*[F.lit(float(x)) for x in query])
    scored = df.select(
        F.col(id_col).alias("id"),
        F.round(cosine_col(F.col(vec_col), qlit), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(np.float64)


def with_lsh_bucket(
    df: DataFrame, vec_col: str, dim: int, n_planes: int = 12, seed: int = 42, out_col: str = "bucket"
) -> DataFrame:
    """Sign-random-projection bucket id per vector (vectorized pandas UDF —
    a matrix multiply per Arrow batch)."""
    from pyspark.sql import types as T

    planes = hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(T.IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in vecs])
        signs = (mat @ planes.T) > 0  # (n, n_planes)
        out = np.zeros(len(vecs), dtype=np.int32)
        for i in range(planes.shape[0]):
            out |= signs[:, i].astype(np.int32) << i
        return pd.Series(out)

    return df.withColumn(out_col, bucket(F.col(vec_col)))


def ann_topk_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    dim: int | None = None,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only the query's LSH bucket. At production
    scale the bucket is a partition key, so this is a partition-pruned scan
    instead of a full one."""
    dim = dim or len(query)
    bucketed = with_lsh_bucket(df, vec_col, dim, n_planes, seed)
    planes = hyperplanes(dim, n_planes, seed)
    q = np.asarray(query, dtype=np.float64)
    qb = 0
    signs = (planes @ q) > 0
    for i in range(n_planes):
        if signs[i]:
            qb |= 1 << i
    cand = bucketed.where(F.col("bucket") == int(qb))
    return cosine_topk_bruteforce(cand, id_col, vec_col, query, k)


def ivf_assign(
    df: DataFrame, id_col: str, vec_col: str, n_cells: int = 16, seed: int = 42
) -> tuple[DataFrame, "object"]:
    """IVF coarse quantizer: KMeans cells (deterministic seed) assigned to
    every vector. Returns (df + `cell` column, fitted model). At production
    scale the cell is the partition key of the vector table, so a probe
    reads only nprobe/n_cells of the data."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_features", predictionCol="cell").fit(feat)
    return model.transform(feat).drop("_features"), model


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 2,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only the `nprobe` cells whose centroids are
    closest to the query (IVF-flat search)."""
    assigned, model = ivf_assign(df, id_col, vec_col, n_cells, seed)
    centers = model.clusterCenters()
    q = np.asarray(query, dtype=np.float64)
    dists = [float(np.linalg.norm(np.asarray(c) - q)) for c in centers]
    probe_cells = [c for c, _ in sorted(enumerate(dists), key=lambda t: t[1])[:nprobe]]
    cand = assigned.where(F.col("cell").isin(probe_cells))
    return cosine_topk_bruteforce(cand, id_col, vec_col, query, k)


def pairwise_topk_blocked(
    df: DataFrame, id_col: str, vec_col: str, block_col: str, k: int = 5
) -> DataFrame:
    """Per-vector top-k neighbors within a block (window over the blocked
    pair join) — the all-pairs variant of ann search used for corpus-level
    near-dup mining."""
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
        F.col(block_col).alias("blk"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate(F.transform("vec", lambda x: x * x), F.lit(0.0), lambda a, v: a + v)),
    )
    l, r = base.alias("l"), base.alias("r")
    dot = F.aggregate(
        F.zip_with(F.col("l.vec"), F.col("r.vec"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    pairs = (
        l.join(r, (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") != F.col("r.id")))
        .select(
            F.col("l.id").alias("id"),
            F.col("r.id").alias("neighbor"),
            F.round(dot / (F.col("l.norm") * F.col("r.norm")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("score").desc(), F.col("neighbor").asc())
    return pairs.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)

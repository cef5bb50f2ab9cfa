"""Similarity search over embedding columns (``array<float>``).

Two paths (task brief "training-data pipeline" operators):

- **Brute-force cosine top-k** (the exact baseline; DuckDB-oracled form in
  ``driver_queries.q_ann_cosine``): broadcast the query set, JVM-side
  ``zip_with``/``aggregate`` dot products, ``row_number`` window for top-k.
  Exact, O(|queries|·n) — right answer whenever the query set is small.
- **LSH-bucketed ANN** (the scale path): random-hyperplane signatures
  (deterministic seeded planes, numpy via one Arrow-vectorized pandas UDF),
  multi-probe candidate generation by signature-band equi-join — shuffle
  O(n·bands) instead of a full cross product — then exact cosine re-rank of
  candidates only. Recall is tunable by (n_planes, bands).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType
from pyspark.sql.window import Window

__all__ = ["cosine_topk", "hyperplane_signature_udf", "ann_lsh_topk", "ann_ivf_topk"]

N_PLANES = 16
N_BANDS = 4
_DIM_DEFAULT = 64


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(c):
    return F.sqrt(F.aggregate(F.transform(c, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine; queries broadcast (small side)."""
    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("q"),
    )
    scored = F.broadcast(q).join(emb, F.col("vec_id") != F.col("query_id")).withColumn(
        "cosine", _dot(F.col("q"), F.col("v")) / (_norm(F.col("q")) * _norm(F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def _planes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    rng = np.random.default_rng(20260816)  # fixed seed — deterministic planes
    return rng.standard_normal((n_planes, dim))


def make_signature_udf(dim: int = _DIM_DEFAULT, n_planes: int = N_PLANES):
    planes = _planes(dim, n_planes)

    @F.pandas_udf(LongType())
    def signature(vecs: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in vecs:
            mat = np.stack(
                [
                    np.asarray(v, dtype=np.float64)
                    if v is not None
                    else np.zeros(dim)
                    for v in series
                ]
            )
            bits = (mat @ planes.T) > 0  # (n, n_planes)
            weights = (1 << np.arange(n_planes, dtype=np.int64))
            yield pd.Series(bits.astype(np.int64) @ weights)

    return signature


hyperplane_signature_udf = make_signature_udf()


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    dim: int = _DIM_DEFAULT,
) -> DataFrame:
    """LSH candidate generation + exact cosine re-rank of candidates."""
    sig = make_signature_udf(dim)
    bits_per_band = N_PLANES // N_BANDS
    mask = (1 << bits_per_band) - 1

    def with_bands(df: DataFrame, idc: str, vc) -> DataFrame:
        s = df.withColumn("sig", sig(vc))
        return s.select(
            idc,
            vc.alias("vec"),
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col("sig"), b * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        for b in range(N_BANDS)
                    ]
                )
            ).alias("band", "chunk"),
        )

    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    emb_b = with_bands(emb, "vec_id", F.col("v"))
    q_b = with_bands(q, "query_id", F.col("qv"))
    cand = (
        q_b.withColumnRenamed("vec", "qv")
        .join(emb_b.withColumnRenamed("vec", "v"), ["band", "chunk"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "qv", "vec_id", "v")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.withColumn(
        "cosine", _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# ---------------------------------------------------------------- IVF ANN --

IVF_N_CELLS = 16
IVF_N_PROBE = 2
_IVF_KMEANS_ITERS = 5


def _ivf_centroids(vectors: np.ndarray, n_cells: int = IVF_N_CELLS) -> np.ndarray:
    """Deterministic Lloyd iterations from seeded initial centroids.

    Trained driver-side on a bounded sample (IVF training is always a
    sample-based offline step; the assignment below is the distributed
    part). Fixed seed → same cells every run."""
    rng = np.random.default_rng(20260817)
    n = len(vectors)
    centroids = vectors[rng.choice(n, size=min(n_cells, n), replace=False)].copy()
    for _ in range(_IVF_KMEANS_ITERS):
        # cosine assignment: normalize then argmax dot
        vn = vectors / np.maximum(np.linalg.norm(vectors, axis=1, keepdims=True), 1e-12)
        cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
        assign = (vn @ cn.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = vectors[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def make_cell_assign_udf(centroids: np.ndarray, n_probe: int = 1):
    """vector → array of the n_probe nearest cell ids (numpy-vectorized)."""
    cn = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def assign(vecs: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for series in vecs:
            mat = np.stack([np.asarray(v, dtype=np.float64) for v in series])
            mn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mn @ cn.T
            top = np.argsort(-sims, axis=1)[:, :n_probe]
            yield pd.Series([row.astype(int).tolist() for row in top])

    return assign


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_cells: int = IVF_N_CELLS,
    n_probe: int = IVF_N_PROBE,
    train_sample: int = 4096,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize into cells, probe the query's nearest
    ``n_probe`` cells, exact cosine re-rank within probed cells only.

    Shuffle shape: equi-join on ``cell`` — O(n·1) for the index side and
    O(q·n_probe) for queries; the cross product never materializes."""
    sample = np.stack(
        [
            np.asarray(r[0], dtype=np.float64)
            for r in embeddings.select(vec_col).limit(train_sample).collect()
        ]
    )
    centroids = _ivf_centroids(sample, n_cells)
    assign1 = make_cell_assign_udf(centroids, n_probe=1)
    assign_p = make_cell_assign_udf(centroids, n_probe=n_probe)

    emb = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("cell", F.element_at(assign1(F.col("v")), 1))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("cell", F.explode(assign_p(F.col("qv"))))

    cand = q.join(emb, "cell").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.withColumn(
        "cosine", _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    ).dropDuplicates(["query_id", "vec_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )

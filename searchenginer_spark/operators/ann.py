"""Similarity search over embedding columns.

The reference's vector path is FAISS IndexFlatIP over FastText doc vectors
(/root/reference/srpc/PageSearch/server.pb_skeleton.cc:288-302, :172-178 —
exact inner-product top-10 over L2-normalized vectors). Spark-native
equivalents:

  cosine_topk       exact brute force — JVM `F.zip_with`/`F.aggregate`
                    column math, distributed scan + TakeOrderedAndProject.
                    This IS IndexFlatIP at cluster scale.
  srp_buckets /     signed-random-projection LSH: deterministic hyperplanes
  ann_lsh_topk      (seeded splitmix stream), bucket = sign-bit code; the
                    query probes only its bucket (optionally hamming-1
                    neighbors). The scale path when a full scan per query
                    is too expensive; recall traded for bucket pruning.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(_dot(a, a))


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    embeddings: DataFrame,
    query_vec,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine similarity against a literal query vector."""
    q = _lit_vec(query_vec)
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    denom = _norm(F.col(vec_col).cast("array<double>")) * F.lit(qn)
    # zero-norm vectors (query or row) define cosine as 0, never div-by-zero
    cos = F.when(
        denom > 0, _dot(F.col(vec_col).cast("array<double>"), q) / denom
    ).otherwise(F.lit(0.0))
    cos = F.round(cos, round_to) if round_to is not None else cos
    return (
        embeddings.select(F.col(id_col), cos.alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def ivf_build(
    embeddings: DataFrame,
    n_lists: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    max_iter: int = 10,
) -> tuple[np.ndarray, DataFrame]:
    """IVF coarse quantizer: k-means centroids + per-vector list assignment.

    Returns (centroids[n_lists, dim], embeddings + ``list_id``). This is the
    FAISS IVF structure rebuilt Spark-native: train with pyspark.ml KMeans
    (distributed Lloyd's), store the inverted lists as a ``list_id``
    partition/bucket column. At scale the bucketed table is written
    ``partitionBy('list_id')`` so a probe reads only nprobe partitions.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = embeddings.withColumn("_fv", array_to_vector(F.col(vec_col).cast("array<double>")))
    km = KMeans(k=n_lists, seed=seed, maxIter=max_iter, featuresCol="_fv", predictionCol="list_id")
    model = km.fit(feat)
    centroids = np.vstack([np.asarray(c) for c in model.clusterCenters()])
    assigned = model.transform(feat).drop("_fv")
    return centroids, assigned


def ivf_topk(
    bucketed: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest inverted lists, exact
    cosine inside them (FAISS IVF-Flat search shape,
    /root/reference/srpc/PageSearch/server.pb_skeleton.cc:288-302 analog)."""
    qv = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - qv) ** 2).sum(axis=1)
    probes = np.argsort(d2)[:nprobe].tolist()
    cand = bucketed.filter(F.col("list_id").isin(probes))
    return cosine_topk(cand, query_vec, k=k, id_col=id_col, vec_col=vec_col, round_to=round_to)


def _planes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic SRP hyperplanes (Gaussian via seeded RNG)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def srp_code(vec_col: Column, planes: np.ndarray) -> Column:
    """LSH bucket id = sign bits of <plane_i, v> packed into a long."""
    code = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bit = F.when(_dot(vec_col, _lit_vec(plane)) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        code = code.bitwiseXOR(F.shiftleft(bit, i))
    return code


def srp_buckets(
    embeddings: DataFrame,
    n_planes: int = 12,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """embeddings + ``bucket`` column (2^n_planes buckets). Precompute once,
    write partitioned/bucketed by ``bucket`` for probe-time pruning."""
    first = embeddings.select(vec_col).first()
    if first is None or first[0] is None:  # empty input: nothing to bucket
        return embeddings.withColumn("bucket", F.lit(0).cast("long"))
    dim = len(first[0])
    planes = _planes(dim, n_planes, seed)
    return embeddings.withColumn(
        "bucket", srp_code(F.col(vec_col).cast("array<double>"), planes)
    )


def ann_lsh_topk(
    bucketed: DataFrame,
    query_vec,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe the query's SRP bucket (+ hamming<=1
    neighbors) then exact cosine inside the probed buckets."""
    qv = np.asarray(query_vec, dtype=np.float64)
    planes = _planes(len(qv), n_planes, seed)
    qcode = 0
    for i, plane in enumerate(planes):
        if float(plane @ qv) > 0:
            qcode |= 1 << i
    probes = [qcode]
    if probe_hamming >= 1:
        probes += [qcode ^ (1 << i) for i in range(n_planes)]
    cand = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(
        cand, query_vec, k=k, id_col=id_col, vec_col=vec_col, round_to=round_to
    )

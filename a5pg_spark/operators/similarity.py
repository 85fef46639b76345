"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: JVM-native dot products via
  ``aggregate``/``zip_with`` (no Python), window top-k.
* SRP-LSH bucketed ANN — the scale path: deterministic sign-random-projection
  buckets computed in one Arrow-batched NumPy matmul per batch, then plain
  equi-joins; recall grows with ``tables``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def dot_col(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def norm_col(a: str) -> F.Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
    )


def cosine_sim_col(a: str, b: str) -> F.Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def cosine_topk(queries: DataFrame, corpus: DataFrame, k: int,
                qid: str = "qid", cid: str = "vec_id",
                qvec: str = "qe", cvec: str = "embedding") -> DataFrame:
    """Exact brute-force cosine top-k: broadcast the (small) query side, scan
    the corpus once, window top-k.  100 TB shape: queries ≪ corpus."""
    cand = F.broadcast(queries).crossJoin(corpus).filter(
        F.col(qid) != F.col(cid)
    ).withColumn("cos_sim", cosine_sim_col(qvec, cvec))
    w = Window.partitionBy(qid).orderBy(F.col("cos_sim").desc(), F.col(cid).asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(qid, cid, F.round("cos_sim", 6).alias("cos_sim"), "rk")
    )


def embedding_dim(df: DataFrame, vec_col: str) -> int | None:
    """Embedding width from column metadata (attach with
    :func:`with_dim_metadata` at load time), or ``None`` if absent."""
    try:
        md = df.schema[vec_col].metadata
    except KeyError:
        return None
    return int(md["dim"]) if md and "dim" in md else None


def with_dim_metadata(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Record the embedding width on the column so ANN operators never have
    to run a one-row probe job (schema-level plumbing; zero data movement)."""
    return df.withColumn(
        vec_col, F.col(vec_col).alias(vec_col, metadata={"dim": int(dim)})
    )


def _resolve_dim(df: DataFrame, vec_col: str, dim: int | None) -> int:
    """dim precedence: explicit arg > column metadata > one-row probe job.
    The probe is the last resort only — production loaders attach metadata."""
    if dim is not None:
        return int(dim)
    md = embedding_dim(df, vec_col)
    if md is not None:
        return md
    return int(df.select(F.size(F.col(vec_col)).alias("d")).first().d)


def _srp_planes(dim: int, planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, planes))


def srp_bucket(df: DataFrame, vec_col: str = "embedding", planes: int = 16,
               seed: int = 11, out_col: str = "__bucket",
               dim: int | None = None) -> DataFrame:
    """Add a sign-random-projection bucket id (one NumPy matmul per Arrow
    batch — vectorized across rows).  Pass ``dim`` to skip the one-row
    dimension-probe driver job (round-3 ADVICE: no ``.first()`` in ANN
    plans when the caller knows the embedding width)."""
    spark = df.sparkSession
    dim = _resolve_dim(df, vec_col, dim)
    P = _srp_planes(dim, planes, seed)
    bc = spark.sparkContext.broadcast(P)

    @pandas_udf(LongType())
    def bucket(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy())
        proj = M.astype(np.float64) @ bc.value
        bits = (proj > 0).astype(np.uint64)
        ids = (bits << np.arange(bits.shape[1], dtype=np.uint64)[None, :]).sum(axis=1)
        return pd.Series(ids.view(np.int64))

    return df.withColumn(out_col, bucket(F.col(vec_col)))


def srp_buckets_all(df: DataFrame, vec_col: str, planes: int, tables: int,
                    seed: int, out_col: str = "__tb",
                    dim: int | None = None) -> DataFrame:
    """Explode each row into ``tables`` bucket keys computed in ONE matmul:
    key = table_index * 2^planes + bucket.  One corpus scan serves every
    table (round 1 scanned the corpus once per table).  Pass ``dim`` to skip
    the one-row dimension-probe driver job."""
    spark = df.sparkSession
    dim = _resolve_dim(df, vec_col, dim)
    P = np.concatenate(
        [_srp_planes(dim, planes, seed + t) for t in range(tables)], axis=1
    )  # (dim, tables*planes)
    bc = spark.sparkContext.broadcast(P)

    from pyspark.sql.types import ArrayType

    @pandas_udf(ArrayType(LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        proj = M @ bc.value                       # (n, tables*planes)
        bits = (proj > 0).astype(np.uint64).reshape(len(M), tables, planes)
        ids = (bits << np.arange(planes, dtype=np.uint64)[None, None, :]).sum(axis=2)
        ids = ids + (np.arange(tables, dtype=np.uint64)[None, :] << np.uint64(planes))
        return pd.Series(list(ids.view(np.int64)))

    return df.withColumn(out_col, F.explode(buckets(F.col(vec_col))))


def srp_ann_topk(queries: DataFrame, corpus: DataFrame, k: int,
                 qid: str = "qid", cid: str = "vec_id",
                 qvec: str = "qe", cvec: str = "embedding",
                 planes: int = 12, tables: int = 4, seed: int = 11,
                 dim: int | None = None) -> DataFrame:
    """Approximate top-k: ``tables`` independent SRP tables in a SINGLE pass
    per side (all buckets from one matmul, exploded with a table tag), one
    equi-join on the tagged bucket, exact cosine rank within candidates.
    The join is broadcastable/AQE-skew-splittable at scale."""
    # one resolution shared by both sides (queries are the small side)
    dim = _resolve_dim(queries, qvec, dim)
    qb = srp_buckets_all(queries, qvec, planes, tables, seed, dim=dim)
    cb = srp_buckets_all(corpus, cvec, planes, tables, seed, dim=dim)
    cand = (
        qb.join(cb, "__tb")
        .filter(F.col(qid) != F.col(cid))
        .select(qid, cid, qvec, cvec)
        .dropDuplicates([qid, cid])
        .withColumn("cos_sim", cosine_sim_col(qvec, cvec))
    )
    w = Window.partitionBy(qid).orderBy(F.col("cos_sim").desc(), F.col(cid).asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(qid, cid, F.round("cos_sim", 6).alias("cos_sim"), "rk")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means-quantizer scale path
# ---------------------------------------------------------------------------

def kmeans_fit(X: np.ndarray, k: int, iters: int = 5, seed: int = 13) -> np.ndarray:
    """Deterministic Lloyd's k-means (float64, fixed iterations, seeded
    init by sampling rows).  Used on a bounded driver-side SAMPLE — the
    standard IVF recipe at 100 TB: train the coarse quantizer on a sample,
    assign the full corpus distributedly."""
    X = np.asarray(X, dtype=np.float64)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def _ivf_lists_udf(C: np.ndarray, nprobe: int):
    """pandas UDF factory: vector -> nprobe nearest centroid ids (first id
    is the assignment list).  One matmul per Arrow batch."""
    from pyspark.sql.types import ArrayType

    Cf = np.asarray(C, dtype=np.float64)

    @pandas_udf(ArrayType(LongType()))
    def lists(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        d = ((M[:, None, :] - Cf[None, :, :]) ** 2).sum(axis=2)
        idx = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(idx.astype(np.int64)))

    return lists


def ivf_ann_topk(queries: DataFrame, corpus: DataFrame, k: int,
                 centroids: np.ndarray, nprobe: int = 4,
                 qid: str = "qid", cid: str = "vec_id",
                 qvec: str = "qe", cvec: str = "embedding") -> DataFrame:
    """IVF ANN: corpus rows live in ONE inverted list (nearest centroid);
    queries probe their ``nprobe`` nearest lists; exact cosine re-rank among
    candidates.  The join is an equi-join on list id — broadcastable for
    small query sets, shuffle-partitioned by list otherwise; lists shard the
    corpus so each probe touches ~nprobe/n_centroids of the data."""
    assign1 = _ivf_lists_udf(centroids, 1)
    assignP = _ivf_lists_udf(centroids, nprobe)
    cb = corpus.withColumn("__list", F.element_at(assign1(F.col(cvec)), 1))
    qb = queries.withColumn("__list", F.explode(assignP(F.col(qvec))))
    cand = (
        qb.join(cb, "__list")
        .filter(F.col(qid) != F.col(cid))
        .select(qid, cid, qvec, cvec)
        .dropDuplicates([qid, cid])
        .withColumn("cos_sim", cosine_sim_col(qvec, cvec))
    )
    w = Window.partitionBy(qid).orderBy(F.col("cos_sim").desc(), F.col(cid).asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(qid, cid, F.round("cos_sim", 6).alias("cos_sim"), "rk")
    )

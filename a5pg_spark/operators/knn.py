"""kNN lookup via A5 hierarchy ring expansion (SURVEY.md §2.4.2).

The reference has no k-ring; the A5-native expansion is containment-based:
probe cell → parent at res−Δ → candidate equi-join on the shared prefix →
exact haversine → windowed top-k.  A ring's result is only accepted when it
is *provably* complete: the k-th candidate distance must be ≤ a conservative
lower bound on the query's clearance to its prefix-cell boundary (a nearer
point could otherwise hide just across the boundary).  Unsatisfied queries
escalate Δ; a final global pass guarantees exactness in sparse regions.

Scale notes: every round is a plain equi-join on a bit-mask prefix (AQE
skew-join splits hot cells); distances are native haversine (whole-stage
codegen).  Python appears only in the per-query clearance bound — O(queries),
not O(points).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..core import cells as _cells
from ..functions import a5_lonlat_to_cell
from .geometry import haversine_m, haversine_np

_CLEAR_SEGMENTS = 16


@pandas_udf(DoubleType())
def _clearance_m(prefix: pd.Series, qlon: pd.Series, qlat: pd.Series) -> pd.Series:
    """Conservative lower bound (meters) on the distance from each query to
    its prefix-cell boundary: min distance to densified boundary samples
    minus half the largest inter-sample gap."""
    ids = prefix.fillna(0).astype("int64").to_numpy()  # no float64 intermediate (>53-bit ids)
    lo = qlon.to_numpy(dtype=np.float64)
    la = qlat.to_numpy(dtype=np.float64)
    rings = _cells.cell_to_boundary_batch(ids, closed_ring=True,
                                          segments=_CLEAR_SEGMENTS)
    out = np.empty(len(ids), dtype=np.float64)
    for i, ring in enumerate(rings):
        d = haversine_np(lo[i], la[i], ring[:, 0], ring[:, 1])
        gaps = haversine_np(ring[:-1, 0], ring[:-1, 1], ring[1:, 0], ring[1:, 1])
        out[i] = max(0.0, float(d.min()) - float(gaps.max()) / 2.0)
    return pd.Series(out)


def knn_join(
    queries: DataFrame,
    points: DataFrame,
    k: int,
    res: int = 12,
    deltas: tuple = (3, 6, 9),
    query_id: str = "qid",
    point_id: str = "pid",
) -> DataFrame:
    """For each query (qid, lon, lat) return its exact k nearest points
    (pid, lon, lat) by great-circle distance."""
    from ..functions_native import encode_native

    q = encode_native(
        queries.select(
            query_id, F.col("lon").alias("qlon"), F.col("lat").alias("qlat")
        ),
        "qlon", "qlat", res, "qcell",
    ).persist()
    # persist the encoded point side: each escalation round re-derives only
    # the cheap bit-math prefix (round 1 re-ran the encode over the full
    # point table once per round); encode is JVM-native (functions_native)
    p = encode_native(
        points.select(
            point_id, F.col("lon").alias("plon"), F.col("lat").alias("plat")
        ),
        "plon", "plat", res, "pcell",
    ).persist()
    try:
        return _knn_ladder(q, p, k, res, deltas, query_id, point_id)
    finally:
        # repeated knn_join calls in one session must not accumulate executor
        # storage (round-3 ADVICE); the result is eagerly checkpointed inside
        # _knn_ladder before the caches are dropped
        q.unpersist()
        p.unpersist()


def _knn_ladder(q, p, k, res, deltas, query_id, point_id) -> DataFrame:
    # escalation ladder: the configured deltas, then one final coarse round at
    # res 2 (clearance bounds need target >= 2 — res-1 quintants 0-11 alias
    # res-0 faces and would overestimate clearance) before conceding to the
    # exact global fallback
    targets = []
    for delta in deltas:
        t = max(2, res - delta)
        if t not in targets:
            targets.append(t)
    if 2 not in targets:
        targets.append(2)

    result = None
    remaining = q
    for target in targets:
        qe = remaining.withColumn(
            "prefix",
            F.call_function("a5_cell_to_parent", F.col("qcell"), F.lit(target)),
        ).withColumn("clear_m", _clearance_m(F.col("prefix"), F.col("qlon"), F.col("qlat")))
        pe = p.withColumn(
            "prefix",
            F.call_function("a5_cell_to_parent", F.col("pcell"), F.lit(target)),
        )
        cand = qe.join(pe, "prefix").withColumn(
            "dist_m", haversine_m(F.col("qlon"), F.col("qlat"), F.col("plon"), F.col("plat"))
        )
        w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(point_id).asc())
        topk = cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
        # a query is DONE only if it has k candidates AND the k-th distance is
        # provably inside the prefix cell (no nearer point can be outside)
        status = topk.groupBy(query_id, "clear_m").agg(
            F.count("*").alias("__n"), F.max("dist_m").alias("__dk")
        )
        done_ids = status.filter(
            (F.col("__n") >= k) & (F.col("__dk") <= F.col("clear_m"))
        ).select(query_id)
        done = topk.join(F.broadcast(done_ids), query_id, "left_semi").select(
            query_id, point_id, "dist_m", "rk"
        )
        result = done if result is None else result.unionByName(done)
        # localCheckpoint cuts the growing anti-join lineage: each round's
        # remaining is materialized once instead of recomputed per reference
        remaining = remaining.join(
            F.broadcast(done_ids), query_id, "left_anti"
        ).localCheckpoint(eager=True)
        if remaining.isEmpty():
            return result.localCheckpoint(eager=True)
    # exact global fallback for still-unsatisfied queries
    cand = remaining.crossJoin(p).withColumn(
        "dist_m", haversine_m(F.col("qlon"), F.col("qlat"), F.col("plon"), F.col("plat"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dist_m").asc(), F.col(point_id).asc())
    topk = (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(query_id, point_id, "dist_m", "rk")
    )
    out = result.unionByName(topk) if result is not None else topk
    # materialize before the caller's finally drops the q/p caches
    return out.localCheckpoint(eager=True)

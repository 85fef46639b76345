"""Set-level compact/uncompact over cell columns (SURVEY.md §2.1 #13-14).

The reference's ``a5_compact``/``a5_uncompact`` are array-valued scalar
functions (src/lib.rs:189-222) — fine for small arrays, wrong shape for 10^12
cells.  The engine-native form operates on a *column* of cells:

* ``uncompact_cells``: explode children natively (sequence + transform).
* ``compact_cells``: iterative sibling-collapse — one hash aggregation per
  level: cells whose 4-sibling group is complete are replaced by the parent,
  repeat until fixpoint.  Each round is a single shuffle keyed by parent
  (map-side partial counts make complete groups cheap); rounds are bounded by
  the resolution span, not data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def uncompact_cells(df: DataFrame, target_res: int, cell_col: str = "cell") -> DataFrame:
    """Expand every cell to its descendants at ``target_res`` (one explode)."""
    kids = F.call_function(
        "a5_cell_to_children", F.col(cell_col), F.lit(target_res)
    )
    return (
        df.withColumn("__kids", kids)
        .select(F.explode("__kids").alias(cell_col))
    )


def compact_cells(df: DataFrame, cell_col: str = "cell", max_rounds: int = 28) -> DataFrame:
    """Replace complete 4-sibling groups (5 at res 1→0) by their parent, to a
    fixpoint.  Input is deduplicated; output is the minimal equivalent set."""
    cur = df.select(F.col(cell_col).alias("cell")).distinct()
    for _ in range(max_rounds):
        res = F.call_function("a5_get_resolution", F.col("cell"))
        with_parent = cur.withColumn("__res", res).withColumn(
            "__parent",
            F.when(
                F.col("__res") >= 1,
                F.call_function("a5_cell_to_parent", F.col("cell"), F.col("__res") - F.lit(1)),
            ),
        )
        need = F.when(
            F.call_function("a5_get_resolution", F.col("__parent")) == 0, 5
        ).otherwise(4)
        groups = (
            with_parent.filter(F.col("__parent").isNotNull())
            .groupBy("__parent")
            .agg(F.countDistinct("cell").alias("__n"))
            .withColumn("__need", need)
            .filter(F.col("__n") >= F.col("__need"))
            .select(F.col("__parent").alias("__p"))
        )
        if groups.isEmpty():
            return cur
        collapsed = (
            with_parent.join(
                F.broadcast(groups), with_parent["__parent"] == groups["__p"], "left"
            )
            .withColumn("__keep", F.col("__p").isNull())
        )
        survivors = collapsed.filter("__keep").select("cell")
        parents = groups.select(F.col("__p").alias("cell")).distinct()
        cur = survivors.unionByName(parents).distinct().localCheckpoint(eager=True)
    return cur

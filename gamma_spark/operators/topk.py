"""Per-group top-k selection.

The reference selects top-k with faiss binary heaps per query
(`index/impl/gamma_index_ivfpq.cc:570-596`). The Spark translation is a
window ``row_number() <= k`` partitioned by the query id.

Scale note: a window shuffles every candidate row to its group's
reducer, so this must only ever see a *reduced* candidate relation. The
reduction itself lives upstream: the brute-force scan kernel
(:func:`gamma_spark.operators.knn.knn_scan`) keeps per-input-partition
heaps (mirroring gamma's per-chunk heaps, `gamma_index_flat.cc:234-268`)
and emits only ``k`` rows per (query, partition); IVF search only emits
candidates from ``nprobe`` buckets. Feeding the raw |docs| x |queries|
cross product through here is correct but intentionally the slow path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    k: int,
    ascending: bool,
    rank_col: str | None = "rank",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Keep the k best rows per group ordered by ``order_col``.

    Ties are broken by ``tiebreak_cols`` (default: none — callers on
    continuous scores) to keep results deterministic.
    """
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    for c in tiebreak_cols or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    if rank_col:
        return out.withColumnRenamed("_rn", rank_col)
    return out.drop("_rn")

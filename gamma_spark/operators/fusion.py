"""Multi-vector score fusion (SURVEY R1-R4) — gamma's only join.

When a Request has >1 VectorQuery, gamma intersects the per-field top-k
result lists on docid (k-way sort-merge, `vector/vector_manager.cc:
501-561`): a doc must appear in *every* field's top-k; its fused score
is the boost-weighted sum of per-field scores
(`vector/vector_manager.cc:532-535,599-606`), then ``multi_vector_rank``
re-sorts by total score with metric direction (IP desc / L2 asc,
comparators `vector/vector_manager.cc:15-21`).

Spark translation: k-way **inner join on (qid, _docid)** + weighted sum
+ window top-k. The per-field results are already tiny (k rows per
query), so these joins are broadcast-sized no matter how big the docs
relation was.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gamma_spark.functions.vector import metric_ascending
from gamma_spark.operators.topk import topk


def collapse_vids(
    hits: DataFrame,
    metric: str = "IP",
    vid_col: str = "_vid",
    docid_col: str = "_docid",
) -> DataFrame:
    """R1 (`parse_index_search_result`, `vector/vector_manager.cc:386-429`):
    gamma permits multiple vectors per doc for one field (multiple vids
    map to one docid via VIDMgr); after a vid-level kNN, keep only the
    best-scoring vid per (query, doc).

    Input: (qid, vid_col, docid_col, score); output: (qid, _docid,
    score) with score = best per doc (max for IP/cosine, min for
    L2/Hamming) — a map-side-combinable aggregation."""
    best = F.min("score") if metric_ascending(metric) else F.max("score")
    return (
        hits.groupBy("qid", F.col(docid_col).alias("_docid"))
        .agg(best.alias("score"))
    )


def fuse(
    per_field: list[DataFrame],
    boosts: list[float] | None = None,
    metric: str = "IP",
    k: int | None = None,
    rank: bool = True,
) -> DataFrame:
    """Fuse per-field kNN results (each (qid, _docid, score, ...)).

    Returns (qid, _docid, score) where score = sum_i boost_i * score_i
    over fields, restricted to docs present in every field's top-k.
    ``rank=False`` preserves gamma's multi_vector_rank=0 mode (docid
    order, `vector/vector_manager.cc:562-575`); k=None returns all
    intersected docs.
    """
    if not per_field:
        raise ValueError("fuse() needs at least one per-field result")
    if boosts is None:
        boosts = [1.0] * len(per_field)
    if len(boosts) != len(per_field):
        raise ValueError("boosts must match per_field")

    fused = None
    score_cols = []
    for i, (df, b) in enumerate(zip(per_field, boosts)):
        part = df.select(
            "qid", "_docid", (F.col("score") * F.lit(float(b))).alias(f"_s{i}")
        )
        score_cols.append(f"_s{i}")
        fused = part if fused is None else fused.join(part, on=["qid", "_docid"], how="inner")

    total = F.col(score_cols[0])
    for c in score_cols[1:]:
        total = total + F.col(c)
    out = fused.select("qid", "_docid", total.alias("score"))

    asc = metric_ascending(metric)
    if rank and k is not None:
        return topk(out, ["qid"], "score", k, ascending=asc, tiebreak_cols=["_docid"])
    if rank:
        return out.orderBy("qid", F.col("score").asc() if asc else F.col("score").desc())
    return out.orderBy("qid", F.col("_docid").asc())

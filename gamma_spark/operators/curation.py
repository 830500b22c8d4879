"""End-to-end corpus curation: annotate -> quality gate -> near-dup
dedup of survivors -> one keep/drop decision per document.

This is the composite an LLM-data-pipeline user actually runs over the
raw corpus (the north-star extension surface, BASELINE.json): the
individual operators — quality scoring and language id
(:mod:`gamma_spark.functions.text`), minhash LSH + exact-Jaccard verify
(:mod:`gamma_spark.operators.dedup`), and dup-group resolution
(:mod:`gamma_spark.operators.groups`) — compose into one decision table:

    (id, lang, quality, passed_filter, group_id, group_size,
     keeper_id, kept)

``filter(kept)`` IS the curated corpus. Keeper policy: the
highest-quality member of each near-dup group survives (ties break to
the min id, making the result deterministic and oracle-checkable).

100 TB shape: the annotation pass is pure Catalyst expressions (one
map-only scan); the gate prunes the corpus BEFORE any shuffle-bearing
dedup stage runs (near-dup mining only ever sees survivors); the dedup
pipeline itself is the staged LSH -> verify -> connected-components
chain whose scale analysis lives in docs/SCALING.md. The final decision
join is id-keyed; every intermediate that is consumed twice is staged.

Reference parity note: vearch/gamma has no curation surface (its
pipeline ends at vector search); this operator is part of the
LLM-data-pipeline extension the brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gamma_spark.functions import text as T
from gamma_spark.operators import dedup as D
from gamma_spark.operators import groups as G
from gamma_spark.session import stage

#: defaults tuned for the synthetic documents table: quality 0.5 keeps
#: ~80%, the lang gate keeps the marker-bearing majority class.
MIN_QUALITY = 0.5
LANGS = ("en",)


def curate_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = MIN_QUALITY,
    langs: tuple[str, ...] = LANGS,
    n: int = 3,
    jaccard_threshold: float = 0.3,
) -> DataFrame:
    """One row per input doc: annotation + gate verdict + dup-group
    decision. ``kept`` = passed the gate AND is its group's keeper
    (non-survivors have NULL group columns and kept = false)."""
    annotated = stage(
        docs.select(
            F.col(id_col),
            F.col(text_col).alias("_text"),
            T.quality_score(text_col).alias("quality"),
            T.lang_id(text_col).alias("lang"),
        ).withColumn(
            "passed_filter",
            (F.col("quality") >= min_quality) & F.col("lang").isin(*langs),
        )
    )
    gated = annotated.filter(F.col("passed_filter"))
    pairs = D.minhash_verified_pairs(gated, id_col, "_text", n, jaccard_threshold)
    resolved = G.resolve_groups(pairs, gated, id_col, keeper_order=F.col("quality"))
    decisions = resolved.select(
        id_col, "group_id", "group_size", "keeper_id",
        F.col("is_keeper").alias("_is_keeper"),
    )
    return (
        annotated.join(decisions, on=id_col, how="left")
        .select(
            id_col,
            "lang",
            "quality",
            "passed_filter",
            "group_id",
            "group_size",
            "keeper_id",
            F.coalesce(F.col("_is_keeper"), F.lit(False)).alias("kept"),
        )
    )


def sql_curate_corpus(
    table: str,
    id_col: str,
    text_col: str,
    min_quality: float = MIN_QUALITY,
    langs: tuple[str, ...] = LANGS,
    n: int = 3,
    jaccard_threshold: float = 0.3,
) -> str:
    """DuckDB twin: identical annotate/gate expressions, the
    minhash-verified pair relation over the gated subquery, and the
    recursive-CTE group resolution — composed exactly like the Spark
    plan so the decision table hash-matches."""
    q = T.sql_quality_score(text_col)
    lang = T.sql_lang_id(text_col)
    in_list = ", ".join(f"'{x}'" for x in langs)
    gated = (
        f"SELECT {id_col}, {text_col}, {q} AS _q FROM {table} "
        f"WHERE {q} >= {min_quality} AND {lang} IN ({in_list})"
    )
    pairs = D.sql_minhash_verified_pairs(
        f"({gated})", id_col, text_col, n, jaccard_threshold
    )
    resolved = G.sql_resolve_groups(pairs, f"({gated})", id_col, "n._q")
    return f"""
WITH ann AS (
  SELECT {id_col}, {q} AS quality, {lang} AS lang,
         ({q} >= {min_quality} AND {lang} IN ({in_list})) AS passed_filter
  FROM {table}
),
resolved AS (SELECT * FROM ({resolved}) r)
SELECT a.{id_col}, a.lang, a.quality, a.passed_filter,
       d.group_id, d.group_size, d.keeper_id,
       coalesce(d.is_keeper, FALSE) AS kept
FROM ann a LEFT JOIN resolved d ON a.{id_col} = d.{id_col}
"""

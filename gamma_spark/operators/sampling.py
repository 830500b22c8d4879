"""Deterministic sampling / data-mixing operators (north-star
extension, like functions/text.py: not reference surface — gamma has no
sampling — but core operations of a 100 TB training-data pipeline:
building a training mix means drawing reproducible per-source /
per-language fractions and quotas from the curated corpus).

Everything is **hash-gated, never rand()**: a row's fate depends only
on its key, so samples are reproducible across runs, engines, cluster
sizes and retries (rand() is none of those under task retry), the gate
is a pure Catalyst expression predicate evaluated in the scan stage
(no UDF, no shuffle — a 1% sample is a narrow filter; the md5
derivation itself is not a parquet-pushable predicate, but nothing
past the scan ever sees a dropped row), and membership is *stable
under corpus growth*: adding rows never flips an existing row in or
out.

The hash is the md5-derived 60-bit int from functions/text.py, verified
bit-identical between Spark and DuckDB, so every operator here has an
exact SQL oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gamma_spark.functions.text import hash60, sql_hash60

#: hash-gate resolution: fraction f keeps rows with unit < f where
#: unit = hash60/2^60 in [0, 1)
_HASH_SPAN = float(1 << 60)


def _unit(key: Column | str, salt: str = "") -> Column:
    key = F.col(key) if isinstance(key, str) else key
    k = key.cast("string")
    if salt:
        k = F.concat(F.lit(salt), F.lit(":"), k)
    return hash60(k).cast("double") / F.lit(_HASH_SPAN)


def sql_unit(key: str, salt: str = "") -> str:
    k = f"({key})::VARCHAR"
    if salt:
        k = f"'{salt}:' || {k}"
    return f"(({sql_hash60(k)})::DOUBLE / {_HASH_SPAN!r})"


def deterministic_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by the key hash alone.
    ``salt`` decorrelates independent samples over the same keys
    (e.g. a train/eval split uses two salts)."""
    return df.filter(_unit(key_col, salt) < F.lit(float(fraction)))


def sample_mixture(
    df: DataFrame,
    group_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-group sampling rates in one pass — the data-mixing
    primitive ("keep 100% of lang A, 30% of B, drop the rest"). The
    per-row gate is a CASE over ``fractions``; groups not listed get
    ``default``."""
    # ONE flat CaseWhen with N branches, not N nested CaseWhen nodes:
    # arms are mutually exclusive equality tests, and a realistic mix
    # (hundreds of languages/sources) as a nested chain builds an
    # expression tree hundreds of levels deep that Catalyst must
    # analyze recursively (stack/codegen-depth risk)
    items = sorted(fractions.items())
    if not items:
        return df.filter(_unit(key_col, salt) < F.lit(float(default)))
    rate = F.when(F.col(group_col) == items[0][0], F.lit(float(items[0][1])))
    for g, f in items[1:]:
        rate = rate.when(F.col(group_col) == g, F.lit(float(f)))
    rate = rate.otherwise(F.lit(float(default)))
    return df.filter(_unit(key_col, salt) < rate)


def sql_sample_mixture(
    group_col: str,
    fractions: dict[str, float],
    key_col: str,
    default: float = 0.0,
    salt: str = "",
) -> str:
    """WHERE-clause twin of :func:`sample_mixture` (CASE evaluation
    order is irrelevant: arms are mutually exclusive equality tests).
    Group keys are single-quote-escaped; an empty ``fractions`` emits
    the bare default instead of a WHEN-less CASE (a parse error)."""
    if not fractions:
        return f"{sql_unit(key_col, salt)} < {float(default)!r}"
    arms = " ".join(
        f"WHEN {group_col} = '{str(g).replace(chr(39), chr(39) * 2)}' "
        f"THEN {float(f)!r}"
        for g, f in sorted(fractions.items())
    )
    return f"{sql_unit(key_col, salt)} < (CASE {arms} ELSE {float(default)!r} END)"


def stratified_quota(
    df: DataFrame, group_col: str, quota: int, key_col: str, salt: str = ""
) -> DataFrame:
    """At most ``quota`` rows per group, chosen by hash order (a
    deterministic uniform draw without replacement) — "take 10k docs
    per language". Hash order, not data order: a head()/limit() per
    group would bias toward storage order.

    Scale shape: one shuffle on ``group_col`` + per-group top-k window
    — identical profile to the engine's top-k operator. Skewed groups
    bound at quota rows out per group."""
    w = Window.partitionBy(group_col).orderBy(
        _unit(key_col, salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_sq_rn", F.row_number().over(w))
        .filter(F.col("_sq_rn") <= quota)
        .drop("_sq_rn")
    )


def sql_stratified_quota(
    table: str, group_col: str, quota: int, key_col: str, salt: str = "",
    select: str = "* EXCLUDE (_sq_rn)",
) -> str:
    """DuckDB twin of :func:`stratified_quota`. The default ``select``
    drops the ``_sq_rn`` helper (DuckDB's EXCLUDE) to match the Spark
    twin's schema — a bare ``*`` would leak the helper column and
    false-fail any twin comparison."""
    u = sql_unit(key_col, salt)
    return f"""
SELECT {select} FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col} ORDER BY {u} ASC, {key_col} ASC) AS _sq_rn
  FROM {table}
) t WHERE _sq_rn <= {quota}
"""


def train_eval_split(
    df: DataFrame, key_col: str, eval_fraction: float, salt: str = "split"
) -> DataFrame:
    """Adds a ``_split`` column ('train'/'eval') — disjoint by
    construction (one hash, one threshold), stable under corpus
    growth, and leakage-free for exact duplicates IF keyed by a
    content hash (pass e.g. the text fingerprint as ``key_col``)."""
    return df.withColumn(
        "_split",
        F.when(_unit(key_col, salt) < F.lit(float(eval_fraction)), F.lit("eval"))
        .otherwise(F.lit("train")),
    )


def plan_mixture(
    df: DataFrame,
    group_col: str,
    token_col: str,
    targets: dict[str, float],
) -> dict[str, float]:
    """Turn per-group TOKEN budgets into sampling fractions — real
    mixes are specified in tokens ("300B tokens of web, 50B of code"),
    not row fractions. One map-combinable aggregate measures what each
    group actually has; the returned fractions (capped at 1.0 — a
    group cannot yield more than it holds) feed
    :func:`sample_mixture`. The collect is G rows — one per group.

    Note the gate stays per-ROW, so realized token counts concentrate
    around the target (doc lengths are i.i.d. w.r.t. the key hash);
    exact-to-the-token cuts would need the packing prefix sum instead.
    """
    rows = (
        df.groupBy(group_col)
        # coalesce: a group whose token_col is all-NULL sums to NULL,
        # which is "has no tokens", not a crash
        .agg(F.coalesce(F.sum(F.col(token_col)), F.lit(0)).alias("_tok"))
        .collect()
    )
    have = {r[0]: int(r[1]) for r in rows}
    out = {}
    for g, want in targets.items():
        tot = have.get(g, 0)
        if tot == 0:
            # a zero-token group can't contribute tokens either way:
            # keep its rows only if a positive budget asks for the
            # group at all (the old unconditional 1.0 kept rows even
            # when the target said drop the group)
            out[g] = 1.0 if float(want) > 0 else 0.0
        else:
            out[g] = min(1.0, float(want) / tot)
    return out


def diversity_sample(
    df: DataFrame,
    centroids,
    quota: int,
    key_col: str,
    vec_col: str = "embedding",
    salt: str = "",
) -> DataFrame:
    """Semantic-diversity sampling: nearest-centroid assignment over an
    embedding column (map-only — the centroid matrix broadcasts inside
    the Arrow kernel, `operators/ivf.py:assign_clusters`) followed by a
    deterministic hash-ordered quota per cluster — the cluster-balanced
    draw that stops a training mix from being dominated by the corpus's
    dense modes (the embedding-space analogue of per-source quotas).

    ``centroids``: a numpy (k, d) matrix — train one with
    ``IvfFlatIndex.build(...).centroids`` or ``kmeans_lloyd_np`` so the
    sample reuses the ANN index's own partitioning.

    Scale shape: assignment is a scan-stage Arrow kernel; the quota is
    one shuffle on ``cluster_id`` + per-group window (WindowGroupLimit)
    — output bounded at quota x k rows. Same determinism contract as
    every operator here: hash-gated, stable under corpus growth.
    """
    from gamma_spark.operators.ivf import assign_clusters

    assigned = assign_clusters(df, centroids, vec_col)
    return stratified_quota(assigned, "cluster_id", quota, key_col, salt)

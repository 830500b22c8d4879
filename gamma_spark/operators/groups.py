"""Dup-group resolution: near-dup pairs -> connected components ->
keeper per group (the step that turns "emits pairs" into "dedups").

Every near-dup strategy in :mod:`gamma_spark.operators.dedup` (minhash
LSH, simhash banding, jaccard verify, embedding LSH) emits an
``(id_a, id_b)`` pair relation. An LLM-pipeline user then needs
*decisions*: which rows to keep, which to drop. That requires grouping
transitively-connected pairs (A~B, B~C => {A,B,C} even if A,C were never
paired) and picking one keeper per group.

Algorithm: iterated **hash-min label propagation** — every node starts
labeled with its own id; each round, a node's label drops to the min
label among itself and its neighbors; fixpoint = per-component min id.

100 TB design notes:

- CC runs over the *pair members only* (tiny vs the corpus — LSH pair
  counts are bounded by bucket fan-out, not corpus size); the corpus is
  only touched by one final left join that tags singletons as their own
  keeper. The expensive relation never enters the loop.
- Each round is join + map-side-combinable min-aggregate on the label
  relation, with ``localCheckpoint`` truncating lineage so N rounds
  don't stack N joins of plan.
- Convergence in O(component diameter) rounds. LSH dup-groups are
  quasi-cliques (diameter 1-2), so 2-3 rounds in practice; the loop
  detects the fixpoint via the monotonically-decreasing label sum (one
  scalar action per round, no extra join). For adversarially long path
  graphs, the known fix is large-star/small-star (Kiveris et al.,
  "Connected Components in MapReduce and Beyond") — same join shape,
  O(log n) rounds; not needed for dedup workloads and omitted here.

The fixpoint is unique (per-component min id) regardless of iteration
order, which is what makes the result oracle-checkable: the DuckDB twin
computes the same labels via a recursive-CTE transitive closure.

Reference parity note: vearch/gamma has no analogue (its dedup story
ends at `_id` upsert identity); this operator is part of the LLM-data-
pipeline extension surface (BASELINE north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: propagation-round cap; dedup components converge in 2-3 rounds, and
#: 50 rounds covers any component of diameter <= 50 (a pathological
#: path graph, not a dup cluster).
MAX_ROUNDS = 50


def symmetric_edges(pairs: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """(src, dst) in both directions, deduplicated."""
    return (
        pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
        .unionByName(pairs.select(F.col(b).alias("src"), F.col(a).alias("dst")))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_rounds: int = MAX_ROUNDS,
) -> DataFrame:
    """(id, group_id) for every id appearing in ``pairs``; group_id =
    min id of the connected component. Raises if ``max_rounds`` passes
    without reaching the fixpoint (never observed on dedup graphs)."""
    # LAZY local checkpoints throughout the loop (r11): eager=True ran
    # one runJob per checkpoint PLUS the convergence-probe action that
    # follows it — two driver-blocking jobs per round (and three at
    # init). A lazy checkpoint materializes (and truncates lineage)
    # as a side effect of the probe action that already scans the same
    # relation, halving the job count per round with identical data
    # and identical lineage truncation.
    edges = symmetric_edges(pairs, a, b).localCheckpoint(eager=False)
    # init fuses the first propagation round: label_0 = min(id, min
    # neighbor) — identical to one round over identity labels, one
    # fewer join+checkpoint cycle (dup quasi-cliques then converge in
    # a single verification round). Isolated A/B on the sf0.1 bench
    # corpus (alternating best-of-8, warm): fused 2.99 s vs identity
    # init 3.21 s — the r4 suite-level regression was contention noise.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_mn"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("_mn")).alias("label"),
        )
        .localCheckpoint(eager=False)
    )
    # convergence probe: sum(label) strictly decreases every round
    # until the fixpoint (labels only ever drop) -> one scalar action
    # per round, no extra join. Sound ONLY for numeric ids — sum over
    # a string label casts to NULL (non-ANSI), and NULL == NULL would
    # declare convergence after round one on a diameter-2 component.
    # String ids (common for doc keys) instead sum a per-row label
    # fingerprint: xxhash64 is not order-monotonic, but the label
    # MULTISET changes whenever any label drops, and a multiset change
    # altering the sum of 64-bit hashes fails only on a hash-sum
    # collision (~2^-64 per round) — the diff-join alternative costs a
    # join per round for no practical gain.
    numeric_id = isinstance(
        labels.schema["label"].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
         T.FloatType, T.DoubleType, T.DecimalType),
    )
    probe = (
        F.sum("label") if numeric_id
        else F.sum(F.xxhash64("label").cast("decimal(38,0)"))
    )
    prev_sum = labels.agg(probe).collect()[0][0]
    for _ in range(max_rounds):
        neigh = edges.join(
            labels.withColumnRenamed("id", "dst"), on="dst"
        ).select(F.col("src").alias("id"), "label")
        new_labels = (
            labels.unionByName(neigh)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=False)
        )
        new_sum = new_labels.agg(probe).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            return labels.select("id", F.col("label").alias("group_id"))
        prev_sum = new_sum
    raise RuntimeError(f"connected_components: no fixpoint in {max_rounds} rounds")


def resolve_groups(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str,
    keeper_order: Column | None = None,
) -> DataFrame:
    """Turn near-dup pairs into per-row keep/drop decisions over the
    full corpus.

    Returns one row per ``nodes`` row: (id_col, group_id, group_size,
    keeper_id, is_keeper). Rows absent from ``pairs`` are singleton
    groups (their own keeper). ``keeper_order`` is a column over
    ``nodes`` ranking keeper preference (max wins, ties broken by min
    id); default keeps the min-id member. ``filter(is_keeper)`` yields
    the deduplicated corpus; ``filter(~is_keeper)`` the rows to drop.
    """
    comp = connected_components(pairs, a="id_a", b="id_b")
    tagged = (
        nodes.join(comp.withColumnRenamed("id", id_col), on=id_col, how="left")
        .withColumn("group_id", F.coalesce(F.col("group_id"), F.col(id_col)))
    )
    order = keeper_order if keeper_order is not None else F.lit(0)
    groups = tagged.groupBy("group_id").agg(
        F.count(F.lit(1)).alias("group_size"),
        # keeper: max keeper_order (numeric ranking), tie-break min id
        # (unique ids make the struct ordering total -> deterministic,
        # oracle-safe). min_by over (-order, id) rather than max_by
        # over (order, -id): negating the id to invert its direction
        # breaks for STRING ids (cast -> NULL -> nondeterministic
        # keeper, diverging from the SQL twin's ORDER BY id ASC).
        F.min_by(
            F.col(id_col),
            F.struct((-order).alias("o"), F.col(id_col).alias("n")),
        ).alias("keeper_id"),
    )
    return tagged.join(groups, on="group_id").select(
        id_col,
        "group_id",
        "group_size",
        "keeper_id",
        (F.col(id_col) == F.col("keeper_id")).alias("is_keeper"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------

def _sql_cc_ctes(pairs_sql: str) -> str:
    """Shared CTE list: pairs -> symmetric edges -> transitive-closure
    reachability (min reachable id == the hash-min fixpoint). Oracle-
    scale only (the closure is quadratic in component size); the Spark
    loop is the scale path."""
    return f"""
cc_pairs AS ({pairs_sql}),
cc_edges AS (
  SELECT id_a AS src, id_b AS dst FROM cc_pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM cc_pairs
),
cc_reach(id, label) AS (
  SELECT src, src FROM cc_edges
  UNION
  SELECT e.src, r.label FROM cc_edges e JOIN cc_reach r ON e.dst = r.id
)"""


def sql_connected_components(pairs_sql: str) -> str:
    return (
        f"WITH RECURSIVE {_sql_cc_ctes(pairs_sql)}\n"
        "SELECT id, min(label) AS group_id FROM cc_reach GROUP BY id"
    )


def sql_resolve_groups(
    pairs_sql: str, nodes_table: str, id_col: str, keeper_order_sql: str = "0"
) -> str:
    return f"""
WITH RECURSIVE {_sql_cc_ctes(pairs_sql)},
cc_comp AS (SELECT id, min(label) AS group_id FROM cc_reach GROUP BY id),
cc_tagged AS (
  SELECT n.{id_col}, coalesce(c.group_id, n.{id_col}) AS group_id,
         {keeper_order_sql} AS _ord
  FROM {nodes_table} n LEFT JOIN cc_comp c ON n.{id_col} = c.id
),
cc_groups AS (
  SELECT group_id, count(*) AS group_size FROM cc_tagged GROUP BY group_id
),
cc_keeper AS (
  SELECT group_id, {id_col} AS keeper_id FROM (
    SELECT group_id, {id_col},
           row_number() OVER (PARTITION BY group_id
                              ORDER BY _ord DESC, {id_col} ASC) AS rn
    FROM cc_tagged) k WHERE rn = 1
)
SELECT t.{id_col}, t.group_id, g.group_size, k.keeper_id,
       t.{id_col} = k.keeper_id AS is_keeper
FROM cc_tagged t JOIN cc_groups g USING (group_id) JOIN cc_keeper k USING (group_id)
"""

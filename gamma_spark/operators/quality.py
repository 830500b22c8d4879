"""Repetition / quality signals for training-data curation
(Gopher-rule family: Rae et al. 2021 §A1.1, RefinedWeb / Dolma filters).

The reference has no text analytics at all (SURVEY §2.6); these are
north-star LLM-pipeline operators over the ``documents`` table,
complementing the pure-projection signals in
:mod:`gamma_spark.functions.text` with the *distributional* ones that
need a per-document group-by:

- ``dup_token_fraction``  — 1 − |distinct tokens| / |tokens| (pure
  array expression, no shuffle);
- ``top_bigram_fraction`` — share of the document's bigrams taken by
  its most frequent bigram (repetition smell);
- ``token_entropy``       — Shannon entropy of the unigram
  distribution in nats (low entropy ⇒ template/spam).

Scale shape: two explode → map-side-combinable count aggregations
(unigrams, bigrams), keyed by (doc, gram) then reduced per doc — the
same two-shuffle shape at any corpus size, no driver collects, no
Python in the hot path. Token counts ``n``/``m`` ride the grouping key
(functionally dependent on the doc) so no join back to the corpus is
needed; the final assembly joins three doc-keyed relations of one row
per doc each.

Determinism contract: entropy terms are scalar doubles rounded to 7
decimals and summed as DECIMAL(20,7) (exact, order-free), then cast
back to double — the money-aggregate convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gamma_spark.functions import text as T


def _bigrams(toks):
    """Adjacent-token bigram array (order-preserving)."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, (i + 1).cast("int")),
            F.element_at(toks, (i + 2).cast("int")),
        ),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, n_tokens, dup_token_fraction, top_bigram_fraction,
    token_entropy) — one row per input document (docs with < 2 tokens
    get a 0.0 top_bigram_fraction)."""
    toks = T.tokens(text_col)
    base = docs.select(
        F.col(id_col),
        toks.alias("t"),
        F.size(toks).alias("n"),
    )
    flat = base.select(
        id_col,
        "n",
        (
            F.lit(1.0)
            - F.size(F.array_distinct("t")).cast("double")
            / F.col("n").cast("double")
        ).alias("dup_token_fraction"),
    )
    # unigram distribution -> entropy; n rides the key (dep. on doc id)
    uni = (
        base.select(id_col, "n", F.explode("t").alias("g"))
        .groupBy(id_col, "n", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    p = F.col("c").cast("double") / F.col("n").cast("double")
    ent = (
        uni.select(
            id_col,
            F.round(-p * F.log(p), 7).cast("decimal(20,7)").alias("e"),
        )
        .groupBy(id_col)
        .agg(F.sum("e").cast("double").alias("token_entropy"))
    )
    # bigram distribution -> top-gram share
    big = (
        base.filter(F.col("n") >= 2)
        .select(id_col, (F.col("n") - 1).alias("m"), F.explode(_bigrams(F.col("t"))).alias("g"))
        .groupBy(id_col, "m", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            (F.max("c").cast("double") / F.first("m").cast("double")).alias(
                "top_bigram_fraction"
            )
        )
    )
    return (
        flat.join(ent, id_col, "left")
        .join(big, id_col, "left")
        .select(
            id_col,
            F.col("n").cast("long").alias("n_tokens"),
            "dup_token_fraction",
            F.coalesce("top_bigram_fraction", F.lit(0.0)).alias(
                "top_bigram_fraction"
            ),
            F.coalesce("token_entropy", F.lit(0.0)).alias("token_entropy"),
        )
    )


def sql_repetition_signals(
    table: str, id_col: str = "doc_id", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`repetition_signals`."""
    toks = T.sql_tokens(text_col)
    return f"""
WITH base AS (SELECT {id_col}, {toks} AS t, len({toks}) AS n FROM {table}),
flat AS (
  SELECT {id_col}, n,
         1.0 - len(list_distinct(t))::DOUBLE / n::DOUBLE AS dup_token_fraction
  FROM base
),
uni AS (
  SELECT {id_col}, n, g, count(*) AS c
  FROM (SELECT {id_col}, n, unnest(t) AS g FROM base) u
  GROUP BY 1, 2, 3
),
ent AS (
  SELECT {id_col},
         (sum(round(-(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / n::DOUBLE),
                    7)::DECIMAL(20,7)))::DOUBLE AS token_entropy
  FROM uni GROUP BY {id_col}
),
bigc AS (
  SELECT {id_col}, m, g, count(*) AS c
  FROM (
    SELECT {id_col}, n - 1 AS m,
           unnest([t[i] || ' ' || t[i+1] for i in generate_series(1, len(t) - 1)]) AS g
    FROM base WHERE n >= 2
  ) u
  GROUP BY 1, 2, 3
),
big AS (
  SELECT {id_col}, max(c)::DOUBLE / first(m)::DOUBLE AS top_bigram_fraction
  FROM bigc GROUP BY {id_col}
)
SELECT flat.{id_col},
       flat.n::BIGINT AS n_tokens,
       flat.dup_token_fraction,
       coalesce(big.top_bigram_fraction, 0.0) AS top_bigram_fraction,
       coalesce(ent.token_entropy, 0.0) AS token_entropy
FROM flat
LEFT JOIN ent USING ({id_col})
LEFT JOIN big USING ({id_col})
"""


# ---------------------------------------------------------------------------
# corpus-trained bigram LM perplexity (CCNet-style quality filter)
# ---------------------------------------------------------------------------

def lm_perplexity(
    train: DataFrame,
    score: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document perplexity under an add-alpha-smoothed bigram LM
    trained on ``train`` — the CCNet move (Wenzek et al. 2020: score
    crawl docs with an LM trained on a reference corpus; high ppl =
    far from the reference distribution, low ppl = degenerate/template)
    with the n-gram LM itself trained IN Spark instead of importing a
    KenLM binary.

    P(w2|w1) = (c12 + alpha) / (c1 + alpha * V); unseen w1 degrades to
    the uniform 1/V. Output: (id, n_bigrams, sum_logp, ppl) with
    ppl = exp(-sum_logp / n_bigrams).

    Scale shape: training is two map-side-combinable count aggregations
    over exploded token/bigram streams (the shared shingle shape); V is
    the one driver scalar. Scoring explodes the score-side bigram
    stream and left-joins the two count relations on their keys —
    volume is the score corpus's bigrams, count relations behave like
    dimension tables (AQE broadcasts them when small). Determinism:
    per-bigram log-probs are rounded to 7 decimals and summed as
    DECIMAL(20,7) (order-free, the quality-signal convention).
    """
    def tok_stream(df):
        return df.select(
            F.col(id_col), F.explode(T.tokens(text_col)).alias("w")
        )

    def bigram_stream(df):
        # tokenize ONCE into a staged column: a raw split() referenced
        # inside the transform lambda re-evaluates per element (no CSE
        # in interpreted higher-order functions) — O(len^2) per doc
        # (same defect and fix as dedup.shingles, OPTIMIZATION_r11.md)
        toks = T.tokens(text_col)
        staged = df.select(F.col(id_col), toks.alias("__lm_toks")).filter(
            F.size("__lm_toks") >= 2
        )
        tref = F.col("__lm_toks")
        bg = F.transform(
            F.sequence(F.lit(0), F.size(tref) - 2),
            lambda i: F.struct(
                F.element_at(tref, (i + 1).cast("int")).alias("w1"),
                F.element_at(tref, (i + 2).cast("int")).alias("w2"),
            ),
        )
        return (
            staged.select(F.col(id_col), F.explode(bg).alias("b"))
            .select(id_col, F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        )

    from gamma_spark.session import stage

    # stage both count relations: ``uni`` is consumed twice (the |V|
    # count below and the scoring join) and would otherwise re-run the
    # train-side token explode per action; ``big`` keeps the scoring
    # join from re-mining train bigrams if the caller triggers
    # multiple actions on the result.
    uni = stage(
        tok_stream(train).groupBy(F.col("w").alias("w1")).agg(
            F.count(F.lit(1)).alias("c1")
        )
    )
    big = stage(
        bigram_stream(train).groupBy("w1", "w2").agg(
            F.count(F.lit(1)).alias("c12")
        )
    )
    # ONE action materializes BOTH persisted count relations and
    # returns both cardinalities (|V| is the one driver scalar; the
    # bigram count gates the broadcast pin below). Two separate
    # count() calls were two driver-blocking jobs over the same train
    # scans — the union computes the same numbers in a single job and
    # the persists still populate (guide §1.2: fewer passes).
    counts = dict(
        uni.select(F.lit("u").alias("_s"))
        .unionByName(big.select(F.lit("b").alias("_s")))
        .groupBy("_s")
        .count()
        .collect()
    )
    vocab = int(counts.get("u", 0))
    n_big = int(counts.get("b", 0))

    # Pin the scoring join's build side when the count relations are
    # dimension-table-sized: left to AQE, the same run either
    # broadcasts them or shuffles the 79n score-side bigram stream on
    # its join keys depending on runtime stat estimates — measured as
    # a 228-vs-385 s swing on back-to-back identical 2M-doc pipeline
    # runs (docs/SCALING.md LM-stage note). Above the cap (huge
    # reference corpora where distinct bigrams ~ train tokens) the
    # relations stop being broadcastable and the shuffle join is the
    # correct plan.
    _BCAST_ROW_CAP = 2_000_000  # ~120 MB at ~60 B/row
    if vocab <= _BCAST_ROW_CAP and n_big <= _BCAST_ROW_CAP:
        big, uni = F.broadcast(big), F.broadcast(uni)

    sb = bigram_stream(score)
    joined = sb.join(big, ["w1", "w2"], "left").join(uni, ["w1"], "left")
    logp = F.log(
        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(alpha * vocab))
    )
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        F.sum(F.round(logp, 7).cast("decimal(20,7)")).alias("_slp"),
    )
    return per_doc.select(
        id_col,
        "n_bigrams",
        F.col("_slp").cast("double").alias("sum_logp"),
        F.round(
            F.exp(-(F.col("_slp").cast("double")) / F.col("n_bigrams")), 6
        ).alias("ppl"),
    )


def sql_lm_perplexity(
    train_table: str,
    score_table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> str:
    """DuckDB twin of :func:`lm_perplexity` (vocab size computed
    in-query instead of as a driver scalar)."""
    toks = T.sql_tokens(text_col)
    return f"""
WITH tr_tok AS (
  SELECT unnest({toks}) AS w1 FROM {train_table}
),
uni AS (SELECT w1, count(*) AS c1 FROM tr_tok GROUP BY w1),
voc AS (SELECT count(*)::DOUBLE AS v FROM uni),
tr_big AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM (SELECT {toks} AS t FROM {train_table}) s,
       LATERAL (SELECT unnest(range(1, len(t))) AS i) g
  WHERE len(t) >= 2
),
big AS (SELECT w1, w2, count(*) AS c12 FROM tr_big GROUP BY w1, w2),
sc_big AS (
  SELECT {id_col}, t[i] AS w1, t[i+1] AS w2
  FROM (SELECT {id_col}, {toks} AS t FROM {score_table}) s,
       LATERAL (SELECT unnest(range(1, len(t))) AS i) g
  WHERE len(t) >= 2
),
scored AS (
  SELECT s.{id_col},
         round(ln((coalesce(b.c12, 0) + {alpha}) /
                  (coalesce(u.c1, 0) + {alpha} * voc.v)), 7)::DECIMAL(20,7) AS lp
  FROM sc_big s
  LEFT JOIN big b ON s.w1 = b.w1 AND s.w2 = b.w2
  LEFT JOIN uni u ON s.w1 = u.w1
  CROSS JOIN voc
)
SELECT {id_col},
       count(*)::INT AS n_bigrams,
       (sum(lp))::DOUBLE AS sum_logp,
       round(exp(-((sum(lp))::DOUBLE) / count(*)), 6) AS ppl
FROM scored GROUP BY {id_col}
"""

"""End-to-end corpus curation (annotate -> gate -> dedup -> keep/drop)."""

from pyspark.sql import functions as F

from gamma_spark.operators import curation as C

# High-quality English near-dup pair (shingle-identical apart from one
# trailing word), a distinct high-quality English doc, a low-quality
# fragment, and a marker-free doc the lang gate drops.
EN_BASE = (
    "the quick brown fox jumps over the lazy dog and then the fox runs "
    "back to the den where it sleeps for a while before it is out again "
    "looking for food in the quiet green valley near the river bend"
)
PLANTED = [
    (1, EN_BASE + " tonight"),
    (2, EN_BASE + " tomorrow"),
    (3, (
        "a completely different english document about the history of "
        "sailing ships and the people who sailed them across the wide "
        "ocean with great skill and the courage that it required of them"
    )),
    (4, "zzz qqq"),  # low quality: tiny, no stopwords
    (5, (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua ut "
        "enim ad minim veniam quis nostrud exercitation ullamco laboris"
    )),  # plausible shape but no English markers -> fails the lang gate
]


def _docs(spark):
    return spark.createDataFrame(PLANTED, "doc_id long, text string")


def test_curation_decisions(spark):
    out = {
        r["doc_id"]: r
        for r in C.curate_corpus(_docs(spark), "doc_id", "text").collect()
    }
    assert len(out) == 5

    # gate verdicts
    assert out[1]["passed_filter"] and out[2]["passed_filter"] and out[3]["passed_filter"]
    assert not out[4]["passed_filter"]  # low quality
    assert not out[5]["passed_filter"] and out[5]["lang"] != "en"

    # near-dup pair 1~2 resolved into one group, one keeper
    assert out[1]["group_id"] == out[2]["group_id"]
    assert out[1]["group_size"] == 2
    assert out[1]["kept"] != out[2]["kept"]
    assert out[1]["keeper_id"] == out[2]["keeper_id"]

    # singleton survivor keeps itself
    assert out[3]["kept"] and out[3]["group_size"] == 1

    # gated-out rows carry no group and are dropped
    assert out[4]["group_id"] is None and not out[4]["kept"]
    assert not out[5]["kept"]


def test_curation_keeper_is_best_quality(spark):
    df = C.curate_corpus(_docs(spark), "doc_id", "text")
    rows = {r["doc_id"]: r for r in df.collect()}
    grp = [rows[1], rows[2]]
    keeper = next(r for r in grp if r["kept"])
    loser = next(r for r in grp if not r["kept"])
    # keeper policy: max quality, min-id tiebreak
    assert (keeper["quality"], -keeper["doc_id"]) >= (loser["quality"], -loser["doc_id"])


def test_curation_kept_is_consistent(spark, documents):
    out = C.curate_corpus(documents, "doc_id", "text")
    # every group of survivors elects exactly one keeper
    bad = (
        out.filter(F.col("passed_filter"))
        .groupBy("group_id")
        .agg(F.sum(F.col("kept").cast("int")).alias("k"))
        .filter(F.col("k") != 1)
        .count()
    )
    assert bad == 0
    # non-survivors are never kept
    assert out.filter(~F.col("passed_filter") & F.col("kept")).count() == 0


def test_lm_perplexity_matches_duckdb_and_separates(spark, documents):
    """Bit-parity with the DuckDB twin on the real table, plus the
    semantic check: a degenerate repeated-token doc scores LOWER ppl
    than the corpus median (the LM has seen its one bigram constantly)."""
    import duckdb
    import pandas as pd

    from gamma_spark.operators.quality import lm_perplexity, sql_lm_perplexity

    base = documents.select("doc_id", "text")
    got = (
        lm_perplexity(base, base)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.register("documents", base.toPandas())
    want = (
        con.sql(sql_lm_perplexity("documents", "documents"))
        .df()
        .sort_values("doc_id", ignore_index=True)[got.columns]
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_bigrams": "int64"}), want.astype({"n_bigrams": "int64"})
    )

    # semantic direction on a corpus with actual bigram structure (the
    # documents fixture is near-uniform token soup, where everything
    # scores ~V): in-domain text scores far below out-of-distribution
    # text — the CCNet filtering signal
    filler = " ".join(f"f{j}" for j in range(60))  # widen V: OOD ppl ~ V
    train = spark.createDataFrame(
        [(i, "x y x y x y z") for i in range(50)] + [(999, filler)],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "p q r s t u")], ["doc_id", "text"]
    )
    ppl = {r["doc_id"]: r["ppl"] for r in lm_perplexity(train, probes).collect()}
    assert ppl[1] * 3 < ppl[2]


def test_lm_perplexity_scoring_join_broadcasts_when_small(spark, documents):
    """The scoring join's build side is pinned: vocab-sized count
    relations must arrive via BroadcastHashJoin (an explicit hint, not
    an AQE runtime decision — the 2M-doc pipeline rehearsal measured a
    228-vs-385 s LM-stage swing on identical runs when the choice was
    left to AQE's stat estimates; docs/SCALING.md)."""
    from gamma_spark.operators.quality import lm_perplexity

    base = documents.select("doc_id", "text")
    plan = lm_perplexity(base, base)._jdf.queryExecution().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

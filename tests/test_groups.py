"""Dup-group resolution (connected components + keeper selection)."""

from pyspark.sql import functions as F

from gamma_spark.operators import groups as G


def _pairs(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_cc_transitive_chain(spark):
    # A~B, B~C must land A,B,C in one group even though (A,C) was never
    # emitted as a pair — the property plain pair output lacks.
    comp = {
        r["id"]: r["group_id"]
        for r in G.connected_components(_pairs(spark, [(1, 2), (2, 3), (10, 11)])).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_path_converges(spark):
    # 21-node path: worst-case diameter for hash-min propagation
    comp = G.connected_components(_pairs(spark, [(i, i + 1) for i in range(20)]))
    rows = comp.collect()
    assert len(rows) == 21
    assert {r["group_id"] for r in rows} == {0}


def test_cc_planted_clusters(spark):
    # two planted quasi-cliques with partial pair coverage + noise edges
    pairs = [(1, 2), (1, 3), (2, 4), (5, 6), (6, 7), (100, 101)]
    comp = {r["id"]: r["group_id"] for r in G.connected_components(_pairs(spark, pairs)).collect()}
    assert {comp[1], comp[2], comp[3], comp[4]} == {1}
    assert {comp[5], comp[6], comp[7]} == {5}
    assert comp[100] == 100 and comp[101] == 100


def test_resolve_groups_keeper_and_singletons(spark):
    nodes = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 20), (4, 5)], "doc_id long, q long"
    )
    out = G.resolve_groups(
        _pairs(spark, [(1, 2), (2, 3)]), nodes, "doc_id", keeper_order=F.col("q")
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    # keeper = max quality, tie-break min id: 2 and 3 tie at q=20 -> 2
    assert rows[2]["is_keeper"] and not rows[1]["is_keeper"] and not rows[3]["is_keeper"]
    assert all(rows[i]["keeper_id"] == 2 for i in (1, 2, 3))
    assert all(rows[i]["group_size"] == 3 for i in (1, 2, 3))
    # node 4 never appears in a pair: singleton, its own keeper
    assert rows[4]["is_keeper"] and rows[4]["group_size"] == 1 and rows[4]["group_id"] == 4


def test_resolve_groups_default_keeper_is_min_id(spark):
    nodes = spark.createDataFrame([(7,), (8,), (9,)], "doc_id long")
    out = G.resolve_groups(_pairs(spark, [(8, 9)]), nodes, "doc_id")
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[8]["is_keeper"] and not rows[9]["is_keeper"]
    assert rows[8]["keeper_id"] == 8 == rows[9]["keeper_id"]


def test_sql_twin_parity(spark, documents, sf_dir):
    """The recursive-CTE oracle and the Spark loop agree on real data."""
    import duckdb

    from gamma_spark.operators import dedup as D

    pairs = D.minhash_dedup_pairs(documents, "doc_id", "text")
    spark_rows = sorted(
        tuple(r)
        for r in G.resolve_groups(
            pairs, documents, "doc_id", keeper_order=F.col("n_chars")
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{sf_dir}/documents.parquet')"
    )
    sig = D.sql_minhash_signatures(
        D.sql_shingles("documents", "doc_id", "text", 3), "doc_id"
    )
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            G.sql_resolve_groups(
                D.sql_lsh_candidate_pairs(sig, "doc_id"), "documents", "doc_id", "n_chars"
            )
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_cc_string_ids_converge(spark):
    """r9 review fix: sum(label) over STRING ids casts to NULL, so the
    old convergence probe declared a fixpoint after one round; a
    diameter-3 path of string ids must still fully converge."""
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")],
        "id_a string, id_b string",
    )
    comp = {r["id"]: r["group_id"] for r in G.connected_components(pairs).collect()}
    assert comp == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_resolve_groups_string_ids_deterministic_keeper(spark):
    """r9 review fix: the keeper tie-break negated the id column, which
    is NULL for strings — keeper must be the min-id member, stable
    across runs, matching the SQL twin's ORDER BY id ASC."""
    pairs = spark.createDataFrame(
        [("doc_b", "doc_c"), ("doc_c", "doc_a")], "id_a string, id_b string"
    )
    nodes = spark.createDataFrame(
        [("doc_a",), ("doc_b",), ("doc_c",), ("doc_z",)], "doc_id string"
    )
    for _ in range(3):
        out = {r["doc_id"]: r for r in G.resolve_groups(pairs, nodes, "doc_id").collect()}
        assert out["doc_a"]["is_keeper"]
        assert all(out[d]["keeper_id"] == "doc_a" for d in ("doc_a", "doc_b", "doc_c"))
        assert out["doc_z"]["is_keeper"] and out["doc_z"]["group_size"] == 1


def test_resolve_groups_string_ids_keeper_order(spark):
    """max keeper_order still wins over string ids; ties break to the
    min id."""
    pairs = spark.createDataFrame([("a", "b"), ("b", "c")], "id_a string, id_b string")
    nodes = spark.createDataFrame(
        [("a", 1.0), ("b", 9.0), ("c", 9.0)], "doc_id string, q double"
    )
    out = {r["doc_id"]: r for r in G.resolve_groups(
        pairs, nodes, "doc_id", keeper_order=F.col("q")
    ).collect()}
    assert out["b"]["is_keeper"]  # q ties at 9.0 for b,c -> min id b
    assert all(out[d]["keeper_id"] == "b" for d in ("a", "b", "c"))

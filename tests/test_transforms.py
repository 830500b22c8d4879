"""Corpus transforms: normalization, PII scrubbing, paragraph dedup
(operators/transforms.py) — semantics + plan-shape checks."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from gamma_spark.operators import transforms as TR


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0/1 share their FIRST paragraph exactly (a b c d with width=4)
        (0, "a b c d e f g"),
        (1, "a b c d x y z"),
        # 2 is an exact duplicate of 0 — every chunk drops
        (2, "a b c d e f g"),
        # 3 repeats its own paragraph internally
        (3, "p q r s p q r s"),
        (4, "lone text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_normalize_text(spark):
    df = spark.createDataFrame([("  Hello,  WORLD! 42 ",)], ["t"])
    out = df.select(TR.normalize_text("t").alias("n")).collect()[0]["n"]
    assert out == "hello world 42"


def test_scrub_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail a@b.co and c.d@e.org ip 10.1.0.9 tel +1-555-0042 end")],
        ["doc_id", "text"],
    )
    row = TR.scrub_pii(df).collect()[0]
    assert (row["n_email"], row["n_ip"], row["n_phone"]) == (2, 1, 1)
    assert "<EMAIL>" in row["clean"] and "<IP>" in row["clean"] and "<PHONE>" in row["clean"]
    assert "a@b.co" not in row["clean"] and "10.1.0.9" not in row["clean"]
    # normalization strips the <> markers' punctuation but keeps words
    assert "email" in row["norm"] and "@" not in row["norm"]


def test_scrub_pii_is_scan_stage_only(spark):
    """Zero exchanges: the whole operator must be a projection."""
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    plan = TR.scrub_pii(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunking_layout(spark, docs):
    got = (
        TR.chunk_paragraphs(docs, width=4)
        .filter(F.col("doc_id") == 0)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [(r["chunk_idx"], r["chunk"]) for r in got] == [(0, "a b c d"), (1, "e f g")]


def test_paragraph_dedup_semantics(spark, docs):
    out = {
        r["doc_id"]: r
        for r in TR.paragraph_dedup(docs, width=4).collect()
    }
    # doc0 wins both its paragraphs (lowest doc_id)
    assert out[0]["n_dropped"] == 0 and out[0]["kept_text"] == "a b c d e f g"
    # doc1 loses its first paragraph to doc0, keeps its tail
    assert out[1]["n_dropped"] == 1 and out[1]["kept_text"] == "x y z"
    # doc2 (exact dup of 0) loses everything
    assert out[2]["n_dropped"] == 2 and out[2]["kept_text"] == ""
    # doc3's internal repeat: first occurrence kept, second dropped
    assert out[3]["n_dropped"] == 1 and out[3]["kept_text"] == "p q r s"
    assert out[4]["n_dropped"] == 0 and out[4]["kept_text"] == "lone text"
    assert all(r["n_chunks"] >= 1 for r in out.values())


def test_paragraph_dedup_min_tokens_floor(spark):
    # 'z' tail chunks collide across docs but sit under the length
    # floor, so they must survive; the long chunk still dedups.
    df = spark.createDataFrame(
        [(0, "a b c d z"), (1, "a b c d z"), (2, "z")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in TR.paragraph_dedup(df, width=4, min_tokens=2).collect()}
    assert out[0]["kept_text"] == "a b c d z"
    assert out[1]["kept_text"] == "z" and out[1]["n_dropped"] == 1
    assert out[2]["kept_text"] == "z" and out[2]["n_dropped"] == 0
    # and the SQL twin agrees
    import duckdb

    con = duckdb.connect()
    con.register("d0", df.toPandas())
    want = con.sql(TR.sql_paragraph_dedup("d0", width=4, min_tokens=2)).df()
    got = TR.paragraph_dedup(df, width=4, min_tokens=2).toPandas()
    cols = sorted(want.columns)
    pd.testing.assert_frame_equal(
        got[cols].sort_values("doc_id", ignore_index=True).astype({"n_chunks": "int64", "n_dropped": "int64"}),
        want[cols].sort_values("doc_id", ignore_index=True).astype({"n_chunks": "int64", "n_dropped": "int64"}),
    )


def test_paragraph_dedup_matches_duckdb(spark, docs):
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = (
        con.sql(TR.sql_paragraph_dedup("documents", width=4))
        .df()
        .sort_values("doc_id", ignore_index=True)
    )
    got = (
        TR.paragraph_dedup(docs, width=4)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)[want.columns]
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_chunks": "int64", "n_dropped": "int64"}),
        want.astype({"n_chunks": "int64", "n_dropped": "int64"}),
    )


def test_normalize_matches_duckdb(spark):
    duckdb = pytest.importorskip("duckdb")
    vals = ["  MiXeD   CaSe!! ", "a,b;c", "", "42 ANSWERS?"]
    sdf = spark.createDataFrame([(v,) for v in vals], ["t"])
    got = [r["n"] for r in sdf.select(TR.normalize_text("t").alias("n")).collect()]
    con = duckdb.connect()
    con.register("t0", pd.DataFrame({"t": vals}))
    want = con.sql(f"SELECT {TR.sql_normalize_text('t')} AS n FROM t0").df()["n"].tolist()
    assert got == want


def test_paragraph_dedup_null_text_keeps_doc(spark):
    """r9 review fix: a NULL-text doc used to vanish entirely (NULL
    chunk dropped by the null-unsafe join); it must come back as one
    row, same as the SQL twin."""
    from gamma_spark.operators.transforms import paragraph_dedup

    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, None), (2, None)],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df, width=2).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0].kept_text == "alpha beta gamma"
    # NULL text behaves as empty text; the first empty doc keeps its
    # (empty) chunk, the second dedups against it
    assert out[1].kept_text == "" and out[2].kept_text == ""
    assert out[1].n_dropped + out[2].n_dropped == 1

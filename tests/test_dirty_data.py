"""Dirty-data oracle parity (r10): at 100 TB there WILL be NULL and
empty text, and both engines must still agree — not just on the clean
synthetic tables the driver verifies. This gate re-runs a
representative slice of the registry against a NULL-injected copy of
the documents table and hash-compares Spark vs DuckDB with the same
comparator the local oracle replica uses.

Findings this gate originally surfaced (each now fixed at the source):
- exact_dedup's equi-join DROPPED every NULL-key row (NULL != NULL);
  null-safe join restores SQL grouping semantics (dedup.py);
- sql_fingerprint turned NULL text into fp=0 (DuckDB's
  list_prepend(0, NULL) -> [0]) while Spark propagated NULL — every
  content-less doc silently collided (functions/text.py);
- the comparator itself false-failed None-vs-NaN NULL
  representations (tools/check_oracle.py `_null_token`).
"""

import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import __spark_entry__ as E  # noqa: E402
from check_oracle import compare  # noqa: E402

#: rows that read ONLY the documents table and exercise the NULL-text /
#: NULL-lang paths end to end (kNN/event rows don't touch text)
DIRTY_ROWS = (
    "text_stats",
    "dedup_exact",
    "pack_sequences",
    "corpus_profile",
    "bm25_topk",
    "decontaminate",
    "paragraph_dedup",
    # r11: the consolidated scalar-filter row — NULL lang/text flow
    # through every predicate shape (range, term OR/AND/NOT-IN, F9
    # total) and through the NULL-propagating info concat
    "filter_scalar_variants",
)


#: event-time rows verified on a NULL-event_type corpus (NULL groups
#: flow through window aggregation identically in both engines)
DIRTY_EVENT_ROWS = (
    "events_hourly",
    "events_sliding_window",
    "events_sessionization",
    "events_session_window",
)


#: kNN rows verified on a NULL-injected embeddings table (r11, VERDICT
#: r10 #2): NULL embedding cells remediated by the documented
#: zero_fill_vectors ingest step on BOTH engines, NULL label cells
#: flowing through the scalar pre-filter (NULL == 1 excludes the row
#: identically in Spark and DuckDB) — NULL-key joins were exactly
#: where the text rows rotted before this gate existed
DIRTY_KNN_ROWS = (
    "knn_metrics_topk",       # K1 exact kNN, all three metrics (zero-
                              # vector query -> cosine 0/0 NaN ordering
                              # must agree engine-to-engine)
    "knn_ip_filtered_banded",  # F6 scalar filter (NULL label) + F8
                               # band + kNN in one request
    # r11: all three near-dup legs (EXACT all-pairs, banded LSH, STAR
    # hub edges). The zero-filled NULL rows are ~26 IDENTICAL zero
    # vectors — a miniature mega-cluster that lands in ONE bucket per
    # band, driving the star hub construction and the zero-norm
    # cosine=0.0 contract through both engines at once
    "embedding_neardup_variants",
)

EMB_DIM = 64


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory, sf_dir):
    """sf0.001 with injected NULLs: documents get NULL text / empty
    text / NULL lang (deterministic by doc_id); events get NULL
    event_type (by user_id)."""
    out = str(tmp_path_factory.mktemp("dirty_sf"))
    con = duckdb.connect()
    con.sql(f"""
    COPY (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN NULL
                  WHEN doc_id % 11 = 0 THEN ''
                  ELSE text END AS text,
             CASE WHEN doc_id % 13 = 0 THEN NULL ELSE lang END AS lang,
             source, n_chars
      FROM '{sf_dir}/documents.parquet'
    ) TO '{out}/documents.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT * REPLACE (CASE WHEN user_id % 17 = 0 THEN NULL
                             ELSE event_type END AS event_type)
      FROM '{sf_dir}/events.parquet'
    ) TO '{out}/events.parquet' (FORMAT PARQUET)
    """)
    con.sql(f"""
    COPY (
      SELECT vec_id,
             CASE WHEN vec_id % 19 = 0 THEN NULL ELSE embedding END
               AS embedding,
             CASE WHEN vec_id % 23 = 0 THEN NULL ELSE label END AS label
      FROM '{sf_dir}/embeddings.parquet'
    ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
    """)
    return out


@pytest.mark.parametrize("name", DIRTY_ROWS + DIRTY_EVENT_ROWS)
def test_dirty_corpus_oracle_parity(spark, dirty_sf, name):
    qs, oracles = E.queries(), E.oracle_sql()
    spark_pdf = qs[name](spark, dirty_sf).toPandas()
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dirty_sf}/{t}.parquet'"
        )
    duck_pdf = con.execute(oracles[name]).fetchdf()
    problems = [
        p for p in compare(name, spark_pdf, duck_pdf) if "warning" not in p
    ]
    assert not problems, f"{name} diverges on dirty data: {problems}"
    if name != "decontaminate":
        # per-doc rows are nonempty by construction; decontaminate can
        # legitimately be empty at sf0.001 (no cross-split 6-gram
        # overlap survives the NULL injection) — parity is the gate
        assert len(spark_pdf) > 0


@pytest.mark.parametrize("name", DIRTY_KNN_ROWS)
def test_dirty_knn_oracle_parity(spark, dirty_sf, name, monkeypatch):
    """The REGISTRY kNN rows re-run unchanged on a NULL-injected
    embeddings table, with the documented remediation
    (functions.vector.zero_fill_vectors — gamma's absent-vector =
    zero-vector semantics, `idl/fbs/doc.fbs:5-14`) applied at the
    ingest boundary on both engines. The 27 NULL-embedding rows
    include query vec_id 0, so a zero query vector flows through every
    metric kernel; the NULL-label rows flow through the scalar
    pre-filter."""
    from gamma_spark.functions.vector import zero_fill_vectors

    real_t = E._t

    def remediated_t(spark_, sf_dir_, table):
        df = real_t(spark_, sf_dir_, table)
        if table == "embeddings":
            df = zero_fill_vectors(df, "embedding", EMB_DIM)
        return df

    monkeypatch.setattr(E, "_t", remediated_t)
    spark_pdf = E.queries()[name](spark, dirty_sf).toPandas()

    con = duckdb.connect()
    zeros = "[" + ", ".join(["0.0"] * EMB_DIM) + "]::FLOAT[]"
    # materialized TABLE, not a view: DuckDB 1.0.0's list_dot_product
    # validates the raw child validity mask of the parquet scan, which
    # a COALESCE projection does not rebuild — through a view it
    # rejects the (row-NULL) input even though no post-coalesce row is
    # NULL; CREATE TABLE re-materializes the lists and clears it
    con.execute(
        f"CREATE TABLE embeddings AS SELECT vec_id, "
        f"COALESCE(embedding, {zeros}) AS embedding, label "
        f"FROM '{dirty_sf}/embeddings.parquet'"
    )
    duck_pdf = con.execute(E.oracle_sql()[name]).fetchdf()
    problems = [
        p for p in compare(name, spark_pdf, duck_pdf) if "warning" not in p
    ]
    assert not problems, f"{name} diverges on dirty vectors: {problems}"
    assert len(spark_pdf) > 0

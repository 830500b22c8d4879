"""Filter engine semantics (SURVEY §2.3 F2-F9) vs a DuckDB oracle."""

import duckdb
import pytest
from pyspark.sql import functions as F

from gamma_spark import filters as GF


@pytest.fixture(scope="module")
def docs(documents):
    return documents


def ora(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


def test_range_include_flags(docs, sf_dir):
    f = GF.RangeFilter("n_chars", 100, 200, include_lower=False, include_upper=True)
    got = docs.filter(f.to_column()).count()
    want = ora(sf_dir, "SELECT count(*) FROM documents WHERE n_chars > 100 AND n_chars <= 200")[0][0]
    assert got == want


def test_term_or_and_notin(docs, sf_dir):
    f = GF.TermFilter("lang", ("en", "fr"), GF.TERM_OR)
    assert docs.filter(f.to_column(docs)).count() == ora(
        sf_dir, "SELECT count(*) FROM documents WHERE lang IN ('en','fr')"
    )[0][0]
    f = GF.TermFilter("lang", ("en", "fr"), GF.TERM_NOT_IN)
    assert docs.filter(f.to_column(docs)).count() == ora(
        sf_dir, "SELECT count(*) FROM documents WHERE lang NOT IN ('en','fr')"
    )[0][0]


def test_term_and_on_tags(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["a"]), (3, ["b", "c", "a"])], "id long, tags array<string>"
    )
    f = GF.TermFilter("tags", ("a", "b"), GF.TERM_AND)
    assert {r.id for r in df.filter(f.to_column(df)).collect()} == {1, 3}
    f_or = GF.TermFilter("tags", ("b", "c"), GF.TERM_OR)
    assert {r.id for r in df.filter(f_or.to_column(df)).collect()} == {1, 3}
    f_not = GF.TermFilter("tags", ("c",), GF.TERM_NOT_IN)
    assert {r.id for r in df.filter(f_not.to_column(df)).collect()} == {1, 2}


def test_delimited_shim():
    f = GF.TermFilter.from_delimited("lang", "en\x01fr")
    assert f.values == ("en", "fr")


def test_combine_and_semantics(docs, sf_dir):
    fs = [
        GF.RangeFilter("n_chars", lower=100),
        GF.TermFilter("lang", ("en",), GF.TERM_OR),
    ]
    got = docs.filter(GF.combine(fs, docs)).count()
    want = ora(
        sf_dir, "SELECT count(*) FROM documents WHERE n_chars >= 100 AND lang = 'en'"
    )[0][0]
    assert got == want


def test_filter_only_query(documents, sf_dir):
    """F9: first topn by docid + total = filter survivor count."""
    docs = documents.withColumn("_docid", F.col("doc_id"))
    fs = [GF.TermFilter("lang", ("en",), GF.TERM_OR)]
    res = GF.filter_only_query(docs, fs, topn=5).collect()
    want_total = ora(sf_dir, "SELECT count(*) FROM documents WHERE lang='en'")[0][0]
    want_ids = [
        r[0]
        for r in ora(
            sf_dir,
            "SELECT doc_id FROM documents WHERE lang='en' ORDER BY doc_id LIMIT 5",
        )
    ]
    assert len(res) == 5
    assert all(r.total == want_total for r in res)
    assert sorted(r.doc_id for r in res) == want_ids


def test_empty_filter_shortcircuit(documents):
    docs = documents.withColumn("_docid", F.col("doc_id"))
    fs = [GF.RangeFilter("n_chars", lower=10**9)]
    res = GF.filter_only_query(docs, fs, topn=5)
    assert res.count() == 0

"""Sources/ingestion (SURVEY S-family) + migrate export (S8)."""

from pyspark.sql import functions as F

from gamma_spark import filters as GF
from gamma_spark.sources import load_tables, read_docs
from gamma_spark.table import GammaTable


def test_load_tables(spark, sf_dir):
    tables = load_tables(spark, sf_dir)
    assert set(tables) == {
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    }
    assert tables["documents"].count() > 0


def test_read_docs_csv_with_tag_shim(tmp_path, spark):
    p = str(tmp_path / "docs.csv")
    with open(p, "w") as fh:
        fh.write("_id,title,tags\n")
        fh.write("a,first,x\x01y\n")
        fh.write("b,second,z\n")
    table = read_docs(spark, p, fmt="csv", tag_columns=["tags"])
    rows = {r._id: r for r in table.df.collect()}
    assert rows["a"].tags == ["x", "y"]
    assert rows["b"].tags == ["z"]
    assert sorted(r._docid for r in rows.values()) == [0, 1]
    # tag filters work on the shimmed column
    f = GF.TermFilter("tags", ("y",), GF.TERM_OR)
    assert [r._id for r in table.df.filter(f.to_column(table.df)).collect()] == ["a"]


def test_read_docs_json(tmp_path, spark):
    p = str(tmp_path / "docs.json")
    with open(p, "w") as fh:
        fh.write('{"_id": "j1", "n": 1}\n{"_id": "j2", "n": 2}\n')
    table = read_docs(spark, p, fmt="json")
    assert table.doc_count() == 2


def test_migrate_since(spark, documents):
    base = GammaTable(spark, documents, id_col="doc_id")
    # mutate: delete lang=fr, update one doc, add one doc
    t1, _ = base.delete_by_filter([GF.TermFilter("lang", ("fr",), GF.TERM_OR)])
    batch = documents.filter(F.col("doc_id") == 3).withColumn(
        "text", F.lit("rewritten")
    ).unionByName(
        documents.filter(F.col("doc_id") == 4).withColumn(
            "doc_id", F.lit(999_999).cast("long")
        )
    )
    t2 = t1.add_or_update(batch.drop("_docid") if "_docid" in batch.columns else batch)
    upserts, deleted = t2.migrate_since(base)
    up_ids = {r.doc_id for r in upserts.select("doc_id").collect()}
    del_ids = {r.doc_id for r in deleted.collect()}
    fr_ids = {r.doc_id for r in documents.filter(F.col("lang") == "fr").collect()}
    assert del_ids == fr_ids - {3, 999_999}
    assert 3 in up_ids and 999_999 in up_ids
    # replay check: snapshot + changes == current live table
    replayed = (
        base.df.join(deleted, on="doc_id", how="left_anti")
        .join(upserts.select("doc_id"), on="doc_id", how="left_anti")
        .unionByName(upserts)
    )
    cur = t2.df.select(*replayed.columns)  # exceptAll is positional
    assert replayed.exceptAll(cur).count() == 0
    assert cur.exceptAll(replayed).count() == 0


def test_write_dataset_roundtrip_with_manifest(tmp_path, spark, documents):
    """Materialization sink: data + manifest roundtrip, counts correct,
    manifest is the done-marker."""
    import json

    import pytest as _pytest
    from pyspark.sql import functions as F

    from gamma_spark.functions.text import bpe_token_count
    from gamma_spark.sources.export import read_dataset, write_dataset

    df = documents.limit(200).select(
        "doc_id", "lang", "text", bpe_token_count("text").alias("n_tokens")
    )
    path = str(tmp_path / "ds")
    man = write_dataset(
        df, path, fmt="parquet", partition_by=["lang"],
        token_col="n_tokens", config={"gate": {"min_quality": 0.5}},
    )
    assert man["n_rows"] == 200
    assert man["n_tokens"] == df.agg(F.sum("n_tokens")).collect()[0][0]
    assert man["config"]["gate"]["min_quality"] == 0.5

    back, man2 = read_dataset(spark, path)
    assert man2 == json.load(open(f"{path}/manifest.json"))
    assert back.count() == 200
    assert {r.doc_id for r in back.select("doc_id").collect()} == {
        r.doc_id for r in df.select("doc_id").collect()
    }

    # jsonl shape too
    write_dataset(df.drop("lang"), str(tmp_path / "ds2"), fmt="json")
    back2, _ = read_dataset(spark, str(tmp_path / "ds2"))
    assert back2.count() == 200

    # missing manifest = uncommitted dataset
    with _pytest.raises(FileNotFoundError):
        read_dataset(spark, str(tmp_path / "nope"))


def test_write_dataset_empty_jsonl_and_allnull_tokens(tmp_path, spark, documents):
    """ADVICE r5: manifest stats read back the written files with the
    input schema pinned — json inference would raise on a 0-row
    dataset and re-type an all-null token column as string."""
    from pyspark.sql import functions as F

    from gamma_spark.sources.export import write_dataset

    df = documents.limit(50).select(
        "doc_id", "text", F.lit(None).cast("long").alias("n_tokens")
    )
    # empty dataset, json format: previously spark.read.json could not
    # infer a schema from zero rows and raised
    man0 = write_dataset(
        df.limit(0), str(tmp_path / "empty"), fmt="json", token_col="n_tokens"
    )
    assert man0["n_rows"] == 0 and man0["n_tokens"] == 0
    # all-null token col must still sum as long (0), not fail as string
    man1 = write_dataset(
        df, str(tmp_path / "nulltok"), fmt="json", token_col="n_tokens"
    )
    assert man1["n_rows"] == 50 and man1["n_tokens"] == 0


def test_load_tables_restores_nanos_conf(spark, sf_dir):
    """r9 review fix: the events read must not leave
    spark.sql.legacy.parquet.nanosAsLong set for the whole session —
    it would silently turn every later TIMESTAMP(NANOS) parquet read
    into BIGINT."""
    key = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(key, None)
    try:
        tables = load_tables(spark, sf_dir)
        assert spark.conf.get(key, None) == prev
        # the events relation still executes correctly after restore
        ev = tables["events"]
        assert dict(ev.dtypes)["ts"] == "bigint"
        assert ev.limit(5).count() > 0
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_load_from_faiss_empty_flat_dump(tmp_path, spark):
    """r9 review fix: a legal empty faiss dump (ntotal=0) materializes
    an empty relation instead of crashing on a missing parquet path."""
    import numpy as np

    from gamma_spark.sources.faiss_io import load_from_faiss, write_faiss_flat

    fpath = str(tmp_path / "empty.faiss")
    write_faiss_flat(fpath, np.zeros((0, 8), dtype=np.float32), metric="L2")
    out = load_from_faiss(spark, fpath, str(tmp_path / "imported"))
    assert out["docs"].count() == 0
    assert out["metric"] == "L2"


def test_write_faiss_quantizer_metric_follows_index(tmp_path, spark):
    """r9 review fix: an IP IVFFlat export must serialize an IP coarse
    quantizer (faiss's quantizer-metric-follows-index convention), not
    an unconditional L2 one."""
    import numpy as np

    from gamma_spark.sources.faiss_io import parse_faiss, write_faiss_ivfflat

    rng = np.random.default_rng(5)
    cents = rng.normal(size=(4, 8)).astype(np.float32)
    vecs = rng.normal(size=(20, 8)).astype(np.float32)
    ids = np.arange(20)
    asg = rng.integers(0, 4, size=20)
    p = str(tmp_path / "ip.faiss")
    write_faiss_ivfflat(p, cents, ids, vecs, asg, metric="IP")
    raw = open(p, "rb").read()
    assert b"IxFI" in raw and b"IxF2" not in raw
    parsed = parse_faiss(p)
    assert parsed["metric"] == "IP"
    # round-trip intact: list membership and vectors preserved
    got_ids = np.sort(np.concatenate([l[0] for l in parsed["lists"] if len(l[0])]))
    assert (got_ids == ids).all()


def test_dataset_empty_jsonl_roundtrip(spark, tmp_path):
    """r10 review: an EMPTY jsonl dataset must reopen — json schema
    inference raises on zero rows, so read_dataset applies the
    manifest's recorded schema instead of inferring."""
    from gamma_spark.sources.export import read_dataset, write_dataset

    empty = spark.createDataFrame([], "doc_id long, text string, n_tok int")
    path = str(tmp_path / "emptyset")
    man = write_dataset(empty, path, fmt="json", token_col="n_tok")
    assert man["n_rows"] == 0 and man["n_tokens"] == 0
    df, man2 = read_dataset(spark, path)
    assert df.count() == 0
    assert df.schema == empty.schema  # exact types, not inferred strings

"""GammaTable DML parity (SURVEY §2.1 S2-S5, F10)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from gamma_spark import filters as GF
from gamma_spark.table import GammaTable, assign_docids


@pytest.fixture()
def table(spark, documents):
    return GammaTable(spark, documents, id_col="doc_id")


def test_assign_docids_dense(spark):
    df = spark.range(0, 1000).repartition(7).select(F.col("id").alias("x"))
    out = assign_docids(df)
    ids = sorted(r._docid for r in out.collect())
    assert ids == list(range(1000))


def test_get_doc_by_id(table):
    row = table.get_doc_by_id(42).collect()
    assert len(row) == 1 and row[0].doc_id == 42


def test_upsert_last_wins_within_batch(spark, table):
    n0 = table.doc_count()
    batch = spark.createDataFrame(
        [
            (42, "updated first", "en", "srcX", 1),
            (42, "updated last", "en", "srcX", 2),   # same key later in batch wins
            (10**9, "brand new", "zz", "srcN", 3),
        ],
        table.df.drop("_docid").schema,
    )
    t2 = table.add_or_update(batch)
    assert t2.doc_count() == n0 + 1
    got = t2.get_doc_by_id(42).collect()[0]
    assert got.text == "updated last"
    # updated doc keeps its docid
    old_docid = table.get_doc_by_id(42).collect()[0]._docid
    assert got._docid == old_docid
    new = t2.get_doc_by_id(10**9).collect()[0]
    assert new._docid == n0  # dense continuation


def test_delete_by_filter_returns_ids(table):
    t2, deleted = table.delete_by_filter([GF.TermFilter("lang", ("zh",), GF.TERM_OR)])
    dels = sorted(r.doc_id for r in deleted.collect())
    assert len(dels) > 0
    assert t2.doc_count() == table.doc_count() - len(dels)
    # deleted => point lookup miss (S4 semantics)
    assert t2.get_doc_by_id(dels[0]).count() == 0
    # re-add revives with same docid
    revive = table.df.filter(F.col("doc_id") == dels[0]).drop("_docid")
    t3 = t2.add_or_update(revive)
    assert t3.get_doc_by_id(dels[0]).count() == 1


def test_dump_load_roundtrip(tmp_path, spark, table):
    t2, _ = table.delete_by_filter([GF.RangeFilter("n_chars", upper=50)])
    t2.dump(str(tmp_path))
    loaded = GammaTable.load(spark, str(tmp_path))
    assert loaded.doc_count() == t2.doc_count()
    assert loaded.status() == t2.status()


def test_status(table):
    st = table.status()
    assert st["doc_count"] == st["max_docid"] - st["deleted"]


def test_persisted_upsert_chain_truncates_lineage(tmp_path, spark, table):
    """persist_root write-back: each merge dumps + reloads, so the
    resulting plan is a bare Parquet scan (no stacked upsert joins) and
    chained batches still produce last-wins state."""
    root = str(tmp_path / "chain")
    docs = table.df.drop("_docid")
    b1 = docs.filter(F.col("doc_id") % 10 == 0).withColumn("text", F.lit("v1"))
    b2 = docs.filter(F.col("doc_id") % 20 == 0).withColumn("text", F.lit("v2"))
    t = table.add_or_update(b1, persist_root=root)
    t = t.add_or_update(b2, persist_root=root)
    assert t.get_doc_by_id(20).collect()[0].text == "v2"
    assert t.get_doc_by_id(10).collect()[0].text == "v1"
    # docids preserved across the chain for updated keys
    orig = {r.doc_id: r._docid for r in table.raw.select("doc_id", "_docid").collect()}
    after = {r.doc_id: r._docid for r in t.raw.select("doc_id", "_docid").collect()}
    assert all(after[k] == v for k, v in orig.items())
    # the loaded table's plan must be a scan, not a join tree
    plan = t.raw._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan


def test_upsert_order_col_multipartition(spark, table):
    """Explicit batch order: conflicting keys spread over an 8-partition
    batch must resolve by order_col, not partition layout (VERDICT r2 #4
    — monotonically_increasing_id is partition-major)."""
    rows = [(42, f"version {i}", "en", "srcX", i) for i in range(64)]
    schema = table.df.drop("_docid").schema.add("pos", "long")
    batch = spark.createDataFrame(
        [r[:4] + (r[4], r[4]) for r in rows],
        schema,
    ).repartition(8)
    t2 = table.add_or_update(batch, order_col="pos")
    got = t2.get_doc_by_id(42).collect()[0]
    assert got.text == "version 63"
    # order_col consumed, not stored
    assert "pos" not in t2.df.columns


def test_bucketed_store_matches_full_merge(tmp_path, spark, table):
    """BucketedDocStore.upsert must be observationally identical to
    add_or_update (same last-wins, docid preservation, dense inserts)."""
    from gamma_spark.table import BucketedDocStore

    docs = table.df.drop("_docid")
    b1 = docs.filter(F.col("doc_id") % 7 == 0).withColumn("text", F.lit("b1"))
    b2 = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 10**6).alias("doc_id"), F.lit("ins").alias("text"),
        "lang", "source", "n_chars",
    )
    expect = table.add_or_update(b1).add_or_update(b2)
    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)
    store = store.upsert(b1).upsert(b2)
    got = store.table()
    e = {(r.doc_id, r.text, r._docid) for r in expect.df.select("doc_id", "text", "_docid").collect()}
    g = {(r.doc_id, r.text, r._docid) for r in got.df.select("doc_id", "text", "_docid").collect()}
    assert g == e


def test_bucketed_store_rewrites_only_affected_buckets(tmp_path, spark, table):
    """O(batch) contract (VERDICT r2 #3): a batch whose keys all hash to
    one bucket leaves every other bucket's files byte-identical on disk."""
    import os

    from gamma_spark.table import BucketedDocStore, _bucket_of

    nb = 8
    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=nb)
    # pick one live key and build a batch containing only keys in its bucket
    some = table.df.select(
        "doc_id", _bucket_of("doc_id", nb).alias("b")
    ).limit(200).collect()
    target_bucket = some[0].b
    keys = [r.doc_id for r in some if r.b == target_bucket][:5]
    batch = table.df.filter(F.col("doc_id").isin(keys)).drop("_docid").withColumn(
        "text", F.lit("touched")
    )

    def snapshot_files():
        out = {}
        docs = os.path.join(str(tmp_path / "store"), "docs")
        for d in os.listdir(docs):
            if not d.startswith("_bucket="):
                continue
            bdir = os.path.join(docs, d)
            out[d] = sorted(
                (f, os.path.getmtime(os.path.join(bdir, f)), os.path.getsize(os.path.join(bdir, f)))
                for f in os.listdir(bdir) if f.endswith(".parquet")
            )
        return out

    before = snapshot_files()
    store = store.upsert(batch)
    after = snapshot_files()
    changed = [d for d in before if before[d] != after.get(d)]
    assert changed == [f"_bucket={target_bucket}"], changed
    # and the data merged correctly
    assert store.table().get_doc_by_id(keys[0]).collect()[0].text == "touched"


def test_bucketed_store_caches_sidecar_schema_across_commits(
    tmp_path, spark, table
):
    """r12: the schema sidecar is written once by create() and never
    rewritten, so its footer is read at most once per store lifetime —
    raw() caches the StructType and _swap_commit hands the cache to the
    post-commit instance (each re-read was a one-task driver job; an
    upsert chain paid ~2 per commit). The cache must equal the sidecar
    read bit-for-bit and survive a commit."""
    from gamma_spark.table import BucketedDocStore

    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)
    assert store._sidecar_schema is None  # lazy: no read until raw()
    sidecar = spark.read.parquet(str(tmp_path / "store" / "schema")).schema
    raw1 = store.raw()
    assert store._sidecar_schema == sidecar
    assert raw1.schema == sidecar
    # the cached object is handed to the post-commit instance
    batch = spark.createDataFrame(
        [(42, "updated", "en", "srcX", 7)],
        table.df.drop("_docid").schema,
    )
    store2 = store.upsert(batch)
    assert store2._sidecar_schema == sidecar
    # and the post-commit reads resolve through it unchanged
    assert store2.raw().schema == sidecar
    got = store2.get_doc_by_id(42).collect()
    assert len(got) == 1 and got[0].text == "updated"


def test_bucketed_store_point_lookup_prunes_to_one_bucket(tmp_path, spark, table):
    """get_doc_by_id on the store must read ONE bucket directory: the
    literal key's bucket constant-folds into the partition filter."""
    import io
    from contextlib import redirect_stdout

    from gamma_spark.table import BucketedDocStore

    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)
    got = store.get_doc_by_id(42)
    rows = got.collect()
    assert len(rows) == 1 and rows[0].doc_id == 42
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    # partition filter on _bucket present and the scan reads 1 partition
    assert "_bucket" in plan
    import re

    m = re.search(r"partitions read[:=]?\s*(\d+)", plan, re.IGNORECASE)
    if m:  # Spark prints 'partitions read: N' in the formatted scan node
        assert int(m.group(1)) == 1, plan
    # deleted key -> miss through the store lookup
    store2, dels = store.delete_by_filter([GF.TermFilter("lang", ("zh",), GF.TERM_OR)])
    key = sorted(r.doc_id for r in dels.collect())[0]
    assert store2.get_doc_by_id(key).count() == 0


def test_bucketed_store_delete_and_compact(tmp_path, spark, table):
    """delete_by_filter tombstones + returns ids rewriting only matching
    buckets; compact physically drops tombstones (incl. removing a
    fully-tombstoned bucket's directory)."""
    import os

    from gamma_spark.table import BucketedDocStore

    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)
    n0 = store.table().doc_count()
    store2, deleted = store.delete_by_filter(
        [GF.TermFilter("lang", ("zh",), GF.TERM_OR)]
    )
    dels = sorted(r.doc_id for r in deleted.collect())
    assert len(dels) > 0
    t = store2.table()
    assert t.doc_count() == n0 - len(dels)
    assert t.get_doc_by_id(dels[0]).count() == 0  # deleted => miss
    # compact drops the tombstoned rows physically
    store3 = store2.compact()
    raw = store3.raw()
    from pyspark.sql import functions as F

    assert raw.filter(F.col("_deleted")).count() == 0
    assert store3.table().doc_count() == n0 - len(dels)
    # delete everything -> compact must remove every bucket directory's rows
    store4, _ = store3.delete_by_filter([])
    store5 = store4.compact()
    assert store5.table().doc_count() == 0
    docs_dir = os.path.join(str(tmp_path / "store"), "docs")
    leftover = [
        d for d in os.listdir(docs_dir)
        if d.startswith("_bucket=")
        and any(f.endswith(".parquet") for f in os.listdir(os.path.join(docs_dir, d)))
    ]
    # no bucket dir may still hold live rows
    for d in leftover:
        assert spark.read.parquet(os.path.join(docs_dir, d)).filter(
            ~F.col("_deleted")
        ).count() == 0


def test_set_get_config_cache_toggle(table):
    """SetConfig/GetConfig (`c_api/gamma_api.h:181-189`): cache sizing
    maps to persist/unpersist of the docs relation."""
    conf = table.set_config({"docs": 64 << 20, "string": 1 << 20})
    assert table.raw.is_cached
    assert conf["cache"] == {"docs": 64 << 20, "string": 1 << 20}
    conf = table.set_config({"docs": 0})
    assert not table.raw.is_cached
    assert conf["cache"]["docs"] == 0
    assert table.get_config()["cache"]["string"] == 1 << 20


def test_bucketed_store_leaves_session_conf_untouched(tmp_path, spark, table):
    """The store's commit path must not mutate session confs (ADVICE
    r3: the old dynamic-partitionOverwriteMode toggle leaked when the
    conf was previously unset, silently changing later unrelated
    partitioned overwrites)."""
    from gamma_spark.table import BucketedDocStore

    key = "spark.sql.sources.partitionOverwriteMode"
    before = spark.conf.get(key, None)
    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)
    batch = spark.createDataFrame(
        [(3, "conf-probe", "en", "src1", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    store = store.upsert(batch)
    store, _ = store.delete_by_filter([GF.TermFilter("lang", ("zh",), GF.TERM_OR)])
    store.compact()
    assert spark.conf.get(key, None) == before


def test_bucketed_store_stale_handle_fails_fast(tmp_path, spark, table):
    """r9: sequential writers from SEPARATELY OPENED handles never
    contend on the writer lock, but a handle opened at commit N would
    mint commit N+1 and docids from N's max again after another handle
    already committed — duplicate docids. The commit now re-reads meta
    under the lock and fails fast on a stale handle."""
    from gamma_spark.io_util import ConcurrentWriterError
    from gamma_spark.table import BucketedDocStore

    root = str(tmp_path / "store")
    BucketedDocStore.create(table, root, nbuckets=8)
    a = BucketedDocStore(spark, root)
    b = BucketedDocStore(spark, root)  # same commit, second handle
    batch = spark.createDataFrame(
        [(900, "h1", "en", "s", 2)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    a.upsert(batch)  # advances the store to commit N+1
    with pytest.raises(ConcurrentWriterError):
        b.upsert(batch.withColumn("text", F.lit("h2")))
    # a freshly opened handle proceeds
    BucketedDocStore(spark, root).upsert(batch.withColumn("text", F.lit("h3")))


def test_upsert_batch_missing_stored_column_raises(spark, table):
    """r9: upserts replace whole documents — a batch missing a stored
    column used to silently erase it for every row in the rewritten
    scope; now it is a loud ValueError."""
    partial = spark.createDataFrame(
        [(3, "narrow")], "doc_id long, text string"  # no lang/source/n_chars
    )
    with pytest.raises(ValueError, match="missing stored column"):
        table.add_or_update(partial)


def test_bucketed_store_aborted_commit_preserves_state(tmp_path, spark, table, monkeypatch):
    """Crash-during-staging (VERDICT r3 #6): if the commit dies before
    the bucket swap begins, a reload sees the pre-commit state exactly —
    same rows, same commit counter, no torn bucket."""
    from gamma_spark import table as tbl
    from gamma_spark.table import BucketedDocStore

    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)
    before_rows = {
        r.doc_id: (r.text, r.n_chars)
        for r in store.table().df.select("doc_id", "text", "n_chars").collect()
    }
    before_commit = store.meta["commit"]

    # abort after the staging write, before any rename: simulate by
    # making os.makedirs (the first post-staging step) raise
    def boom(*a, **k):
        raise RuntimeError("injected crash before bucket swap")

    monkeypatch.setattr(tbl.os, "makedirs", boom)
    batch = spark.createDataFrame(
        [(7, "must-not-survive", "en", "src1", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with pytest.raises(RuntimeError, match="injected crash"):
        store.upsert(batch)
    monkeypatch.undo()

    reloaded = BucketedDocStore(spark, str(tmp_path / "store"))
    after_rows = {
        r.doc_id: (r.text, r.n_chars)
        for r in reloaded.table().df.select("doc_id", "text", "n_chars").collect()
    }
    assert after_rows == before_rows
    assert reloaded.meta["commit"] == before_commit
    # and the store still works: a clean retry of the same batch lands
    retried = reloaded.upsert(batch)
    assert retried.get_doc_by_id(7).collect()[0].text == "must-not-survive"


def test_bucketed_store_torn_swap_rolls_back(tmp_path, spark, table, monkeypatch):
    """Crash BETWEEN bucket renames (VERDICT r4 #8): the swap journal
    in the trash dir lets the next open detect meta.commit < journal
    commit and roll every affected bucket back — reload sees the
    pre-commit state exactly, and a clean retry then lands."""
    from gamma_spark import table as tbl
    from gamma_spark.table import BucketedDocStore

    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)
    before_rows = {
        r.doc_id: (r.text, r.n_chars)
        for r in store.table().df.select("doc_id", "text", "n_chars").collect()
    }
    before_commit = store.meta["commit"]

    # batch touching several buckets, so the rename loop has multiple
    # iterations to die between
    batch = spark.createDataFrame(
        [(i, f"torn-{i}", "en", "src1", i) for i in (3, 7, 11, 20, 41)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    real_rename = tbl.os.rename
    calls = {"n": 0}

    def flaky_rename(src_p, dst_p):
        calls["n"] += 1
        if calls["n"] > 3:  # die mid-loop: some buckets new, some old
            raise RuntimeError("injected crash mid-swap")
        return real_rename(src_p, dst_p)

    monkeypatch.setattr(tbl.os, "rename", flaky_rename)
    with pytest.raises(RuntimeError, match="injected crash"):
        store.upsert(batch)
    monkeypatch.undo()
    assert calls["n"] > 3  # the loop really was interrupted mid-way

    reloaded = BucketedDocStore(spark, str(tmp_path / "store"))
    after_rows = {
        r.doc_id: (r.text, r.n_chars)
        for r in reloaded.table().df.select("doc_id", "text", "n_chars").collect()
    }
    assert after_rows == before_rows
    assert reloaded.meta["commit"] == before_commit
    # no in-flight dirs survive recovery
    leftovers = [
        p.name for p in (tmp_path / "store").iterdir()
        if p.name.startswith((".trash", ".staging"))
    ]
    assert leftovers == []
    # and the store still works: a clean retry of the same batch lands
    retried = reloaded.upsert(batch)
    assert retried.get_doc_by_id(3).collect()[0].text == "torn-3"
    assert retried.get_doc_by_id(41).collect()[0].text == "torn-41"


def test_bucketed_store_crash_during_meta_write_recovers(
    tmp_path, spark, table, monkeypatch
):
    """ADVICE r5 (medium): a crash DURING the meta.json commit write
    must not tear the very file recovery keys on. With the atomic
    tmp+os.replace protocol, a crash after the renames but mid-meta
    leaves the OLD meta intact and a torn .tmp aside; the next open
    sees meta.commit < journal.commit and rolls the swap back."""
    import gamma_spark.io_util as ioutil
    from gamma_spark.table import BucketedDocStore

    store = BucketedDocStore.create(table, str(tmp_path / "store"), nbuckets=8)
    before_rows = {
        r.doc_id: (r.text, r.n_chars)
        for r in store.table().df.select("doc_id", "text", "n_chars").collect()
    }
    before_commit = store.meta["commit"]

    batch = spark.createDataFrame(
        [(i, f"metacrash-{i}", "en", "src1", i) for i in (3, 7, 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    real_replace = ioutil.os.replace

    def crash_on_meta_replace(src_p, dst_p):
        if str(dst_p).endswith("meta.json"):
            # simulate the torn write the OLD protocol suffered: the
            # pending bytes exist only as a truncated tmp; the real
            # meta.json must remain the old complete file
            with open(src_p, "w") as fh:
                fh.write('{"id_col": "doc_id", "nbuck')  # torn prefix
            raise RuntimeError("injected crash mid-meta-write")
        return real_replace(src_p, dst_p)

    monkeypatch.setattr(ioutil.os, "replace", crash_on_meta_replace)
    with pytest.raises(RuntimeError, match="injected crash"):
        store.upsert(batch)
    monkeypatch.undo()

    # the store reopens (old meta parses — it was never touched) and
    # rolls the fully-renamed-but-uncommitted swap back
    reloaded = BucketedDocStore(spark, str(tmp_path / "store"))
    after_rows = {
        r.doc_id: (r.text, r.n_chars)
        for r in reloaded.table().df.select("doc_id", "text", "n_chars").collect()
    }
    assert after_rows == before_rows
    assert reloaded.meta["commit"] == before_commit
    # clean retry lands
    retried = reloaded.upsert(batch)
    assert retried.get_doc_by_id(7).collect()[0].text == "metacrash-7"
    assert retried.meta["commit"] == before_commit + 1


def test_bucketed_store_unparsable_swap_journal_is_cleanup_only(
    tmp_path, spark, table
):
    """ADVICE r5: a trash dir whose swap.json is truncated (crash
    before the journal's atomic replace landed — i.e. before any
    rename) must be classified as 'docs untouched, just clean up',
    not crash the recovery path with a JSONDecodeError."""
    import os

    from gamma_spark.table import BucketedDocStore

    root = str(tmp_path / "store")
    store = BucketedDocStore.create(table, root, nbuckets=8)
    before = {
        r.doc_id: r.text for r in store.table().df.select("doc_id", "text").collect()
    }
    trash = os.path.join(root, ".trash-99")
    os.makedirs(trash)
    with open(os.path.join(trash, "swap.json"), "w") as fh:
        fh.write('{"commit": 99, "hi')  # torn journal prefix

    reloaded = BucketedDocStore(spark, root)  # must not raise
    after = {
        r.doc_id: r.text
        for r in reloaded.table().df.select("doc_id", "text").collect()
    }
    assert after == before
    assert not os.path.exists(trash)  # cleaned up


def test_migrate_since_detects_null_swaps(spark):
    """ADVICE r3: bare xxhash64 skips NULL inputs, so (NULL,'x') ->
    ('x',NULL) hashed identically and the update was dropped. The JSON
    row encoding must detect it."""
    base_df = spark.createDataFrame(
        [(1, None, "x"), (2, "a", "b")], "id long, c1 string, c2 string"
    )
    base = GammaTable(spark, base_df, id_col="id")
    upd = spark.createDataFrame([(1, "x", None)], "id long, c1 string, c2 string")
    cur = base.add_or_update(upd)
    ups, dels = cur.migrate_since(base)
    got = [(r.id, r.c1, r.c2) for r in ups.collect()]
    assert got == [(1, "x", None)]
    assert dels.count() == 0


def test_normalize_event_time_restores_session_tz(spark, sf_dir):
    """ADVICE r3: the read helper must not permanently override the
    session timezone (while still resolving the NTZ cast under UTC)."""
    from gamma_spark.sources.ingest import normalize_event_time

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "America/New_York")
        ev = normalize_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"), "ts")
        assert spark.conf.get(key) == "America/New_York"
        # and the epoch mapping stayed UTC-deterministic (analysis-time
        # zone capture): compare against the value under a UTC session
        got = ev.select(F.min("ts")).collect()[0][0]
        spark.conf.set(key, "UTC")
        want = normalize_event_time(
            spark.read.parquet(f"{sf_dir}/events.parquet"), "ts"
        ).select(F.min("ts")).collect()[0][0]
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_build_index_via_registry(spark, embeddings):
    """CreateTable retrieval_type surface: any registered model builds
    from the table's live view and serves table.search()."""
    from gamma_spark.plans.search import SearchRequest, VectorQuery
    from gamma_spark.table import GammaTable

    docs = embeddings.withColumnRenamed("vec_id", "_id")
    table = GammaTable(spark, docs, id_col="_id")
    queries = spark.createDataFrame(
        [(int(r._id), [float(x) for x in r.embedding])
         for r in docs.orderBy("_id").limit(3).collect()],
        "qid long, qvec array<float>",
    )
    for model, params in [
        ("HNSW", {"nshards": 2, "m": 8, "ef_construction": 40}),
        ("VEARCH", {"ncentroids": 8, "nsubvector": 8}),
    ]:
        idx = table.build_index(model, **params)
        req = SearchRequest(
            vector_queries=[VectorQuery(field="embedding", queries=queries, metric="L2")]
            if model == "HNSW"
            else [VectorQuery(field="embedding", queries=queries, metric="L2",
                              retrieval_params={"nprobe": 8})],
            topn=5,
        )
        out = table.search(req, index=idx)
        assert out.count() == 15


def test_bucketed_upsert_widens_batch_id_type(tmp_path, spark, documents):
    """r9 review fix: a batch with a NARROWER id type hashed into
    different buckets than the store's (xxhash64 is type-sensitive) —
    rows silently vanished in the commit. Integral batches widen to
    the store's type; incompatible types fail loudly."""
    from gamma_spark.table import BucketedDocStore, GammaTable

    base = GammaTable(spark, documents.limit(30), id_col="doc_id")
    store = BucketedDocStore.create(base, str(tmp_path / "store"), nbuckets=8)
    # batch with INT ids (store ids are LONG)
    batch = (
        documents.limit(5)
        .withColumn("doc_id", (F.col("doc_id") + 1000).cast("int"))
    )
    grown = store.upsert(batch)
    live = grown.table().df
    assert live.count() == 35
    got = {r.doc_id for r in live.filter(F.col("doc_id") >= 1000).collect()}
    assert len(got) == 5
    # every inserted key is findable through the bucket-pruned lookup
    for key in sorted(got):
        assert grown.get_doc_by_id(key).count() == 1
    # an incompatible id type fails fast instead of corrupting buckets
    bad = documents.limit(1).withColumn("doc_id", F.lit("not-a-long"))
    with pytest.raises(TypeError, match="id column"):
        grown.upsert(bad)


def test_merge_batch_drops_engine_columns(spark, documents):
    """r9 review fix: migrate_since upserts carry _docid from the live
    view; replaying them through add_or_update must work without the
    caller hand-dropping engine-internal columns."""
    from gamma_spark.table import GammaTable

    base = GammaTable(spark, documents.limit(20), id_col="doc_id")
    batch = base.df.limit(3).withColumn("text", F.lit("replayed"))
    assert "_docid" in batch.columns
    out = base.add_or_update(batch)
    assert out.doc_count() == 20
    got = out.df.filter(F.col("text") == "replayed").count()
    assert got == 3


def test_bucketed_store_migrate_under_write(tmp_path, spark, table):
    """VERDICT r9 #6 — the reference migrates DURING adds
    (`tests/test.h:364-396`); our store export must be a consistent
    commit-N cut. (a) a delta pair exported at commit N replays to
    exactly commit N's state even after later upserts + deletes +
    compaction rewrote and REMOVED the underlying bucket files (a lazy
    plan would re-read the swapped files or die on the renamed ones);
    (b) no commit can land inside the export's critical section — a
    concurrent writer fails fast instead of swapping files under the
    export's scan."""
    from gamma_spark.io_util import ConcurrentWriterError, writer_lock
    from gamma_spark.table import BucketedDocStore

    root = str(tmp_path / "store")
    store = BucketedDocStore.create(table, root, nbuckets=8)

    # consumer's base snapshot (immutable dump, commit 0)
    base_root = str(tmp_path / "snap")
    store.table().dump(base_root)
    base = GammaTable.load(spark, base_root)

    # advance the store to commit-state v1: update, insert, delete
    cols = [c for c in store.table().df.columns if c != "_docid"]
    batch = spark.createDataFrame(
        [(1, "v1 text", "en", "srcX", 1), (10**9, "fresh", "zz", "srcN", 2)],
        store.table().df.drop("_docid").schema,
    )
    store = store.upsert(batch, order_col=None)
    store, deleted_now = store.delete_by_filter(
        [GF.TermFilter("lang", ("zh",), GF.TERM_OR)]
    )
    v1_rows = sorted(tuple(r) for r in store.table().df.collect())
    v1_deleted = {r[0] for r in deleted_now.collect()}

    # export at v1 (materialized, consistent)
    upserts, deleted = store.migrate_since(base)

    # keep writing: another update to the SAME doc, more deletes, and a
    # compaction that physically removes the tombstoned rows' files
    batch2 = spark.createDataFrame(
        [(1, "v2 text CHANGED", "en", "srcX", 1)],
        store.table().df.drop("_docid").schema,
    )
    store = BucketedDocStore(spark, root).upsert(batch2)
    store, _ = store.delete_by_filter(
        [GF.TermFilter("lang", ("de",), GF.TERM_OR)]
    )
    store = store.compact()

    # the exported pair still replays base -> v1 exactly
    up_rows = upserts.collect()
    del_ids = {r[0] for r in deleted.collect()}
    assert del_ids == v1_deleted  # tombstones exact
    up_ids = {getattr(r, "doc_id") for r in up_rows}
    replayed = sorted(
        [tuple(r) for r in base.df.collect()
         if r.doc_id not in del_ids and r.doc_id not in up_ids]
        + [tuple(r)[: len(cols) + 1] for r in up_rows]
    )
    assert replayed == v1_rows

    # (b) the export's critical section is only the hardlink PIN (r11,
    # VERDICT r10 #6): while the pin is held the writer lock excludes
    # commits exactly as before...
    with writer_lock(root):
        with pytest.raises(ConcurrentWriterError):
            BucketedDocStore(spark, root).upsert(batch2)


def test_bucketed_store_migrate_snapshot_isolated(tmp_path, spark, table):
    """r11 (VERDICT r10 #6): the delta SCAN runs outside the writer
    lock against hardlink-pinned part files. Proof of both properties:
    (a) a writer PROCEEDS while the export scan is still pending (the
    r10 shape blocked it for the whole scan); (b) the export computed
    from the pin replays the PINNED commit's state even though the
    interleaved commit rewrote and deleted the underlying bucket
    dirs — snapshot isolation, not just torn-read avoidance."""
    from gamma_spark.table import BucketedDocStore

    root = str(tmp_path / "store")
    store = BucketedDocStore.create(table, root, nbuckets=8)

    base_root = str(tmp_path / "snap")
    store.table().dump(base_root)
    base = GammaTable.load(spark, base_root)

    batch = spark.createDataFrame(
        [(1, "v1 text", "en", "srcX", 1)],
        store.table().df.drop("_docid").schema,
    )
    store = store.upsert(batch, order_col=None)
    v1_rows = sorted(tuple(r) for r in store.table().df.collect())

    # pin commit v1, then land ANOTHER commit before any scan runs —
    # the interleaving the r10 blocking lock made impossible
    pin = store._pin_current_commit()
    try:
        batch2 = spark.createDataFrame(
            [(1, "v2 CHANGED", "en", "srcX", 1), (10**9, "new", "zz", "srcN", 2)],
            store.table().df.drop("_docid").schema,
        )
        BucketedDocStore(spark, root).upsert(batch2)  # (a) proceeds

        pinned = store._pinned_table(pin)
        # (b) the pinned view still reads commit v1 bit-for-bit, even
        # though upsert swapped the bucket dirs and removed the old
        # files (the hardlinks keep the bytes alive)
        spark.catalog.refreshByPath(f"{pin}/docs")
        assert sorted(tuple(r) for r in pinned.df.collect()) == v1_rows
        upserts, deleted = pinned.migrate_since(base)
        up = {r["doc_id"]: r["text"] for r in upserts.collect()}
        assert up == {1: "v1 text"}  # v1, NOT the interleaved v2
        assert deleted.count() == 0
    finally:
        import shutil

        shutil.rmtree(pin, ignore_errors=True)


def test_export_pin_sweep_policy(tmp_path, spark, table):
    """Stale-pin sweep (r11 review): (a) a local pin whose exporter pid
    is dead is removed; (b) a local pin older than EXPORT_PIN_TTL_NS is
    removed even when its pid reads as alive (pid-reuse guard — a
    recycled pid must not make a crashed exporter's pin immortal, since
    its hardlinks retain every superseded commit's bytes); (c) a
    FOREIGN host's pin is never judged — on a shared filesystem its
    export may be live and its pid is meaningless here."""
    import socket
    import subprocess

    from gamma_spark.table import BucketedDocStore

    root = str(tmp_path / "store")
    store = BucketedDocStore.create(table, root, nbuckets=4)
    host = socket.gethostname()

    child = subprocess.Popen(["true"])
    child.wait()
    dead = os.path.join(root, f".export-{host}-{child.pid}-{time.time_ns()}")
    stale_ns = time.time_ns() - BucketedDocStore.EXPORT_PIN_TTL_NS - 1
    expired = os.path.join(root, f".export-{host}-{os.getpid()}-{stale_ns}")
    foreign = os.path.join(root, ".export-no-such-host-1-1")
    for d in (dead, expired, foreign):
        os.makedirs(d)

    pin = store._pin_current_commit()
    try:
        assert not os.path.exists(dead)  # (a)
        assert not os.path.exists(expired)  # (b)
        assert os.path.exists(foreign)  # (c)
    finally:
        import shutil

        for d in (pin, foreign):
            shutil.rmtree(d, ignore_errors=True)


def test_export_partial_pin_cleaned_up(tmp_path, spark, table, monkeypatch):
    """A failed link loop (ENOSPC, EPERM on one bucket, no-hardlink
    filesystem) must not leave a partial .export-* dir behind: this
    pid is alive, so the liveness sweep would skip it for the life of
    the process while its hardlinks retain superseded commits. The
    OSError still propagates so migrate() takes the blocking
    fallback — and the export still succeeds."""
    from gamma_spark.table import BucketedDocStore

    root = str(tmp_path / "store")
    store = BucketedDocStore.create(table, root, nbuckets=4)
    base_root = str(tmp_path / "snap")
    store.table().dump(base_root)
    base = GammaTable.load(spark, base_root)

    batch = spark.createDataFrame(
        [(1, "v1 text", "en", "srcX", 1)],
        store.table().df.drop("_docid").schema,
    )
    store = store.upsert(batch, order_col=None)

    def no_link(src, dst, **kw):
        raise OSError(95, "hardlinks not supported")

    monkeypatch.setattr(os, "link", no_link)
    upserts, deleted = store.migrate_since(base)  # blocking fallback
    assert {r["doc_id"]: r["text"] for r in upserts.collect()} == {1: "v1 text"}
    assert deleted.count() == 0
    leftovers = [p for p in os.listdir(root) if p.startswith(".export-")]
    assert leftovers == []

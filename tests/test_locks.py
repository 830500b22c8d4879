"""Single-writer lock enforcement (VERDICT r6 #5): the sidecar stores'
single-writer contracts are self-enforcing — a second simulated writer
fails fast with ConcurrentWriterError instead of silently losing a
ledger entry to a read-modify-write race."""

import os
import subprocess
import sys

import pytest

from gamma_spark.io_util import ConcurrentWriterError, writer_lock


# -- unit: the lock itself ---------------------------------------------------


def test_writer_lock_excludes_live_holder(tmp_path):
    d = str(tmp_path / "store")
    with writer_lock(d):
        assert os.path.exists(os.path.join(d, "writer.lock"))
        with pytest.raises(ConcurrentWriterError, match="writer.lock"):
            with writer_lock(d):
                pass
    # released on exit
    assert not os.path.exists(os.path.join(d, "writer.lock"))
    with writer_lock(d):
        pass  # re-acquirable


def test_writer_lock_released_on_exception(tmp_path):
    d = str(tmp_path / "store")
    with pytest.raises(RuntimeError, match="boom"):
        with writer_lock(d):
            raise RuntimeError("boom")
    assert not os.path.exists(os.path.join(d, "writer.lock"))


def test_writer_lock_steals_dead_pid(tmp_path):
    """A lock left by a CRASHED writer (dead local pid) is stale and
    must be stolen, or every post-crash append would fail forever."""
    d = str(tmp_path / "store")
    os.makedirs(d)
    # a real pid that is guaranteed dead: a finished subprocess
    proc = subprocess.run([sys.executable, "-c", "pass"], check=True)
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    del proc
    with open(os.path.join(d, "writer.lock"), "w") as fh:
        fh.write(str(dead.pid))
    with writer_lock(d):  # steals, does not raise
        pass


def test_writer_lock_conservative_on_unreadable_pid(tmp_path):
    """An empty/garbled pid is treated as a LIVE holder (the
    acquire-to-write window): never steal what might be alive."""
    d = str(tmp_path / "store")
    os.makedirs(d)
    with open(os.path.join(d, "writer.lock"), "w") as fh:
        fh.write("not-a-pid")
    with pytest.raises(ConcurrentWriterError):
        with writer_lock(d):
            pass


# -- integration: the three guarded commit sections --------------------------


def test_bm25_append_fails_fast_under_held_lock(tmp_path, spark, documents):
    from gamma_spark.operators.retrieval import Bm25Index

    p = str(tmp_path / "bm25")
    base = documents.select("doc_id", "text").orderBy("doc_id").limit(50)
    idx = Bm25Index.build(base, path=p)
    batch = (
        documents.select("doc_id", "text").orderBy("doc_id").limit(60)
    ).subtract(base)
    with writer_lock(p):  # the simulated first writer
        with pytest.raises(ConcurrentWriterError):
            idx.append(batch, batch_id=1)
    # ledger intact, append succeeds once the writer is gone
    idx2 = idx.append(batch, batch_id=1)
    assert idx2.n_docs == pytest.approx(60.0)


def test_embedding_index_append_fails_fast_under_held_lock(
    tmp_path, spark, sf_dir
):
    from gamma_spark.operators.dedup import EmbeddingNearDupIndex

    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    p = str(tmp_path / "embidx")
    base = embs.orderBy("vec_id").limit(50)
    idx = EmbeddingNearDupIndex.build(base, dim=64, path=p)
    batch = embs.orderBy("vec_id").limit(60).subtract(base)
    with writer_lock(p):
        with pytest.raises(ConcurrentWriterError):
            idx.append(batch, batch_id=1)
    idx.append(batch, batch_id=1)  # clean retry lands


def test_bucketed_store_commit_fails_fast_under_held_lock(
    tmp_path, spark, documents
):
    from gamma_spark.table import BucketedDocStore, GammaTable

    root = str(tmp_path / "store")
    store = BucketedDocStore.create(
        GammaTable(spark, documents, id_col="doc_id"), root, nbuckets=8
    )
    batch = spark.createDataFrame(
        [(3, "locked-3", "en", "src1", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with writer_lock(root):
        with pytest.raises(ConcurrentWriterError):
            store.upsert(batch)
    # no half-committed state: commit number unchanged, retry lands
    reloaded = BucketedDocStore(spark, root)
    assert reloaded.meta["commit"] == store.meta["commit"]
    retried = reloaded.upsert(batch)
    assert retried.get_doc_by_id(3).collect()[0].text == "locked-3"

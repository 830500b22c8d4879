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


def test_writer_lock_crashed_writer_releases(tmp_path):
    """A lock FILE left by a crashed writer must not block forever:
    the kernel drops the flock with the dead process, so acquisition
    succeeds even though the stale file (and its garbled or dead-pid
    content — content is diagnostic only) is still on disk."""
    d = str(tmp_path / "store")
    os.makedirs(d)
    dead = subprocess.Popen([sys.executable, "-c", "pass"])
    dead.wait()
    for content in (str(dead.pid), "not-a-pid", ""):
        with open(os.path.join(d, "writer.lock"), "w") as fh:
            fh.write(content)
        with writer_lock(d):  # no flock held on the file -> acquirable
            pass


def test_writer_lock_excludes_live_cross_process_holder(tmp_path):
    """A live holder in ANOTHER process excludes us via the kernel
    flock — including during the open-to-write-pid window, which the
    old pid-file protocol could only approximate conservatively."""
    d = str(tmp_path / "store")
    ready = str(tmp_path / "ready")
    release = str(tmp_path / "release")
    holder = subprocess.Popen(
        [
            sys.executable,
            "-c",
            "import sys, time, pathlib\n"
            "sys.path.insert(0, %r)\n"
            "from gamma_spark.io_util import writer_lock\n"
            "with writer_lock(%r):\n"
            "    pathlib.Path(%r).touch()\n"
            "    while not pathlib.Path(%r).exists(): time.sleep(0.01)\n"
            % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))), d, ready, release),
        ]
    )
    try:
        import time

        deadline = time.time() + 30
        while not os.path.exists(ready):
            assert time.time() < deadline, "holder subprocess never acquired"
            time.sleep(0.01)
        with pytest.raises(ConcurrentWriterError):
            with writer_lock(d):
                pass
    finally:
        with open(release, "w"):
            pass
        holder.wait(timeout=30)
    with writer_lock(d):  # acquirable once the holder exits
        pass


def test_writer_lock_mutual_exclusion_stress(tmp_path):
    """TOCTOU regression (ADVICE r7): N processes hammering acquire
    with retry must serialize perfectly — a read-modify-write counter
    under the lock ends at exactly the number of acquisitions. Under
    the old steal protocol two stealers could both enter."""
    d = str(tmp_path / "store")
    counter = str(tmp_path / "counter")
    with open(counter, "w") as fh:
        fh.write("0")
    script = (
        "import sys, time\n"
        "sys.path.insert(0, %r)\n"
        "from gamma_spark.io_util import writer_lock, ConcurrentWriterError\n"
        "done = 0\n"
        "while done < 20:\n"
        "    try:\n"
        "        with writer_lock(%r):\n"
        "            n = int(open(%r).read())\n"
        "            time.sleep(0.001)\n"
        "            open(%r, 'w').write(str(n + 1))\n"
        "        done += 1\n"
        "    except ConcurrentWriterError:\n"
        "        time.sleep(0.001)\n"
        % (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            d,
            counter,
            counter,
        )
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", script]) for _ in range(4)
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    assert int(open(counter).read()) == 4 * 20


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


def test_writer_lock_blocking_mode_serializes(tmp_path):
    """block=True waits in the kernel instead of raising: N processes
    doing read-modify-write increments with NO retry loop still end at
    exactly N*K — the serialize-appends mode."""
    d = str(tmp_path / "store")
    counter = str(tmp_path / "counter")
    with open(counter, "w") as fh:
        fh.write("0")
    script = (
        "import sys, time\n"
        "sys.path.insert(0, %r)\n"
        "from gamma_spark.io_util import writer_lock\n"
        "for _ in range(15):\n"
        "    with writer_lock(%r, block=True):\n"
        "        n = int(open(%r).read())\n"
        "        time.sleep(0.001)\n"
        "        open(%r, 'w').write(str(n + 1))\n"
        % (
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            d,
            counter,
            counter,
        )
    )
    procs = [
        subprocess.Popen([sys.executable, "-c", script]) for _ in range(4)
    ]
    for p in procs:
        assert p.wait(timeout=120) == 0
    assert int(open(counter).read()) == 4 * 15

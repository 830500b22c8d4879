"""GammaTable — the document-table abstraction + DML surface (SURVEY §1,
§2.1).

The reference's table is scalars + vector fields keyed by ``_id`` with a
dense engine-assigned ``docid`` (`table/table.cc`, cuckoo key map
`table/table.h:185`), logical deletes via a global bitmap
(`util/bitmap_manager.cc`), and snapshot Dump/Load persistence with a
done-marker (`search/gamma_engine.cc:1101-1146`).

Spark mapping (SURVEY §1.4):

- docs live in Parquet; ``_docid`` is a dense long minted at ingest,
  ``_deleted`` a tombstone column every reader masks.
- AddOrUpdateDocs = MERGE-style batch job: new keys get fresh docids,
  existing keys are updated in place (same ``_docid``), duplicate keys
  *within* a batch resolve last-write-wins
  (`search/gamma_engine.cc:676-759`).
- Dump = atomic snapshot directory (write to temp, done-marker rename);
  Load = newest complete snapshot. Gamma's replay-rebuild of field
  indexes disappears — Parquet stats are rebuilt by writing.

Scale notes: docid minting uses a per-partition offset scheme (no
global sort, no driver collect); upsert is a single full-outer-shuffle
join on ``_id`` — at 100 TB the docs side should be bucketed by ``_id``
so the join co-locates without shuffling the big side; deletes write
only tombstones and a compaction job rewrites.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gamma_spark import filters as GF
from gamma_spark.io_util import atomic_write_json, read_json_or_none

DOCID = "_docid"
DELETED = "_deleted"
DONE_MARKER = "dump.done"


def assign_docids(
    df: DataFrame,
    start: int = 0,
    docid_col: str = DOCID,
    stats_out: dict | None = None,
) -> DataFrame:
    """Mint dense monotonically-increasing docids (gamma's ``max_docid_``
    counter, `search/gamma_engine.cc:656`) without a global sort.

    Two Spark jobs: (1) count rows per partition (cheap, column-pruned),
    (2) per-partition ``row_number`` + broadcast offset. Unlike
    ``monotonically_increasing_id`` the result is *dense*, which
    multi-vector fusion and the delete bitmap analogue rely on.

    ``stats_out`` (optional dict) receives ``{"n": rows, "end": next
    unminted docid}`` from the count pass — minting already knows the
    post-batch max docid, so callers that previously ran a separate
    ``max(_docid)`` action over the minted relation can read it here
    for free (guide §1.2: don't compute what a prior pass already
    established).
    """
    with_pid = df.withColumn("_pid", F.spark_partition_id())
    counts = with_pid.groupBy("_pid").count().collect()
    if stats_out is not None:
        total = int(sum(r["count"] for r in counts))
        stats_out["n"] = total
        stats_out["end"] = start + total
    if not counts:  # empty input: keep schema, no rows to number
        return df.withColumn(docid_col, F.lit(start).cast("long"))
    offsets, acc = {}, start
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[int(row["_pid"])] = acc
        acc += row["count"]

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(docid_col, LongType())]
    )
    names = [f.name for f in out_schema.fields]

    def number(batches):
        # shuffle-free numbering: mapInPandas preserves row order within
        # a partition, so a running counter from the partition's offset
        # reproduces the dense sequence the count pass promised
        import pandas as pd  # noqa: F401

        pos = None
        for pdf in batches:
            if pdf.empty:
                continue
            if pos is None:
                pos = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.copy()
            pdf[docid_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf.drop(columns=["_pid"])

    return with_pid.mapInPandas(number, schema=out_schema)


def _merge_batch(
    cur: DataFrame,
    batch: DataFrame,
    idc: str,
    next_docid_start: int | None = None,
    order_col: str | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """Core AddOrUpdateDocs merge (`search/gamma_engine.cc:676-759`):
    last-write-wins dedup within the batch, in-place update of existing
    keys (docid preserved, tombstone cleared), fresh dense docids for
    new keys. ``cur`` must carry ``_docid``/``_deleted``. Shared by the
    full-table path (GammaTable.add_or_update) and the O(batch) bucketed
    path (BucketedDocStore.upsert), where ``cur`` is only the affected
    buckets and ``next_docid_start`` comes from store metadata.

    Engine-internal columns riding on the batch are dropped: a
    migrate_since replay feeds upserts built from a live view (which
    carries ``_docid``) straight back in, and the stale docids must not
    collide with this table's minting (the merge assigns/preserves
    docids itself; tombstones arrive through the deletes relation, not
    the upsert batch)."""
    batch = batch.drop(DOCID, DELETED)
    if order_col is not None:
        if order_col not in batch.columns:
            raise ValueError(f"order_col {order_col!r} not in batch columns")
        pos = F.col(order_col)
        deduped_in = batch
    else:
        # partition-major, not ingestion order — see add_or_update docstring
        pos = F.col("_batch_pos")
        deduped_in = batch.withColumn("_batch_pos", F.monotonically_increasing_id())
    w = Window.partitionBy(idc).orderBy(pos.desc())
    drop_cols = ["_rn", order_col] if order_col is not None else ["_rn", "_batch_pos"]
    deduped = (
        deduped_in.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop(*drop_cols)
    )
    # upserts replace WHOLE documents (the reference's AddOrUpdateDoc
    # takes full docs): a batch missing a stored column would silently
    # narrow the output schema and erase that column for EVERY row in
    # the rewritten scope (the whole table here; every touched bucket
    # on the BucketedDocStore path) — fail loudly instead
    missing = [
        c
        for c in cur.columns
        if c not in (idc, DOCID, DELETED) and c not in deduped.columns
    ]
    if missing:
        raise ValueError(
            f"upsert batch is missing stored column(s) {missing}; "
            "upserts replace whole documents — include every data column"
        )
    data_cols = [c for c in deduped.columns if c != idc]
    joined = cur.alias("t").join(
        deduped.alias("b"), on=F.col(f"t.{idc}") == F.col(f"b.{idc}"), how="left"
    )
    updated = joined.select(
        F.col(f"t.{idc}").alias(idc),
        F.col(f"t.{DOCID}").alias(DOCID),
        F.when(F.col(f"b.{idc}").isNotNull(), F.lit(False))
        .otherwise(F.col(f"t.{DELETED}"))
        .alias(DELETED),
        *[
            F.when(F.col(f"b.{idc}").isNotNull(), F.col(f"b.{c}"))
            .otherwise(F.col(f"t.{c}"))
            .alias(c)
            for c in data_cols
        ],
    )
    if next_docid_start is None:
        max_docid = cur.select(F.max(DOCID)).collect()[0][0]
        next_docid_start = (max_docid or -1) + 1
    new_rows = deduped.join(cur.select(idc), on=idc, how="left_anti")
    new_rows = assign_docids(new_rows, start=next_docid_start, stats_out=stats_out)
    if stats_out is not None:
        # post-merge max docid, known from the minting count pass:
        # updated rows keep docids <= the pre-batch max, inserts end at
        # end-1 — callers use this instead of re-scanning the merge
        stats_out["max_docid"] = max(next_docid_start - 1, stats_out["end"] - 1)
    new_rows = new_rows.withColumn(DELETED, F.lit(False))
    return updated.unionByName(new_rows.select(*updated.columns))


class GammaTable:
    """A gamma document table backed by a DataFrame (optionally a Parquet
    snapshot directory). One instance = one table, like one engine
    instance = one table in the reference (`c_api/gamma_api.h:20-206`).
    """

    def __init__(
        self,
        spark: SparkSession,
        df: DataFrame,
        id_col: str = "_id",
        path: str | None = None,
    ):
        self.spark = spark
        self.id_col = id_col
        self.path = path
        #: max docid ever minted for this table when KNOWN from the
        #: minting pass (None when the relation arrived with _docid
        #: already attached, e.g. a snapshot load). Lets docid-derived
        #: metadata (BucketedDocStore.create, add_or_update's
        #: next_docid_start) skip a full max(_docid) scan.
        self._max_docid_hint: int | None = None
        if DOCID not in df.columns:
            stats: dict = {}
            df = assign_docids(df, stats_out=stats)
            self._max_docid_hint = stats["end"] - 1
        if DELETED not in df.columns:
            df = df.withColumn(DELETED, F.lit(False))
        self._df = df
        self._config: dict = {"path": path, "cache": {}}

    # -- views ---------------------------------------------------------
    @property
    def df(self) -> DataFrame:
        """Live view: deleted docs masked (F7)."""
        return self._df.filter(~F.col(DELETED)).drop(DELETED)

    @property
    def raw(self) -> DataFrame:
        return self._df

    def doc_count(self) -> int:
        """GetDocsNum = max_docid - delete_num (`gamma_engine.cc:1069`)."""
        return self.df.count()

    def status(self) -> dict:
        """EngineStatus analogue (`idl/fbs/engine_status.fbs:87-99`)."""
        agg = self._df.select(
            F.count(F.lit(1)).alias("max_docid"),
            F.sum(F.col(DELETED).cast("long")).alias("deleted"),
        ).collect()[0]
        return {
            "max_docid": agg["max_docid"],
            "deleted": int(agg["deleted"] or 0),
            "doc_count": agg["max_docid"] - int(agg["deleted"] or 0),
        }

    # -- config (SetConfig/GetConfig, `c_api/gamma_api.h:181-189`) -------
    def set_config(self, cache_infos: dict[str, int]) -> dict:
        """SetConfig analogue (`search/gamma_engine.cc:1367-1382`): the
        reference's only runtime knob is per-component LRU cache sizing
        ("table" / "string" / vector fields). The Spark translation of
        "give this component a cache" is persisting the relation:
        ``{"docs": n}`` with n > 0 pins the table in executor memory
        (MEMORY_AND_DISK — Spark manages eviction, so the byte count is
        advisory exactly as gamma's is); 0 releases it. Unknown
        components are recorded but have no Spark-side effect (Parquet
        readers have no per-field cache to size). Returns the updated
        config, matching ``SetConfig``'s ``GetConfig(conf)`` tail call."""
        for component, size in cache_infos.items():
            self._config["cache"][component] = int(size)
            if component == "docs":
                if size > 0 and not self._df.is_cached:
                    self._df.persist()
                elif size <= 0 and self._df.is_cached:
                    self._df.unpersist()
        return self.get_config()

    def get_config(self) -> dict:
        """GetConfig analogue: current path + cache sizings."""
        return {
            "path": self._config.get("path") or self.path,
            "cache": dict(self._config["cache"]),
        }

    # -- index build (CreateTable retrieval_type) ------------------------
    def build_index(self, model: str = "IVFFLAT", **params):
        """Build the named retrieval model over this table's live view
        through the registry — the CreateTable ``retrieval_type`` +
        ``retrieval_param`` surface (`search/gamma_engine.cc:524-617`;
        model lookup mirrors REGISTER_MODEL reflection,
        `index/reflector.h`). Any of FLAT / IVFFLAT / IVFPQ / IVFSQ8 /
        BINARYIVF / HNSW / VEARCH; params pass through to the model's
        build()."""
        from gamma_spark.operators.ann import get_model

        return get_model(model).build(self.df, **params)

    # -- search (the user-facing engine.Search) --------------------------
    def search(self, request, index=None):
        """Run a SearchRequest against this table's live view — the
        GammaTable analogue of the reference's ``Search(engine, req)``
        entry point (`c_api/gamma_api.h`)."""
        from gamma_spark.plans.search import search as _search

        return _search(self.df, request, index=index)

    # -- point lookup (S4) ----------------------------------------------
    def get_doc_by_id(self, key) -> DataFrame:
        """GetDocByID (`search/gamma_engine.cc:951-994`): deleted => miss."""
        return self.df.filter(F.col(self.id_col) == F.lit(key))

    # -- upsert (S2/S3) --------------------------------------------------
    def add_or_update(
        self,
        batch: DataFrame,
        persist_root: str | None = None,
        order_col: str | None = None,
    ) -> "GammaTable":
        """AddOrUpdateDocs (`search/gamma_engine.cc:676-759`).

        - duplicate ``_id`` within the batch: last write wins (batch
          order = ingestion order);
        - existing ``_id``: update in place, docid preserved, tombstone
          cleared (a re-add of a deleted key revives it with its old
          docid — matches gamma updating rather than re-adding);
        - new ``_id``: appended with fresh dense docids.

        ``order_col``: name of a column in ``batch`` giving the explicit
        within-batch write order (higher = later = wins); it is consumed
        and not stored. Without it the order falls back to
        ``monotonically_increasing_id``, which is *partition-major*, not
        ingestion order — deterministic only for single-partition
        batches. Callers with conflicting keys across a multi-partition
        batch must pass ``order_col`` (VERDICT r2 #4).

        ``persist_root``: write the merged state back as a snapshot
        (dump + done-marker) and return a table whose plan is a bare
        Parquet scan of it. Without this, N successive upserts stack N
        joins of logical lineage — fine for one batch, fatal for a
        drip-feed. NOTE this rewrites the full table per batch; the
        O(batch) durable path is ``BucketedDocStore.upsert``.
        """
        stats: dict = {}
        merged = _merge_batch(
            self._df, batch, self.id_col,
            # minting bookkeeping: when this table minted its own docids
            # the max is already known — skip _merge_batch's max(_docid)
            # scan over the full table (a per-upsert full pass, and a
            # Python one when the table plan carries mapInPandas stages)
            next_docid_start=(
                None if self._max_docid_hint is None
                else self._max_docid_hint + 1
            ),
            order_col=order_col,
            stats_out=stats,
        )
        out = GammaTable(self.spark, merged, id_col=self.id_col, path=self.path)
        out._max_docid_hint = stats.get("max_docid")
        if persist_root is None:
            return out
        out.dump(persist_root)
        return GammaTable.load(self.spark, persist_root)

    # -- delete (F10) -----------------------------------------------------
    def delete_by_id(self, key) -> "GammaTable":
        return self.delete_by_filter([], extra_predicate=F.col(self.id_col) == F.lit(key))[0]

    def delete_by_query(self, range_filters) -> "GammaTable":
        """DelDocByQuery (`search/gamma_engine.cc:826-871`): the range-
        only variant — tombstones matches, does NOT return ids (the
        reference only sets the bitmap on this path)."""
        from gamma_spark.filters import RangeFilter

        if not all(isinstance(f, RangeFilter) for f in range_filters):
            raise TypeError("delete_by_query accepts RangeFilters only "
                            "(term deletes go through delete_by_filter)")
        table, _ = self.delete_by_filter(range_filters)
        return table

    def delete_by_filter(
        self, filter_list, extra_predicate: Column | None = None
    ) -> tuple["GammaTable", DataFrame]:
        """DelDocByFilter (`search/gamma_engine.cc:873-949`): tombstone
        matching live docs and return their ids (the reference returns a
        JSON array of deleted ``_id``s)."""
        pred = GF.combine(filter_list, self._df)
        full = F.lit(True) if pred is None else pred
        if extra_predicate is not None:
            full = full & extra_predicate
        hit = full & ~F.col(DELETED)
        deleted_ids = self._df.filter(hit).select(self.id_col)
        new_df = self._df.withColumn(
            DELETED, F.when(hit, F.lit(True)).otherwise(F.col(DELETED))
        )
        out = GammaTable(self.spark, new_df, id_col=self.id_col, path=self.path)
        out._max_docid_hint = self._max_docid_hint  # tombstones mint nothing
        return out, deleted_ids

    # -- snapshot persistence (S5) ---------------------------------------
    def dump(self, root: str) -> str:
        """Dump (`search/gamma_engine.cc:1101-1146`): timestamped snapshot
        dir; the done-marker write is last, so readers only ever load
        complete snapshots."""
        # ONE clock reading for both parts: two reads straddling a
        # second boundary can yield '..00_999' -> '..01_000'-style
        # inversions where the newer snapshot sorts lexically OLDER and
        # load() silently returns stale data. gmtime, not localtime: a
        # DST fall-back would reintroduce the same inversion through
        # the wall clock (01:50 EDT sorts after 01:10 EST an hour later)
        now = time.time()
        ts = time.strftime(
            "%Y%m%d%H%M%S", time.gmtime(now)
        ) + f"_{int(now * 1000) % 1000:03d}"
        snap = os.path.join(root, ts)
        self._df.write.mode("overwrite").parquet(os.path.join(snap, "docs"))
        meta = {"id_col": self.id_col, "created": ts, "columns": self._df.columns}
        atomic_write_json(os.path.join(snap, "meta.json"), meta)
        with open(os.path.join(snap, DONE_MARKER), "w") as fh:
            fh.write("done\n")
        return snap

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "GammaTable":
        """Load the newest snapshot carrying a done-marker
        (`search/gamma_engine.cc:1175-1285`)."""
        snaps = sorted(
            d
            for d in os.listdir(root)
            if os.path.exists(os.path.join(root, d, DONE_MARKER))
        )
        if not snaps:
            raise FileNotFoundError(f"no complete snapshot under {root}")
        snap = os.path.join(root, snaps[-1])
        with open(os.path.join(snap, "meta.json")) as fh:
            meta = json.load(fh)
        df = spark.read.parquet(os.path.join(snap, "docs"))
        return cls(spark, df, id_col=meta["id_col"], path=snap)

    # -- migrate (S8) ------------------------------------------------------
    def migrate_since(self, snapshot: "GammaTable") -> tuple[DataFrame, DataFrame]:
        """Incremental export relative to an earlier snapshot
        (`BeginMigrate/GetMigrageDoc`, `storage/migrate_data.cc`):
        returns (upserts, deleted_ids) — new or changed live docs, and
        keys tombstoned since the snapshot. A consumer replaying
        upserts + deletes onto the snapshot reconstructs this table."""
        idc = self.id_col
        cur_live = self.df
        old_live = snapshot.df.select(*cur_live.columns)
        # changed-or-new detection via per-row content hash: the old side
        # shuffles only (id, hash) instead of full-width rows (exceptAll
        # shuffles both tables whole — at 100 TB that doubles the bytes
        # moved). Hashing a JSON encoding of the row struct discriminates
        # NULLs: bare xxhash64(*cols) SKIPS null inputs, so a value
        # moving across a NULL between same-typed columns — e.g.
        # (NULL,'x') -> ('x',NULL) — hashed identically and the update
        # was deterministically dropped (ADVICE r3). Residual risk is the
        # 2^-64 random collision every hash-diff replication scheme takes.
        data_cols = [c for c in cur_live.columns if c != idc]
        hcol = F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in data_cols])))
        old_h = old_live.select(F.col(idc), hcol.alias("_oh"))
        upserts = (
            cur_live.withColumn("_ch", hcol)
            .join(old_h, on=idc, how="left")
            .filter(F.col("_oh").isNull() | (F.col("_ch") != F.col("_oh")))
            .drop("_ch", "_oh")
        )
        deleted = old_live.select(idc).join(
            cur_live.select(idc), on=idc, how="left_anti"
        )
        return upserts, deleted

    def compact(self) -> "GammaTable":
        """Physically drop tombstoned rows (gamma leaves this to index
        compaction, `index/impl/gamma_index_ivfpq.cc:420`)."""
        return GammaTable(
            self.spark, self._df.filter(~F.col(DELETED)), id_col=self.id_col, path=self.path
        )


# ---------------------------------------------------------------------------
# BucketedDocStore — O(batch) durable upsert (VERDICT r2 #3)
# ---------------------------------------------------------------------------

BUCKET = "_bucket"


def _bucket_of(id_col: str, nbuckets: int) -> Column:
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(nbuckets)).cast("int")


class BucketedDocStore:
    """Durable doc store partitioned by ``pmod(xxhash64(_id), nbuckets)``
    where an upsert batch rewrites **only the buckets its keys hash
    into** — the Spark analogue of the reference's in-place update
    (`search/gamma_engine.cc:761-800`), replacing ``persist_root``'s
    full-table rewrite with an O(batch)-sized write.

    Layout under ``root``::

        docs/_bucket=<n>/part-*.parquet   hash-partitioned rows
        meta.json                         {id_col, nbuckets, max_docid, commit}
        dump.done                         written LAST per commit

    Scale story: at 100 TB with e.g. 4096 buckets, a drip-feed batch
    touching B buckets reads and writes ~B/4096 of the table — reads are
    partition-pruned (``_bucket IN (...)`` prunes directories), writes
    use dynamic partition overwrite so untouched bucket directories are
    never listed, read, or rewritten. ``max_docid`` lives in the
    metadata, so docid minting never scans the table.

    Crash semantics (r5, VERDICT r4 #8): a commit writes replacement
    buckets to a ``.staging-<commit>`` dir, journals the swap into the
    ``.trash-<commit>`` dir (commit number + affected buckets), swaps
    each affected bucket directory into place with atomic renames,
    rewrites ``meta.json`` + done-marker, and only then clears the
    trash. Every prefix of that sequence is recoverable on the next
    open: a crash before the journal leaves the docs dir untouched; a
    crash mid-swap (or before the meta write) is detected as
    ``meta.commit < journal.commit`` and rolled back from the trash to
    the exact pre-commit state; a crash after the meta write just
    finishes cleanup. The reference's in-place row store can tear and
    recovers by replay (`search/gamma_engine.cc:1175-1285`); here the
    store itself rolls back. ``GammaTable.dump`` snapshots remain the
    belt-and-suspenders path.
    """

    def __init__(self, spark: SparkSession, root: str, _schema=None):
        self.spark = spark
        self.root = root
        # sidecar-schema cache (r12, guide §1.2 "the driver is part of
        # the job"): the schema sidecar is written once by create() and
        # never rewritten (upserts must carry every stored column —
        # _merge_batch fails loudly otherwise; delete/compact only flip
        # or drop rows), so its footer is read at most once per store
        # lifetime. Without this, every raw() call ran a one-task
        # schema-inference job (+ driver gap); an upsert chain paid
        # ~2 jobs per commit just re-reading the same schema.
        # _swap_commit hands the cache to the post-commit instance.
        self._sidecar_schema = _schema
        # a crash mid-swap leaves a .trash-<n> dir with a swap journal;
        # heal BEFORE trusting the docs dir (VERDICT r4 #8). Recovery
        # is DESTRUCTIVE (renames + rmtree), so it must not race a
        # LIVE commit: the same leftover signature exists while a
        # healthy writer is mid-swap. Fast path: no leftovers, no lock.
        # Leftovers: take the writer lock (blocking — a live committer
        # finishes in seconds and cleans its own trash) and re-scan
        # under it; after a genuine crash the lock is free and the
        # re-scan still sees the torn state.
        import glob as _glob

        from gamma_spark.io_util import writer_lock

        leftovers = _glob.glob(os.path.join(root, ".trash-*")) or _glob.glob(
            os.path.join(root, ".staging-*")
        )
        if leftovers:
            with writer_lock(root, block=True):
                recovered = self._recover_torn_swap(root)
            if recovered:
                # healed dirs must not be read through a stale listing
                spark.catalog.refreshByPath(os.path.join(root, "docs"))
        with open(os.path.join(root, "meta.json")) as fh:
            self.meta = json.load(fh)
        if not os.path.exists(os.path.join(root, DONE_MARKER)):
            raise FileNotFoundError(f"no complete commit under {root}")

    @staticmethod
    def _recover_torn_swap(root: str) -> bool:
        """Detect and heal a half-swapped docs dir. ``_swap_commit``
        journals the swap (commit number + affected buckets) into the
        trash dir BEFORE the first rename; the trash dir is removed
        only after the new meta is durable. So on open:

        - no ``.trash-*``: nothing in flight;
        - trash + meta.commit == journal commit: the swap AND meta
          committed, only cleanup was interrupted — finish it;
        - trash + meta.commit < journal commit: torn swap — roll every
          affected bucket back (old dir restored from trash; a bucket
          with no trash entry was newly created by the torn commit and
          is removed), leaving the store bit-identical to the
          pre-commit state the old meta describes.

        A trash dir without a journal predates the journaled protocol
        (or crashed before the journal write, i.e. before any rename) —
        the docs dir is untouched; just clean up. Returns True if any
        in-flight state was found (the caller then refreshes Spark's
        cached file listing)."""
        import glob as _glob
        import shutil

        recovered = False
        docs_path = os.path.join(root, "docs")
        for trash in sorted(_glob.glob(os.path.join(root, ".trash-*"))):
            recovered = True
            # an unparsable journal == crashed before the (atomic)
            # journal replace landed, i.e. before any rename — the docs
            # dir is untouched, so treat it exactly like no journal:
            # clean up, never roll back
            journal = read_json_or_none(os.path.join(trash, "swap.json"))
            if journal is not None:
                cur_meta = read_json_or_none(os.path.join(root, "meta.json"))
                cur_commit = int(cur_meta["commit"]) if cur_meta else -1
                if cur_commit < int(journal["commit"]):
                    # torn: roll back exactly the buckets the loop
                    # touched — an old dir parked in the trash is
                    # restored; a "created-<b>" marker means the torn
                    # commit created the bucket, so it is removed; a
                    # bucket with neither was never reached by the
                    # rename loop and is left alone
                    for b in journal["hit"]:
                        dst = os.path.join(docs_path, f"{BUCKET}={b}")
                        src_old = os.path.join(trash, f"{BUCKET}={b}")
                        if os.path.exists(src_old):
                            if os.path.exists(dst):
                                shutil.rmtree(dst)
                            os.rename(src_old, dst)
                        elif os.path.exists(
                            os.path.join(trash, f"created-{b}")
                        ) and os.path.exists(dst):
                            shutil.rmtree(dst)
                # else: swap + meta committed; only cleanup remained
            shutil.rmtree(trash, ignore_errors=True)
        for staging in _glob.glob(os.path.join(root, ".staging-*")):
            recovered = True
            shutil.rmtree(staging, ignore_errors=True)
        return recovered

    # -- bootstrap -------------------------------------------------------
    @classmethod
    def create(
        cls,
        table: GammaTable,
        root: str,
        nbuckets: int = 256,
    ) -> "BucketedDocStore":
        """Materialize a GammaTable as a bucketed store (full write —
        done once; every later batch is incremental)."""
        spark = table.spark
        # co-locate buckets before the partitioned write: without the
        # repartition, T tasks x nbuckets dirs spray T*nbuckets tiny
        # files and every later pruned read pays the listing
        df = table.raw.withColumn(
            BUCKET, _bucket_of(table.id_col, nbuckets)
        ).repartition(nbuckets, F.col(BUCKET))
        df.write.mode("overwrite").partitionBy(BUCKET).parquet(
            os.path.join(root, "docs")
        )
        # schema sidecar: an empty non-partitioned parquet carrying the
        # full row schema, so the store stays readable even when every
        # bucket is compacted away (zero data files -> no inference)
        df.limit(0).write.mode("overwrite").parquet(os.path.join(root, "schema"))
        if table._max_docid_hint is not None:
            # the table minted its own docids, so the max is already
            # known — no post-write max(_docid) job (the written data
            # is exactly table.raw plus the bucket column)
            max_docid = table._max_docid_hint
        else:
            written = spark.read.parquet(os.path.join(root, "docs"))
            max_docid = written.select(F.max(DOCID)).collect()[0][0]
        meta = {
            "id_col": table.id_col,
            "nbuckets": nbuckets,
            "max_docid": int(max_docid if max_docid is not None else -1),
            "commit": 0,
            "columns": [c for c in table.raw.columns],
        }
        cls._commit_meta(root, meta)
        return cls(spark, root)

    @staticmethod
    def _commit_meta(root: str, meta: dict) -> None:
        # atomic replace: _recover_torn_swap reads this very file to
        # decide rollback-vs-cleanup, so it must never observe a
        # truncated prefix of its own commit step
        atomic_write_json(os.path.join(root, "meta.json"), meta)
        with open(os.path.join(root, DONE_MARKER), "w") as fh:
            fh.write(f"commit={meta['commit']}\n")

    # -- views -----------------------------------------------------------
    @property
    def id_col(self) -> str:
        return self.meta["id_col"]

    @property
    def nbuckets(self) -> int:
        return int(self.meta["nbuckets"])

    def raw(self, docs_dir: str | None = None) -> DataFrame:
        """The docs relation, schema-pinned by the sidecar when one
        exists. ``docs_dir`` overrides the scan path (the export pin
        reads the same schema over its hardlinked snapshot)."""
        docs = docs_dir or os.path.join(self.root, "docs")
        schema_dir = os.path.join(self.root, "schema")
        if self._sidecar_schema is not None:
            return self.spark.read.schema(self._sidecar_schema).parquet(docs)
        if os.path.exists(schema_dir):
            s = self.spark.read.parquet(schema_dir).schema
            self._sidecar_schema = s
            return self.spark.read.schema(s).parquet(docs)
        return self.spark.read.parquet(docs)

    def table(self) -> GammaTable:
        """The store as a GammaTable (bare Parquet scan, no lineage)."""
        return GammaTable(
            self.spark, self.raw().drop(BUCKET), id_col=self.id_col, path=self.root
        )

    def get_doc_by_id(self, key) -> DataFrame:
        """Point lookup reading ONE bucket directory: the bucket of a
        literal key folds to a constant (Catalyst constant-folds
        ``pmod(xxhash64(lit(key)), nb)``), so the partition filter
        prunes every other bucket at scan planning — the store-level
        analogue of gamma's cuckoo key map (`table/table.h:185`).
        Deleted docs are a miss (S4 semantics)."""
        raw = self.raw()
        # xxhash64 is type-sensitive: the literal must hash as the same
        # type the bucket column was derived from (INT 42 != LONG 42)
        key_lit = F.lit(key).cast(raw.schema[self.id_col].dataType)
        hit = F.col(BUCKET) == F.pmod(
            F.xxhash64(key_lit), F.lit(self.nbuckets)
        ).cast("int")
        return raw.filter(
            hit & (F.col(self.id_col) == key_lit) & ~F.col(DELETED)
        ).drop(BUCKET, DELETED)

    # -- O(batch) upsert -------------------------------------------------
    def upsert(self, batch: DataFrame, order_col: str | None = None) -> "BucketedDocStore":
        """AddOrUpdateDocs against the store, rewriting only affected
        buckets. Same merge semantics as ``GammaTable.add_or_update``
        (last-write-wins, docid-preserving updates, fresh dense docids
        for inserts, tombstone revival)."""
        idc = self.id_col
        nb = self.nbuckets
        # xxhash64 bucketing is TYPE-sensitive (INT 42 != LONG 42, the
        # point_lookup comment below): a batch whose id column arrives
        # narrower than the store's would compute `hit` from the narrow
        # hashes while the post-merge bucket recompute runs on the
        # union-promoted type — rows land in staged buckets outside
        # `hit` and the commit silently discards them. Widen the batch
        # id to the store's type up front; anything non-widening fails
        # loudly instead of corrupting the store.
        from pyspark.sql import types as _T

        raw = self.raw()  # one relation for the type check AND the pruned read
        store_t = raw.schema[idc].dataType
        batch_t = batch.schema[idc].dataType
        if batch_t != store_t:
            _rank = {
                _T.ByteType(): 0, _T.ShortType(): 1,
                _T.IntegerType(): 2, _T.LongType(): 3,
            }
            if batch_t in _rank and store_t in _rank and _rank[batch_t] <= _rank[store_t]:
                batch = batch.withColumn(idc, F.col(idc).cast(store_t))
            else:
                raise TypeError(
                    f"upsert batch id column {idc!r} is {batch_t.simpleString()} "
                    f"but the store was created with {store_t.simpleString()}; "
                    "cast the batch to the store's id type explicitly"
                )
        # bounded collect: at most nbuckets ints
        hit = [
            int(r[0])
            for r in batch.select(_bucket_of(idc, nb).alias("b")).distinct().collect()
        ]
        if not hit:
            return self
        # partition-pruned read (only affected bucket directories)
        # through raw(): the schema-sidecar path keeps a fully
        # compacted-away store (zero bucket dirs) readable — a bare
        # read.parquet on the empty docs dir fails schema inference
        cur = raw.filter(F.col(BUCKET).isin(hit))
        stats: dict = {}
        merged = _merge_batch(
            cur.drop(BUCKET),
            batch,
            idc,
            next_docid_start=int(self.meta["max_docid"]) + 1,
            order_col=order_col,
            stats_out=stats,
        )
        # co-locate each bucket before the partitioned write (T tasks x
        # B buckets would otherwise spray T*B tiny files — same hygiene
        # as the IVF index write, operators/ivf.py). The post-merge max
        # docid comes from the minting count pass (stats_out), so the
        # staged write is the merge's ONLY materialization — the former
        # persist + separate max(_docid) job per commit are gone
        merged = merged.withColumn(BUCKET, _bucket_of(idc, nb)).repartition(
            len(hit), F.col(BUCKET)
        )
        meta = dict(self.meta)
        meta["max_docid"] = max(
            int(self.meta["max_docid"]), int(stats["max_docid"])
        )
        return self._swap_commit(merged, hit, meta, pre_partitioned=True)

    def _swap_commit(
        self,
        df: DataFrame,
        hit: list[int],
        meta: dict | None = None,
        pre_partitioned: bool = False,
    ) -> "BucketedDocStore":
        """Commit ``df``'s rows as the new content of the ``hit``
        buckets: stage to a fresh directory, atomically rename each
        bucket dir into place (old dir parked in ``.trash`` until the
        swap completes), metadata + done-marker last. A plain overwrite
        of a private staging dir needs no partitionOverwriteMode
        fiddling — the session conf is never touched (ADVICE r3: the
        previous dynamic-mode toggle leaked session-wide when the conf
        was unset before the call). A ``hit`` bucket absent from ``df``
        (e.g. fully compacted away) is removed.

        ``pre_partitioned=True`` declares the caller already
        co-located ``df`` on the bucket column (upsert repartitions
        below its persist so the staged write reads the CACHED layout);
        repartitioning again here would shuffle every merged row a
        second time. The default keeps the pre-write repartition for
        unpartitioned callers (delete_by_filter, compact) — without it
        T scan tasks x B buckets would spray T*B tiny staging files."""
        import shutil

        from gamma_spark.io_util import writer_lock

        # self-enforced single-writer (io_util.writer_lock): two
        # concurrent committers would both derive commit N+1 from the
        # same opened meta and collide on the staging/trash dirs and
        # the ledger — the second one now fails fast with
        # ConcurrentWriterError instead
        with writer_lock(self.root):
            # stale-handle guard: SEQUENTIAL writers from separately
            # opened handles never contend on the lock, but a handle
            # opened at commit N would still mint commit N+1 and docids
            # from N's max_docid after another handle already committed
            # N+1 — duplicate docids, colliding trash/journal
            # generations. The merge upstream already baked the stale
            # max in, so recomputing here is not safe; fail fast.
            from gamma_spark.io_util import ConcurrentWriterError, read_json_or_none

            disk_meta = read_json_or_none(os.path.join(self.root, "meta.json"))
            if disk_meta is not None and int(disk_meta["commit"]) != int(
                self.meta["commit"]
            ):
                raise ConcurrentWriterError(
                    f"store {self.root} is at commit {disk_meta['commit']} "
                    f"but this handle was opened at commit "
                    f"{self.meta['commit']}; re-open the store and retry"
                )
            docs_path = os.path.join(self.root, "docs")
            commit = int(self.meta["commit"]) + 1
            staging = os.path.join(self.root, f".staging-{commit}")
            trash = os.path.join(self.root, f".trash-{commit}")
            shutil.rmtree(staging, ignore_errors=True)
            shutil.rmtree(trash, ignore_errors=True)  # crashed-swap leftovers
            out = df if pre_partitioned else df.repartition(
                max(1, len(hit)), F.col(BUCKET)
            )
            out.write.mode("overwrite").partitionBy(BUCKET).parquet(staging)
            os.makedirs(trash, exist_ok=True)
            # journal BEFORE the first rename: open() can then tell a torn
            # swap (meta.commit < journal.commit -> roll back from trash)
            # from an interrupted cleanup (equal -> just remove the trash);
            # see _recover_torn_swap
            atomic_write_json(
                os.path.join(trash, "swap.json"),
                {"commit": commit, "hit": [int(b) for b in hit]},
            )
            for b in hit:
                src = os.path.join(staging, f"{BUCKET}={b}")
                dst = os.path.join(docs_path, f"{BUCKET}={b}")
                if os.path.exists(dst):
                    os.rename(dst, os.path.join(trash, f"{BUCKET}={b}"))
                else:
                    # marker: this commit CREATES the bucket — rollback
                    # must delete it, while a bucket with neither trash
                    # entry nor marker was never touched and must be left
                    with open(os.path.join(trash, f"created-{b}"), "w") as fh:
                        fh.write("created\n")
                if os.path.exists(src):
                    os.rename(src, dst)
            # meta BEFORE cleanup: trash removal is the "swap fully
            # durable" marker recovery keys on (and a crash after the
            # renames but before the meta write must stay recoverable —
            # the old dirs live in the trash until the new meta lands)
            out_meta = dict(meta if meta is not None else self.meta)
            out_meta["commit"] = commit
            self._commit_meta(self.root, out_meta)
            shutil.rmtree(staging, ignore_errors=True)
            shutil.rmtree(trash, ignore_errors=True)
        # drop Spark's cached file listing for the path — later reads
        # must see the swapped files, not the pre-commit index
        self.spark.catalog.refreshByPath(docs_path)
        # the sidecar schema is commit-invariant: hand the cache on
        return BucketedDocStore(self.spark, self.root, _schema=self._sidecar_schema)

    def _rewrite_buckets(self, df: DataFrame, hit: list[int]) -> "BucketedDocStore":
        """Overwrite the listed buckets with ``df``'s rows (which must
        all hash into them); commit metadata last."""
        return self._swap_commit(df, hit)

    def delete_by_filter(self, filter_list) -> tuple["BucketedDocStore", DataFrame]:
        """DelDocByFilter against the store
        (`search/gamma_engine.cc:873-949`): tombstone matching live docs,
        return their ids. Finding matches is one predicate-pushed scan;
        the *write* rewrites only buckets that contain a match."""
        pred = GF.combine(filter_list, self.raw())
        full = (F.lit(True) if pred is None else pred) & ~F.col(DELETED)
        # eager checkpoint: the ids relation must survive the in-place
        # file replacement below (a lazy plan over the old listing would
        # hit FILE_NOT_EXIST when collected after the commit)
        matches = (
            self.raw().filter(full).select(self.id_col, BUCKET).localCheckpoint()
        )
        # bounded collect: distinct buckets containing matches
        hit = [int(r[0]) for r in matches.select(BUCKET).distinct().collect()]
        deleted_ids = matches.select(self.id_col)
        if not hit:
            return self, deleted_ids
        cur = self.raw().filter(F.col(BUCKET).isin(hit))
        pred_cur = (F.lit(True) if pred is None else pred) & ~F.col(DELETED)
        updated = cur.withColumn(
            DELETED, F.when(pred_cur, F.lit(True)).otherwise(F.col(DELETED))
        )
        return self._rewrite_buckets(updated, hit), deleted_ids

    def compact(self) -> "BucketedDocStore":
        """Physically drop tombstoned rows, rewriting only buckets that
        contain tombstones (T3 — gamma compacts inverted lists the same
        lazily-targeted way, `index/impl/gamma_index_ivfpq.cc:420`)."""
        hit = [
            int(r[0])
            for r in self.raw()
            .filter(F.col(DELETED))
            .select(BUCKET)
            .distinct()
            .collect()
        ]
        if not hit:
            return self
        kept = self.raw().filter(F.col(BUCKET).isin(hit)).filter(~F.col(DELETED))
        # a fully-tombstoned bucket stages no rows; _swap_commit removes
        # its directory as part of the swap
        return self._rewrite_buckets(kept, hit)

    def migrate_since(self, snapshot: GammaTable) -> tuple[DataFrame, DataFrame]:
        """S8 against a LIVE store — the reference migrates while adds
        keep landing (`tests/test.h:364-396`, `storage/migrate_data.cc`),
        so the export must be a consistent cut, not a lazy plan racing
        the writers. Two hazards a bare ``table().migrate_since`` has:

        * a commit swapping bucket directories mid-scan tears the read
          (some buckets pre-commit, some post — or FILE_NOT_FOUND on the
          renamed files);
        * even an untorn lazy plan re-reads the CURRENT files at every
          later action, so a consumer collecting upserts after one more
          commit replays a different table than the deletes it paired
          them with.

        Both close the same way: the delta computation runs under the
        store's writer lock (``block=True`` — commits queue behind the
        export's scan instead of failing) and both relations are
        MATERIALIZED before the export view releases them. The returned
        pair is therefore an immutable commit-N view: replaying it onto
        ``snapshot`` reconstructs exactly the state the export saw,
        however far the store advances afterwards. Export size is
        delta-bounded; a 100 TB deployment streams the checkpointed pair
        straight into ``sources.export`` rather than holding it.

        r11 (VERDICT r10 #6 — non-blocking export): the r10 shape held
        the writer lock for the WHOLE delta scan; at a 100 TB table
        that blocks ingest for the duration of a full-table hash-diff.
        Now the lock covers only a hardlink PIN of the current commit's
        part files (O(file-count) metadata work — measured 0.124 s at
        1M docs / 32 buckets vs 7.1 s for the under-lock scan,
        tools/scale_check_migrate.py, docs/SCALING.md): part files are
        immutable once written, a
        later commit swaps *directories* and deletes the old ones, but
        the pinned hardlinks keep the bytes alive, so the scan +
        checkpoint runs entirely OUTSIDE the lock while writers
        proceed. On an object store (no hardlinks) the same pin is a
        manifest of object keys + versions; the OSError fallback below
        keeps the r10 blocking behavior for filesystems without link
        support."""
        from gamma_spark.io_util import writer_lock

        try:
            pin = self._pin_current_commit()
        except OSError:
            # filesystem without hardlink support: the r10 blocking
            # path (correct, writers queue for the scan duration)
            with writer_lock(self.root, block=True):
                upserts, deleted = self.table().migrate_since(snapshot)
                upserts = upserts.localCheckpoint()
                deleted = deleted.localCheckpoint()
            return upserts, deleted
        try:
            upserts, deleted = self._pinned_table(pin).migrate_since(snapshot)
            upserts = upserts.localCheckpoint()
            deleted = deleted.localCheckpoint()
        finally:
            import shutil

            shutil.rmtree(pin, ignore_errors=True)
        return upserts, deleted

    #: stale-pin age ceiling. Pid-liveness alone cannot retire a pin
    #: whose crashed exporter's pid the OS later recycled to an
    #: unrelated long-lived process — and once commits supersede the
    #: pinned part files, the pin's hardlinks are the SOLE reference
    #: to the old commit's bytes (hardly "~zero bytes"): an immortal
    #: pin is unbounded disk retention. No export legitimately runs
    #: for days, so an age ceiling closes the pid-reuse hole.
    EXPORT_PIN_TTL_NS = 48 * 3600 * 1_000_000_000

    def _pin_current_commit(self) -> str:
        """Hardlink every current part file into
        ``.export-<host>-<pid>-<ns>`` under the writer lock and return
        the pin dir. Metadata-only work: the lock-hold is O(number of
        part files), independent of table bytes.

        Sweep policy for leftover pins (crashed exporters): only pins
        created on THIS host are judged — a pid is meaningless across
        hosts, and on a shared filesystem sweeping a foreign host's
        LIVE pin would kill its in-flight export scan. A local pin is
        removed when its exporter pid is gone, or when it is older
        than EXPORT_PIN_TTL_NS (the pid-reuse guard above). A partial
        pin from a failed link loop is cleaned up before the OSError
        propagates to the blocking fallback."""
        import glob as _glob
        import shutil
        import socket

        from gamma_spark.io_util import writer_lock

        host = socket.gethostname()
        now = time.time_ns()
        pin = os.path.join(self.root, f".export-{host}-{os.getpid()}-{now}")
        with writer_lock(self.root, block=True):
            for stale in _glob.glob(os.path.join(self.root, ".export-*")):
                parts = os.path.basename(stale)[len(".export-") :].rsplit("-", 2)
                if len(parts) == 3:
                    pin_host, pid_s, ns_s = parts
                elif len(parts) == 2:  # legacy <pid>-<ns> pins: local
                    pin_host, (pid_s, ns_s) = host, parts
                else:
                    continue
                if pin_host != host:
                    continue  # foreign host: its export may be live
                try:
                    expired = now - int(ns_s) > self.EXPORT_PIN_TTL_NS
                except ValueError:
                    expired = False
                try:
                    pid_alive = False
                    os.kill(int(pid_s), 0)
                    pid_alive = True
                except (ValueError, ProcessLookupError):
                    pass
                except PermissionError:
                    pid_alive = True  # alive under another uid
                if not pid_alive or expired:
                    shutil.rmtree(stale, ignore_errors=True)
            docs = os.path.join(self.root, "docs")
            try:
                os.makedirs(os.path.join(pin, "docs"))
                for bdir in sorted(os.listdir(docs)):
                    src_b = os.path.join(docs, bdir)
                    if not os.path.isdir(src_b):
                        continue
                    dst_b = os.path.join(pin, "docs", bdir)
                    os.makedirs(dst_b)
                    for fn in os.listdir(src_b):
                        if fn.startswith(("_", ".")):
                            continue
                        os.link(os.path.join(src_b, fn), os.path.join(dst_b, fn))
            except OSError:
                # a partial pin would survive every pid-liveness sweep
                # for the life of this process while its hardlinks
                # retain superseded commits — clean it up before the
                # caller falls back to the blocking path
                shutil.rmtree(pin, ignore_errors=True)
                raise
        return pin

    def _pinned_table(self, pin: str) -> GammaTable:
        """The pinned commit as a GammaTable — ``table()`` over the pin
        dir's hardlinked files instead of the live docs dir."""
        df = self.raw(docs_dir=os.path.join(pin, "docs"))
        return GammaTable(
            self.spark, df.drop(BUCKET), id_col=self.id_col, path=self.root
        )

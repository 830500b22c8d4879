"""LoadFromFaiss — bootstrap a table + ANN index from a faiss index
dump (SURVEY S9; `search/gamma_engine.cc:1287-1329`: gamma reads a raw
faiss IVF index plus a feature file and rebuilds its own structures
from it, so an existing faiss deployment can migrate without
re-embedding).

The faiss index file format is public (faiss/impl/index_write.cpp /
index_read.cpp, BSD-licensed; layout stable since the 1.7 line) and is
simple enough to parse without the faiss library, which keeps the
ingest dependency-free:

    file      := fourcc(uint32) body
    header    := d:int32 ntotal:int64 dummy:int64 dummy:int64
                 is_trained:uint8 metric_type:int32
                 [metric_arg:float32 if metric_type > 1]
    IxFI/IxF2/IxFl (IndexFlat*):
                 header, xb: size:uint64(float count) float32[size]
    IxMp (IndexIDMap — how faiss users attach ids to a flat index):
                 header, <wrapped index>, id_map:vec<int64>
    IwFl (IndexIVFFlat):
                 header, nlist:uint64 nprobe:uint64,
                 <embedded flat index = the coarse quantizer>,
                 direct_map: type:uint8 array:vec<int64>,
                 invlists: fourcc 'ilar', nlist:uint64 code_size:uint64,
                 fourcc 'full', sizes:vec<uint64>,
                 then per list: codes(uint8[n*code_size]) ids(int64[n])
    IwPQ (IndexIVFPQ):
                 header, nlist:uint64 nprobe:uint64, <quantizer>,
                 direct_map, by_residual:uint8 code_size:uint64,
                 pq := d:uint64 M:uint64 nbits:uint64
                       centroids:vec<float32>(M*ksub*dsub),
                 invlists as above with code_size = M (nbits=8)
    vec<T>    := count:uint64 T[count]

(metric_type: 0 = inner product, 1 = L2 — faiss MetricType.)

Scale shape: a faiss dump is one driver-readable binary blob by
construction (the reference mmaps it the same way), so the ingest
parses it ONCE, streaming rows out in bounded batches to a *parquet*
layout identical to what :class:`IvfFlatIndex.build` writes — from
there everything is distributed and the file is never touched again.
The writer twin exists for round-trip tests and as the Migrate-style
export path back out to a faiss deployment.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from gamma_spark.io_util import atomic_write_json
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

METRIC_INNER_PRODUCT = 0
METRIC_L2 = 1

_FLAT_FOURCC = {b"IxFI": "IP", b"IxF2": "L2", b"IxFl": None}

#: rows per createDataFrame batch when materializing to parquet
BATCH_ROWS = 65_536


class _Reader:
    def __init__(self, fh):
        self.fh = fh

    def read(self, n: int) -> bytes:
        b = self.fh.read(n)
        if len(b) != n:
            raise ValueError("faiss file truncated")
        return b

    def u32(self) -> int:
        return struct.unpack("<I", self.read(4))[0]

    def i32(self) -> int:
        return struct.unpack("<i", self.read(4))[0]

    def i64(self) -> int:
        return struct.unpack("<q", self.read(8))[0]

    def u64(self) -> int:
        return struct.unpack("<Q", self.read(8))[0]

    def u8(self) -> int:
        return struct.unpack("<B", self.read(1))[0]

    def f32s(self, n: int) -> np.ndarray:
        return np.frombuffer(self.read(4 * n), dtype="<f4")

    def i64s(self, n: int) -> np.ndarray:
        return np.frombuffer(self.read(8 * n), dtype="<i8")

    def fourcc(self) -> bytes:
        return self.read(4)


def _read_header(r: _Reader) -> dict:
    d = r.i32()
    ntotal = r.i64()
    r.i64()  # dummy (1 << 20, historical)
    r.i64()  # dummy
    is_trained = bool(r.u8())
    metric_type = r.i32()
    if metric_type > 1:
        r.f32s(1)  # metric_arg, unused for IP/L2
    return {"d": d, "ntotal": ntotal, "is_trained": is_trained, "metric": metric_type}


def _read_flat_body(r: _Reader, hdr: dict) -> np.ndarray:
    nfloats = r.u64()  # legacy xb layout: FLOAT count, not bytes
    if nfloats != hdr["ntotal"] * hdr["d"]:
        raise ValueError(
            f"flat vector count {nfloats} != ntotal*d {hdr['ntotal'] * hdr['d']}"
        )
    return r.f32s(nfloats).reshape(hdr["ntotal"], hdr["d"])


def _read_flat(r: _Reader, fourcc: bytes) -> tuple[dict, np.ndarray]:
    hdr = _read_header(r)
    metric = _FLAT_FOURCC[fourcc]
    if metric is None:
        metric = "IP" if hdr["metric"] == METRIC_INNER_PRODUCT else "L2"
    hdr["metric_name"] = metric
    return hdr, _read_flat_body(r, hdr)


def parse_faiss(path: str) -> dict:
    """Parse a faiss index file into numpy structures.

    Returns for flat indexes: {kind: 'flat', metric, vectors[, ids]}
    (ids present when wrapped in IndexIDMap); for IVFFlat: {kind:
    'ivfflat', metric, centroids, lists: [(ids, vectors), ...],
    nprobe}; for IVFPQ: {kind: 'ivfpq', ..., codebooks, nsubvector,
    by_residual, lists: [(ids, codes), ...]}.
    """
    with open(path, "rb") as fh:
        r = _Reader(fh)
        fourcc = r.fourcc()
        if fourcc in _FLAT_FOURCC:
            hdr, mat = _read_flat(r, fourcc)
            return {"kind": "flat", "metric": hdr["metric_name"], "vectors": mat}
        if fourcc == b"IxMp":
            _read_header(r)  # the IDMap wrapper's own header
            sub_cc = r.fourcc()
            if sub_cc not in _FLAT_FOURCC:
                raise ValueError(
                    f"IndexIDMap over {sub_cc!r} unsupported (flat only)"
                )
            hdr, mat = _read_flat(r, sub_cc)
            nid = r.u64()
            if nid != len(mat):
                raise ValueError("id_map length != ntotal")
            ids = r.i64s(nid)
            return {
                "kind": "flat",
                "metric": hdr["metric_name"],
                "vectors": mat,
                "ids": np.asarray(ids, dtype=np.int64),
            }
        if fourcc not in (b"IwFl", b"IwPQ"):
            raise ValueError(
                f"unsupported faiss index fourcc {fourcc!r} (supported: "
                f"IxFI/IxF2/IxFl flat [+IxMp id wrapper], IwFl IVFFlat, "
                f"IwPQ IVFPQ)"
            )
        hdr = _read_header(r)
        metric = "IP" if hdr["metric"] == METRIC_INNER_PRODUCT else "L2"
        nlist = r.u64()
        nprobe = r.u64()
        qcc = r.fourcc()
        if qcc not in _FLAT_FOURCC:
            raise ValueError(f"unsupported coarse quantizer fourcc {qcc!r}")
        qhdr, centroids = _read_flat(r, qcc)
        if qhdr["ntotal"] != nlist:
            raise ValueError("quantizer ntotal != nlist")
        # direct map: type byte + WRITEVECTOR(array)
        r.u8()
        dm_n = r.u64()
        r.i64s(dm_n)

        out = {
            "metric": metric,
            "centroids": np.asarray(centroids, dtype=np.float64),
            "nprobe": int(nprobe),
        }
        if fourcc == b"IwPQ":
            by_residual = bool(r.u8())
            pq_code_size = r.u64()
            pq_d = r.u64()
            pq_m = r.u64()
            pq_nbits = r.u64()
            if pq_nbits != 8:
                raise ValueError("only 8-bit PQ codes supported")
            if pq_d != hdr["d"]:
                raise ValueError("PQ d != index d")
            ksub, dsub = 1 << pq_nbits, hdr["d"] // pq_m
            ncent = r.u64()
            if ncent != pq_m * ksub * dsub:
                raise ValueError("PQ centroid count mismatch")
            codebooks = (
                r.f32s(ncent).astype(np.float64).reshape(pq_m, ksub, dsub)
            )
            expected_code_size = pq_m  # nbits=8: one byte per subquantizer
            if pq_code_size != expected_code_size:
                raise ValueError("PQ code_size mismatch")
            out.update(
                kind="ivfpq",
                by_residual=by_residual,
                codebooks=codebooks,
                nsubvector=int(pq_m),
            )
            entry_bytes = pq_m
        else:
            out["kind"] = "ivfflat"
            entry_bytes = 4 * hdr["d"]

        ilcc = r.fourcc()
        if ilcc != b"ilar":
            raise ValueError(
                f"unsupported inverted-lists fourcc {ilcc!r} (only 'ilar' "
                f"ArrayInvertedLists)"
            )
        il_nlist = r.u64()
        code_size = r.u64()
        if il_nlist != nlist:
            raise ValueError("invlists nlist mismatch")
        if code_size != entry_bytes:
            raise ValueError(f"code_size {code_size} != expected {entry_bytes}")
        listcc = r.fourcc()
        if listcc != b"full":
            raise ValueError(f"unsupported list-size encoding {listcc!r}")
        nsz = r.u64()
        if nsz != nlist:
            raise ValueError("list-size vector length mismatch")
        sizes = np.frombuffer(r.read(8 * nlist), dtype="<u8")
        lists = []
        for n in sizes:
            n = int(n)
            if fourcc == b"IwPQ":
                codes = np.frombuffer(
                    r.read(n * entry_bytes), dtype=np.uint8
                ).reshape(n, entry_bytes)
            else:
                codes = r.f32s(n * hdr["d"]).reshape(n, hdr["d"])
            ids = r.i64s(n)
            lists.append((ids, codes))
        out["lists"] = lists
        return out


def load_from_faiss(
    spark: SparkSession,
    faiss_path: str,
    out_path: str,
    raw_docs: DataFrame | None = None,
):
    """Materialize a faiss dump as the engine's own parquet index
    layout and return a searchable index (gamma's LoadFromFaiss,
    `search/gamma_engine.cc:1287-1329`).

    - Flat index -> docs parquet (``_docid``, ``embedding``) +
      :class:`FlatIndex` (docids are the faiss sequential positions,
      exactly gamma's vid mapping for flat dumps).
    - IVFFlat -> cluster-partitioned index parquet + ``centroids.npy``
      + ``meta.json`` — byte-compatible with what
      :meth:`IvfFlatIndex.build` writes, so :meth:`IvfFlatIndex.load`
      round-trips it and search is immediately nprobe-pruned; the
      imported quantizer is NOT retrained (list membership is
      preserved verbatim from the dump).
    - IVFPQ -> the :meth:`IvfPqIndex.build` layout (codes parquet +
      centroids/codebooks/identity-rotation npy). ``raw_docs`` is the
      analogue of gamma's separate raw-feature file: without it the
      index serves ADC-only (``has_rank=False``); with it, exact
      rerank works too. Only ``by_residual`` dumps are accepted
      (faiss's default and our encoding).
    """
    from pyspark.sql import functions as F  # noqa: F401 (parity imports)

    from gamma_spark.operators.ann import FlatIndex
    from gamma_spark.operators.ivf import IvfFlatIndex

    parsed = parse_faiss(faiss_path)
    os.makedirs(out_path, exist_ok=True)
    schema_flat = "_docid long, embedding array<float>"

    if parsed["kind"] == "flat":
        mat = parsed["vectors"]
        all_ids = parsed.get("ids")  # IxMp wrapper carries explicit ids
        if all_ids is None:
            all_ids = np.arange(len(mat), dtype=np.int64)
        target = os.path.join(out_path, "docs")
        writer = None
        for lo in range(0, len(mat), BATCH_ROWS):
            chunk = mat[lo : lo + BATCH_ROWS]
            pdf = pd.DataFrame(
                {
                    "_docid": all_ids[lo : lo + len(chunk)],
                    "embedding": [row.tolist() for row in chunk],
                }
            )
            df = spark.createDataFrame(pdf, schema=schema_flat)
            mode = "overwrite" if writer is None else "append"
            df.write.mode(mode).parquet(target)
            writer = True
        if writer is None:
            # legal empty dump (ntotal=0, e.g. a freshly created faiss
            # deployment): materialize an empty relation instead of
            # crashing on a missing path
            spark.createDataFrame([], schema_flat).write.mode(
                "overwrite"
            ).parquet(target)
        docs = spark.read.parquet(target)
        return {"docs": docs, "metric": parsed["metric"], "index": FlatIndex()}

    if parsed["kind"] == "ivfpq":
        return _load_ivfpq(spark, parsed, out_path, raw_docs)

    cents = parsed["centroids"]
    target = os.path.join(out_path, "index")
    first = True
    buf_ids: list[np.ndarray] = []
    buf_vecs: list[np.ndarray] = []
    buf_cids: list[np.ndarray] = []
    buffered = 0

    def flush():
        nonlocal first, buffered, buf_ids, buf_vecs, buf_cids
        if not buffered:
            return
        ids = np.concatenate(buf_ids)
        cids = np.concatenate(buf_cids)
        vecs = [v for arr in buf_vecs for v in arr]
        pdf = pd.DataFrame(
            {"_docid": ids, "embedding": vecs, "cluster_id": cids.astype(np.int32)}
        )
        df = spark.createDataFrame(
            pdf, schema="_docid long, embedding array<float>, cluster_id int"
        )
        df.repartition("cluster_id").write.mode(
            "overwrite" if first else "append"
        ).partitionBy("cluster_id").parquet(target)
        first = False
        buf_ids, buf_vecs, buf_cids, buffered = [], [], [], 0

    for cid, (ids, vecs) in enumerate(parsed["lists"]):
        if not len(ids):
            continue
        buf_ids.append(ids.astype(np.int64))
        buf_vecs.append([row.tolist() for row in vecs])
        buf_cids.append(np.full(len(ids), cid, dtype=np.int64))
        buffered += len(ids)
        if buffered >= BATCH_ROWS:
            flush()
    flush()
    if first:
        # all inverted lists empty (a trained-but-unpopulated dump):
        # write the empty relation so IvfFlatIndex.load round-trips
        spark.createDataFrame(
            [], "_docid long, embedding array<float>, cluster_id int"
        ).write.mode("overwrite").partitionBy("cluster_id").parquet(target)
    np.save(os.path.join(out_path, "centroids.npy"), cents)
    atomic_write_json(
        os.path.join(out_path, "meta.json"),
        {
            "model": "IVFFLAT",
            "ncentroids": len(cents),
            "doc_vec": "embedding",
            "source": "faiss:IwFl",
            "faiss_nprobe": parsed["nprobe"],
        },
    )
    idx = IvfFlatIndex.load(spark, out_path)
    return {"docs": idx.index_df, "metric": parsed["metric"], "index": idx}


def _load_ivfpq(spark, parsed, out_path, raw_docs):
    from gamma_spark.operators.pq import IvfPqIndex

    if not parsed["by_residual"]:
        raise ValueError(
            "only by_residual IVFPQ dumps supported (faiss default; our "
            "ADC kernels assume residual encoding)"
        )
    cents = parsed["centroids"]
    target = os.path.join(out_path, "codes")
    first = True
    rows_ids, rows_cid, rows_codes, buffered = [], [], [], 0

    def flush():
        nonlocal first, rows_ids, rows_cid, rows_codes, buffered
        if not buffered:
            return
        pdf = pd.DataFrame(
            {
                "_docid": np.concatenate(rows_ids),
                "cluster_id": np.concatenate(rows_cid).astype(np.int32),
                "codes": [c for arr in rows_codes for c in arr],
            }
        )
        df = spark.createDataFrame(
            pdf, schema="_docid long, cluster_id int, codes array<int>"
        )
        df.repartition("cluster_id").write.mode(
            "overwrite" if first else "append"
        ).partitionBy("cluster_id").parquet(target)
        first = False
        rows_ids, rows_cid, rows_codes, buffered = [], [], [], 0

    for cid, (ids, codes) in enumerate(parsed["lists"]):
        if not len(ids):
            continue
        rows_ids.append(ids.astype(np.int64))
        rows_cid.append(np.full(len(ids), cid, dtype=np.int64))
        rows_codes.append([row.astype(np.int32).tolist() for row in codes])
        buffered += len(ids)
        if buffered >= BATCH_ROWS:
            flush()
    flush()
    if first:
        # all lists empty: still materialize the codes relation
        spark.createDataFrame(
            [], "_docid long, cluster_id int, codes array<int>"
        ).write.mode("overwrite").partitionBy("cluster_id").parquet(target)
    d = cents.shape[1]
    np.save(os.path.join(out_path, "centroids.npy"), cents)
    np.save(os.path.join(out_path, "codebooks.npy"), parsed["codebooks"])
    np.save(os.path.join(out_path, "rotation.npy"), np.eye(d))
    atomic_write_json(
        os.path.join(out_path, "meta.json"),
        {
            "model": "IVFPQ",
            "nsubvector": parsed["nsubvector"],
            "doc_vec": "embedding",
            "source": "faiss:IwPQ",
            "faiss_nprobe": parsed["nprobe"],
        },
    )
    if raw_docs is None:
        # no raw-feature source: ADC-only serving; a docid-only relation
        # stands in so predicate/tombstone pruning still works
        codes_df = spark.read.parquet(target)
        raw_docs = codes_df.select("_docid")
        idx = IvfPqIndex(
            cents, parsed["codebooks"], np.eye(d), codes_df, raw_docs,
            "embedding", out_path,
        )
    else:
        idx = IvfPqIndex.load(spark, out_path, raw_docs)
    return {"docs": raw_docs, "metric": parsed["metric"], "index": idx}


# ---------------------------------------------------------------------------
# writer twin (round-trip tests + Migrate-style export to faiss)
# ---------------------------------------------------------------------------

class _Writer:
    def __init__(self, fh):
        self.fh = fh

    def u32(self, v):
        self.fh.write(struct.pack("<I", v))

    def i32(self, v):
        self.fh.write(struct.pack("<i", v))

    def i64(self, v):
        self.fh.write(struct.pack("<q", v))

    def u64(self, v):
        self.fh.write(struct.pack("<Q", v))

    def u8(self, v):
        self.fh.write(struct.pack("<B", v))

    def f32s(self, arr):
        self.fh.write(np.ascontiguousarray(arr, dtype="<f4").tobytes())

    def i64s(self, arr):
        self.fh.write(np.ascontiguousarray(arr, dtype="<i8").tobytes())


def _write_header(w: _Writer, d: int, ntotal: int, metric: str):
    w.i32(d)
    w.i64(ntotal)
    w.i64(1 << 20)
    w.i64(1 << 20)
    w.u8(1)  # is_trained
    w.i32(METRIC_INNER_PRODUCT if metric == "IP" else METRIC_L2)


def _write_flat(w: _Writer, mat: np.ndarray, metric: str):
    w.fh.write(b"IxFI" if metric == "IP" else b"IxF2")
    _write_header(w, mat.shape[1], len(mat), metric)
    w.u64(mat.size)  # legacy xb layout: float count
    w.f32s(mat.reshape(-1))


def write_faiss_flat(path: str, mat: np.ndarray, metric: str = "L2") -> None:
    with open(path, "wb") as fh:
        _write_flat(_Writer(fh), np.asarray(mat), metric)


def write_faiss_ivfflat(
    path: str,
    centroids: np.ndarray,
    ids: np.ndarray,
    vectors: np.ndarray,
    assignments: np.ndarray,
    metric: str = "L2",
    nprobe: int = 1,
) -> None:
    """Serialize (ids, vectors, cluster assignments) as a faiss
    IndexIVFFlat file — the export direction of the S9 bridge."""
    centroids = np.asarray(centroids)
    nlist, d = centroids.shape
    ids = np.asarray(ids, dtype=np.int64)
    assignments = np.asarray(assignments, dtype=np.int64)
    with open(path, "wb") as fh:
        w = _Writer(fh)
        w.fh.write(b"IwFl")
        _write_header(w, d, len(ids), metric)
        w.u64(nlist)
        w.u64(nprobe)
        # quantizer metric follows the index metric (faiss's
        # index_factory builds IndexFlat(d, metric) as the coarse
        # quantizer): an IP index with an L2 quantizer would probe
        # lists by the WRONG geometry after reload in faiss — vectors
        # were assigned by max inner product, probes would use min L2
        _write_flat(w, centroids, metric)
        # direct map: NoMap + empty array
        w.u8(0)
        w.u64(0)
        w.fh.write(b"ilar")
        w.u64(nlist)
        w.u64(4 * d)
        w.fh.write(b"full")
        sizes = np.bincount(assignments, minlength=nlist)
        w.u64(nlist)
        w.fh.write(sizes.astype("<u8").tobytes())
        for c in range(nlist):
            mask = assignments == c
            if not mask.any():
                continue
            w.f32s(vectors[mask].reshape(-1))
            w.i64s(ids[mask])


def write_faiss_ivfpq(
    path: str,
    centroids: np.ndarray,
    codebooks: np.ndarray,  # (M, ksub, dsub), ksub == 256
    ids: np.ndarray,
    codes: np.ndarray,  # (n, M) uint8
    assignments: np.ndarray,
    metric: str = "L2",
    nprobe: int = 1,
) -> None:
    """Serialize PQ codes + codebooks as a faiss IndexIVFPQ file
    (by_residual, 8-bit) — the export direction for PQ indexes."""
    centroids = np.asarray(centroids)
    nlist, d = centroids.shape
    m, ksub, dsub = codebooks.shape
    if ksub != 256:
        raise ValueError("faiss IVFPQ export requires 8-bit codebooks (ksub=256)")
    if m * dsub != d:
        raise ValueError("codebook geometry does not cover d")
    ids = np.asarray(ids, dtype=np.int64)
    codes = np.asarray(codes, dtype=np.uint8)
    assignments = np.asarray(assignments, dtype=np.int64)
    with open(path, "wb") as fh:
        w = _Writer(fh)
        w.fh.write(b"IwPQ")
        _write_header(w, d, len(ids), metric)
        w.u64(nlist)
        w.u64(nprobe)
        _write_flat(w, centroids, metric)  # quantizer metric = index metric
        w.u8(0)   # direct map: NoMap
        w.u64(0)  # + empty array
        w.u8(1)   # by_residual
        w.u64(m)  # code_size (one byte per subquantizer at nbits=8)
        w.u64(d)
        w.u64(m)
        w.u64(8)  # nbits
        w.u64(m * ksub * dsub)
        w.f32s(codebooks.reshape(-1))
        w.fh.write(b"ilar")
        w.u64(nlist)
        w.u64(m)
        w.fh.write(b"full")
        sizes = np.bincount(assignments, minlength=nlist)
        w.u64(nlist)
        w.fh.write(sizes.astype("<u8").tobytes())
        for c in range(nlist):
            mask = assignments == c
            if not mask.any():
                continue
            w.fh.write(codes[mask].tobytes())
            w.i64s(ids[mask])


def write_faiss_idmap_flat(
    path: str, ids: np.ndarray, mat: np.ndarray, metric: str = "L2"
) -> None:
    """Serialize (ids, vectors) as faiss IndexIDMap(IndexFlat) — the
    common shape real deployments dump (explicit ids over a flat
    index)."""
    ids = np.asarray(ids, dtype=np.int64)
    mat = np.asarray(mat)
    with open(path, "wb") as fh:
        w = _Writer(fh)
        w.fh.write(b"IxMp")
        _write_header(w, mat.shape[1], len(ids), metric)
        _write_flat(w, mat, metric)
        w.u64(len(ids))
        w.i64s(ids)

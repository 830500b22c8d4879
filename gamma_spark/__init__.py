"""gamma_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vearch/gamma.

The reference (read-only at /root/reference) is a single-node C++ vector
search core: documents mixing scalar and dense-vector fields, answering
filtered top-k nearest-neighbor queries with real-time indexing
(see SURVEY.md). This package re-expresses that surface Spark-first:

- Tables are DataFrames persisted as Parquet (gamma's row store /
  RawVector tiers are replaced by columnar storage + Spark persist()).
- The one query operator (``Search``: filters AND kNN -> fuse -> top-k
  -> project) becomes a composition of DataFrame operators built by
  :mod:`gamma_spark.plans.search`.
- ANN models (FLAT / IVFFLAT / IVFPQ / BINARYIVF / HNSW / VEARCH)
  become batch index builds (k-means quantizers, PQ codebooks, sharded
  small-world graphs) producing *index tables* that accelerate the
  same DataFrame plan via partition pruning and two-phase rerank.
- DML (AddOrUpdateDocs / DeleteDoc / GetDocByID) becomes MERGE-style
  batch jobs with last-write-wins semantics.

Beyond the reference surface, :mod:`gamma_spark.operators.dedup`,
:mod:`gamma_spark.operators.groups`, :mod:`gamma_spark.operators.curation`
and :mod:`gamma_spark.functions.text` add the LLM-data-pipeline operators
(near-duplicate detection, dup-group resolution, end-to-end corpus
curation, similarity search, text quality analysis) designed for
100 TB scale.
"""

from gamma_spark.session import get_spark

__all__ = [
    "get_spark",
    "GammaTable",
    "BucketedDocStore",
    "SearchRequest",
    "VectorQuery",
    "TextQuery",
    "search",
    "bm25_search",
    "Bm25Index",
    "MinHashIndex",
    "EmbeddingNearDupIndex",
    "rrf_fuse",
    "repetition_signals",
    "lm_perplexity",
    "decontaminate",
    "RangeFilter",
    "TermFilter",
    "get_model",
    "tune_nprobe",
    "tune_recall_num",
    "curate_corpus",
    "resolve_groups",
    "load_from_faiss",
    "write_dataset",
    "read_dataset",
    "sample_mixture",
    "plan_mixture",
    "stratified_quota",
    "diversity_sample",
    "scrub_pii",
    "paragraph_dedup",
    "pack_contiguous",
]
__version__ = "0.1.0"


def __getattr__(name):  # lazy re-exports: keep `import gamma_spark` cheap
    if name == "GammaTable":
        from gamma_spark.table import GammaTable

        return GammaTable
    if name == "BucketedDocStore":
        from gamma_spark.table import BucketedDocStore

        return BucketedDocStore
    if name in ("SearchRequest", "VectorQuery", "TextQuery", "search"):
        from gamma_spark.plans import search as _s

        return getattr(_s, name)
    if name in ("RangeFilter", "TermFilter"):
        from gamma_spark import filters as _f

        return getattr(_f, name)
    if name in ("bm25_search", "Bm25Index", "rrf_fuse"):
        from gamma_spark.operators import retrieval as _r

        return getattr(_r, name)
    if name in ("MinHashIndex", "EmbeddingNearDupIndex"):
        from gamma_spark.operators import dedup as _d

        return getattr(_d, name)
    if name in ("repetition_signals", "lm_perplexity"):
        from gamma_spark.operators import quality as _q

        return getattr(_q, name)
    if name == "decontaminate":
        from gamma_spark.operators.dedup import decontaminate

        return decontaminate
    if name == "get_model":
        from gamma_spark.operators.ann import get_model

        return get_model
    if name in ("tune_nprobe", "tune_recall_num"):
        from gamma_spark.operators import ann as _ann

        return getattr(_ann, name)
    if name == "curate_corpus":
        from gamma_spark.operators.curation import curate_corpus

        return curate_corpus
    if name == "resolve_groups":
        from gamma_spark.operators.groups import resolve_groups

        return resolve_groups
    if name == "load_from_faiss":
        from gamma_spark.sources.faiss_io import load_from_faiss

        return load_from_faiss
    if name in ("write_dataset", "read_dataset"):
        from gamma_spark.sources import export as _ex

        return getattr(_ex, name)
    if name in ("sample_mixture", "plan_mixture", "stratified_quota", "diversity_sample"):
        from gamma_spark.operators import sampling as _sp

        return getattr(_sp, name)
    if name in ("scrub_pii", "paragraph_dedup"):
        from gamma_spark.operators import transforms as _tr

        return getattr(_tr, name)
    if name == "pack_contiguous":
        from gamma_spark.operators.packing import pack_contiguous

        return pack_contiguous
    raise AttributeError(name)

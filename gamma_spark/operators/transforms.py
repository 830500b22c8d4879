"""Corpus-transform operators for LLM data pipelines (north-star
extension, BASELINE.json): text normalization, PII scrubbing, and
paragraph-level exact deduplication (the CCNet/Dolma pattern: drop
repeated paragraphs corpus-wide but keep the documents).

Not part of the reference surface (gamma has no string functions —
SURVEY §2.6). Every operator is pure Catalyst (no Python in the hot
path) and ships a ``sql_*`` twin emitting equivalent DuckDB SQL for the
oracle gate.

Scale notes (100 TB):

- ``normalize_text`` / ``scrub_pii`` are scan-stage expressions — zero
  shuffles, full whole-stage codegen.
- ``paragraph_dedup`` chunks each document map-side with array
  functions (``slice``/``transform`` over the token array — the token
  stream is never exploded for assembly), then shuffles the (id, idx,
  chunk) relation on chunk text for a map-side-combinable
  ``min(struct(doc, idx))`` keeper election, joins the keepers back
  (broadcast at small scale — plan-verified; chunk-co-partitioned
  sort-merge beyond that, reusing the election's exchange), and runs
  one per-doc aggregation to rebuild surviving text. Every shuffled
  relation is chunk- or doc-keyed rows, never exploded tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def normalize_text(c: Column | str) -> Column:
    """Lowercase, strip non-alphanumeric, collapse runs of spaces, trim
    — the canonical key for exact dedup over lightly-reformatted text."""
    c = F.col(c) if isinstance(c, str) else c
    folded = F.regexp_replace(F.lower(c), "[^a-z0-9 ]", "")
    return F.trim(F.regexp_replace(folded, " +", " "))


def sql_normalize_text(c: str) -> str:
    folded = f"regexp_replace(lower({c}), '[^a-z0-9 ]', '', 'g')"
    return f"trim(regexp_replace({folded}, ' +', ' ', 'g'))"


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

#: (name, pattern, replacement) — patterns restricted to the regex
#: subset Java (Spark) and RE2 (DuckDB) implement identically.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{4}", "<PHONE>"),
)


def pii_counts(c: Column | str) -> list[Column]:
    """One ``n_<name>`` int column per PII class."""
    c = F.col(c) if isinstance(c, str) else c
    return [
        F.size(F.regexp_extract_all(c, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def scrub(c: Column | str) -> Column:
    """Redact every PII class in a fixed order (the order is part of the
    operator contract — overlapping matches resolve deterministically)."""
    c = F.col(c) if isinstance(c, str) else c
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def scrub_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII report + redacted and normalized text. Pure
    scan-stage projection — composes with any downstream dedup."""
    return df.select(
        F.col(id_col),
        *pii_counts(text_col),
        scrub(text_col).alias("clean"),
        normalize_text(scrub(text_col)).alias("norm"),
    )


def sql_pii_counts(c: str) -> list[str]:
    return [
        f"len(regexp_extract_all({c}, '{pat}'))::INT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    ]


def sql_scrub(c: str) -> str:
    for _, pat, repl in PII_PATTERNS:
        c = f"regexp_replace({c}, '{pat}', '{repl}', 'g')"
    return c


def sql_scrub_pii(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    counts = ", ".join(sql_pii_counts(text_col))
    return (
        f"SELECT {id_col}, {counts}, {sql_scrub(text_col)} AS clean, "
        f"{sql_normalize_text(sql_scrub(text_col))} AS norm FROM {table}"
    )


# ---------------------------------------------------------------------------
# paragraph-level exact dedup
# ---------------------------------------------------------------------------


def chunk_paragraphs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 20,
) -> DataFrame:
    """Split each document into paragraphs of ``width`` whitespace
    tokens → (id, chunk_idx, chunk). Real corpora would split on
    ``\\n\\n`` boundaries first; the fixed token window is the
    deterministic stand-in that also bounds paragraph length (CCNet
    hashes windows the same way for wall-of-text pages). Map-only:
    ``slice`` over the token array, no explode-then-regroup.

    NULL text coalesces to '' (one empty chunk): a NULL chunk would be
    silently dropped by paragraph_dedup's null-unsafe chunk join — the
    document would vanish from the output, violating its one-row-per-
    input-document contract (and diverging from the SQL twin)."""
    # tokenize ONCE into a staged column: a raw split() referenced
    # inside the transform lambda re-evaluates per chunk (no CSE in
    # interpreted higher-order functions) — O(len^2/width) per doc
    # (same defect and fix as dedup.shingles, OPTIMIZATION_r11.md)
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    staged = df.select(F.col(id_col), toks.alias("__pp_toks"))
    tref = F.col("__pp_toks")
    nchunks = F.greatest(
        F.lit(1), F.ceil(F.size(tref).cast("double") / F.lit(float(width))).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), nchunks - 1),
        lambda i: F.array_join(F.slice(tref, i * width + 1, width), " "),
    )
    return staged.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 20,
    min_tokens: int = 1,
) -> DataFrame:
    """Corpus-wide paragraph dedup, document-preserving: the FIRST
    occurrence of every distinct paragraph (ordered by (id, chunk_idx))
    survives; later repeats are dropped and the documents are
    reassembled from their surviving paragraphs.

    ``min_tokens``: paragraphs shorter than this never dedup (always
    kept) — short tail chunks collide by chance (a 1-token paragraph
    has only |vocab| distinct values), the same reason CCNet hashes
    only paragraphs above a length floor. Default 1 = dedup everything.

    Output: (id, n_chunks, n_dropped, kept_text) — one row per input
    document (kept_text = '' when everything it said was said before).
    """
    chunks = chunk_paragraphs(df, id_col, text_col, width)
    keepers = chunks.groupBy("chunk").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).alias("_keeper")
    )
    marked = chunks.join(keepers, "chunk").withColumn(
        "_keep",
        (F.col("_keeper." + id_col) == F.col(id_col))
        & (F.col("_keeper.chunk_idx") == F.col("chunk_idx"))
        | (F.size(F.split(F.col("chunk"), " ")) < min_tokens),
    )
    kept_structs = F.array_sort(
        F.collect_list(F.when(F.col("_keep"), F.struct("chunk_idx", "chunk")))
    )
    return marked.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("int").alias("n_chunks"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).cast("int").alias("n_dropped"),
        F.array_join(
            F.transform(kept_structs, lambda s: s["chunk"]), " "
        ).alias("kept_text"),
    )


def sql_paragraph_dedup(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 20,
    min_tokens: int = 1,
) -> str:
    w = width
    return f"""
WITH t AS (SELECT {id_col}, string_split(coalesce({text_col}, ''), ' ') AS toks FROM {table}),
e AS (SELECT {id_col}, toks,
             unnest(range(1, greatest(1, ceil(len(toks)::DOUBLE / {w}))::BIGINT + 1)) AS i
      FROM t),
c AS (SELECT {id_col}, (i - 1)::INT AS chunk_idx,
             array_to_string(toks[((i-1)*{w}+1)::INT : (i*{w})::INT], ' ') AS chunk
      FROM e),
k AS (SELECT *, (row_number() OVER (PARTITION BY chunk ORDER BY {id_col}, chunk_idx) = 1
                 OR len(string_split(chunk, ' ')) < {min_tokens}) AS keep
      FROM c)
SELECT {id_col},
       count(*)::INT AS n_chunks,
       sum(CASE WHEN keep THEN 0 ELSE 1 END)::INT AS n_dropped,
       coalesce(string_agg(CASE WHEN keep THEN chunk END, ' ' ORDER BY chunk_idx), '')
         AS kept_text
FROM k GROUP BY {id_col}
"""

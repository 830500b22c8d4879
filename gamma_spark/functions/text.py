"""Text-analysis primitives for LLM data pipelines (north-star
extension, BASELINE.json): tokenization, quality scoring, language id,
document fingerprinting.

Not part of the reference surface (gamma has no string functions —
SURVEY §2.6); these are the operators a 100 TB training-data pipeline
runs over the ``documents`` table. Every function here is a pure
Catalyst column expression (no Python in the hot path) and has an
``sql_*`` twin emitting the equivalent DuckDB SQL, so each operator is
oracle-checkable. Hashes are md5-derived 60-bit ints — verified
bit-identical between Spark ``conv(substring(md5(x),1,15),16,10)`` and
DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: modulus for bounded hash arithmetic (fits ANSI-mode BIGINT products)
HASH_P = 2_147_483_647  # 2^31 - 1
#: polynomial base for fingerprint folding
FP_BASE = 131

# simple per-language marker words for the n-gram/stopword heuristic
# language-id. Real pipelines plug in fastText etc.; the *operator* is
# the deterministic argmax scaffold, which is the oracle-checkable part.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "with", "is"),
    "de": ("der", "die", "und", "nicht", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "los", "que", "y", "es"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}
LANG_ORDER = ("en", "de", "fr", "es", "zh")  # deterministic tie-break

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


# -- tokens ------------------------------------------------------------------

def tokens(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.split(c, " ")


def sql_tokens(c: str) -> str:
    return f"string_split({c}, ' ')"


def token_count(c: Column | str) -> Column:
    return F.size(tokens(c))


def sql_token_count(c: str) -> str:
    return f"len({sql_tokens(c)})"


def avg_token_len(c: Column | str) -> Column:
    """(chars - separators) / tokens, as one double division (exact
    cross-engine reproducibility)."""
    n = token_count(c)
    col = F.col(c) if isinstance(c, str) else c
    return (
        (F.length(col) - (n - F.lit(1))).cast("double") / n.cast("double")
    )


def sql_avg_token_len(c: str) -> str:
    n = sql_token_count(c)
    return f"((length({c}) - ({n} - 1))::DOUBLE / ({n})::DOUBLE)"


def stopword_ratio(c: Column | str, words: tuple[str, ...] = STOPWORDS) -> Column:
    lst = F.array(*[F.lit(w) for w in words])
    hits = F.size(F.filter(tokens(c), lambda t: F.array_contains(lst, t)))
    return hits.cast("double") / token_count(c).cast("double")


def sql_stopword_ratio(c: str, words: tuple[str, ...] = STOPWORDS) -> str:
    lits = ", ".join(f"'{w}'" for w in words)
    hits = f"len(list_filter({sql_tokens(c)}, t -> list_contains([{lits}], t)))"
    return f"(({hits})::DOUBLE / ({sql_token_count(c)})::DOUBLE)"


#: GPT-style pre-tokenizer approximation: word runs OR single
#: non-space-non-word symbols — the count proxies BPE token counts far
#: better than whitespace splitting on punctuated text
BPE_ISH_PATTERN = r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]"


def bpe_token_count(c: Column | str) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), F.lit(0)))


def sql_bpe_token_count(c: str) -> str:
    return f"len(regexp_extract_all({c}, '{BPE_ISH_PATTERN}'))"


# -- quality score -------------------------------------------------------------

def quality_score(c: Column | str) -> Column:
    """Composite [0,1]-ish quality heuristic: favor mid-length docs with
    plausible token lengths and some stopwords (C4/Gopher-style rules,
    here as a deterministic arithmetic combo)."""
    n = token_count(c).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    atl = avg_token_len(c)
    shape_term = F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw = stopword_ratio(c)
    sw_term = F.least(sw * F.lit(5.0), F.lit(1.0))
    return (length_term * F.lit(0.4) + shape_term * F.lit(0.3) + sw_term * F.lit(0.3))


def sql_quality_score(c: str) -> str:
    n = f"({sql_token_count(c)})::DOUBLE"
    atl = sql_avg_token_len(c)
    sw = sql_stopword_ratio(c)
    return (
        f"(least({n} / 100.0, 1.0) * 0.4 + "
        f"(CASE WHEN {atl} >= 3.0 AND {atl} <= 10.0 THEN 1.0 ELSE 0.5 END) * 0.3 + "
        f"least({sw} * 5.0, 1.0) * 0.3)"
    )


# -- language id ---------------------------------------------------------------

def _lang_hits(c: Column | str, lang: str) -> Column:
    lst = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens(c), lambda t: F.array_contains(lst, t)))


def lang_id(c: Column | str) -> Column:
    """argmax over per-language marker-word hits; ties resolve in
    LANG_ORDER; no hits at all -> 'und' (undetermined)."""
    hits = {lang: _lang_hits(c, lang) for lang in LANG_ORDER}
    expr = F.lit("und")
    # build the CASE from lowest priority up so earlier langs win ties
    for lang in reversed(LANG_ORDER):
        cond = hits[lang] > 0
        for other in LANG_ORDER:
            if other == lang:
                break
            cond = cond & (hits[lang] > hits[other])
        for other in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]:
            cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def sql_lang_id(c: str) -> str:
    def hits(lang):
        lits = ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])
        return f"len(list_filter({sql_tokens(c)}, t -> list_contains([{lits}], t)))"

    parts = []
    for lang in LANG_ORDER:
        conds = [f"{hits(lang)} > 0"]
        for other in LANG_ORDER:
            if other == lang:
                break
            conds.append(f"{hits(lang)} > {hits(other)}")
        for other in LANG_ORDER[LANG_ORDER.index(lang) + 1 :]:
            conds.append(f"{hits(lang)} >= {hits(other)}")
        parts.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(parts) + " ELSE 'und' END"


# -- hashing / fingerprint ------------------------------------------------------

def hash60(c: Column | str) -> Column:
    """md5-derived 60-bit positive int — bit-identical across engines."""
    c = F.col(c) if isinstance(c, str) else c
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def sql_hash60(c: str) -> str:
    return f"('0x' || substr(md5({c}), 1, 15))::BIGINT"


def fingerprint(c: Column | str) -> Column:
    """Rolling polynomial hash over the token stream:
    fp = fold((fp * 131 + hash60(tok) % P) % P). Order-sensitive (same
    tokens shuffled -> different fingerprint), bounded arithmetic (ANSI
    safe), reproducible in the oracle."""
    toks = tokens(c)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (acc * F.lit(FP_BASE) + F.pmod(hash60(t), F.lit(HASH_P)))
        % F.lit(HASH_P),
    )


def sql_fingerprint(c: str) -> str:
    # NULL text must stay NULL (matching Spark's aggregate-over-NULL
    # propagation): DuckDB's list_prepend(0, NULL) yields [0], which
    # would silently fingerprint every NULL doc as 0 — colliding all
    # content-less docs with each other and with any true-zero hash
    h = f"({sql_hash60('t')} % {HASH_P})"
    fold = (
        f"list_reduce(list_prepend(0::BIGINT, [{h} for t in {sql_tokens(c)}]), "
        f"(acc, t) -> (acc * {FP_BASE} + t) % {HASH_P})"
    )
    return f"(CASE WHEN {c} IS NULL THEN NULL ELSE {fold} END)"

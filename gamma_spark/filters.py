"""Gamma filter semantics -> Catalyst predicates (SURVEY §2.3).

A gamma ``Request`` carries RangeFilters and TermFilters
(`idl/fbs/request.fbs:3-15`), ANDed together; an empty result
short-circuits the whole query (`search/gamma_engine.cc:365-372`).
The reference's per-field B-tree inverted index + bitmap machinery
(`table/field_range_index.cc`) is replaced wholesale by Parquet
row-group statistics + dictionary filters + Catalyst predicate pushdown
— expressing these as plain Column predicates is what makes that free.

Deliberate deviation (documented, SURVEY §7.3): the reference *parses*
include_lower/include_upper but never applies them — its B-tree scan is
inclusive on both ends (`table/field_range_index.cc:616-759`). We
implement the declared semantics; the DuckDB oracle defines truth.

Term fields may be multi-valued via the ``\\001`` delimiter
(`table/field_range_index.cc:553-563`) — honest representation here is
``ARRAY<STRING>``, with a compatibility shim for delimited strings.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType

#: gamma's in-band tag delimiter (`field_range_index.cc:1211`)
TAG_DELIMITER = ""

# TermFilter.is_union values (`idl/fbs/request.fbs:3-7`;
# AND split at `table/field_range_index.cc:1029-1039`)
TERM_AND = 0
TERM_OR = 1
TERM_NOT_IN = 2


@dataclass(frozen=True)
class RangeFilter:
    """RangeFilter{field, lower, upper, include_lower, include_upper}
    (`common/common_query_data.h:9-21`)."""

    field: str
    lower: float | int | None = None
    upper: float | int | None = None
    include_lower: bool = True
    include_upper: bool = True

    def to_column(self) -> Column:
        c = F.col(self.field)
        preds = []
        if self.lower is not None:
            preds.append(c >= self.lower if self.include_lower else c > self.lower)
        if self.upper is not None:
            preds.append(c <= self.upper if self.include_upper else c < self.upper)
        if not preds:
            return F.lit(True)
        out = preds[0]
        for p in preds[1:]:
            out = out & p
        return out


@dataclass(frozen=True)
class TermFilter:
    """TermFilter{field, value(s), is_union} on string / tag-array fields.

    OR = match any value; AND = row's tag set contains every value
    (meaningful on multi-valued fields); NOT_IN = match none.
    """

    field: str
    values: tuple[str, ...] = field(default_factory=tuple)
    mode: int = TERM_OR

    @classmethod
    def from_delimited(cls, field_name: str, value: str, mode: int = TERM_OR):
        """Compatibility shim for gamma's ``\\001``-delimited value string."""
        return cls(field_name, tuple(value.split(TAG_DELIMITER)), mode)

    def to_column(self, df: DataFrame | None = None) -> Column:
        c = F.col(self.field)
        is_array = df is not None and isinstance(
            df.schema[self.field].dataType, ArrayType
        )
        vals = list(self.values)
        if is_array:
            overlap = F.arrays_overlap(c, F.array(*[F.lit(v) for v in vals]))
            if self.mode == TERM_OR:
                return overlap
            if self.mode == TERM_AND:
                pred = F.lit(True)
                for v in vals:
                    pred = pred & F.array_contains(c, v)
                return pred
            if self.mode == TERM_NOT_IN:
                return ~overlap
        else:
            if self.mode == TERM_OR:
                return c.isin(vals)
            if self.mode == TERM_AND:
                # on a scalar field AND over >1 distinct values is empty;
                # gamma gets the same effect via bitmap intersection
                pred = F.lit(True)
                for v in vals:
                    pred = pred & (c == v)
                return pred
            if self.mode == TERM_NOT_IN:
                return ~c.isin(vals)
        raise ValueError(f"unknown term mode {self.mode}")


def combine(filters, df: DataFrame | None = None) -> Column | None:
    """AND all filters together (`search/gamma_engine.cc:359-372`)."""
    preds = []
    for f in filters:
        preds.append(f.to_column(df) if isinstance(f, TermFilter) else f.to_column())
    if not preds:
        return None
    out = preds[0]
    for p in preds[1:]:
        out = out & p
    return out


def filter_only_query(
    docs: DataFrame,
    filters,
    topn: int,
    docid_col: str = "_docid",
    extra_predicate: Column | None = None,
) -> DataFrame:
    """F9 (`search/gamma_engine.cc:405-457`): a Request with no query
    vector scans docids in order and returns the first ``topn`` rows
    passing the filter, plus ``total`` = the number of filter survivors
    (gamma's SearchResult.total is the match count, not min(topn, ...)).

    Scale note: the ``total`` count is a separate aggregate over the
    filtered scan (Parquet-pushed predicate, column-pruned to nothing);
    the topn scan uses a global sort-limit which Spark executes as
    TakeOrderedAndProject (per-partition heap + driver merge of topn).
    """
    if "_deleted" in docs.columns:
        # F7: deleted docs neither surface nor count toward `total`
        # (same defensive mask as the vector kernels, knn.py)
        docs = docs.filter(~F.col("_deleted"))
    pred = combine(filters, docs)
    if extra_predicate is not None:
        pred = extra_predicate if pred is None else (pred & extra_predicate)
    matches = docs.filter(pred) if pred is not None else docs
    head = matches.orderBy(F.col(docid_col).asc()).limit(topn)
    total = matches.select(F.count(F.lit(1)).alias("total"))
    return head.crossJoin(F.broadcast(total))

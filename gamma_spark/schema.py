"""Table-schema declaration + enforcement (SURVEY S1, §1.1-1.2).

The reference declares a table as FieldInfo scalars + VectorInfo vector
fields (`idl/fbs/table.fbs:22-32`) and enforces at ingest: vector
dimension (binary dims divisible by 8, `vector/vector_manager.cc:
100-103`) and string length caps (`Table::CheckStrLen`,
`table/table.cc:215-226` — indexable strings truncated to
STR_MAX_INDEX_LEN, all strings to MAX_STRING_LEN).

Spark mapping: a TableSchema validates/conforms a DataFrame once at
ingest — dimension violations are rejected rows (collected to a
quarantine relation, never silently dropped), string caps are applied
as truncating projections. All pure Catalyst expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference limits (`table/table.cc` constants; values are ours —
#: gamma's exact caps are compile-time configuration)
MAX_STRING_LEN = 65_535
STR_MAX_INDEX_LEN = 1_024


@dataclass(frozen=True)
class VectorField:
    name: str
    dimension: int
    data_type: str = "FLOAT"  # FLOAT | BINARY (BinaryInfo: dim % 8 == 0)

    def __post_init__(self):
        if self.data_type == "BINARY" and self.dimension % 8:
            raise ValueError(
                f"binary vector field {self.name!r}: dimension "
                f"{self.dimension} not divisible by 8 "
                "(`vector/vector_manager.cc:100-103`)"
            )


@dataclass(frozen=True)
class TableSchema:
    """Declarative schema: which scalar strings are indexed (shorter
    cap), which columns are vectors (fixed dimension)."""

    vector_fields: tuple[VectorField, ...] = ()
    indexed_strings: tuple[str, ...] = ()
    string_fields: tuple[str, ...] = ()
    max_string_len: int = MAX_STRING_LEN
    max_index_string_len: int = STR_MAX_INDEX_LEN

    def conform(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """Returns (valid, rejected): rows whose vector columns all have
        the declared dimension, with string caps applied; rejects carry
        a ``_reject_reason`` column."""
        reason = F.lit(None).cast("string")
        for vf in self.vector_fields:
            bad = F.size(F.col(vf.name)) != vf.dimension
            reason = F.when(
                reason.isNull() & bad,
                F.concat(
                    F.lit(f"{vf.name}: dim "),
                    F.size(F.col(vf.name)).cast("string"),
                    F.lit(f" != {vf.dimension}"),
                ),
            ).otherwise(reason)
        flagged = df.withColumn("_reject_reason", reason)
        rejected = flagged.filter(F.col("_reject_reason").isNotNull())
        valid = flagged.filter(F.col("_reject_reason").isNull()).drop("_reject_reason")
        for c in self.string_fields:
            valid = valid.withColumn(c, F.substring(F.col(c), 1, self.max_string_len))
        for c in self.indexed_strings:
            valid = valid.withColumn(
                c, F.substring(F.col(c), 1, self.max_index_string_len)
            )
        return valid, rejected

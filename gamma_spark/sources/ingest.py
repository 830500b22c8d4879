"""Sources: document ingestion into GammaTable-shaped relations
(SURVEY §2.1).

The reference ingests via its C API (AddOrUpdateDocs over flatbuffers)
from whatever the caller has; our equivalents are Spark's file sources.
Three pieces of gamma wire-format compatibility live here:

- ``split_tag_columns``: gamma packs multi-valued term fields into one
  string with the ``\\x01`` delimiter (`table/field_range_index.cc:1211`)
  — ingest converts them to honest ``ARRAY<STRING>`` columns.
- ``read_docs``: format-dispatching reader (parquet/csv/json) that
  mints ``_docid`` and tombstone columns via GammaTable.
- ``load_tables``: convenience loader for a TESTDATA-layout directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gamma_spark.filters import TAG_DELIMITER

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def split_tag_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """``\\x01``-delimited term-field shim: one string column carrying
    multiple tag values becomes ARRAY<STRING> (SURVEY §1.2)."""
    for c in columns:
        df = df.withColumn(c, F.split(F.col(c), TAG_DELIMITER))
    return df


def read_docs(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    id_col: str = "_id",
    tag_columns: list[str] | None = None,
    schema=None,
    **options,
):
    """Read a document corpus and wrap it as a GammaTable (dense
    ``_docid`` minting + tombstone column)."""
    from gamma_spark.table import GammaTable

    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    if fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "csv":
        df = reader.option("header", options.get("header", "true")).csv(path)
    elif fmt == "json":
        df = reader.json(path)
    else:
        raise ValueError(f"unsupported format {fmt!r} (parquet/csv/json)")
    if tag_columns:
        df = split_tag_columns(df, tag_columns)
    return GammaTable(spark, df, id_col=id_col)


def normalize_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize an event-time column to **epoch nanoseconds as BIGINT**,
    the engine's canonical event-time representation.

    The testdata generator has shipped ``events.parquet`` with ``ts`` as
    TIMESTAMP(NANOS) (read as long under
    ``spark.sql.legacy.parquet.nanosAsLong``) and as ``timestamp[us]``
    (read as TIMESTAMP_NTZ). Downstream operators do epoch arithmetic,
    so both must land on the same type. Handled dtypes:

    - ``bigint``           — already epoch-nanos; passthrough.
    - ``timestamp_ntz``    — wall-clock with no zone. The session
      timezone is pinned to UTC before the cast so NTZ→TIMESTAMP is a
      deterministic epoch mapping (matching DuckDB's ``epoch_ns`` on a
      naive timestamp) instead of depending on the host zone.
    - ``timestamp``        — already zoned; ``unix_micros`` is exact.
    """
    dt = dict(df.dtypes).get(ts_col)
    if dt in ("bigint", "long"):
        return df
    if dt is not None and dt.startswith("timestamp"):
        # NTZ→TIMESTAMP casts interpret the wall clock in
        # spark.sql.session.timeZone; UTC makes it an identity on the
        # epoch and matches the DuckDB oracle. The Cast captures the
        # zone when the plan is analyzed (eagerly, inside withColumn),
        # so pinning is scoped to plan construction and the session
        # conf is restored — a read helper must not mutate session
        # state for every later timestamp operation (ADVICE r3).
        spark = df.sparkSession
        tz_key = "spark.sql.session.timeZone"
        prev = spark.conf.get(tz_key, None)
        spark.conf.set(tz_key, "UTC")
        try:
            ns = (
                F.unix_micros(F.col(ts_col).cast("timestamp")) * F.lit(1000)
            ).cast("long")
            return df.withColumn(ts_col, ns)
        finally:
            if prev is None:
                spark.conf.unset(tz_key)
            else:
                spark.conf.set(tz_key, prev)
    raise TypeError(
        f"cannot normalize event-time column {ts_col!r} of type {dt!r}; "
        "expected bigint (epoch nanos) or a timestamp type"
    )


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every TESTDATA table present under ``sf_dir``; the events
    table's ``ts`` is normalized to epoch-nanos BIGINT whatever the
    parquet file stored (see ``normalize_event_time``)."""
    out = {}
    for name in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if not os.path.exists(p):
            continue
        if name == "events":
            # nanos-as-long only for THIS read: the schema is captured
            # when the relation is created, so the conf can be restored
            # immediately — leaving it set would silently turn every
            # later TIMESTAMP(NANOS) parquet read in the session into
            # BIGINT (the same must-not-mutate-session-state rule
            # normalize_event_time documents above)
            key = "spark.sql.legacy.parquet.nanosAsLong"
            prev = spark.conf.get(key, None)
            spark.conf.set(key, "true")
            try:
                df = normalize_event_time(spark.read.parquet(p), "ts")
            finally:
                if prev is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, prev)
        else:
            df = spark.read.parquet(p)
        out[name] = df
    return out

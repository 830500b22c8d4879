"""Dataset materialization sink: write a curated/packed corpus with a
manifest sidecar — the hand-off artifact a training run consumes.

Not reference surface (gamma's export is doc-by-doc Migrate, SURVEY S8
— covered in table.py); this is the north-star endpoint of the
curation pipeline: after curate → dedup → mix → pack, the dataset
ships as files plus a manifest recording what it contains (row/token
counts, schema, the config that produced it) so downstream loaders and
audits never re-scan to answer "what is this".

Scale shape: one write (optionally partitioned), one map-side
combinable aggregation pass for the counts. The manifest writes LAST —
it is the done-marker (the engine's dump.done convention,
`search/gamma_engine.cc:1101-1146`): readers that require the manifest
never observe a half-written dataset.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_dataset(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    token_col: str | None = None,
    config: dict | None = None,
) -> dict:
    """Write ``df`` to ``path`` as ``fmt`` ('parquet' or 'json' —
    json = one JSON object per line, the jsonl interchange shape) and
    a ``manifest.json`` sidecar. Returns the manifest dict.

    ``token_col``: name of an int column to sum into
    ``manifest['n_tokens']`` (the number a mixture plan is specified
    in). ``config``: echoed verbatim — put the pipeline parameters
    (gate thresholds, dedup settings, mixture weights) here so the
    dataset is self-describing.
    """
    if fmt not in ("parquet", "json"):
        raise ValueError(f"write_dataset: unsupported format {fmt!r}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    getattr(writer, fmt)(os.path.join(path, "data"))

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if token_col is not None:
        aggs.append(F.sum(F.col(token_col)).cast("long").alias("n_tokens"))
    # stats over the WRITTEN files, not the input plan — aggregating
    # ``df`` would re-execute the whole upstream stage a second time
    # (the write itself was the first execution). The explicit schema
    # matters for json: inference cannot handle a 0-row dataset (it
    # raises) and would add an extra scan + can re-type all-null
    # columns (e.g. token_col -> string, breaking the sum)
    written = getattr(
        df.sparkSession.read.schema(df.schema), fmt
    )(os.path.join(path, "data"))
    row = written.agg(*aggs).collect()[0]
    manifest = {
        "format": fmt,
        "n_rows": int(row["n_rows"]),
        "schema": df.schema.simpleString(),
        # exact schema for reopen: json datasets cannot re-infer their
        # schema when empty (inference raises on zero rows) and can
        # re-type all-NULL columns; readers apply this instead
        "schema_json": df.schema.json(),
        "partition_by": partition_by or [],
        "config": config or {},
    }
    if token_col is not None:
        manifest["n_tokens"] = int(row["n_tokens"] or 0)
    # atomic replace: the manifest is the done-marker — a torn write
    # would present a committed-looking dataset with an unreadable
    # manifest
    tmp = os.path.join(path, "manifest.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(path, "manifest.json"))
    return manifest


def read_dataset(spark, path: str) -> tuple[DataFrame, dict]:
    """Reopen a :func:`write_dataset` artifact; raises if the manifest
    (the done-marker) is absent — a missing manifest means the write
    never committed."""
    with open(os.path.join(path, "manifest.json")) as fh:
        manifest = json.load(fh)
    reader = spark.read
    if manifest.get("schema_json"):
        # the recorded schema makes reopen inference-free: an EMPTY
        # json dataset is unreadable otherwise (inference raises on
        # zero rows), and a partial read could silently re-type
        # all-NULL columns. Manifests from before this key fall back
        # to inference (parquet never needed it — self-describing).
        from pyspark.sql.types import StructType

        reader = reader.schema(
            StructType.fromJson(json.loads(manifest["schema_json"]))
        )
    df = getattr(reader, manifest["format"])(os.path.join(path, "data"))
    return df, manifest

from gamma_spark.sources.ingest import (  # noqa: F401
    load_tables,
    read_docs,
    split_tag_columns,
)

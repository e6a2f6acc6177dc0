from cga_logs_to_kinesis_spark.sources.tables import (  # noqa: F401
    embedding_valid,
    load_documents_jsonl,
    load_embeddings,
    load_table,
    load_events,
    register_views,
)

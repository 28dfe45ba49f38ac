from sat_val_framework_spark.sources.readers import (
    read_documents,
    read_documents_csv_spans,
    read_documents_json,
    read_documents_orc,
    read_iceberg_table,
)

__all__ = [
    "read_documents",
    "read_documents_json",
    "read_documents_csv_spans",
    "read_documents_orc",
    "read_iceberg_table",
]

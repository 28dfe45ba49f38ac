from sat_val_framework_spark.streaming.qc_stream import streaming_schema_assert, streaming_stats

__all__ = ["streaming_schema_assert", "streaming_stats"]

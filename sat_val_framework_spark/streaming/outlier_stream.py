"""Streaming tail-heaviness monitoring: per-micro-batch Tukey-fence
outlier rate of a numeric column, per partition, against each partition's
OWN quartiles within the batch.

The streaming twin of the round-5 'outlier' suite kind: a sensor burst or
corrupted long-tail injection arriving hours after the batch run must
still flag. Each micro-batch is scored with the BATCH ``outlier_check``
through the shared ``file_monitor`` scaffold — one code path both modes,
verdict rows (+ epoch_id) appended to the same parquet sink shape as the
other monitors. Fences are per-(partition, epoch) by the same
determinism argument as the batch kind: every verdict is a pure function
of the rows in its own partition-slice of its own micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA
from sat_val_framework_spark.operators.stats import outlier_check
from sat_val_framework_spark.profile import text_len_series, with_n_spans
from sat_val_framework_spark.streaming._monitor import file_monitor


def streaming_outlier(
    spark: SparkSession,
    input_path: str,
    sink_path: str,
    column: str = "n_spans",
    k: float = 1.5,
    max_outlier_rate: float = 0.05,
    max_files: int = 4,
) -> StreamingQuery:
    """Score each micro-batch's per-partition outlier rate on ``column``
    (derived ``n_spans``/``text_len`` or any top-level numeric column —
    the runner's derived-series conventions); verdict rows (+ epoch_id)
    append to ``sink_path``. Zero-observation partitions get the typed
    EmptySeriesError verdict per epoch, like the drift monitors."""

    def score(batch: DataFrame) -> DataFrame:
        if column == "text_len":
            frame = text_len_series(batch, "part_id").withColumnRenamed("value", "text_len")
        elif column == "n_spans":
            frame = with_n_spans(batch)
        else:
            frame = batch
        return outlier_check(frame, column, k=k, max_outlier_rate=max_outlier_rate)

    return file_monitor(spark, input_path, DOCUMENTS_SCHEMA, sink_path, score, max_files)

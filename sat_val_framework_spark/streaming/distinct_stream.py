"""Streaming cardinality-health monitoring: per-micro-batch distinct-count
bounds of a column, per partition — the streaming twin of the round-5
'distinct' suite kind.

An upstream join starting to default-fill an id column (value-space
collapse) or a fanout minting ids (explosion) shows up in the NEXT
micro-batch rather than the next batch audit. Each micro-batch is scored
with the BATCH ``distinct_bound_check`` through the shared ``file_monitor``
scaffold — one code path both modes, verdict rows (+ epoch_id) appended to
the same parquet sink shape as the other monitors. Counts are
per-(partition, epoch) by the same determinism argument as the batch kind:
every verdict is a pure function of its own partition-slice of its own
micro-batch. Declare bounds for the EPOCH's expected cardinality, not the
corpus's — a stream never sees the whole value space at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA
from sat_val_framework_spark.operators.stats import distinct_bound_check
from sat_val_framework_spark.profile import text_len_series, with_n_spans
from sat_val_framework_spark.streaming._monitor import file_monitor


def streaming_distinct(
    spark: SparkSession,
    input_path: str,
    sink_path: str,
    column: str,
    lo: int | None = None,
    hi: int | None = None,
    approx: bool = True,
    rsd: float = 0.01,
    max_files: int = 4,
) -> StreamingQuery:
    """Score each micro-batch's per-partition distinct count of ``column``
    against [lo, hi] (derived ``n_spans``/``text_len`` or any top-level
    column — the runner's derived-series conventions); verdict rows
    (+ epoch_id) append to ``sink_path``. All-NULL partitions get the typed
    EmptySeriesError verdict per epoch, like the other monitors."""

    def score(batch: DataFrame) -> DataFrame:
        if column == "text_len":
            frame = text_len_series(batch, "part_id").withColumnRenamed("value", "text_len")
        elif column == "n_spans":
            frame = with_n_spans(batch)
        else:
            frame = batch
        return distinct_bound_check(frame, column, lo=lo, hi=hi, approx=approx, rsd=rsd)

    return file_monitor(spark, input_path, DOCUMENTS_SCHEMA, sink_path, score, max_files)

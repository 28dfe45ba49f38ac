"""Shared scaffold for per-micro-batch file-stream monitors.

Every monitor in this package follows the same shape — file stream with a
declared schema and bounded files/trigger, foreachBatch reusing a BATCH
operator on each micro-batch, results (+ epoch_id) appended to a parquet
sink. One implementation here; each monitor module contributes only its
scoring function (review finding: three near-verbatim copies)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def file_monitor(
    spark: SparkSession,
    input_path: str,
    schema,
    sink_path: str,
    score_fn: Callable[[DataFrame], DataFrame],
    max_files: int = 4,
) -> StreamingQuery:
    """Run ``score_fn`` (a batch operator) on each micro-batch of the
    parquet file stream at ``input_path``; append its rows (+ ``epoch_id``)
    to ``sink_path``. Empty batches append nothing."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_path)
    )

    def run(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        out = score_fn(batch_df)
        out.withColumn("epoch_id", F.lit(epoch_id)).write.mode("append").parquet(sink_path)

    return stream.writeStream.foreachBatch(run).start()

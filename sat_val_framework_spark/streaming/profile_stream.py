"""Streaming profile monitoring: per-micro-batch distribution-profile
constraints (top-share / entropy / distinct-ratio) over an unbounded source.

A column can collapse to a constant mid-stream (an upstream extractor
breaks, one source floods the topic); the batch 'profile' check would only
catch it at the next full validation. This operator re-expresses the same
constraint per micro-batch via ``foreachBatch`` reusing the batch
``profile_check`` — one code path, one threshold semantics, verdict rows
(+ epoch_id) appended to the same parquet sink shape as the other
streaming monitors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from sat_val_framework_spark import profile
from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA
from sat_val_framework_spark.operators.stats import profile_check


def streaming_profile(
    spark: SparkSession,
    input_path: str,
    sink_path: str,
    column: str = "n_spans",
    max_top_share: float | None = 0.9,
    min_entropy: float | None = 0.5,
    min_distinct_ratio: float | None = None,
    max_files: int = 4,
) -> StreamingQuery:
    """Profile each micro-batch's documents; verdict rows (+ epoch_id)
    append to ``sink_path``. Per-batch semantics: a batch whose column
    distribution degenerates FAILS for that batch — lineage keeps the
    history, and the alert fires within one trigger of the break."""
    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_path)
    )

    def score_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        verdicts = profile_check(
            profile.with_n_spans(batch_df),
            column,
            max_top_share=max_top_share,
            min_entropy=min_entropy,
            min_distinct_ratio=min_distinct_ratio,
        )
        verdicts.withColumn("epoch_id", F.lit(epoch_id)).write.mode("append").parquet(sink_path)

    return stream.writeStream.foreachBatch(score_batch).start()

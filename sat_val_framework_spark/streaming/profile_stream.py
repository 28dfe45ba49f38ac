"""Streaming profile monitoring: per-micro-batch distribution-profile
constraints (top-share / entropy / distinct-ratio) over an unbounded source.

A column can collapse to a constant mid-stream (an upstream extractor
breaks, one source floods the topic); the batch 'profile' check would only
catch it at the next full validation. This operator re-expresses the same
constraint per micro-batch via the shared ``file_monitor`` scaffold
reusing the batch ``profile_check`` — one code path, one threshold
semantics, verdict rows (+ epoch_id) appended to the same parquet sink
shape as the other streaming monitors.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from sat_val_framework_spark import profile
from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA
from sat_val_framework_spark.operators.stats import profile_check
from sat_val_framework_spark.streaming._monitor import file_monitor


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
    return file_monitor(
        spark,
        input_path,
        DOCUMENTS_SCHEMA,
        sink_path,
        lambda batch: profile_check(
            profile.with_n_spans(batch),
            column,
            max_top_share=max_top_share,
            min_entropy=min_entropy,
            min_distinct_ratio=min_distinct_ratio,
        ),
        max_files=max_files,
    )

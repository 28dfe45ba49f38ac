"""Streaming contamination monitoring: each micro-batch of incoming
documents is checked for near-duplicates AGAINST A STATIC REFERENCE CORPUS
(the held-out eval set) — the guard a training-data ingest pipeline runs
continuously so benchmark leaks are caught at ingest time, not at the next
full-corpus sweep.

The shared ``file_monitor`` scaffold reuses the batch
``cross_contamination`` composition verbatim (batch = side a, reference =
side b): one code path, one threshold semantics; hit pairs (+ epoch_id)
append to the same parquet sink shape as the other streaming monitors.
The reference corpus is a bounded DataFrame re-used across batches — at
scale, persist it (its signatures are recomputed per batch otherwise; for
a large reference, pre-compute signatures once and pass a custom matcher
instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from sat_val_framework_spark.functions.dedup import cross_contamination, ngram_hits
from sat_val_framework_spark.streaming._monitor import file_monitor


def streaming_contamination(
    spark: SparkSession,
    input_path: str,
    reference: DataFrame,
    sink_path: str,
    schema,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files: int = 4,
) -> StreamingQuery:
    """Check each micro-batch against ``reference``; contaminated pairs
    (incoming a_id, reference b_id, jaccard, epoch_id) append to
    ``sink_path``. A batch with no hits appends nothing."""
    return file_monitor(
        spark,
        input_path,
        schema,
        sink_path,
        lambda batch: cross_contamination(
            batch, reference, threshold=threshold, text_col=text_col, id_col=id_col
        ),
        max_files=max_files,
    )


def streaming_ngram_decontam(
    spark: SparkSession,
    input_path: str,
    reference: DataFrame,
    sink_path: str,
    schema,
    n: int = 13,
    max_hits: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files: int = 4,
) -> StreamingQuery:
    """Streaming EXACT n-gram decontamination (VERDICT r4 #6 — the last
    suite kind without a streaming twin): each micro-batch of incoming
    documents is checked for verbatim n-gram overlap against the static
    reference corpus via the batch ``ngram_hits`` operator, so quotes of
    eval items are caught at ingest time. Rows with more than ``max_hits``
    overlapping grams append (doc_id, n_hits, first_gram, epoch_id) to
    ``sink_path``; clean batches append nothing. Because ``ngram_hits`` is
    per-document (no cross-batch pairing), cumulative stream output EXACTLY
    equals the batch operator on the union of all batches — no state store
    needed, unlike the near-dup monitor."""
    from pyspark.sql import functions as F

    return file_monitor(
        spark,
        input_path,
        schema,
        sink_path,
        lambda batch: ngram_hits(
            batch, reference, n=n, text_col=text_col, id_col=id_col
        ).filter(F.col("n_hits") > max_hits),
        max_files=max_files,
    )

"""Streaming span-grammar monitoring: per-micro-batch structural
validation of the interleaved span arrays — the streaming twin of the
'span_grammar' suite kind.

An ingest regression that starts emitting unknown span kinds, ref-less
media spans, or shuffled offsets shows up in the NEXT micro-batch rather
than the next batch audit. Each micro-batch is scored with the BATCH
``span_grammar_check`` through the shared ``file_monitor`` scaffold — one
code path both modes, verdict rows (+ epoch_id) appended to the same
parquet sink shape as the other monitors. Verdicts are per-(partition,
epoch) and deterministic: each is a pure function of its own
partition-slice of its own micro-batch (document-level flags, no
cross-batch state needed — the grammar is a per-row invariant).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA
from sat_val_framework_spark.operators.span_grammar import span_grammar_check
from sat_val_framework_spark.streaming._monitor import file_monitor


def streaming_span_grammar(
    spark: SparkSession,
    input_path: str,
    sink_path: str,
    allowed_kinds: Sequence[str],
    require_text: bool = False,
    require_media_ref: bool = True,
    check_order: bool = True,
    require_spans: bool = False,
    max_files: int = 4,
) -> StreamingQuery:
    """Check each micro-batch's span arrays against the declared grammar
    (kind vocabulary, media refs, optional text presence, offset order);
    verdict rows (+ epoch_id) append to ``sink_path``. Same rule semantics
    and leaf-pruned scan shape as the batch operator."""

    def score(batch: DataFrame) -> DataFrame:
        return span_grammar_check(
            batch,
            allowed_kinds,
            require_text=require_text,
            require_media_ref=require_media_ref,
            check_order=check_order,
            require_spans=require_spans,
        )

    return file_monitor(spark, input_path, DOCUMENTS_SCHEMA, sink_path, score, max_files)

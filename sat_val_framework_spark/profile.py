"""Derived per-document series used by stats/drift checks on the
interleaved-documents table (BASELINE.json input_hint shape)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_n_spans(docs: DataFrame) -> DataFrame:
    """docs + n_spans (NULL when spans is NULL — a schema_assert failure,
    not a zero)."""
    return docs.withColumn(
        "n_spans",
        F.when(F.col("spans").isNull(), F.lit(None).cast("int")).otherwise(F.size("spans")),
    )


def n_spans_series(docs: DataFrame, part_col: str = "part_id") -> DataFrame:
    return with_n_spans(docs).select(part_col, F.col("n_spans").cast("double").alias("value"))


def text_len_series(docs: DataFrame, part_col: str = "part_id") -> DataFrame:
    """One row per text span: its character length. Lengths are computed
    inside the array BEFORE exploding so the explode fans out ints, not the
    span strings themselves (less row churn on wide text)."""
    lens = F.transform(
        "spans",
        lambda s: F.when(s["kind"] == "text", F.length(s["text"])),
    )
    return (
        docs.select(part_col, F.explode(lens).alias("v"))
        .filter(F.col("v").isNotNull())
        .select(part_col, F.col("v").cast("double").alias("value"))
    )

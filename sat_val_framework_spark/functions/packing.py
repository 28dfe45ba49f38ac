"""Sequence packing: lay documents end-to-end into fixed-size training
sequences (concat-and-split packing, the standard LM pretraining layout —
documents may span a sequence boundary; nothing is padded or dropped).

The layout is pure window arithmetic: a deterministic total order over the
documents, an exclusive cumulative token sum, and each doc's occupied token
interval [cum_prev, cum_prev + n_tokens) mapped onto sequences of length
``seq_len``. No Python in the hot path, one shuffle (the window sort).

Scale shape: the window partitions by a shard column (source, date, ...)
so no global sort exists — each shard packs independently, which is what a
distributed writer wants anyway (one output stream per shard). Within a
shard the order is (doc_id) — deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs_with_len: DataFrame,
    seq_len: int,
    shard_col: str,
    id_col: str = "doc_id",
    len_col: str = "n_tokens",
) -> DataFrame:
    """-> one row per (doc, sequence) placement:
    (shard, doc_id, n_tokens, seq_id, seq_offset, doc_offset, span_tokens).

    A doc occupying tokens [s, e) of the shard's concatenated stream lands
    in sequences floor(s/L) .. floor((e-1)/L); a doc longer than the
    remaining room SPLITS across consecutive sequences (posexplode over
    the covered sequence ids). seq_offset = where the doc's piece starts
    inside the sequence; doc_offset = where the piece starts inside the
    doc; span_tokens = piece length.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive")
    w = Window.partitionBy(shard_col).orderBy(id_col)
    placed = (
        docs_with_len.filter(F.col(len_col) > 0)
        .withColumn("cum_prev", F.coalesce(
            F.sum(len_col).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ))
        .withColumn("first_seq", (F.col("cum_prev") / seq_len).cast("long"))
        .withColumn(
            "last_seq", ((F.col("cum_prev") + F.col(len_col) - 1) / seq_len).cast("long")
        )
    )
    exploded = placed.select(
        F.col(shard_col).alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(len_col).alias("n_tokens"),
        "cum_prev",
        F.explode(F.sequence(F.col("first_seq"), F.col("last_seq"))).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_len
    piece_start = F.greatest(F.col("cum_prev"), seq_start)
    piece_end = F.least(F.col("cum_prev") + F.col("n_tokens"), seq_start + seq_len)
    return exploded.select(
        "shard",
        "doc_id",
        "n_tokens",
        "seq_id",
        (piece_start - seq_start).cast("int").alias("seq_offset"),
        (piece_start - F.col("cum_prev")).cast("int").alias("doc_offset"),
        (piece_end - piece_start).cast("int").alias("span_tokens"),
    )

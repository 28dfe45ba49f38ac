"""A14: parameterized subsetter as a check.

The reference's ``RawDataSubsetter.subset() -> Optional[RawData]``
(/root/reference/sat_val_framework/implement.py:70-77) applies a
parameterized predicate to a granule and rejects it entirely on failure;
``CollocatedRawData.subset`` records the rejection
(implement.py:201-216). Engine form: ``df.filter(predicate)`` — Catalyst
pushes it into the scan — with the rejected complement emitted as verdict
rows and violation doc_ids. The predicate is the check's parameter
(JointParameters contract), validated against the schema before any job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sat_val_framework_spark.verdicts import FAIL, PASS, merged_samples, sample_col


def subset_check(
    docs: DataFrame,
    predicate: str,
    constraint_id: str = "subset",
    part_col: str = "part_id",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (surviving docs, verdicts per partition, rejected violation rows).

    One scan computes both verdict counters and the surviving set's filter
    (the filter itself is lazy and fuses into downstream consumers).

    Sampling bound: the two-level (partition, input-split) aggregate keeps
    the per-group collect bounded by split size even when a predicate
    rejects most of a huge partition (the r2-measured OOM shape) — still
    one scan; the violations sink persists the full rejected set either way.
    """
    keep = F.expr(predicate)
    rejected_flag = ~F.coalesce(keep, F.lit(False))  # NULL predicate = reject (None contract)
    l1 = docs.groupBy(
        F.col(part_col).alias("part_id"), F.spark_partition_id().alias("__split")
    ).agg(
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(rejected_flag.cast("long")).alias("violation_count"),
        sample_col(F.col(id_col), rejected_flag).alias("sample_violations"),
    )
    per_part = l1.groupBy("part_id").agg(
        F.sum("rows_scanned").alias("rows_scanned"),
        F.sum("violation_count").alias("violation_count"),
        merged_samples("sample_violations").alias("sample_violations"),
    )
    verdicts = per_part.select(
        F.lit(constraint_id).alias("constraint_id"),
        "part_id",
        F.when(F.col("violation_count") > 0, F.lit(FAIL)).otherwise(F.lit(PASS)).alias("status"),
        "rows_scanned",
        F.col("violation_count").cast("long").alias("violation_count"),
        "sample_violations",
    )
    surviving = docs.filter(F.coalesce(keep, F.lit(False)))
    rejected = docs.filter(rejected_flag).select(
        F.col(part_col).alias("part_id"), F.col(id_col).alias("violation_key")
    )
    return surviving, verdicts, rejected

"""B12: checkpointed verdicts/metrics + left-anti-join resume.

Contract: the reference persists its expensive discovery output and reloads
it to re-run with different parametrisations (/root/reference/
sat_val_framework/usable.py:51-62), and *intends* no-clobber writes (the
``usable.py:52-55`` missing-return bug shows intent). Engine form: verdicts
append to a parquet (Iceberg in production) metrics table keyed by
(run_id, constraint_id, part_id); reads dedupe on that key keeping the
latest ts, so retried/overlapping appends are idempotent; a killed run
resumes by LEFT ANTI joining the partition worklist against completed ids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sat_val_framework_spark.verdicts import VERDICT_SCHEMA


def append_verdicts(verdicts: DataFrame, path: str) -> None:
    verdicts.write.mode("append").parquet(path)


def read_checkpoint(spark: SparkSession, path: str) -> DataFrame:
    """Read the metrics table, deduped to the latest verdict per
    (run_id, constraint_id, part_id) — idempotent under retried appends."""
    if not os.path.exists(path):
        return spark.createDataFrame([], VERDICT_SCHEMA)
    raw = spark.read.schema(VERDICT_SCHEMA).parquet(path)
    w = Window.partitionBy("run_id", "constraint_id", "part_id").orderBy(F.col("ts").desc())
    return raw.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def completed_parts(checkpoint: DataFrame, run_id: str, constraint_id: str) -> DataFrame:
    return (
        checkpoint.filter(
            (F.col("run_id") == run_id) & (F.col("constraint_id") == constraint_id)
        )
        .select("part_id")
        .distinct()
    )


def pending_parts(worklist: DataFrame, done: DataFrame) -> DataFrame:
    """Resume = left-anti join of the partition worklist against completed
    partition ids (usable.py:51-62 contract, SURVEY.md B12)."""
    return worklist.join(done, "part_id", "left_anti")

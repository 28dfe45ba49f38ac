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
from pyspark.sql import types as T

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


VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("constraint_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), True),
        T.StructField("violation_key", T.StringType(), True),
        T.StructField("detail_json", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def append_violations(
    violations: DataFrame,
    path: str,
    run_id: str,
    constraint_id: str,
    key_col: str,
    part_col: str = "part_id",
) -> None:
    """Persist full violation rows (not just the 10 samples on the verdict)
    to a parquet violations table. ``detail_json`` carries every other
    column of the violation frame for ad-hoc triage."""
    detail_cols = [c for c in violations.columns if c not in (key_col, part_col)]
    out = violations.select(
        F.lit(run_id).alias("run_id"),
        F.lit(constraint_id).alias("constraint_id"),
        (F.col(part_col) if part_col in violations.columns else F.lit(None)).cast("int").alias("part_id"),
        F.col(key_col).cast("string").alias("violation_key"),
        F.to_json(F.struct(*[F.col(c) for c in detail_cols])).alias("detail_json")
        if detail_cols
        else F.lit("{}").alias("detail_json"),
        F.current_timestamp().alias("ts"),
    )
    # one subdir per (run, constraint), overwritten whole: retried writes
    # are idempotent by construction (the usable.py:52-55 no-clobber intent)
    import re

    safe = re.sub(r"\W", "_", f"{run_id}__{constraint_id}")
    out.write.mode("overwrite").parquet(f"{path}/{safe}")


def read_violations(spark: SparkSession, path: str) -> DataFrame:
    if not os.path.exists(path):
        return spark.createDataFrame([], VIOLATIONS_SCHEMA)
    return (
        spark.read.schema(VIOLATIONS_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )


def completed_parts(checkpoint: DataFrame, run_id: str, constraint_id: str) -> DataFrame:
    return (
        checkpoint.filter(
            (F.col("run_id") == run_id) & (F.col("constraint_id") == constraint_id)
        )
        .select("part_id")
        .distinct()
    )


def diff_runs(checkpoint: DataFrame, run_a: str, run_b: str) -> DataFrame:
    """Verdict regressions/changes between two runs: rows where the status
    or violation_count for a (constraint, partition) differs — the
    re-parameterized-rerun comparison the reference's pickled event list
    existed to enable (usable.py:51-62)."""
    a = checkpoint.filter(F.col("run_id") == run_a).alias("a")
    b = checkpoint.filter(F.col("run_id") == run_b).alias("b")
    j = a.join(
        b,
        (F.col("a.constraint_id") == F.col("b.constraint_id"))
        & (F.col("a.part_id") == F.col("b.part_id")),
        "full_outer",
    )
    return j.filter(
        ~F.col("a.status").eqNullSafe(F.col("b.status"))
        | ~F.col("a.violation_count").eqNullSafe(F.col("b.violation_count"))
    ).select(
        F.coalesce(F.col("a.constraint_id"), F.col("b.constraint_id")).alias("constraint_id"),
        F.coalesce(F.col("a.part_id"), F.col("b.part_id")).alias("part_id"),
        F.col("a.status").alias("status_a"),
        F.col("b.status").alias("status_b"),
        F.col("a.violation_count").alias("violations_a"),
        F.col("b.violation_count").alias("violations_b"),
    )


def run_summary(checkpoint: DataFrame) -> DataFrame:
    """Per-run health rollup: constraint coverage, failure counts, pass rate,
    total violations — the dashboard row for a validation run."""
    return checkpoint.groupBy("run_id").agg(
        F.countDistinct("constraint_id").alias("n_constraints"),
        F.count(F.lit(1)).alias("n_verdicts"),
        F.sum((F.col("status") == "FAIL").cast("long")).alias("n_fail"),
        F.round(F.avg((F.col("status") == "PASS").cast("double")), 6).alias("pass_rate"),
        F.sum("violation_count").alias("total_violations"),
    )


def discover_worklist(docs: DataFrame, path: str | None = None, part_col: str = "part_id") -> DataFrame:
    """E1 discovery: enumerate the partition worklist (one row per partition
    with its cardinality) and optionally persist it — the engine twin of the
    reference's expensive matching step whose output is checkpointed so
    re-parameterized runs skip rediscovery (usable.py:51-62,
    implement.py:140-143). Idempotent overwrite: discovery is a pure
    function of the table."""
    wl = docs.groupBy(F.col(part_col).alias("part_id")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    if path is not None:
        wl.write.mode("overwrite").parquet(path)
        spark = docs.sparkSession
        return spark.read.parquet(path)
    return wl


def pending_parts(worklist: DataFrame, done: DataFrame) -> DataFrame:
    """Resume = left-anti join of the partition worklist against completed
    partition ids (usable.py:51-62 contract, SURVEY.md B12)."""
    return worklist.join(done, "part_id", "left_anti")

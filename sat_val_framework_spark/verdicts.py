"""Verdict/violation row model — the errors-as-values contract.

The reference converts exceptions into *returned values* via its
``return_caught_errors`` decorator (/root/reference/sat_val_framework/
implement.py:23-56). The Spark-native equivalent: a failing check never
raises on an executor; every check emits one verdict row per
(constraint_id, part_id) plus deterministic sample violation strings.
Schema follows FIXTURES.md §4 (qc_metrics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PASS = "PASS"
FAIL = "FAIL"
ERROR = "ERROR"

VERDICT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("constraint_id", T.StringType(), False),
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_scanned", T.LongType(), True),
        T.StructField("violation_count", T.LongType(), True),
        T.StructField("sample_violations", T.ArrayType(T.StringType()), True),
        T.StructField("latency_ms", T.DoubleType(), True),
        T.StructField("params_json", T.StringType(), True),
        T.StructField("snapshot_id", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# columns a check itself must produce; the runner stamps the lineage rest
CHECK_OUTPUT_COLS = ["constraint_id", "part_id", "status", "rows_scanned", "violation_count", "sample_violations"]


def finalize_verdicts(
    check_out: DataFrame,
    run_id: str,
    params_json: str = "{}",
    snapshot_id: str = "",
    latency_ms: float | None = None,
) -> DataFrame:
    """Stamp lineage columns (RawMetadata contract, implement.py:81-86) onto a
    check's raw output and conform it to VERDICT_SCHEMA."""
    return check_out.select(
        F.lit(run_id).alias("run_id"),
        F.col("constraint_id"),
        F.col("part_id").cast("int").alias("part_id"),
        F.col("status"),
        F.col("rows_scanned").cast("long").alias("rows_scanned"),
        F.col("violation_count").cast("long").alias("violation_count"),
        F.col("sample_violations"),
        F.lit(latency_ms).cast("double").alias("latency_ms"),
        F.lit(params_json).alias("params_json"),
        F.lit(snapshot_id).alias("snapshot_id"),
        F.current_timestamp().alias("ts"),
    )


def status_col(violation_count: Column) -> Column:
    return F.when(violation_count > 0, F.lit(FAIL)).otherwise(F.lit(PASS))


def sample_col(violation_expr: Column, cond: Column, limit: int = 10) -> Column:
    """Deterministic violation samples: collect under ``cond``, sort, take
    first ``limit`` — stable across task order / parallelism levels
    (SURVEY.md §7 hard part (d))."""
    return F.slice(
        F.sort_array(F.collect_list(F.when(cond, violation_expr))), 1, limit
    )

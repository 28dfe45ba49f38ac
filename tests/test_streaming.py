"""Structured Streaming QC: micro-batched files drive the same per-partition
verdicts as the batch path."""

import pytest
from pyspark.sql import functions as F

from sat_val_framework_spark import fixtures as fx
from sat_val_framework_spark.streaming import streaming_schema_assert, streaming_stats


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    path = str(d / "docs")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    fx.documents_df(spark, 2000).repartition(6).write.parquet(path)
    return path


def test_streaming_schema_assert_matches_batch(spark, stream_dir):
    q = streaming_schema_assert(spark, stream_dir, query_name="t_schema")
    q.processAllAvailable()
    q.stop()
    got = {r["part_id"]: (r["status"], r["violation_count"]) for r in spark.table("t_schema").collect()}
    batch = fx.documents_df(spark, 2000).groupBy("part_id").agg(
        F.sum(F.col("spans").isNull().cast("long")).alias("v")
    )
    exp = {r["part_id"]: ("FAIL" if r["v"] > 0 else "PASS", r["v"]) for r in batch.collect()}
    assert got == exp


def test_streaming_stats_matches_batch(spark, stream_dir):
    q = streaming_stats(spark, stream_dir, query_name="t_stats")
    q.processAllAvailable()
    q.stop()
    got = {
        r["part_id"]: (r["rows_scanned"], r["null_count"], r["min_val"], r["max_val"])
        for r in spark.table("t_stats").collect()
    }
    n_spans = F.when(F.col("spans").isNull(), F.lit(None).cast("int")).otherwise(F.size("spans"))
    batch = (
        fx.documents_df(spark, 2000)
        .select("part_id", n_spans.alias("ns"))
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("ns").isNull().cast("long")).alias("nulls"),
            F.min("ns").alias("mn"),
            F.max("ns").alias("mx"),
        )
    )
    exp = {r["part_id"]: (r["n"], r["nulls"], r["mn"], r["mx"]) for r in batch.collect()}
    assert got == exp


def test_streaming_drift_scores_batches(spark, stream_dir, tmp_path, baseline):
    from sat_val_framework_spark.streaming import streaming_drift

    sink = str(tmp_path / "drift_sink")
    q = streaming_drift(spark, stream_dir, baseline, sink, column="n_spans")
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(sink)
    assert rows.count() > 0
    got = rows.toPandas()
    assert {"constraint_id", "part_id", "status", "epoch_id"} <= set(got.columns)
    # per-batch drift: the drifted partition fails in at least one batch;
    # clean partitions may be noisy in tiny batches, so just assert the
    # drifted one is caught and statuses are well-formed
    import sat_val_framework_spark.fixtures as fx

    drifted = got[(got.part_id == fx.DRIFT_PART) & (got.constraint_id == "drift_psi:n_spans")]
    assert (drifted.status == "FAIL").any()
    assert set(got.status) <= {"PASS", "FAIL"}


def test_streaming_foreach_batch_checkpoints(spark, stream_dir, tmp_path):
    sink = str(tmp_path / "verdict_sink")
    q = streaming_schema_assert(
        spark, stream_dir, query_name="t_fb", foreach_batch_path=sink
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(sink)
    assert rows.count() > 0
    assert {"constraint_id", "part_id", "status", "epoch_id"} <= set(rows.columns)

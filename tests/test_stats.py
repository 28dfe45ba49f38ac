"""B3: exact per-partition stats + B2 schema assertion vs the pandas oracle."""

from pyspark.sql import functions as F

from sat_val_framework_spark import fixtures as fx
from sat_val_framework_spark import profile
from sat_val_framework_spark.operators.stats import StatSpec, column_stats, schema_assert


def test_schema_assert_flags_null_spans_per_partition(docs, oracle):
    out = schema_assert(docs, fx.DOCUMENTS_SCHEMA, not_null=("spans",)).toPandas()
    for r in out.itertuples():
        expected = oracle["null_spans_per_part"].get(r.part_id, 0)
        assert r.violation_count == expected, r
        assert r.status == ("FAIL" if expected else "PASS")
        assert r.rows_scanned == oracle["rows_per_part"][r.part_id]


def test_schema_assert_detects_wrong_schema(docs):
    # build a fresh StructType: .add() mutates the shared schema in place
    from pyspark.sql import types as T

    wrong = T.StructType(list(fx.DOCUMENTS_SCHEMA.fields) + [T.StructField("extra", T.StringType())])
    out = schema_assert(docs, wrong, not_null=()).toPandas()
    assert (out.status == "FAIL").all()


def test_column_stats_exact_minmax_and_nulls(docs, oracle):
    d = profile.with_n_spans(docs)
    verdicts, metrics = column_stats(d, [StatSpec("n_spans", max_null_rate=0.0, lo=1, hi=64)])
    m = metrics.toPandas().set_index("part_id")
    for p, lo in oracle["n_spans_min"].items():
        assert m.loc[p, "min_val"] == lo
        assert m.loc[p, "max_val"] == oracle["n_spans_max"][p]
        assert m.loc[p, "null_count"] == oracle["n_spans_nulls"][p]
        assert m.loc[p, "rows_scanned"] == oracle["rows_per_part"][p]
    v = verdicts.toPandas()
    for r in v.itertuples():
        nulls = oracle["n_spans_nulls"][r.part_id]
        assert r.violation_count == nulls, r
        assert r.status == ("FAIL" if nulls else "PASS")


def test_column_stats_bounds_violations(docs):
    d = profile.with_n_spans(docs)
    verdicts, _ = column_stats(d, [StatSpec("n_spans", lo=100)])  # everything out of bounds
    v = verdicts.toPandas()
    assert (v.status == "FAIL").all()
    assert v.violation_count.sum() == d.filter(F.col("n_spans").isNotNull()).count()


def test_single_fused_aggregation(docs):
    """Two specs must not cause two scans: the plan contains one Aggregate."""
    d = profile.with_n_spans(docs).withColumn("n2", F.col("n_spans") * 2)
    verdicts, _ = column_stats(d, [StatSpec("n_spans"), StatSpec("n2")])
    # verdicts = union of selects over ONE shared wide agg; physical plan of
    # either branch reuses the same exchange. Count HashAggregate pairs.
    plan = verdicts._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ") <= 2  # union of two branches over one cached agg at most

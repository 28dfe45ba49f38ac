"""B10 whole-document gating: a doc failing ANY gating check is excluded as
a unit and the rejection is itself a verdict (None-propagation contract,
implement.py:185-187,211-213)."""

from pyspark.sql import functions as F

from sat_val_framework_spark.operators.gating import gate_documents
from sat_val_framework_spark.operators.referential import referential_check
from sat_val_framework_spark.operators.uniqueness import uniqueness_check


def test_gate_excludes_union_of_violations(spark, docs, catalog, oracle):
    _, uniq_viol = uniqueness_check(docs, "doc_id")
    _, orphans = referential_check(docs, catalog)
    null_docs = docs.filter(F.col("spans").isNull()).select("doc_id")
    surviving, rejected, verdicts = gate_documents(
        docs, [uniq_viol.select(F.col("violation_key").alias("doc_id")), orphans.select("doc_id"), null_docs]
    )
    bad_ids = (
        {r["doc_id"] for r in docs.filter(F.col("spans").isNull()).select("doc_id").collect()}
        | oracle["dup_ids"]
        | {r["doc_id"] for r in orphans.select("doc_id").distinct().collect()}
    )
    n_docs = docs.count()
    n_bad_rows = docs.filter(F.col("doc_id").isin(list(bad_ids))).count()
    assert rejected.count() == n_bad_rows
    assert surviving.count() == n_docs - n_bad_rows
    # surviving set contains no violating doc_id
    assert surviving.filter(F.col("doc_id").isin(list(bad_ids))).count() == 0
    v = verdicts.toPandas()
    assert v.violation_count.sum() == n_bad_rows
    assert set(v[v.violation_count > 0].status) == {"FAIL"}


def test_gate_with_no_violations_keeps_everything(spark, docs):
    surviving, rejected, verdicts = gate_documents(docs, [])
    assert rejected.count() == 0
    assert surviving.count() == docs.count()
    assert (verdicts.toPandas().status == "PASS").all()

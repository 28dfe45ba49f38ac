"""A14: parameterized subsetter check — rejection as data, None = reject."""

import pytest
from pyspark.sql import functions as F

from sat_val_framework_spark.operators.subset import subset_check
from sat_val_framework_spark.runner import run_suite
from sat_val_framework_spark.suite import Check, CheckSuite


def test_subset_counts_match_complement(spark, docs):
    surv, verdicts, rejected = subset_check(docs, "size(spans) >= 3")
    n = docs.count()
    n_surv, n_rej = surv.count(), rejected.count()
    assert n_surv + n_rej == n
    v = verdicts.toPandas()
    assert v.violation_count.sum() == n_rej
    # docs with NULL spans evaluate the predicate to NULL -> rejected
    null_docs = docs.filter(F.col("spans").isNull()).count()
    assert n_rej >= null_docs > 0


def test_subset_identity_predicate_keeps_all(spark, docs):
    surv, verdicts, rejected = subset_check(docs, "true")
    assert rejected.count() == 0 and surv.count() == docs.count()
    assert (verdicts.toPandas().status == "PASS").all()


def test_subset_via_suite_runner(spark, docs):
    suite = CheckSuite([Check("subset", "spans", {"predicate": "size(spans) >= 3"})])
    res = run_suite(spark, docs, suite)
    rows = res.verdicts.collect()
    assert rows and all(r["constraint_id"] == "subset:spans" for r in rows)


def test_bad_predicate_is_config_error_value(spark, docs):
    suite = CheckSuite([Check("subset", "spans", {"predicate": "no_such_col > 1"})])
    errs = suite.validate(docs)
    assert errs and any("bad predicate" in str(e) for e in errs)
    suite2 = CheckSuite([Check("subset", "spans", {})])
    assert any("predicate" in str(e) for e in suite2.validate(docs))

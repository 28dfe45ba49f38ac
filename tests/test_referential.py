"""B5/B6: referential integrity — broadcast and sort-merge strategies must
produce identical verdicts, matching the pandas oracle exactly."""

from sat_val_framework_spark.operators.referential import referential_check


def _verdict_tuples(df):
    return sorted(
        (r["part_id"], r["status"], r["violation_count"])
        for r in df.collect()
    )


def test_broadcast_orphans_exact(docs, catalog, oracle):
    verdicts, orphans = referential_check(docs, catalog, strategy="broadcast")
    v = verdicts.toPandas()
    for r in v.itertuples():
        expected = oracle["orphans_per_part"].get(r.part_id, 0)
        assert r.violation_count == expected, r
        assert r.status == ("FAIL" if expected else "PASS")
    assert orphans.count() == sum(oracle["orphans_per_part"].values())
    for r in orphans.collect():
        assert r["media_ref"].startswith("m-missing-")


def test_merge_strategy_identical_verdicts(docs, catalog):
    b, _ = referential_check(docs, catalog, strategy="broadcast")
    m, _ = referential_check(docs, catalog, strategy="merge")
    assert _verdict_tuples(b) == _verdict_tuples(m)


def test_broadcast_plan_is_broadcast(docs, catalog):
    _, orphans = referential_check(docs, catalog, strategy="broadcast")
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_merge_plan_is_sort_merge(docs, catalog):
    _, orphans = referential_check(docs, catalog, strategy="merge")
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan

"""B5/B6: referential integrity — broadcast, sort-merge, and bloom
strategies must produce identical verdicts, matching the pandas oracle
exactly."""

from pyspark.sql import functions as F

from sat_val_framework_spark.functions import bloom
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


def test_bloom_strategy_identical_verdicts(docs, catalog):
    b, bo = referential_check(docs, catalog, strategy="broadcast")
    l, lo = referential_check(docs, catalog, strategy="bloom")
    assert _verdict_tuples(b) == _verdict_tuples(l)
    assert sorted(r["media_ref"] for r in bo.collect()) == sorted(
        r["media_ref"] for r in lo.collect()
    )


def test_bloom_no_false_negatives_and_fpp_bounded(spark):
    """Every dim key must probe positive (no false negatives — the property
    exactness rests on); absent keys must probe positive at roughly the
    configured FPP."""
    dim = spark.range(10_000).select(F.format_string("k-%06d", "id").alias("k"))
    n_bits, n_hashes = bloom.bloom_params(10_000, fpp=0.01)
    words = F.broadcast(bloom.bloom_build(dim, "k", n_bits, n_hashes))
    mc = lambda df: df.join(words).select(  # noqa: E731
        bloom.bloom_might_contain(F.col("k"), F.col("bloom_words"), n_bits, n_hashes).alias("m")
    )
    assert mc(dim).where(~F.col("m")).count() == 0
    absent = spark.range(20_000).select(F.format_string("absent-%06d", "id").alias("k"))
    fp = mc(absent).where(F.col("m")).count() / 20_000
    assert fp < 0.03, fp


def test_bloom_single_fact_scan_single_join(spark):
    """The whole composition must read the fact table ONCE (the
    filter-split two-branch shape re-ran the scan per branch — the −7.6%
    lesson from fused Pass C) and contain exactly one equi-join."""
    dim = spark.range(5_000).select(F.col("id").alias("k"))
    fact = spark.range(50_000).select(F.col("id").alias("k"))
    orphans = bloom.bloom_anti_join(fact, dim, "k", "k")
    assert orphans.count() == 45_000
    plan = orphans._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 50000") == 1, plan  # fact scanned once
    n_joins = sum(plan.count(j) for j in ("SortMergeJoin", "BroadcastHashJoin"))
    assert n_joins == 1, plan


def test_bloom_mixed_key_types_still_exact(spark):
    """xxhash64 is type-sensitive: an int fact key probed against a
    bigint-built filter matches nothing and every matching row would come
    back a 'definite orphan'. The common-type cast must keep the answer
    exactly the left-anti answer; incompatible families refuse loudly."""
    import pytest

    dim = spark.range(100).select(F.col("id").alias("k"))  # bigint
    fact = spark.range(150).select(F.col("id").cast("int").alias("k"))  # int
    got = sorted(r["k"] for r in bloom.bloom_anti_join(fact, dim, "k", "k").collect())
    assert got == list(range(100, 150))  # matching rows are NOT orphans

    sfact = spark.range(10).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError, match="common hash type"):
        bloom.bloom_anti_join(sfact, dim, "k", "k")


def test_bloom_nonunique_dim_does_not_duplicate_orphans(spark):
    """left-anti semantics: a dim key appearing many times still matches
    once; the internal left-join formulation must not fan out fact rows."""
    dim = spark.range(50).select((F.col("id") % 10).alias("k"))  # each key x5
    fact = spark.range(20).select(F.col("id").alias("k"))
    got = sorted(r["k"] for r in bloom.bloom_anti_join(fact, dim, "k", "k").collect())
    assert got == list(range(10, 20))


def test_bloom_null_fact_keys_match_left_anti_semantics(spark):
    """NULL fact keys never equi-join, so left-anti keeps them as orphans;
    the bloom composition must agree (NULL probe -> coalesced to definite)."""
    dim = spark.range(100).select(F.col("id").alias("k"))
    fact = spark.range(50).select(
        F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") + 90).alias("k")
    )
    exact = sorted(
        r["k"] for r in fact.join(dim, "k", "left_anti").collect() if r["k"] is not None
    )
    got = bloom.bloom_anti_join(fact, dim, "k", "k").collect()
    assert sum(1 for r in got if r["k"] is None) == 5
    assert sorted(r["k"] for r in got if r["k"] is not None) == exact

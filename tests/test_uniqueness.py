"""B4: salted-aggregate uniqueness — exact duplicate verdicts, including
duplicates whose occurrences span partitions (and salt groups)."""

from pyspark.sql import functions as F

from sat_val_framework_spark.operators.uniqueness import duplicate_keys, uniqueness_check


def test_duplicate_keys_exact(docs, oracle):
    dups = {r["doc_id"] for r in duplicate_keys(docs, "doc_id").collect()}
    assert dups == oracle["dup_ids"]


def test_verdicts_attribute_rows_per_partition(docs, oracle):
    verdicts, viol = uniqueness_check(docs, "doc_id")
    v = verdicts.toPandas()
    for r in v.itertuples():
        expected = oracle["dup_rows_per_part"].get(r.part_id, 0)
        assert r.violation_count == expected, r
        assert r.status == ("FAIL" if expected else "PASS")
    assert viol.count() == sum(oracle["dup_rows_per_part"].values())


def test_cross_partition_duplicate_caught(spark):
    # two rows with the same key land in different spark partitions (and so
    # different salts): the two-level agg must still merge their counts
    df = spark.createDataFrame(
        [("k1", 0), ("k1", 1), ("k2", 0)], ["doc_id", "part_id"]
    ).repartition(4, "part_id")
    dups = duplicate_keys(df, "doc_id").collect()
    assert [(r["doc_id"], r["dup_count"]) for r in dups] == [("k1", 2)]


def test_pathological_hot_key(spark):
    """Skew: one doc_id occupying most of the table. The two-level agg's
    partial combine collapses the hot key map-side, so the final reducer
    sees at most #splits rows for it — the check completes and counts
    exactly (north-rule 'skew handled explicitly')."""
    n_hot, n_cold = 200_000, 1_000
    from pyspark.sql import functions as F

    hot = spark.range(n_hot).select(
        F.lit("hot-doc").alias("doc_id"), (F.col("id") % 16).cast("int").alias("part_id")
    )
    cold = spark.range(n_cold).select(
        F.format_string("cold-%06d", F.col("id")).alias("doc_id"),
        (F.col("id") % 16).cast("int").alias("part_id"),
    )
    df = hot.unionByName(cold).repartition(32)
    dups = duplicate_keys(df, "doc_id").collect()
    assert [(r["doc_id"], r["dup_count"]) for r in dups] == [("hot-doc", n_hot)]
    verdicts, _ = uniqueness_check(df, "doc_id")
    v = verdicts.toPandas()
    assert v.violation_count.sum() == n_hot
    assert (v.status == "FAIL").all()  # hot rows exist in every partition


def test_sample_violations_deterministic_sorted(docs):
    verdicts, _ = uniqueness_check(docs, "doc_id")
    for r in verdicts.filter(F.col("violation_count") > 0).collect():
        s = r["sample_violations"]
        assert s == sorted(s)
        assert len(s) <= 10


def test_composite_key_duplicates(spark):
    """Composite-key uniqueness (A3 invariants over key tuples): (a, b)
    tuples are the unit — rows sharing only one component are NOT dups;
    list and comma-joined string forms are equivalent; cross-salt merge
    holds (copies forced into different partitions)."""
    rows = [
        ("s1", 1, 0), ("s1", 1, 1),          # dup tuple, spans partitions
        ("s1", 2, 0), ("s2", 1, 0),          # share one component each: unique
        ("s2", 2, 0), ("s2", 2, 0), ("s2", 2, 1),  # triple dup tuple
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "part_id"]).repartition(4, "part_id")
    got = {
        (r["source"], r["doc_id"]): r["dup_count"]
        for r in duplicate_keys(df, ["source", "doc_id"]).collect()
    }
    assert got == {("s1", 1): 2, ("s2", 2): 3}
    # string form parses to the same keys
    got2 = {
        (r["source"], r["doc_id"]): r["dup_count"]
        for r in duplicate_keys(df, "source,doc_id").collect()
    }
    assert got2 == got


def test_composite_key_uniqueness_check_verdicts_and_samples(spark):
    rows = [
        ("s1", 1, 0), ("s1", 1, 1),
        ("s1", 2, 0), ("s2", 1, 1),
        ("s2", 2, 1), ("s2", 2, 1),
    ]
    df = spark.createDataFrame(rows, ["source", "doc_id", "part_id"])
    verdicts, viol = uniqueness_check(df, "source,doc_id")
    v = {r["part_id"]: r for r in verdicts.collect()}
    assert v[0]["violation_count"] == 1 and v[0]["status"] == "FAIL"
    assert v[1]["violation_count"] == 3 and v[1]["status"] == "FAIL"
    assert v[0]["sample_violations"] == ["s1|1"]  # tuple rendered as a|b
    assert sorted(v[1]["sample_violations"]) == ["s1|1", "s2|2", "s2|2"]
    assert {r["constraint_id"] for r in verdicts.collect()} == {"unique:source,doc_id"}


def test_composite_key_suite_config_validates(spark, docs):
    from sat_val_framework_spark.suite import Check, CheckSuite

    ok = CheckSuite([Check("unique", "doc_id,part_id")])
    assert ok.validate(docs) == []
    bad = CheckSuite([Check("unique", "doc_id,nope")])
    errs = bad.validate(docs)
    assert len(errs) == 1 and "nope" in str(errs[0])


def test_fd_violations_flags_only_broken_groups(spark):
    """a -> b: groups with one distinct b (incl. repeated rows) pass; a
    group with two distinct b values flags; NULL b never contradicts the
    dependency (SQL FD semantics) and an all-NULL group never flags."""
    from sat_val_framework_spark.operators.uniqueness import fd_violations

    rows = [
        ("k1", "v1"), ("k1", "v1"),          # consistent: no row
        ("k2", "v1"), ("k2", "v2"),          # broken: 2 distinct
        ("k3", "v9"), ("k3", None),          # NULL can't contradict: no row
        ("k4", None), ("k4", None),          # all-NULL: no row
    ]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = {r["a"]: (r["n_dependent"], r["n_rows"]) for r in fd_violations(df, "a", "b").collect()}
    assert got == {"k2": (2, 2)}


def test_fd_violations_composite_determinant(spark):
    from sat_val_framework_spark.operators.uniqueness import fd_violations

    rows = [("s1", 1, "x"), ("s1", 1, "y"), ("s1", 2, "x"), ("s2", 1, "x")]
    df = spark.createDataFrame(rows, ["src", "k", "v"])
    got = fd_violations(df, "src,k", "v").collect()
    assert [(r["src"], r["k"], r["n_dependent"]) for r in got] == [("s1", 1, 2)]


def test_fd_check_suite_fixture_fail_parts(spark, docs):
    """fd:doc_id->part_id on the seeded fixture: the duplicated doc_ids land
    in two partitions each, so exactly parts 6/7/14/15 FAIL (the same parts
    uniqueness flags — the dup IS the dependency break here)."""
    from sat_val_framework_spark.operators.uniqueness import fd_check

    verdicts, viol = fd_check(docs, "doc_id->part_id")
    v = {r["part_id"]: r for r in verdicts.collect()}
    assert {p for p, r in v.items() if r["status"] == "FAIL"} == {6, 7, 14, 15}
    assert all(r["constraint_id"] == "fd:doc_id->part_id" for r in v.values())
    assert v[6]["violation_count"] == 2 and v[0]["violation_count"] == 0
    assert viol.count() == 8  # 4 dup pairs x 2 rows


def test_fd_spec_rejects_dots_and_null_determinants_consistent(spark):
    """Dotted fd specs would break constraint-id parity with
    Check.constraint_id (checkpoint-resume-forever class) — rejected at
    parse time. NULL determinant rows are excluded from fd_violations so
    the profile and the fd_check verdict surfaces agree (the attribution
    equi-join can never see a NULL group anyway)."""
    import pytest

    from sat_val_framework_spark.operators.uniqueness import fd_check, fd_violations, parse_fd_spec

    with pytest.raises(ValueError, match="dot-free"):
        parse_fd_spec("meta.source->x")
    with pytest.raises(ValueError, match="dot-free"):
        parse_fd_spec("a->meta.x")

    rows = [(None, "v1"), (None, "v2"), ("k1", "v1"), ("k1", "v1")]
    df = spark.createDataFrame(rows, ["a", "b"]).withColumn(
        "part_id", F.lit(0)
    )
    assert fd_violations(df, "a", "b").count() == 0  # NULL determines nothing
    verdicts, viol = fd_check(df, "a->b")
    assert viol.count() == 0
    assert all(r["status"] == "PASS" for r in verdicts.collect())

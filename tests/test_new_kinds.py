"""Round-4 suite kinds: drift_categorical (vs configured baseline),
repetition, contamination — each declarable in a CheckSuite, emitting
standard verdict rows and riding checkpoint/resume (VERDICT r3 #3/#4/#7)."""

import pytest
from pyspark.sql import functions as F

from sat_val_framework_spark import checkpoint as ckpt
from sat_val_framework_spark import fixtures as fx
from sat_val_framework_spark.runner import DEFAULT_SUITE, run_suite
from sat_val_framework_spark.suite import Check, CheckSuite


def _status(res):
    return {
        (r["constraint_id"], r["part_id"]): r["status"] for r in res.verdicts.collect()
    }


def test_default_suite_new_constraints_expected_verdicts(
    spark, docs, catalog, baseline, baseline_cat
):
    """quantile:n_spans must FAIL exactly the drifted partition (its +4
    n_spans shift moves the median from ~6.5 to ~10.5, outside [5, 8]);
    drift_categorical:kind must PASS everywhere (the kind mix is not
    drifted in the fixture)."""
    res = run_suite(
        spark, docs, DEFAULT_SUITE, catalog=catalog, baseline=baseline,
        baseline_cat=baseline_cat,
    )
    st = _status(res)
    q_fail = {p for (c, p), s in st.items() if c == "quantile:n_spans" and s == "FAIL"}
    assert q_fail == {fx.DRIFT_PART}
    cat_status = {s for (c, _), s in st.items() if c == "drift_categorical:kind"}
    assert cat_status == {"PASS"}


def test_categorical_drift_check_detects_seeded_kind_shift(spark, baseline_cat):
    """A partition whose span kinds collapse to one category must FAIL the
    tv threshold; matching partitions PASS; a partition with only presence
    markers gets a typed EmptySeriesError."""
    from sat_val_framework_spark.operators.drift import categorical_drift_check

    rows = (
        # part 0: matches the baseline mix (0.7/0.1/0.2)
        [(0, "text")] * 70 + [(0, "image")] * 10 + [(0, "audio")] * 20
        # part 1: all image — tv = (|0-0.7| + |1-0.1| + |0-0.2|)/2 = 0.9
        + [(1, "image")] * 50
        # part 2: presence markers only (docs with no spans)
        + [(2, None)] * 5
    )
    series = spark.createDataFrame(rows, "part_id int, value string")
    verdicts, scores = categorical_drift_check(
        series, baseline_cat, "kind", tv_threshold=0.1
    )
    st = {r["part_id"]: r for r in verdicts.collect()}
    assert st[0]["status"] == "PASS"
    assert st[1]["status"] == "FAIL" and "tv=0.9>0.1" in st[1]["sample_violations"][0]
    assert st[2]["status"] == "ERROR" and st[2]["error_kind"] == "EmptySeriesError"
    sc = {r["part_id"]: r for r in scores.collect()}
    assert abs(sc[0]["tv"]) < 1e-9 and abs(sc[1]["tv"] - 0.9) < 1e-9
    # unseen category counts against the baseline (p>0, q=0)
    extra = spark.createDataFrame([(0, "video")] * 10 + [(0, "text")] * 90, "part_id int, value string")
    _, sc2 = categorical_drift_check(extra, baseline_cat, "kind", tv_threshold=0.1)
    tv = sc2.collect()[0]["tv"]
    # |0.9-0.7| + |0-0.1| + |0-0.2| + 0.1 -> /2 = 0.3
    assert abs(tv - 0.3) < 1e-9


def _mini_docs(spark, texts_per_part: dict):
    """DOCUMENTS_SCHEMA-shaped docs: one text span per doc."""
    rows = []
    for part, texts in texts_per_part.items():
        for i, t in enumerate(texts):
            rows.append(
                (f"doc-{part}-{i}", part, [(("text", t, None, 0))])
            )
    return spark.createDataFrame(rows, fx.DOCUMENTS_SCHEMA)


def test_repetition_kind_flags_degenerate_partitions(spark, tmp_path):
    suite = CheckSuite([Check("repetition", params={"max_dup_word_frac": 0.5})])
    docs = _mini_docs(
        spark,
        {
            0: ["alpha beta gamma delta epsilon zeta", "one two three four five six"],
            1: ["spam spam spam spam spam spam spam spam", "ham ham ham ham ham eggs"],
        },
    )
    path = str(tmp_path / "ck")
    res = run_suite(spark, docs, suite, checkpoint_path=path, run_id="rep1")
    st = {r["part_id"]: r for r in res.verdicts.collect()}
    assert st[0]["status"] == "PASS" and st[0]["violation_count"] == 0
    assert st[1]["status"] == "FAIL" and st[1]["violation_count"] == 2
    assert st[1]["sample_violations"] == ["doc-1-0", "doc-1-1"]
    assert st[0]["rows_scanned"] == 2
    # resume is a noop (constraint ids match Check.constraint_id)
    res2 = run_suite(spark, docs, suite, checkpoint_path=path, run_id="rep1")
    assert res2.verdicts.count() == 0


def test_repetition_validate_requires_threshold(docs):
    errs = CheckSuite([Check("repetition")]).validate(docs)
    assert len(errs) == 1 and "max_dup_word_frac" in str(errs[0])
    errs2 = CheckSuite([Check("repetition", params={"max_dup_word_frac": 1.5})]).validate(docs)
    assert len(errs2) == 1 and "[0,1]" in str(errs2[0])


def test_contamination_kind_with_resume_after_missing_ref(spark, tmp_path):
    """Missing reference corpus -> typed retryable ERROR verdicts; after the
    path exists, the SAME run_id re-runs exactly those pairs and flags the
    leaked docs (errors-as-values + resume, the A1/A20 composition)."""
    ref_path = str(tmp_path / "ref.parquet")
    suite = CheckSuite(
        [Check("contamination", params={"ref_path": ref_path, "threshold": 0.5})]
    )
    leak = "the quick brown fox jumps over the lazy dog again and again tonight"
    docs = _mini_docs(
        spark,
        {
            0: ["completely original words nothing shared here at all", leak],
            1: ["another unique document with its own content entirely"],
        },
    )
    path = str(tmp_path / "ck")
    r1 = run_suite(spark, docs, suite, checkpoint_path=path, run_id="c1")
    first = r1.verdicts.collect()
    assert {r["status"] for r in first} == {"ERROR"}
    assert {r["error_kind"] for r in first} == {"FileNotFoundError"}

    spark.createDataFrame(
        [("r-1", leak), ("r-2", "benchmark question about many different topics")],
        ["doc_id", "text"],
    ).write.parquet(ref_path)
    r2 = run_suite(spark, docs, suite, checkpoint_path=path, run_id="c1")
    st = {r["part_id"]: r for r in r2.verdicts.collect()}
    assert st[0]["status"] == "FAIL" and st[0]["sample_violations"] == ["doc-0-1"]
    assert st[1]["status"] == "PASS"
    # third run: everything done, noop
    r3 = run_suite(spark, docs, suite, checkpoint_path=path, run_id="c1")
    assert r3.verdicts.count() == 0


def test_contamination_validate_requires_ref_path(docs):
    errs = CheckSuite([Check("contamination")]).validate(docs)
    assert len(errs) == 1 and "ref_path" in str(errs[0])


def test_drift_categorical_validate(docs):
    ok = CheckSuite([Check("drift_categorical", "kind", {"tv_threshold": 0.1})])
    assert ok.validate(docs) == []
    errs = CheckSuite([Check("drift_categorical", "kind")]).validate(docs)
    assert len(errs) == 1 and "tv_threshold" in str(errs[0])
    errs2 = CheckSuite(
        [Check("drift_categorical", "spans.kind", {"tv_threshold": 0.1})]
    ).validate(docs)
    assert len(errs2) == 1 and "dot-free" in str(errs2[0])


def test_drift_categorical_missing_baseline_is_error_value(spark, docs):
    suite = CheckSuite([Check("drift_categorical", "kind", {"tv_threshold": 0.1})])
    res = run_suite(spark, docs, suite)  # baseline_cat MISSING
    rows = res.verdicts.collect()
    assert rows and {r["status"] for r in rows} == {"ERROR"}
    assert {r["error_kind"] for r in rows} == {"MissingInputError"}


def test_ngram_decontam_kind(spark, tmp_path):
    """Exact n-gram overlap as a declarable constraint: docs quoting the
    reference corpus verbatim FAIL their partition; resume is a noop."""
    ref_path = str(tmp_path / "eval.parquet")
    quote = "the quick brown fox jumps over the lazy dog tonight"
    spark.createDataFrame([("e1", quote)], ["doc_id", "text"]).write.parquet(ref_path)
    suite = CheckSuite(
        [Check("ngram_decontam", params={"ref_path": ref_path, "n": 5})]
    )
    docs = _mini_docs(
        spark,
        {
            0: ["prefix words then " + quote + " and a suffix", "clean original content here"],
            1: ["nothing shared with the reference at all today"],
        },
    )
    path = str(tmp_path / "ck")
    res = run_suite(spark, docs, suite, checkpoint_path=path, run_id="ng1")
    st = {r["part_id"]: r for r in res.verdicts.collect()}
    assert st[0]["status"] == "FAIL" and st[0]["sample_violations"] == ["doc-0-0"]
    assert st[1]["status"] == "PASS"
    assert res.verdicts.filter("constraint_id != 'ngram_decontam'").count() == 0
    r2 = run_suite(spark, docs, suite, checkpoint_path=path, run_id="ng1")
    assert r2.verdicts.count() == 0
    # config validation: ref_path required, n must be an int >= 2
    errs = CheckSuite([Check("ngram_decontam", params={"n": 1})]).validate(docs)
    assert len(errs) == 2


def test_drift_categorical_empty_baseline_is_error_value(spark, docs, baseline_cat):
    """Review r4: a baseline with no rows for the column is a CONFIG error
    (retryable MissingInput verdicts), not uniform tv=0.5 drift."""
    from pyspark.sql import functions as Fn

    wrong = baseline_cat.withColumn("col_name", Fn.lit("span_kind"))  # never 'kind'
    suite = CheckSuite([Check("drift_categorical", "kind", {"tv_threshold": 0.1})])
    res = run_suite(spark, docs, suite, baseline_cat=wrong)
    rows = res.verdicts.collect()
    assert rows and {r["status"] for r in rows} == {"ERROR"}
    assert {r["error_kind"] for r in rows} == {"MissingInputError"}


def test_repetition_duplicate_doc_ids_profile_per_partition(spark, tmp_path):
    """Advice r4 (medium): duplicate doc_ids spanning partitions — exactly
    the defect the unique/fd checks model — must NOT merge their tokens
    into one profile with nondeterministic partition attribution. The
    degenerate copy fails ITS partition; the clean copy's partition passes."""
    suite = CheckSuite([Check("repetition", params={"max_dup_word_frac": 0.5})])
    rows = [
        ("dup-1", 0, [("text", "alpha beta gamma delta epsilon zeta", None, 0)]),
        ("dup-1", 1, [("text", "spam spam spam spam spam spam spam spam", None, 0)]),
        ("other", 1, [("text", "one two three four five six seven", None, 0)]),
    ]
    import sat_val_framework_spark.fixtures as fx

    docs = spark.createDataFrame(rows, fx.DOCUMENTS_SCHEMA).repartition(4)
    for _ in range(3):  # attribution must be stable across runs
        res = run_suite(spark, docs, suite)
        st = {r["part_id"]: r for r in res.verdicts.collect()}
        assert st[0]["status"] == "PASS" and st[0]["violation_count"] == 0
        assert st[1]["status"] == "FAIL" and st[1]["violation_count"] == 1
        assert st[1]["sample_violations"] == ["dup-1"]


def test_ngram_decontam_duplicate_doc_ids_keyed_per_partition(spark, tmp_path):
    """Advice r4: the decontam kinds key on the physical (part, doc) row —
    a quoting copy of a duplicated doc_id flags its own partition only,
    the clean copy's partition stays green (no cross-partition text pooling)."""
    ref_path = str(tmp_path / "eval.parquet")
    quote = "the quick brown fox jumps over the lazy dog tonight"
    spark.createDataFrame([("e1", quote)], ["doc_id", "text"]).write.parquet(ref_path)
    suite = CheckSuite([Check("ngram_decontam", params={"ref_path": ref_path, "n": 5})])
    rows = [
        ("dup-1", 0, [("text", "totally clean original words here today", None, 0)]),
        ("dup-1", 1, [("text", "prefix " + quote + " suffix", None, 0)]),
    ]
    import sat_val_framework_spark.fixtures as fx

    docs = spark.createDataFrame(rows, fx.DOCUMENTS_SCHEMA)
    res = run_suite(spark, docs, suite)
    st = {r["part_id"]: r for r in res.verdicts.collect()}
    assert st[0]["status"] == "PASS" and st[0]["violation_count"] == 0
    assert st[1]["status"] == "FAIL" and st[1]["sample_violations"] == ["dup-1"]


def test_contamination_cap_writes_oversized_bucket_audit(spark, tmp_path):
    """Advice r4: when the contamination kind caps LSH buckets, the
    oversized-bucket audit lands in the violations table (no-silent-caps) —
    constraint_id suffixed '#oversized_buckets', one row per over-cap
    (band, key) bucket."""
    ref_path = str(tmp_path / "ref.parquet")
    boiler = "error page not found please try again later contact support now"
    spark.createDataFrame(
        [(f"r{i}", boiler) for i in range(3)], ["doc_id", "text"]
    ).write.parquet(ref_path)
    suite = CheckSuite(
        [Check("contamination", params={
            "ref_path": ref_path, "threshold": 0.5, "max_bucket_size": 2,
        })]
    )
    docs = _mini_docs(spark, {0: [boiler, boiler, "unrelated fresh content words"]})
    vio = str(tmp_path / "vio")
    res = run_suite(spark, docs, suite, violations_path=vio, run_id="cap1")
    st = {r["part_id"]: r for r in res.verdicts.collect()}
    assert st[0]["status"] == "FAIL"  # boilerplate docs still pair via hub
    audit = ckpt.read_violations(spark, vio).filter(
        F.col("constraint_id").endswith("#oversized_buckets")
    )
    rows = audit.collect()
    assert rows, "cap set but no oversized-bucket audit row written"
    assert all("bucket_size" in r["detail_json"] for r in rows)


def test_quantile_and_profile_on_derived_text_len(spark, tmp_path):
    """VERDICT r4 #2: a doc-length quantile bound — quantile:text_len rides
    the drift family's per-text-span series. Long-text partitions FAIL the
    hi bound, a media-only partition (no text spans) gets the drift
    family's EmptySeriesError, and resume is a noop."""
    import sat_val_framework_spark.fixtures as fx

    rows = (
        [(f"s{i}", 0, [("text", "five!", None, 0), ("text", "chars", None, 1)])
         for i in range(4)]
        + [(f"l{i}", 1, [("text", "x" * 50, None, 0)]) for i in range(4)]
        + [(f"m{i}", 2, [("image", None, f"img-{i}", 0)]) for i in range(2)]
    )
    docs = spark.createDataFrame(rows, fx.DOCUMENTS_SCHEMA)
    suite = CheckSuite([
        Check("quantile", "text_len", {"q": 0.5, "lo": 1, "hi": 20, "approx": False}),
        Check("profile", "text_len", {"max_top_share": 0.9}),
    ])
    path = str(tmp_path / "ck")
    res = run_suite(spark, docs, suite, checkpoint_path=path, run_id="tl1")
    st = {(r["constraint_id"], r["part_id"]): r for r in res.verdicts.collect()}
    q = "quantile:text_len"
    assert st[(q, 0)]["status"] == "PASS"
    assert st[(q, 1)]["status"] == "FAIL" and "50" in st[(q, 1)]["sample_violations"][0]
    assert st[(q, 2)]["status"] == "ERROR"
    assert st[(q, 2)]["error_kind"] == "EmptySeriesError"
    # rows_scanned counts SPAN rows on the per-span series (2 spans/doc in part 0)
    assert st[(q, 0)]["rows_scanned"] == 8
    # profile: part 1 collapses to one length (top share 1.0 > 0.9)
    p = "profile:text_len"
    assert st[(p, 1)]["status"] == "FAIL"
    assert st[(p, 0)]["status"] == "FAIL"  # both spans are length 5 -> top share 1.0
    res2 = run_suite(spark, docs, suite, checkpoint_path=path, run_id="tl1")
    assert res2.verdicts.count() == 0


def test_outlier_kind_tukey_rate_per_partition(spark, tmp_path):
    """'outlier' kind: FAIL a partition whose own-Tukey-fence outlier rate
    exceeds max_outlier_rate; clean partitions PASS; a no-observation
    partition gets the drift family's EmptySeriesError; resume is a noop;
    config survives the JSON round-trip."""
    import sat_val_framework_spark.fixtures as fx

    span = lambda i: ("text", "w", None, i)  # noqa: E731
    rows = (
        # part 0: span counts 2/3 only -> fences [2-1.5, 3+1.5], rate 0
        [(f"a{i}", 0, [span(j) for j in range(2 + i % 2)]) for i in range(10)]
        # part 1: 18 clean docs + 2 docs with 30 spans -> rate 0.1 > 0.05
        + [(f"b{i}", 1, [span(j) for j in range(2 + i % 2)]) for i in range(18)]
        + [(f"B{i}", 1, [span(j) for j in range(30)]) for i in range(2)]
        # part 2: no spans at all -> n_obs = 0 -> typed ERROR
        + [(f"c{i}", 2, None) for i in range(2)]
    )
    docs = spark.createDataFrame(rows, fx.DOCUMENTS_SCHEMA)
    suite = CheckSuite([
        Check("outlier", "n_spans", {"max_outlier_rate": 0.05, "k": 1.5}),
    ])
    suite2 = CheckSuite.from_json(suite.to_json())
    assert suite2.checks == suite.checks

    path = str(tmp_path / "ck")
    res = run_suite(spark, docs, suite2, checkpoint_path=path, run_id="ol1")
    st = {(r["constraint_id"], r["part_id"]): r for r in res.verdicts.collect()}
    cid = "outlier:n_spans"
    assert set(st) == {(cid, 0), (cid, 1), (cid, 2)}
    assert st[(cid, 0)]["status"] == "PASS" and st[(cid, 0)]["violation_count"] == 0
    assert st[(cid, 1)]["status"] == "FAIL" and st[(cid, 1)]["violation_count"] == 2
    assert "outlier_rate=0.1>" in st[(cid, 1)]["sample_violations"][0]
    assert st[(cid, 2)]["status"] == "ERROR"
    assert st[(cid, 2)]["error_kind"] == "EmptySeriesError"
    assert st[(cid, 0)]["rows_scanned"] == 10 and st[(cid, 1)]["rows_scanned"] == 20

    res2 = run_suite(spark, docs, suite2, checkpoint_path=path, run_id="ol1")
    assert res2.verdicts.count() == 0  # ERROR is EmptySeriesError: data-inherent, done


def test_distinct_kind_cardinality_bounds_per_partition(spark, tmp_path):
    """'distinct' kind: FAIL a partition whose distinct count of the column
    is outside [lo, hi] — id collapse AND explosion both flag; approx
    (HLL++) and exact paths agree at these cardinalities; all-NULL
    partition gets the typed EmptySeriesError; resume is a noop; JSON
    round-trip preserves the check."""
    import sat_val_framework_spark.fixtures as fx

    rows = (
        # part 0: healthy — 10 docs, 10 distinct langs ∈ [5, 50]
        [(f"a{i}", 0, f"lang{i}") for i in range(10)]
        # part 1: collapsed — 12 docs all sharing ONE lang (< lo=5)
        + [(f"b{i}", 1, "en") for i in range(12)]
        # part 2: exploded — 60 docs, 60 distinct (> hi=50)
        + [(f"c{i}", 2, f"x{i}") for i in range(60)]
        # part 3: all NULL -> n_obs 0 -> typed ERROR
        + [(f"d{i}", 3, None) for i in range(3)]
    )
    docs = spark.createDataFrame(rows, "doc_id string, part_id int, lang string")
    suite = CheckSuite([Check("distinct", "lang", {"lo": 5, "hi": 50})])
    suite2 = CheckSuite.from_json(suite.to_json())
    assert suite2.checks == suite.checks

    path = str(tmp_path / "ck")
    res = run_suite(spark, docs, suite2, checkpoint_path=path, run_id="dc1")
    st = {r["part_id"]: r for r in res.verdicts.collect()}
    cid = "distinct:lang"
    assert all(r["constraint_id"] == cid for r in st.values()) and len(st) == 4
    assert st[0]["status"] == "PASS" and st[0]["violation_count"] == 0
    assert st[1]["status"] == "FAIL" and "distinct=1<5" in st[1]["sample_violations"][0]
    assert st[2]["status"] == "FAIL" and "distinct=60>50" in st[2]["sample_violations"][0]
    assert st[3]["status"] == "ERROR" and st[3]["error_kind"] == "EmptySeriesError"
    assert st[3]["rows_scanned"] == 3  # rows seen, zero observations

    # exact path agrees on the same data
    res_ex = run_suite(
        spark, docs,
        CheckSuite([Check("distinct", "lang", {"lo": 5, "hi": 50, "approx": False})]),
    )
    ex = {r["part_id"]: r["status"] for r in res_ex.verdicts.collect()}
    assert ex == {p: st[p]["status"] for p in ex}

    res2 = run_suite(spark, docs, suite2, checkpoint_path=path, run_id="dc1")
    assert res2.verdicts.count() == 0  # EmptySeriesError is data-inherent: done


def test_distinct_kind_config_validation(spark, docs):
    errs = lambda ck: [str(e) for e in CheckSuite([ck]).validate(docs)]  # noqa: E731
    assert any("lo/hi" in e for e in errs(Check("distinct", "doc_id", {})))
    assert any("must be numeric" in e
               for e in errs(Check("distinct", "doc_id", {"lo": "5"})))
    assert any("must be numeric" in e
               for e in errs(Check("distinct", "doc_id", {"hi": True})))
    assert any("not in schema" in e
               for e in errs(Check("distinct", "nope", {"lo": 1})))
    assert any("dot-free" in e
               for e in errs(Check("distinct", "spans.kind", {"lo": 1})))
    assert not errs(Check("distinct", "doc_id", {"lo": 1}))        # string col OK
    assert not errs(Check("distinct", "text_len", {"hi": 100}))    # derived OK


def test_outlier_kind_config_validation(spark, docs):
    errs = lambda ck: [str(e) for e in CheckSuite([ck]).validate(docs)]  # noqa: E731
    assert any("max_outlier_rate" in e for e in errs(Check("outlier", "n_spans", {})))
    assert any("max_outlier_rate" in e
               for e in errs(Check("outlier", "n_spans", {"max_outlier_rate": 1.0})))
    assert any("k must be positive" in e
               for e in errs(Check("outlier", "n_spans", {"max_outlier_rate": 0.1, "k": 0})))
    assert any("must be numeric" in e
               for e in errs(Check("outlier", "doc_id", {"max_outlier_rate": 0.1})))
    assert any("not in schema" in e
               for e in errs(Check("outlier", "nope", {"max_outlier_rate": 0.1})))
    assert any("dot-free" in e
               for e in errs(Check("outlier", "spans.kind", {"max_outlier_rate": 0.1})))
    assert not errs(Check("outlier", "n_spans", {"max_outlier_rate": 0.1}))
    assert not errs(Check("outlier", "text_len", {"max_outlier_rate": 0.1}))

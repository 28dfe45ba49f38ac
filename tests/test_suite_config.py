"""B13: suite-config validation returns errors as values
(reference contract implement.py:147-162, errors-as-values implement.py:23-56)."""

import pytest

from sat_val_framework_spark.suite import Check, CheckSuite, SuiteConfigError


def test_valid_suite_returns_no_errors(docs):
    suite = CheckSuite([Check("unique", "doc_id"), Check("stats", "n_spans", {"max_null_rate": 0.0})])
    assert suite.validate(docs) == []


def test_unknown_kind_is_error_value(docs):
    errs = CheckSuite([Check("nope", "doc_id")]).validate(docs)
    assert len(errs) == 1 and isinstance(errs[0], SuiteConfigError)
    assert "unknown check kind" in str(errs[0])


def test_missing_column_is_error_value(docs):
    errs = CheckSuite([Check("stats", "no_such_col")]).validate(docs)
    assert any("not in schema" in str(e) for e in errs)


def test_nested_column_resolves(docs):
    errs = CheckSuite([Check("ref", "spans.media_ref", {"dim_table_alias": "cat"})]).validate(docs)
    assert errs == []


def test_drift_requires_positive_threshold(docs):
    errs = CheckSuite([Check("drift_ks", "n_spans", {"threshold": -1})]).validate(docs)
    assert any("threshold" in str(e) for e in errs)


def test_duplicate_constraint_ids_flagged(docs):
    errs = CheckSuite([Check("unique", "doc_id"), Check("unique", "doc_id")]).validate(docs)
    assert any("duplicate constraint_id" in str(e) for e in errs)


def test_missing_part_col_flagged(docs):
    errs = CheckSuite([Check("unique", "doc_id")]).validate(docs, part_col="nope")
    assert any("partition column" in str(e) for e in errs)


def test_validate_or_raise_raises(docs):
    with pytest.raises(SuiteConfigError):
        CheckSuite([Check("nope")]).validate_or_raise(docs)


def test_suite_json_roundtrip_and_errors(spark, docs):
    import pytest

    from sat_val_framework_spark.runner import DEFAULT_SUITE
    from sat_val_framework_spark.suite import CheckSuite, SuiteConfigError

    back = CheckSuite.from_json(DEFAULT_SUITE.to_json())
    assert back == DEFAULT_SUITE          # dataclass equality: lossless
    assert back.validate(docs) == []

    with pytest.raises(SuiteConfigError):
        CheckSuite.from_json("{not json")
    with pytest.raises(SuiteConfigError):
        CheckSuite.from_json('{"kind": "stats"}')  # object, not array
    with pytest.raises(SuiteConfigError):
        CheckSuite.from_json('[{"column": "x"}]')  # missing kind
    # unknown kinds parse fine and surface through validate (all errors, as values)
    s = CheckSuite.from_json('[{"kind": "nope"}, {"kind": "stats", "column": "missing_col"}]')
    errs = s.validate(docs)
    assert len(errs) == 2


def test_from_json_numeric_column_surfaces_as_config_error(spark, docs):
    from sat_val_framework_spark.suite import CheckSuite

    s = CheckSuite.from_json('[{"kind": "stats", "column": 5}]')
    errs = s.validate(docs)  # must not crash with AttributeError
    assert len(errs) == 1 and "5" in str(errs[0])


def test_drift_on_non_numeric_column_rejected_driver_side(spark, docs):
    """Drift on a string column would fail mid-job with a RETRYABLE error
    verdict that re-runs forever on resume — validate rejects it up front."""
    from sat_val_framework_spark.suite import Check, CheckSuite

    errs = CheckSuite([Check("drift_ks", "doc_id", {"threshold": 0.1})]).validate(docs)
    assert len(errs) == 1 and "must be numeric" in str(errs[0])


def test_quantile_config_rejections(spark, docs):
    """Eager validation closes the run-forever classes found in review:
    dotted columns (constraint-id mismatch + array aggregation), the
    per-span text_len derived series, and non-numeric bounds."""
    from sat_val_framework_spark.suite import Check, CheckSuite

    for params, column, needle in [
        ({"hi": 100}, "spans.offset", "dot-free"),
        ({"lo": "abc"}, "n_spans", "must be numeric"),
    ]:
        errs = CheckSuite([Check("quantile", column, params)]).validate(docs)
        assert len(errs) == 1 and needle in str(errs[0]), (column, errs)
    # both derived series are accepted since r5 (VERDICT r4 #2)
    assert CheckSuite([Check("quantile", "text_len", {"hi": 100})]).validate(docs) == []


def test_composite_unique_constraint_id_canonicalized(docs):
    """ADVICE r3: Check('unique', 'source, doc_id') must produce the SAME
    constraint_id the operator emits ('unique:source,doc_id'), or checkpoint
    resume silently re-runs the check forever."""
    assert Check("unique", "doc_id, part_id").constraint_id == "unique:doc_id,part_id"
    assert Check("unique", " doc_id ,  part_id").constraint_id == "unique:doc_id,part_id"
    # single-key ids unchanged
    assert Check("unique", "doc_id").constraint_id == "unique:doc_id"


def test_composite_unique_id_matches_operator_emission(spark, docs):
    """End-to-end parity: the id in uniqueness_check's verdicts equals the
    whitespace-bearing Check's constraint_id."""
    from sat_val_framework_spark.operators.uniqueness import uniqueness_check

    verdicts, _ = uniqueness_check(docs.limit(50), "doc_id, part_id")
    emitted = {r["constraint_id"] for r in verdicts.select("constraint_id").distinct().collect()}
    assert emitted == {Check("unique", "doc_id, part_id").constraint_id}


def test_profile_text_len_accepted_driver_side(docs):
    """VERDICT r4 #2: profile/quantile on the derived text_len series are
    supported (the runner routes them through the drift family's exploded
    series) — validate must accept them; n_spans stays accepted too."""
    assert CheckSuite([Check("profile", "text_len", {"max_top_share": 0.9})]).validate(docs) == []
    assert CheckSuite([Check("profile", "n_spans", {"max_top_share": 0.9})]).validate(docs) == []
    # round-trip keeps the derived column declarable
    s = CheckSuite([
        Check("quantile", "text_len", {"q": 0.5, "lo": 1, "hi": 100}),
        Check("profile", "text_len", {"max_top_share": 0.9}),
    ])
    rt = CheckSuite.from_json(s.to_json())
    assert [c.constraint_id for c in rt.checks] == [c.constraint_id for c in s.checks]
    assert rt.validate(docs) == []


def test_unique_dotted_components_rejected(docs):
    """Review r4: dotted unique components would make the operator's id
    ('unique:spans.media_ref') diverge from Check.constraint_id's leaf —
    rejected driver-side like the fd kind's dot rule."""
    for col in ("spans.media_ref", "doc_id,spans.kind"):
        errs = CheckSuite([Check("unique", col)]).validate(docs)
        assert len(errs) == 1 and "dot-free" in str(errs[0]), col
    # composite ids never leaf-split (even un-validated ad-hoc use)
    assert Check("unique", "a,b.c").constraint_id == "unique:a,b.c"

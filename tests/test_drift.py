"""B7/B8: KS/PSI drift vs the numpy oracle; only the drifted partition fails."""

import pytest

from sat_val_framework_spark import fixtures as fx
from sat_val_framework_spark import profile
from sat_val_framework_spark.operators.drift import drift_check, drift_scores


@pytest.mark.parametrize("col,series_fn,oracle_ks,oracle_psi", [
    ("n_spans", profile.n_spans_series, "ks_n_spans", "psi_n_spans"),
    ("text_len", profile.text_len_series, "ks_text_len", "psi_text_len"),
])
def test_scores_match_numpy_oracle(docs, baseline, oracle, col, series_fn, oracle_ks, oracle_psi):
    scores = drift_scores(series_fn(docs), baseline, col).toPandas().set_index("part_id")
    for p, ks in oracle[oracle_ks].items():
        assert scores.loc[p, "ks"] == pytest.approx(ks, abs=1e-12)
        assert scores.loc[p, "psi"] == pytest.approx(oracle[oracle_psi][p], abs=1e-9)


@pytest.mark.parametrize("col,series_fn", [
    ("n_spans", profile.n_spans_series),
    ("text_len", profile.text_len_series),
])
def test_only_drifted_partition_fails(docs, baseline, col, series_fn):
    verdicts, _ = drift_check(series_fn(docs), baseline, col)
    v = verdicts.toPandas()
    failed = set(v[v.status == "FAIL"].part_id)
    assert failed == {fx.DRIFT_PART}
    # both statistics emitted for every partition
    assert set(v.constraint_id) == {f"drift_ks:{col}", f"drift_psi:{col}"}
    assert len(v) == 2 * fx.N_PARTS


def test_histogram_stays_tiny(docs, baseline):
    """The Python boundary must see histograms, not rows: the grouped-map
    input is bounded by n_parts * n_bins regardless of document count."""
    from sat_val_framework_spark.operators.drift import baseline_edges, histogram

    series = profile.n_spans_series(docs)
    edges = baseline_edges(baseline, "n_spans")
    h = histogram(series, edges)
    assert h.count() <= fx.N_PARTS * fx.N_BINS

"""Fused three-scan suite must emit verdicts identical to the modular
operator-by-operator runner on the seeded fixture."""

from sat_val_framework_spark.fused import run_suite_fused
from sat_val_framework_spark.runner import DEFAULT_SUITE, run_suite


def _key(rows):
    return {
        (r["constraint_id"], r["part_id"]): (
            r["status"],
            r["rows_scanned"],
            r["violation_count"],
            tuple(r["sample_violations"] or []),
        )
        for r in rows
    }


def test_fused_matches_modular(spark, docs, catalog, baseline):
    modular = run_suite(
        spark, docs, DEFAULT_SUITE, catalog=catalog, baseline=baseline
    ).verdicts.collect()
    fused = run_suite_fused(spark, docs, catalog, baseline).collect()
    mk, fk = _key(modular), _key(fused)
    assert set(mk) == set(fk)
    for k in mk:
        assert mk[k] == fk[k], (k, mk[k], fk[k])


def test_fused_checkpoint_resume(spark, docs, catalog, baseline, tmp_path):
    """Fused path resumes like the modular one: full run -> rerun is a noop;
    half-deleted checkpoint -> only missing pairs recompute, final identical."""
    from pyspark.sql import functions as F

    from sat_val_framework_spark import checkpoint as ckpt

    path = str(tmp_path / "fckpt")
    kw = dict(checkpoint_path=path, run_id="fr1")
    run_suite_fused(spark, docs, catalog, baseline, **kw)
    full = _key(ckpt.read_checkpoint(spark, path).collect())
    assert len(full) > 0

    again = run_suite_fused(spark, docs, catalog, baseline, **kw)
    assert again.count() == 0  # noop resume

    kept_rows = ckpt.read_checkpoint(spark, path).filter(F.col("part_id") < 8).collect()
    import shutil

    shutil.rmtree(path)
    spark.createDataFrame(kept_rows, ckpt.VERDICT_SCHEMA).write.parquet(path)
    recomputed = run_suite_fused(spark, docs, catalog, baseline, **kw)
    rec = _key(recomputed.collect())
    assert rec and all(p >= 8 for (_, p) in rec)
    final = _key(ckpt.read_checkpoint(spark, path).collect())
    assert final == full


def test_fused_shares_pass_results(spark, docs, catalog, baseline):
    """The wide per-pass aggregates are persisted so every verdict family
    reads the shared result instead of re-expanding the scan subtree."""
    verdicts = run_suite_fused(spark, docs, catalog, baseline)
    plan = verdicts._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan

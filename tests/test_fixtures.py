"""Generator determinism + Spark/pandas parity (FIXTURES.md §6)."""

from sat_val_framework_spark import fixtures as fx


def test_same_seed_identical_frames(spark):
    a = fx.documents_df(spark, 300).orderBy("doc_id", "part_id").collect()
    b = fx.documents_df(spark, 300).orderBy("doc_id", "part_id").collect()
    assert a == b


def test_spark_matches_pandas_oracle(spark):
    sp = fx.documents_df(spark, 300).orderBy("doc_id", "part_id").toPandas()
    pdf = fx.documents_pandas(300).sort_values(["doc_id", "part_id"]).reset_index(drop=True)
    assert len(sp) == len(pdf) == 300
    for a, b in zip(sp.to_dict("records"), pdf.to_dict("records")):
        assert a["doc_id"] == b["doc_id"]
        assert a["part_id"] == b["part_id"]
        sa = None if a["spans"] is None else [dict(s) for s in a["spans"]]
        assert sa == b["spans"], a["doc_id"]


def test_violations_are_injected(docs_pd):
    # duplicates exist
    counts = docs_pd.groupby("doc_id").size()
    assert (counts > 1).any()
    # null-span docs exist
    assert docs_pd.spans.isna().any()
    # dangling refs exist
    assert any(
        s["kind"] != "text" and s["media_ref"].startswith("m-missing-")
        for spans in docs_pd.spans.dropna()
        for s in spans
    )


def test_offsets_strictly_increasing(docs_pd):
    for spans in docs_pd.spans.dropna():
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)


def test_media_catalog_unique_and_covering(spark, catalog):
    rows = catalog.collect()
    refs = [r["media_ref"] for r in rows]
    assert len(refs) == len(set(refs)) == fx.N_MEDIA


def test_baseline_fracs_sum_to_one(baseline):
    sums = {r["col_name"]: r["s"] for r in
            baseline.groupBy("col_name").agg({"ref_frac": "sum"}).withColumnRenamed("sum(ref_frac)", "s").collect()}
    assert abs(sums["n_spans"] - 1.0) < 1e-9
    assert abs(sums["text_len"] - 1.0) < 1e-9

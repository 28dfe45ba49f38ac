"""Structured Streaming QC: micro-batched files drive the same per-partition
verdicts as the batch path."""

import pytest
from pyspark.sql import functions as F

from sat_val_framework_spark import fixtures as fx
from sat_val_framework_spark.streaming import streaming_schema_assert, streaming_stats


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream")
    path = str(d / "docs")
    # several files so maxFilesPerTrigger yields multiple micro-batches
    fx.documents_df(spark, 2000).repartition(6).write.parquet(path)
    return path


def test_streaming_schema_assert_matches_batch(spark, stream_dir):
    q = streaming_schema_assert(spark, stream_dir, query_name="t_schema")
    q.processAllAvailable()
    q.stop()
    got = {r["part_id"]: (r["status"], r["violation_count"]) for r in spark.table("t_schema").collect()}
    batch = fx.documents_df(spark, 2000).groupBy("part_id").agg(
        F.sum(F.col("spans").isNull().cast("long")).alias("v")
    )
    exp = {r["part_id"]: ("FAIL" if r["v"] > 0 else "PASS", r["v"]) for r in batch.collect()}
    assert got == exp


def test_streaming_stats_matches_batch(spark, stream_dir):
    q = streaming_stats(spark, stream_dir, query_name="t_stats")
    q.processAllAvailable()
    q.stop()
    got = {
        r["part_id"]: (r["rows_scanned"], r["null_count"], r["min_val"], r["max_val"])
        for r in spark.table("t_stats").collect()
    }
    n_spans = F.when(F.col("spans").isNull(), F.lit(None).cast("int")).otherwise(F.size("spans"))
    batch = (
        fx.documents_df(spark, 2000)
        .select("part_id", n_spans.alias("ns"))
        .groupBy("part_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("ns").isNull().cast("long")).alias("nulls"),
            F.min("ns").alias("mn"),
            F.max("ns").alias("mx"),
        )
    )
    exp = {r["part_id"]: (r["n"], r["nulls"], r["mn"], r["mx"]) for r in batch.collect()}
    assert got == exp


def test_streaming_drift_scores_batches(spark, stream_dir, tmp_path, baseline):
    from sat_val_framework_spark.streaming import streaming_drift

    sink = str(tmp_path / "drift_sink")
    q = streaming_drift(spark, stream_dir, baseline, sink, column="n_spans")
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(sink)
    assert rows.count() > 0
    got = rows.toPandas()
    assert {"constraint_id", "part_id", "status", "epoch_id"} <= set(got.columns)
    # per-batch drift: the drifted partition fails in at least one batch;
    # clean partitions may be noisy in tiny batches, so just assert the
    # drifted one is caught and statuses are well-formed
    import sat_val_framework_spark.fixtures as fx

    drifted = got[(got.part_id == fx.DRIFT_PART) & (got.constraint_id == "drift_psi:n_spans")]
    assert (drifted.status == "FAIL").any()
    assert set(got.status) <= {"PASS", "FAIL"}
    # stats selection: only the requested siblings emit (no made-up EMD rows)
    assert set(got.constraint_id) == {"drift_ks:n_spans", "drift_psi:n_spans"}


def test_streaming_drift_emd_stat_passthrough(spark, stream_dir, tmp_path, baseline):
    """The EMD sibling flows through the streaming wrapper: same kernel,
    same per-epoch semantics, and the drifted partition (+4 spans shift =
    EMD ~4 bins) fails the 1.0-bin threshold in at least one batch."""
    import sat_val_framework_spark.fixtures as fx
    from sat_val_framework_spark.streaming import streaming_drift

    sink = str(tmp_path / "emd_sink")
    q = streaming_drift(spark, stream_dir, baseline, sink, column="n_spans", stats=("emd",))
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(sink).toPandas()
    assert set(got.constraint_id) == {"drift_emd:n_spans"}
    drifted = got[got.part_id == fx.DRIFT_PART]
    assert (drifted.status == "FAIL").any()


def test_streaming_foreach_batch_checkpoints(spark, stream_dir, tmp_path):
    sink = str(tmp_path / "verdict_sink")
    q = streaming_schema_assert(
        spark, stream_dir, query_name="t_fb", foreach_batch_path=sink
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(sink)
    assert rows.count() > 0
    assert {"constraint_id", "part_id", "status", "epoch_id"} <= set(rows.columns)


def test_streaming_sessionize_matches_batch_closed_sessions(spark, tmp_path):
    """Stateful streaming sessionization == batch sessionize for every
    CLOSED session, including sessions spanning micro-batch boundaries (the
    still-open last session per user stays in state by design)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from sat_val_framework_spark.functions.asof import sessionize
    from sat_val_framework_spark.streaming.session_stream import streaming_sessionize

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    # NON-UTC on purpose: ts is TIMESTAMP_NTZ end-to-end (input parquet,
    # state, output schema), so stream==batch must hold in ANY session TZ —
    # the ADVICE r2 fragility was an NTZ->TIMESTAMP cast inside the operator
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        base = pd.Timestamp("2024-03-01 00:00:00")
        rows = []
        for u in range(6):
            t = base + pd.Timedelta(minutes=u)
            for s in range(3):  # 3 sessions per user
                for i in range(4):  # 4 events each, 5 min apart (< 30min gap)
                    rows.append((u, t.to_pydatetime()))
                    t += pd.Timedelta(minutes=5)
                t += pd.Timedelta(minutes=45)  # gap > 30 min closes the session
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz").orderBy("ts")
        # feed in 3 time-ordered files so sessions span micro-batches
        src = str(tmp_path / "sess_src")
        # slice as python rows with an explicit NTZ schema: a pandas
        # round-trip without one would infer TIMESTAMP and localize the
        # naive datetimes through the (deliberately non-UTC) session TZ
        srows = sorted(((r["user_id"], r["ts"]) for r in ev.collect()), key=lambda x: x[1])
        n = len(srows)
        import os

        os.makedirs(src, exist_ok=True)
        for i, chunk in enumerate([srows[: n // 3], srows[n // 3 : 2 * n // 3], srows[2 * n // 3 :]]):
            spark.createDataFrame(chunk, "user_id long, ts timestamp_ntz").coalesce(1).write.mode(
                "overwrite"
            ).parquet(f"{src}/f{i}")
        # stream each file dir in order through ONE query via a glob source
        flat = str(tmp_path / "sess_flat")
        os.makedirs(flat, exist_ok=True)
        import glob
        import shutil

        import time as _time

        now = _time.time()
        for i in range(3):
            part = glob.glob(f"{src}/f{i}/part-*.parquet")[0]
            dst = f"{flat}/{i:02d}.parquet"
            shutil.copy(part, dst)
            # the file source orders by modification time: pin strictly
            # increasing mtimes so micro-batches arrive in event-time order
            os.utime(dst, (now + i * 10, now + i * 10))
        q = streaming_sessionize(spark, flat, ev.schema, gap_seconds=1800, query_name="sess_t")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r["user_id"], r["session_seq"]): (r["n_events"], r["session_start"], r["session_end"])
            for r in spark.table("sess_t").collect()
        }
        batch = (
            sessionize(ev, key="user_id", ts="ts", gap_seconds=1800)
            .groupBy("user_id", "session_seq")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.min("ts").alias("session_start"),
                F.max("ts").alias("session_end"),
            )
        )
        last_seq = {r["user_id"]: r["m"] for r in batch.groupBy("user_id").agg(F.max("session_seq").alias("m")).collect()}
        expected = {
            (r["user_id"], r["session_seq"]): (r["n_events"], r["session_start"], r["session_end"])
            for r in batch.collect()
            if r["session_seq"] < last_seq[r["user_id"]]  # open sessions stay in state
        }
        assert got == expected and len(expected) == 6 * 2  # 2 closed sessions/user
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_streaming_profile_matches_batch_and_catches_degeneracy(spark, stream_dir, tmp_path):
    """Per-micro-batch profile constraint: healthy stream batches PASS; a
    degenerate batch (column collapsed to a constant) FAILS within its own
    epoch; verdict rows reuse the batch profile_check semantics."""
    from sat_val_framework_spark.streaming.profile_stream import streaming_profile

    sink = str(tmp_path / "profile_sink")
    q = streaming_profile(spark, stream_dir, sink, column="n_spans")
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(sink).collect()
    assert rows and all(r["constraint_id"] == "profile:n_spans" for r in rows)
    assert all(r["status"] == "PASS" for r in rows)  # healthy fixture
    assert {"epoch_id"} <= set(spark.read.parquet(sink).columns)

    # degenerate stream: every doc collapsed to ONE span
    bad_dir = str(tmp_path / "bad_docs")
    bad = fx.documents_df(spark, 500, n_parts=2).withColumn(
        "spans", F.when(F.col("spans").isNotNull(), F.slice("spans", 1, 1))
    )
    bad.coalesce(1).write.parquet(bad_dir)
    sink2 = str(tmp_path / "profile_sink2")
    q2 = streaming_profile(spark, bad_dir, sink2, column="n_spans")
    q2.processAllAvailable()
    q2.stop()
    rows2 = spark.read.parquet(sink2).collect()
    assert rows2 and all(r["status"] == "FAIL" for r in rows2)
    assert all(any(s.startswith("top_share=1.0>") for s in r["sample_violations"]) for r in rows2)


def test_streaming_contamination_catches_leak_per_epoch(spark, tmp_path):
    """A leaked reference doc arriving mid-stream is flagged in its own
    micro-batch; clean batches append nothing; semantics == the batch
    cross_contamination composition."""
    from sat_val_framework_spark.streaming import streaming_contamination

    schema = "doc_id long, text string"
    reference = spark.createDataFrame(
        [(900, "held out benchmark question about rivers and mountains"),
         (901, "another eval item regarding oceans and tides today")],
        schema,
    )
    src = str(tmp_path / "incoming")
    clean = spark.createDataFrame(
        [(1, "ordinary web document about cooking pasta at home"),
         (2, "release notes for a software project version two")], schema)
    leaky = spark.createDataFrame(
        [(3, "held out benchmark question about rivers and mountains"),
         (4, "yet another unremarkable training document here")], schema)
    clean.coalesce(1).write.mode("append").parquet(src)
    leaky.coalesce(1).write.mode("append").parquet(src)

    sink = str(tmp_path / "contamination_sink")
    q = streaming_contamination(
        spark, src, reference, sink, spark.createDataFrame([], schema).schema,
        threshold=0.8, max_files=1,
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(sink).collect()
    assert [(r["a_id"], r["b_id"]) for r in rows] == [("3", "900")]
    assert rows[0]["jaccard"] == 1.0


def test_streaming_categorical_drift_monitor(spark, stream_dir, tmp_path, baseline_cat):
    """Per-epoch categorical drift vs the configured kind baseline: the
    clean fixture passes every partition each epoch; a degenerate batch
    (all-image spans) fails in ITS epoch."""
    from sat_val_framework_spark.streaming import streaming_categorical_drift

    sink = str(tmp_path / "cat_sink")
    q = streaming_categorical_drift(
        spark, stream_dir, baseline_cat, sink, column="kind", tv_threshold=0.1
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(sink)
    assert rows.count() > 0
    assert {r["constraint_id"] for r in rows.select("constraint_id").distinct().collect()} == {
        "drift_categorical:kind"
    }
    assert {r["status"] for r in rows.select("status").distinct().collect()} == {"PASS"}

    # degenerate batch: every span collapses to 'image' -> tv vs 0.7/0.1/0.2
    # baseline = 0.9 -> FAIL in its epoch
    bad_dir = str(tmp_path / "bad_docs")
    bad = fx.documents_df(spark, 400).withColumn(
        "spans",
        F.transform(
            F.col("spans"),
            lambda s: F.struct(
                F.lit("image").alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    bad.coalesce(1).write.parquet(bad_dir)
    sink2 = str(tmp_path / "cat_sink2")
    q2 = streaming_categorical_drift(
        spark, bad_dir, baseline_cat, sink2, column="kind", tv_threshold=0.1
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(sink2)
    st = {r["part_id"]: r["status"] for r in got.collect()}
    assert st and all(s == "FAIL" for s in st.values())


def test_streaming_ngram_decontam_matches_batch(spark, tmp_path):
    """Streaming exact n-gram decontamination (last suite kind without a
    streaming twin): a doc quoting a reference 5-gram is flagged in ITS
    micro-batch with the same n_hits the batch operator reports; clean
    batches append nothing; cumulative stream output == batch ngram_hits
    on the union of all batches (per-doc operator, no cross-batch state)."""
    from sat_val_framework_spark.functions.dedup import ngram_hits
    from sat_val_framework_spark.streaming import streaming_ngram_decontam

    schema = "doc_id long, text string"
    reference = spark.createDataFrame(
        [(900, "the quick brown fox jumps over the lazy dog"),
         (901, "a held out benchmark item about tides")],
        schema,
    )
    src = str(tmp_path / "incoming_ng")
    clean = spark.createDataFrame(
        [(1, "ordinary web document about cooking pasta at home"),
         (2, "release notes for a software project version two")], schema)
    # doc 3 quotes a verbatim 5-gram span of ref 900 inside unrelated text
    leaky = spark.createDataFrame(
        [(3, "he said the quick brown fox jumps over and ran away"),
         (4, "yet another unremarkable training document here")], schema)
    clean.coalesce(1).write.mode("append").parquet(src)
    leaky.coalesce(1).write.mode("append").parquet(src)

    sink = str(tmp_path / "ngram_sink")
    q = streaming_ngram_decontam(
        spark, src, reference, sink,
        spark.createDataFrame([], schema).schema, n=5, max_files=1,
    )
    q.processAllAvailable()
    q.stop()
    rows = spark.read.parquet(sink).collect()
    assert [r["doc_id"] for r in rows] == [3]

    # cumulative stream == batch operator on the union of all batches
    batch = {
        (r["doc_id"], r["n_hits"])
        for r in ngram_hits(clean.union(leaky), reference, n=5)
        .filter("n_hits > 0").collect()
    }
    assert {(r["doc_id"], r["n_hits"]) for r in rows} == batch


def test_streaming_distinct_monitor(spark, tmp_path):
    """Per-epoch distinct-count verdicts == the batch distinct_bound_check
    on the same rows (one code path); the collapsed partition FAILs in its
    epoch, the healthy one PASSes, the span-less one gets the typed ERROR."""
    from sat_val_framework_spark.operators.stats import distinct_bound_check
    from sat_val_framework_spark.profile import with_n_spans
    from sat_val_framework_spark.streaming import streaming_distinct

    span = lambda i: ("text", "w", None, i)  # noqa: E731
    rows = (
        # part 0: span counts 2/3 only -> 2 distinct < lo=3 -> FAIL
        [(f"a{i}", 0, [span(j) for j in range(2 + i % 2)]) for i in range(10)]
        # part 1: counts 2/3/30 -> 3 distinct -> PASS
        + [(f"b{i}", 1, [span(j) for j in range(2 + i % 2)]) for i in range(18)]
        + [(f"B{i}", 1, [span(j) for j in range(30)]) for i in range(2)]
        # part 2: no spans -> zero observations -> typed ERROR
        + [(f"c{i}", 2, None) for i in range(2)]
    )
    docs = spark.createDataFrame(rows, fx.DOCUMENTS_SCHEMA)
    in_dir = str(tmp_path / "docs_in")
    docs.coalesce(1).write.parquet(in_dir)

    sink = str(tmp_path / "distinct_sink")
    q = streaming_distinct(spark, in_dir, sink, column="n_spans", lo=3, approx=False)
    q.processAllAvailable()
    q.stop()

    got = {r["part_id"]: r for r in spark.read.parquet(sink).collect()}
    assert got[0]["status"] == "FAIL" and "distinct=2<3" in got[0]["sample_violations"][0]
    assert got[1]["status"] == "PASS"
    assert got[2]["status"] == "ERROR" and got[2]["error_kind"] == "EmptySeriesError"

    batch = {
        r["part_id"]: r
        for r in distinct_bound_check(
            with_n_spans(docs), "n_spans", lo=3, approx=False
        ).collect()
    }
    for p, r in got.items():
        for f in ("constraint_id", "status", "rows_scanned", "violation_count",
                  "sample_violations", "error_kind"):
            assert r[f] == batch[p][f], (p, f)


def test_streaming_outlier_monitor(spark, tmp_path):
    """Per-epoch Tukey outlier-rate verdicts == the batch outlier_check on
    the same rows (one code path); the injected-tail partition FAILs in its
    epoch, the clean one PASSes, the span-less one gets the typed ERROR."""
    from sat_val_framework_spark.operators.stats import outlier_check
    from sat_val_framework_spark.profile import with_n_spans
    from sat_val_framework_spark.streaming import streaming_outlier

    span = lambda i: ("text", "w", None, i)  # noqa: E731
    rows = (
        [(f"a{i}", 0, [span(j) for j in range(2 + i % 2)]) for i in range(10)]
        + [(f"b{i}", 1, [span(j) for j in range(2 + i % 2)]) for i in range(18)]
        + [(f"B{i}", 1, [span(j) for j in range(30)]) for i in range(2)]
        + [(f"c{i}", 2, None) for i in range(2)]
    )
    docs = spark.createDataFrame(rows, fx.DOCUMENTS_SCHEMA)
    in_dir = str(tmp_path / "docs_in")
    docs.coalesce(1).write.parquet(in_dir)

    sink = str(tmp_path / "outlier_sink")
    q = streaming_outlier(spark, in_dir, sink, column="n_spans", max_outlier_rate=0.05)
    q.processAllAvailable()
    q.stop()

    got = {r["part_id"]: r for r in spark.read.parquet(sink).collect()}
    assert got[0]["status"] == "PASS"
    assert got[1]["status"] == "FAIL" and got[1]["violation_count"] == 2
    assert got[2]["status"] == "ERROR" and got[2]["error_kind"] == "EmptySeriesError"

    # one code path: the streamed verdicts equal the batch operator's
    batch = {
        r["part_id"]: r
        for r in outlier_check(
            with_n_spans(docs), "n_spans", max_outlier_rate=0.05
        ).collect()
    }
    for p, r in got.items():
        for f in ("constraint_id", "status", "rows_scanned", "violation_count",
                  "sample_violations", "error_kind"):
            assert r[f] == batch[p][f], (p, f)


def test_streaming_span_grammar_monitor(spark, tmp_path):
    """Per-epoch span-grammar verdicts == the batch span_grammar_check on
    the same rows (one code path): the clean epoch PASSes, the epoch whose
    ingest regressed (unknown kind, ref-less media span, shuffled offsets)
    FAILs with per-doc rule annotations."""
    from sat_val_framework_spark.operators.span_grammar import span_grammar_check
    from sat_val_framework_spark.streaming import streaming_span_grammar

    clean = [
        (f"a{i}", 0, [("text", "w", None, 0), ("image", None, "m-1", 1)])
        for i in range(8)
    ]
    broken = (
        [(f"b{i}", 0, [("video", None, "m-2", 0)]) for i in range(2)]
        + [(f"c{i}", 1, [("image", None, None, 0)]) for i in range(2)]
        + [(f"d{i}", 1, [("text", "w", None, 3), ("text", "w", None, 1)]) for i in range(2)]
        + [(f"e{i}", 1, [("text", "w", None, 0)]) for i in range(4)]
    )
    in_dir = tmp_path / "sg_in"
    in_dir.mkdir()
    df_clean = spark.createDataFrame(clean, fx.DOCUMENTS_SCHEMA)
    df_broken = spark.createDataFrame(broken, fx.DOCUMENTS_SCHEMA)
    df_clean.coalesce(1).write.parquet(str(in_dir / "f0"))
    df_broken.coalesce(1).write.parquet(str(in_dir / "f1"))

    sink = str(tmp_path / "sg_sink")
    q = streaming_span_grammar(
        spark, str(in_dir / "*"), sink, ["text", "image", "audio"], max_files=1
    )
    q.processAllAvailable()
    q.stop()

    out = spark.read.parquet(sink).collect()
    # one epoch per file -> (epoch, part) verdicts; epochs arrive in either
    # order, so key by the verdict content instead of epoch_id
    by_docs = {}
    for r in out:
        by_docs[(r["part_id"], r["rows_scanned"])] = r
    clean_v = by_docs[(0, 8)]
    assert clean_v["status"] == "PASS" and clean_v["violation_count"] == 0
    bad0 = by_docs[(0, 2)]
    assert bad0["status"] == "FAIL" and bad0["violation_count"] == 2
    assert "b0:bad_kind" in bad0["sample_violations"]
    bad1 = by_docs[(1, 8)]
    assert bad1["status"] == "FAIL" and bad1["violation_count"] == 4
    assert "c0:bad_media" in bad1["sample_violations"]
    assert "d0:bad_order" in bad1["sample_violations"]

    # field-equal to the batch operator on each epoch's rows
    for df, keys in ((df_clean, [(0, 8)]), (df_broken, [(0, 2), (1, 8)])):
        batch = {
            r["part_id"]: r
            for r in span_grammar_check(df, ["text", "image", "audio"]).collect()
        }
        for p, n in keys:
            got = by_docs[(p, n)]
            for f in ("constraint_id", "status", "rows_scanned",
                      "violation_count", "sample_violations"):
                assert got[f] == batch[p][f], (p, f)

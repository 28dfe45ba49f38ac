"""Stateful streaming near-dup LSH: candidate pairs spanning micro-batches
are still found (state = band buckets), and the cumulative stream output
equals the batch lsh_candidate_pairs on the union of all batches."""

import pytest
from pyspark.sql import functions as F

from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA
from sat_val_framework_spark.functions import dedup
from sat_val_framework_spark.streaming import streaming_neardup


def _doc(doc_id, part_id, text):
    return (doc_id, part_id, [{"kind": "text", "text": text, "media_ref": None, "offset": 0}])


def _words(i):
    return " ".join(f"w{(i * 97 + j * 31 + i * j) % 5000}" for j in range(30))


@pytest.fixture(scope="module")
def nd_stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ndstream") / "docs")
    # batch 1: distinct docs + one doc whose near-dup arrives in batch 2
    b1 = [_doc(f"a{i:02d}", 0, _words(i)) for i in range(8)]
    b2 = [_doc(f"b{i:02d}", 1, _words(i + 100)) for i in range(6)] + [
        _doc("b99", 1, _words(3) + " extra")  # near-dup of a03, cross-batch
    ]
    spark.createDataFrame(b1, DOCUMENTS_SCHEMA).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(b2, DOCUMENTS_SCHEMA).coalesce(1).write.mode("append").parquet(d)
    return d


def test_streaming_neardup_equals_batch(spark, nd_stream_dir):
    q = streaming_neardup(spark, nd_stream_dir, query_name="t_nd", max_files=1)
    q.processAllAvailable()
    q.stop()
    got = {(r["doc_a"], r["doc_b"]) for r in spark.table("t_nd").collect()}

    docs = spark.read.parquet(nd_stream_dir)
    text = F.concat_ws(
        " ",
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == "text"), lambda s: s["text"]
        ),
    )
    flat = docs.select("doc_id", text.alias("text")).where(F.trim("text") != "")
    sigs = dedup.minhash_signature(flat, k=12)
    expected = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(sigs, 4, 3).collect()
    }
    assert got == expected
    assert ("a03", "b99") in got  # the cross-batch near-dup pair


def test_streaming_signature_col_matches_batch_signature(spark):
    """minhash_signature_col (per-row projection, streaming path) must be
    value-identical to minhash_signature (explode+agg, batch path)."""
    rows = [(f"d{i}", _words(i)) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    agg = {r["doc_id"]: list(r["minhash"]) for r in dedup.minhash_signature(df, k=12).collect()}
    col = {
        r["doc_id"]: list(r["sig"])
        for r in df.select(
            "doc_id", dedup.minhash_signature_col(F.col("text"), k=12).alias("sig")
        ).collect()
    }
    assert agg == col


def test_streaming_neardup_bucket_cap_bounds_state(spark, tmp_path):
    """A boilerplate family larger than the cap: later members pair only
    with the hub (state never exceeds the cap), distinct docs unaffected."""
    d = str(tmp_path / "capstream")
    boiler = "error page not found please try again later contact support"
    fam1 = [_doc(f"f{i:02d}", 0, boiler) for i in range(4)]
    fam2 = [_doc(f"f{i:02d}", 0, boiler) for i in range(4, 8)] + [
        _doc("z1", 0, _words(1)), _doc("z2", 0, _words(1) + " extra")
    ]
    from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA as S
    spark.createDataFrame(fam1, S).coalesce(1).write.mode("append").parquet(d)
    spark.createDataFrame(fam2, S).coalesce(1).write.mode("append").parquet(d)
    q = streaming_neardup(spark, d, query_name="t_ndcap", max_files=1, max_bucket_size=3)
    q.processAllAvailable()
    q.stop()
    pairs = {(r["doc_a"], r["doc_b"]) for r in spark.table("t_ndcap").collect()}
    fam_pairs = {(a, b) for a, b in pairs if a.startswith("f")}
    # members f00..f02 fill the bucket (all-pairs among them); f03..f07
    # arrive at a full bucket and pair ONLY with the hub f00
    assert {(a, b) for a, b in fam_pairs if a in ("f01", "f02") and b in ("f01", "f02")} == {("f01", "f02")}
    for late in ("f03", "f04", "f05", "f06", "f07"):
        assert ("f00", late) in fam_pairs
        assert not any(a == late or (b == late and a != "f00") for a, b in fam_pairs)
    # the genuine near-dup pair outside the family is still found
    assert ("z1", "z2") in pairs


def test_streaming_neardup_parquet_sink(spark, nd_stream_dir, tmp_path):
    """Advice r4: sink_path writes pairs to parquet (executor-side, no
    driver accumulation) — same cumulative pair set as the memory sink."""
    sink = str(tmp_path / "nd_pairs")
    q = streaming_neardup(
        spark, nd_stream_dir, query_name="t_nd_pq", max_files=1, sink_path=sink
    )
    q.processAllAvailable()
    q.stop()
    got = {(r["doc_a"], r["doc_b"]) for r in spark.read.parquet(sink).collect()}
    docs = spark.read.parquet(nd_stream_dir)
    text = F.concat_ws(
        " ",
        F.transform(
            F.filter(F.col("spans"), lambda s: s["kind"] == "text"), lambda s: s["text"]
        ),
    )
    flat = docs.select("doc_id", text.alias("text")).where(F.trim("text") != "")
    expected = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(dedup.minhash_signature(flat, k=12), 4, 3).collect()
    }
    assert got == expected

"""Incremental near-dup: an ingest batch dedups against a persisted
(doc_id, band_id, band_key) signature index without rescanning the corpus
text. Equivalence oracle: incremental pairs == full-batch LSH pairs
restricted to the cross/within-batch subsets."""

import pytest
from pyspark.sql import functions as F

from sat_val_framework_spark.functions.dedup import (
    banded_signatures,
    incremental_neardup_pairs,
    lsh_candidate_pairs,
    minhash_signature,
    oversized_buckets,
)

BASE = "the quick brown fox jumps over the lazy dog near the quiet river bank today"


def _docs(spark, items):
    return spark.createDataFrame(items, "doc_id string, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    """Near-dup families spanning the old/new split plus unique docs."""
    rows = []
    for i in range(6):  # family A: identical text -> same signature
        rows.append((f"a{i}", BASE))
    for i in range(4):  # family B: one-word variants, still near-dup
        rows.append((f"b{i}", BASE.replace("fox", f"fox{i % 2}")))
    for i in range(8):  # unique docs
        rows.append((f"u{i}", f"wholly distinct document number {i} " * 3 + f"tail {i}"))
    return rows


def _split(rows):
    old = [r for j, r in enumerate(rows) if j % 2 == 0]
    new = [r for j, r in enumerate(rows) if j % 2 == 1]
    return old, new


def test_incremental_equals_full_batch_restriction(spark, corpus):
    old_rows, new_rows = _split(corpus)
    old, new = _docs(spark, old_rows), _docs(spark, new_rows)
    store = banded_signatures(minhash_signature(old, k=12), 4, 3)
    nvo, nvn, banded_new = incremental_neardup_pairs(new, store)

    all_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            minhash_signature(_docs(spark, corpus), k=12), 4, 3
        ).collect()
    }
    new_ids = {d for d, _ in new_rows}
    want_cross = {
        tuple(sorted(p)) for p in all_pairs if len({p[0], p[1]} & new_ids) == 1
    }
    got_cross = {
        tuple(sorted((r["doc_new"], r["doc_old"]))) for r in nvo.collect()
    }
    assert got_cross == want_cross and got_cross  # non-vacuous

    want_within = {p for p in all_pairs if set(p) <= new_ids}
    got_within = {(r["doc_a"], r["doc_b"]) for r in nvn.collect()}
    assert got_within == want_within

    # the returned banded rows ARE the store increment: appending them and
    # ingesting a second batch reproduces the full-batch restriction again
    batch2_rows = [("z0", BASE), ("z1", "another unique z text " * 4)]
    store2 = store.unionByName(banded_new)
    nvo2, _, _ = incremental_neardup_pairs(_docs(spark, batch2_rows), store2)
    got2 = {tuple(sorted((r["doc_new"], r["doc_old"]))) for r in nvo2.collect()}
    all2 = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(
            minhash_signature(_docs(spark, corpus + batch2_rows), k=12), 4, 3
        ).collect()
    }
    z_ids = {"z0", "z1"}
    want2 = {tuple(sorted(p)) for p in all2 if len(set(p) & z_ids) == 1}
    assert got2 == want2 and ("a0", "z0") in got2


def test_reingest_same_doc_id_never_self_pairs(spark):
    rows = [("x0", BASE), ("x1", BASE)]
    old = _docs(spark, rows)
    store = banded_signatures(minhash_signature(old, k=12), 4, 3)
    # re-ingest x0 (same id, same text): pairs with x1 but not itself
    nvo, _, _ = incremental_neardup_pairs(_docs(spark, [("x0", BASE)]), store)
    got = {(r["doc_new"], r["doc_old"]) for r in nvo.collect()}
    assert got == {("x0", "x1")}


def test_store_bucket_cap_prunes_to_hub(spark):
    """An oversized STORE bucket (template family accumulated over many
    batches) pairs each new doc with the family hub only; the audit frame
    reports exactly that bucket."""
    family = [(f"t{i}", BASE) for i in range(5)]  # one family, all buckets size 5
    store = banded_signatures(minhash_signature(_docs(spark, family), k=12), 4, 3)
    new = _docs(spark, [("n0", BASE)])
    nvo, _, _ = incremental_neardup_pairs(new, store, max_bucket_size=3)
    got = {(r["doc_new"], r["doc_old"]) for r in nvo.collect()}
    assert got == {("n0", "t0")}  # hub = min doc_id
    audit = oversized_buckets(store, ["band_id", "band_key"], 3).collect()
    assert len(audit) == 4 and all(r["bucket_size"] == 5 for r in audit)
    # under the cap nothing degrades
    nvo_uncapped, _, _ = incremental_neardup_pairs(new, store, max_bucket_size=5)
    assert nvo_uncapped.count() == 5


def test_incremental_join_keeps_batch_side_small(spark, corpus):
    """Plan shape: the batch-vs-store join must not shuffle by recomputing
    signatures of the store (the index is consumed as-is — no md5/shingle
    work on the store side)."""
    old_rows, new_rows = _split(corpus)
    store = banded_signatures(
        minhash_signature(_docs(spark, old_rows), k=12), 4, 3
    )
    # persist the index like production would, then read it back
    import tempfile

    path = tempfile.mkdtemp() + "/store"
    store.write.parquet(path)
    nvo, _, _ = incremental_neardup_pairs(
        _docs(spark, new_rows), spark.read.parquet(path)
    )
    plan = nvo._jdf.queryExecution().executedPlan().toString()
    # exactly one side computes signatures (one 'md5' family per plan leg);
    # the store leg is a bare parquet scan of the three index columns
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln and "store" in ln]
    assert scans and "band_key" in scans[0]
    assert "md5" not in scans[0]


def test_store_join_never_smj_in_broadcast_mode(spark, corpus):
    """The batch side has no size stats (it comes out of an aggregate), so
    without the explicit broadcast Catalyst would SMJ-shuffle the
    corpus-sized index every batch; batch_broadcast=False is the
    documented fallback and is allowed to shuffle."""
    old_rows, new_rows = _split(corpus)
    store = banded_signatures(minhash_signature(_docs(spark, old_rows), k=12), 4, 3)
    nvo, _, _ = incremental_neardup_pairs(_docs(spark, new_rows), store)
    plan = nvo._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    nvo_big, _, _ = incremental_neardup_pairs(
        _docs(spark, new_rows), store, batch_broadcast=False
    )
    got = {tuple(sorted((r["doc_new"], r["doc_old"]))) for r in nvo_big.collect()}
    want = {tuple(sorted((r["doc_new"], r["doc_old"]))) for r in nvo.collect()}
    assert got == want  # join strategy never changes the answer

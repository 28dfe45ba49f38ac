"""Similarity search: exact cosine vs numpy oracle; bucketed variant is a
subset of exact; embedding stats."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sat_val_framework_spark.functions import similarity

N, DIM = 200, 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(N, DIM).astype("float32")
    rows = [(i, vecs[i].tolist(), int(i % 4)) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    return df, vecs


def test_topk_matches_numpy(emb):
    df, vecs = emb
    got = similarity.brute_force_topk(df, df.filter(F.col("vec_id") < 3), k=5)
    res = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"]) for r in got.collect()}
    v = vecs.astype("float64")
    sims = v @ v.T / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    for q in range(3):
        order = sorted((-(round(sims[q, j], 12)), j) for j in range(N) if j != q)
        for rank in range(1, 6):
            nb, cs = res[(q, rank)]
            exp_j = order[rank - 1][1]
            assert nb == exp_j
            assert cs == pytest.approx(round(sims[q, exp_j], 6), abs=2e-6)


def test_threshold_pairs_set_equals_numpy(emb):
    df, vecs = emb
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.threshold_pairs(df, df.filter(F.col("vec_id") < 3), 0.3).collect()
    }
    v = vecs.astype("float64")
    sims = v @ v.T / (np.linalg.norm(v, axis=1)[:, None] * np.linalg.norm(v, axis=1)[None, :])
    exp = {(q, j) for q in range(3) for j in range(N) if j != q and round(sims[q, j], 6) >= 0.3}
    assert got == exp


def test_bucketed_is_subset_of_exact_and_same_bucket_only(emb):
    df, _ = emb
    qs = df.filter(F.col("vec_id") < 5)
    approx = similarity.bucketed_topk(df, qs, k=10, n_bits=4).collect()
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.brute_force_topk(df, qs, k=N).collect()
    }
    for r in approx:
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]


def test_ivf_scores_subset_of_exact(emb):
    df, _ = emb
    qs = df.filter(F.col("vec_id") < 5)
    ivf = similarity.ivf_topk(df, qs, k=10, n_centroids=8, n_probe=2).collect()
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cos_sim"]
        for r in similarity.brute_force_topk(df, qs, k=N).collect()
    }
    assert ivf, "ivf returned nothing"
    for r in ivf:
        # every IVF hit carries the exact cosine score
        assert exact[(r["query_id"], r["neighbor_id"])] == r["cos_sim"]


def test_ivf_full_probe_equals_exact(emb):
    """Probing every cell makes IVF exhaustive -> identical to brute force."""
    df, _ = emb
    qs = df.filter(F.col("vec_id") < 3)
    ivf = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in similarity.ivf_topk(df, qs, k=5, n_centroids=4, n_probe=4).collect()
    }
    exact = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in similarity.brute_force_topk(df, qs, k=5).collect()
    }
    assert ivf == exact


def test_embedding_stats(emb):
    df, vecs = emb
    got = {r["grp"]: (r["n_vecs"], r["avg_norm"]) for r in similarity.embedding_stats(df).collect()}
    for g in range(4):
        idx = [i for i in range(N) if i % 4 == g]
        norms = np.linalg.norm(vecs[idx].astype("float64"), axis=1)
        assert got[g][0] == len(idx)
        assert got[g][1] == pytest.approx(round(float(norms.mean()), 6), abs=2e-6)


def test_embedding_near_dup_is_subset_of_allpairs(emb):
    df, vecs = emb
    got = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup_pairs(df, threshold=0.3, n_bits=4, bands=2).collect()
    }
    sims = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)) @ (
        vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    ).T
    for (a, b), s in got.items():
        assert a < b
        assert abs(s - sims[a, b]) < 1e-5
        assert s >= 0.3


def test_embedding_near_dup_finds_true_near_dups(spark, emb):
    """True near-duplicates (cos ~ 1) agree on every sign band, so the
    banded LSH path must recall them."""
    df, vecs = emb
    dup = vecs[:10] + np.float32(1e-4)  # near-identical copies of vecs 0..9
    extra = [(N + i, dup[i].tolist(), 0) for i in range(10)]
    df2 = df.unionByName(
        spark.createDataFrame(extra, "vec_id long, embedding array<float>, label int")
    )
    got = {
        (r["vec_a"], r["vec_b"])
        for r in similarity.embedding_near_dup_pairs(df2, threshold=0.95, n_bits=4, bands=2).collect()
    }
    for i in range(10):
        assert (i, N + i) in got, f"missed near-dup pair ({i}, {N + i})"


def test_ivf_kmeans_training_improves_recall_over_first_n(spark):
    """Lloyd-refined centroids must beat first-N seeding (VERDICT r3 #5).
    Uniform pseudo-random vectors are the honest geometry: clustered
    corpora collapse whole clusters into single cells either way (recall
    survives bad seeds there), but on unstructured data cell QUALITY is
    what recall rides on — numpy prototype: first-N 0.475, 3 Lloyd
    iterations 0.6 at n_probe=2/16 cells."""
    from sat_val_framework_spark.fixtures import _mix_np
    import numpy as np

    from sat_val_framework_spark.functions.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    dim, n = 16, 400
    ii, jj = np.meshgrid(np.arange(n), np.arange(dim), indexing="ij")
    x = (_mix_np(ii.ravel(), jj.ravel(), 9).reshape(n, dim) % 2001 - 1000) / 1000.0
    emb = spark.createDataFrame(
        [(int(i), [float(v) for v in x[i]]) for i in range(n)],
        "vec_id int, embedding array<float>",
    )
    queries = emb.filter("vec_id % 57 = 0")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=10).collect()
    }

    def recall(centroids):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                emb, queries, k=10, n_centroids=16, n_probe=2, centroids=centroids
            ).collect()
        }
        return len(got & exact) / len(exact)

    r_first = recall(None)
    trained = train_ivf_centroids(emb, n_centroids=16, n_iters=3)
    r_trained = recall(trained)
    assert r_trained > r_first
    assert r_trained >= 0.55
    # training is deterministic: same input -> same centroids
    assert trained == train_ivf_centroids(emb, n_centroids=16, n_iters=3)


def test_train_ivf_centroids_short_corpus(spark):
    """Review r4: a corpus smaller than n_centroids trains over the cells
    that exist instead of raising IndexError."""
    from sat_val_framework_spark.functions.similarity import ivf_topk, train_ivf_centroids

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 5 - 2) for j in range(8)]) for i in range(10)],
        "vec_id int, embedding array<float>",
    )
    cents = train_ivf_centroids(emb, n_centroids=16, n_iters=2)
    assert len(cents) == 10
    out = ivf_topk(emb, emb.filter("vec_id < 2"), k=3, n_probe=2, centroids=cents)
    assert out.count() > 0


def test_embedding_near_dup_kernel_equals_jvm_path(spark, emb):
    """r6 optimization guard: the per-bucket Arrow kernel (long ids) and
    the generic JVM join path (forced via string ids) must produce
    IDENTICAL (pair, cos_sim) sets — np.add.accumulate is a sequential
    left fold, bit-compatible with aggregate(zip_with(...), 0.0, acc+v)."""
    df, _vecs = emb
    kernel = {
        (str(r["vec_a"]), str(r["vec_b"])): r["cos_sim"]
        for r in similarity.embedding_near_dup_pairs(
            df, threshold=0.3, n_bits=4, bands=2
        ).collect()
    }
    as_str = df.withColumn("vec_id", F.col("vec_id").cast("string"))
    jvm = {
        (r["vec_a"], r["vec_b"]): r["cos_sim"]
        for r in similarity.embedding_near_dup_pairs(
            as_str, threshold=0.3, n_bits=4, bands=2
        ).collect()
    }
    # string ordering differs from numeric ordering, so canonicalize pairs
    jvm = {tuple(sorted(k, key=int)): v for k, v in jvm.items()}
    kernel = {tuple(sorted(k, key=int)): v for k, v in kernel.items()}
    assert kernel == jvm  # exact equality including every 6dp-rounded cos


def test_np_accumulate_matches_jvm_left_fold():
    """The kernel's exactness precondition, tested directly: numpy's
    add.accumulate over widened float32 products equals an explicit
    sequential left fold (Spark's aggregate order) bit-for-bit."""
    rng = np.random.RandomState(11)
    a = rng.randn(500, 64).astype(np.float32).astype(np.float64)
    b = rng.randn(500, 64).astype(np.float32).astype(np.float64)
    acc = np.add.accumulate(a * b, axis=1)[:, -1]
    for i in range(500):
        s = 0.0
        for k in range(64):
            s = s + a[i, k] * b[i, k]
        assert s == acc[i]

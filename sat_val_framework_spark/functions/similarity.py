"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k. The query side is broadcast
  (it's small by construction); the corpus is scanned once, scores computed
  JVM-side with ``zip_with``/``aggregate`` — no Python, no shuffle except
  the final per-query top-k (window over query_id).
- ``bucketed_topk``: the scale path — sign-projection LSH. Bucket key =
  sign bits of the first B dimensions (axis-aligned random-hyperplane
  hashing). Join on bucket key turns all-pairs scoring into per-bucket
  scoring; recall is traded for a ~2^B reduction in comparisons. At 100 TB
  you'd pre-materialize bucket membership and bucket the table on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Left-fold dot product of two array<float/double> columns
    (``aggregate(zip_with(a,b,*), 0.0, acc+v)`` — strictly left-to-right
    accumulation, the order every oracle twin mirrors with list_reduce).

    NEGATIVE RESULT (r6, PLANS.md): unrolling this into a flat 64-term
    ``lit(0.0)+a[0]*b[0]+...`` Add chain — hoping for whole-stage codegen —
    measured 3-4x SLOWER than the HOF fold on a 3M-pair verify (28s vs 8s),
    balanced tree included, with no codegen-failure warning anywhere. An
    Arrow cumsum kernel (bit-identical left fold via np.add.accumulate)
    also lost: the 2x64-double-per-pair boundary crossing costs more than
    it saves (11s). The interpreted HOF fold IS the fastest exact shape;
    what actually pays is calling it once per pair instead of three times
    (see embedding_near_dup_pairs' norm hoist)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(v: Column) -> Column:
    """L2 norm with the same fold order as dot_product."""
    return F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns, JVM-side."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches).

    Norms are hoisted out of the per-pair expression: each side computes
    its own L2 norm ONCE (n + q rows), the pair projection is one dot fold
    + a multiply — same floats (`dot/(norm_a*norm_b)` unchanged), one fold
    per pair instead of three (guide §1.2 per-task work; r6)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_product(F.col("query_vec"), F.col("vec"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def threshold_pairs(
    corpus: DataFrame,
    queries: DataFrame,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All (query, neighbor) pairs with cosine >= threshold — the set-valued
    twin of top-k (no rank, so float-tie order can't affect the result).
    Norms hoisted per side (see brute_force_topk)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_product(F.col("query_vec"), F.col("vec"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def sign_bucket(vec: Column, n_bits: int = 8) -> Column:
    """LSH bucket key: concatenated sign bits of the first n_bits dims."""
    return F.concat(
        *[
            F.when(vec[i] >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)
        ]
    )


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign bucket.
    Equi-join on the bucket key replaces the cross join — the plan scales
    with bucket occupancy, not corpus size × query count. Norms hoisted
    per side (see brute_force_topk)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        sign_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_product(F.col("query_vec"), F.col("vec"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def sign_banded(
    emb: DataFrame,
    n_bits: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(doc_id, vec, band_id, band_key) rows: band b's key = sign bits of
    dims [b*n_bits, (b+1)*n_bits)."""

    def band_key(vec: Column, b: int) -> Column:
        return F.concat(
            *[
                F.when(vec[b * n_bits + i] >= 0, F.lit("1")).otherwise(F.lit("0"))
                for i in range(n_bits)
            ]
        )

    return emb.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"), band_key(F.col(vec_col), b).alias("band_key")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "vec", "band.band_id", "band.band_key")


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    n_bits: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = None,
    oversize: str = "star",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-bucket LSH —
    the scale path replacing the all-pairs crossJoin (O(n²) in corpus size).

    Band b's bucket key = sign bits of dims [b*n_bits, (b+1)*n_bits); two
    vectors are candidates if they agree on ANY band (union of equi-joins on
    (band_id, key) — high-cardinality keys, well-distributed shuffle). Exact
    cosine verifies every candidate; a pair hit by several bands is scored
    per hit and collapsed by max (same value), avoiding a join-back for the
    vectors. Recall grows with ``bands``; cost with bucket occupancy — never
    with corpus size squared.

    ``max_bucket_size``: skew guard for a degenerate bucket (a family of
    near-identical embeddings — dedup.capped_bucket_pairs semantics:
    all-pairs under the cap, hub-star above it, auditable via
    ``embedding_oversized_buckets``).

    Per-vector norms are computed ONCE before the pair join (n rows, not
    n_pairs) and carried as scalars; the division ``dot/(norm_a*norm_b)``
    is unchanged, so scores are bit-identical to the inline cosine while
    the per-candidate verify runs ONE fold instead of three (guide §1.2;
    r6 — see dot_product's docstring for the rejected faster-looking
    variants).
    """
    from sat_val_framework_spark.functions.dedup import capped_bucket_pairs

    banded = sign_banded(emb, n_bits, bands, id_col, vec_col).withColumn(
        "nrm", l2_norm(F.col("vec"))
    )
    id_type = emb.schema[id_col].dataType.simpleString()
    if max_bucket_size is None and id_type in ("bigint", "int"):
        # uncapped fast path (r6, guide §8 "move the heavy bytes once" +
        # §4.2 "hand whole batches to vectorized native code"): instead of
        # a self-join whose output carries BOTH vectors into a per-pair
        # interpreted HOF fold (3.2M candidate pairs x 64 dims at sf1.0,
        # measured ~8s of pure fold time), group the banded frame by bucket
        # with applyInPandas — each vector crosses the Arrow boundary ONCE
        # per band, and the bucket's all-pairs dots run as one numpy
        # broadcast-multiply + np.add.accumulate. That accumulate is a
        # strictly sequential left fold, BIT-IDENTICAL to the JVM
        # ``aggregate(zip_with(...), 0.0, acc+v)`` (property-tested in
        # tests/test_similarity.py); float32->float64 widening and the
        # nrm_a*nrm_b division are exact IEEE ops on both sides. The kernel
        # pre-filters at (threshold - 1e-6) — a superset of every pair the
        # final 6dp-rounded filter can keep, since rounding moves a value
        # by at most 5e-7 — and the authoritative F.round + threshold
        # filter stays in Spark, so no numpy rounding semantics ever touch
        # the result. doc_a < doc_b comes from sorting each bucket by id.
        import numpy as np
        import pandas as pd

        margin = threshold - 1e-6
        np_id = np.int64 if id_type == "bigint" else np.int32

        def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
            n = len(pdf)
            empty = pd.DataFrame(
                {
                    "doc_a": np.array([], dtype=np_id),
                    "doc_b": np.array([], dtype=np_id),
                    "cos": np.array([], dtype=np.float64),
                }
            )
            if n < 2:
                return empty
            pdf = pdf.sort_values("doc_id")
            ids = pdf["doc_id"].to_numpy()
            M = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            nrm = pdf["nrm"].to_numpy(dtype=np.float64)
            ia, ib = np.triu_indices(n, k=1)
            prod = M[ia] * M[ib]
            dots = np.add.accumulate(prod, axis=1)[:, -1]
            cos = dots / (nrm[ia] * nrm[ib])
            keep = cos >= margin
            if not keep.any():
                return empty
            return pd.DataFrame(
                {
                    "doc_a": ids[ia[keep]].astype(np_id),
                    "doc_b": ids[ib[keep]].astype(np_id),
                    "cos": cos[keep],
                }
            )

        scored = (
            banded.where(F.col("vec").isNotNull())
            .groupBy("band_id", "band_key")
            .applyInPandas(bucket_pairs, f"doc_a {id_type}, doc_b {id_type}, cos double")
        )
    elif max_bucket_size is None:
        # generic-id uncapped path: score every band hit in the join's
        # output projection and collapse duplicates in the (ids, cos)
        # groupBy — NEVER a distinct over rows still carrying both vectors
        # (that shuffled 2 x dim doubles per candidate; the hash-agg here
        # ships ~24 bytes). Same result: a pair hit by both bands scores
        # the same cos twice and max() collapses it.
        a, b = banded.alias("a"), banded.alias("b")
        scored = a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (
                dot_product(F.col("a.vec"), F.col("b.vec"))
                / (F.col("a.nrm") * F.col("b.nrm"))
            ).alias("cos"),
        )
    else:
        cands = capped_bucket_pairs(
            banded, ["band_id", "band_key"], max_bucket_size, oversize,
            carry_cols=["vec", "nrm"],
        )
        scored = cands.select(
            "doc_a",
            "doc_b",
            (
                dot_product(F.col("vec_a"), F.col("vec_b"))
                / (F.col("nrm_a") * F.col("nrm_b"))
            ).alias("cos"),
        )
    return (
        scored.groupBy(F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"))
        .agg(F.round(F.max("cos"), 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_oversized_buckets(
    emb: DataFrame,
    n_bits: int = 8,
    bands: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 1000,
) -> DataFrame:
    """(band_id, band_key, bucket_size) for sign buckets over the cap — the
    no-silent-caps audit twin of a capped ``embedding_near_dup_pairs``."""
    from sat_val_framework_spark.functions.dedup import oversized_buckets

    return oversized_buckets(
        sign_banded(emb, n_bits, bands, id_col, vec_col),
        ["band_id", "band_key"],
        max_bucket_size,
    )


def _dot_lit(vec: Column, c: list[float]) -> Column:
    # fold over the literal centroid: one multiply-add chain per dim
    return sum((vec[i].cast("double") * float(c[i]) for i in range(len(c))), F.lit(0.0))


def _top_cells(vec: Column, cents: list[list[float]], n: int) -> Column:
    """indices of the n largest centroid dots (descending; ties break
    toward the HIGHER cell via reverse(array_sort))."""
    scored = F.transform(
        F.array(*[_dot_lit(vec, c) for c in cents]),
        lambda s, i: F.struct(s.alias("s"), i.alias("cell")),
    )
    return F.slice(F.reverse(F.array_sort(scored)), 1, n).getField("cell")


def train_ivf_centroids(
    corpus: DataFrame,
    n_centroids: int = 16,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd-refined IVF centroids as plain Python lists (VERDICT r3 #5).

    Seeds are the first ``n_centroids`` corpus vectors by id (seed-free,
    deterministic); each iteration is ONE DataFrame aggregation — assign
    every vector to its best cell with the centroids baked in as literals
    (the same JVM-side expression the probe path uses), then per-cell
    per-dimension means (dim × cells cheap avg aggregates, map-side
    partial). Only n_centroids × dim doubles ever reach the driver per
    iteration; at 10^12 vectors the identical loop runs on a sample.
    Updated centroids are rounded to 6dp so the training is reproducible
    across engines (the DuckDB oracle twin unrolls the same iterations;
    raw float sums would differ in association order). Empty cells keep
    their previous centroid."""
    first = corpus.orderBy(id_col).limit(n_centroids).collect()
    cents = [list(r[vec_col]) for r in first]
    if not cents:
        raise ValueError("train_ivf_centroids: empty corpus")
    dim = len(cents[0])
    # a corpus smaller than n_centroids seeds fewer cells — iterate over
    # the cells that exist (indexing range(n_centroids) raised IndexError
    # on the dict-default; review finding r4)
    for _ in range(n_iters):
        assigned = corpus.select(
            _top_cells(F.col(vec_col), cents, 1)[0].alias("cell"),
            F.col(vec_col).alias("vec"),
        )
        rows = assigned.groupBy("cell").agg(
            *[F.avg(F.col("vec")[i].cast("double")).alias(f"d{i}") for i in range(dim)]
        ).collect()
        new = {r["cell"]: [round(float(r[f"d{i}"]), 6) for i in range(dim)] for r in rows}
        cents = [new.get(c, cents[c]) for c in range(len(cents))]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned to
    their nearest centroid cell; a query scores only the vectors in its
    ``n_probe`` nearest cells, via an equi-join on cell id.

    ``centroids`` defaults to the first ``n_centroids`` corpus vectors
    (seed-free and deterministic); pass ``train_ivf_centroids(...)`` output
    for Lloyd-refined cells (better recall at the same probe cost).
    Either way centroids ship as literal arrays baked into the plan, so
    cell assignment is a JVM-side expression with NO join against a
    centroid table. The inverted lists are the join partitioning at 100 TB
    scale (bucket the table by cell id to make the probe join shuffle-free).
    """
    cents = centroids if centroids is not None else [
        list(r[vec_col])
        for r in corpus.orderBy(id_col).limit(n_centroids).collect()
    ]

    def top_cells(vec: Column, n: int) -> Column:
        return _top_cells(vec, cents, n)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        l2_norm(F.col(vec_col)).alias("__cn"),
        top_cells(F.col(vec_col), 1)[0].alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        l2_norm(F.col(vec_col)).alias("__qn"),
        F.explode(top_cells(F.col(vec_col), n_probe)).alias("cell"),
    )
    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                dot_product(F.col("query_vec"), F.col("vec"))
                / (F.col("__qn") * F.col("__cn"))
            ).alias("cos_sim"),
        )
        .groupBy("query_id", "neighbor_id")
        .agg(F.max("cos_sim").alias("cos_sim"))  # dedupe multi-probe hits
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def embedding_stats(
    emb: DataFrame, group_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-group embedding diagnostics (count, mean L2 norm)."""
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return (
        emb.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(F.avg(norm), 6).alias("avg_norm"),
        )
    )

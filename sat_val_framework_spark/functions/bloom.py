"""Bloom-filter referential pre-filter: the no-broadcast scale path.

Contract: the reference's collocation matcher (A10,
/root/reference/sat_val_framework/implement.py:140-143) — find fact rows
whose partner key does not exist in a dimension. B5 broadcasts the dim
(needs the whole key set on every executor) and B6 sort-merges (shuffles
BOTH full sides). At 100 TB the dim key set can exceed the broadcast
limit while a bloom filter over it (~1.2 bytes/key at 1% FPP) still fits:

1. build a bloom over the dim keys (one hash-agg; only packed 64-bit
   words cross to the driver — metadata-sized, the IVF-centroid precedent),
2. probe every fact row map-side (pure codegen: element_at + bit_get,
   no shuffle, no Python) — rows the bloom rejects are DEFINITE orphans
   (a bloom has no false negatives) and never enter any join,
3. rows the bloom accepts (true matches + ~FPP of orphans) go through
   the exact anti-join; the union is EXACTLY the exact-strategy answer.

The win scales with how broken the data is: a mass-orphan incident (the
case that matters operationally — a dim table load failed) resolves
map-side instead of exploding the anti-join shuffle; healthy data pays
one cheap probe per row. This is the same row-level runtime filtering
Spark's optimizer injects for shuffle joins, expressed as data so the
filter itself is inspectable, persistable, and mergeable.

Spark has no SQL-callable bloom (bloom_filter_agg is optimizer-internal,
verified UNRESOLVED_ROUTINE on 4.1), hence the explicit construction.
Hashing is Kirsch-Mitzenmaucher double hashing: positions
pmod(h1 + i*h2, m) from two xxhash64 seeds — 2 hash evaluations total
per probe instead of k (lambda-CSE gotcha does not apply: no lambdas,
the two hashes are plain named columns shared by projection).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Textbook sizing -> (n_bits rounded up to a multiple of 64, n_hashes)."""
    if not 0 < fpp < 1:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    n_keys = max(1, n_keys)
    m = max(64, int(-n_keys * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _positions(key: Column, n_bits: int, n_hashes: int) -> list[Column]:
    # reduce both hashes mod m BEFORE combining: ANSI mode (Spark 4 default)
    # raises on long overflow, so keep i*h2 + h1 under 2^63 by construction.
    # h2 is forced into [1, m-1] — a zero step would collapse all k probes
    # onto one position (the standard double-hashing caveat).
    h1 = F.pmod(F.xxhash64(key, F.lit(1)), F.lit(n_bits))
    h2 = F.pmod(F.xxhash64(key, F.lit(2)), F.lit(n_bits - 1)) + F.lit(1)
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(n_bits)) for i in range(n_hashes)]


def bloom_build(dim: DataFrame, key_col: str, n_bits: int, n_hashes: int) -> DataFrame:
    """-> 1-row broadcastable frame ``words: array<bigint>`` (n_bits/64 packed
    words). One distributed hash-agg packs bits into words (bit_or, map-side
    partial); only the sparse (word_idx, word) rows — n_bits/8 bytes total —
    reach the driver for densification. NULL dim keys are skipped (a NULL
    partner can't be referenced; mirrors the exact strategies where NULL
    never equi-joins)."""
    spark = dim.sparkSession
    n_words = n_bits // 64
    pos = dim.where(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*_positions(F.col(key_col), n_bits, n_hashes))).alias("h")
    )
    sparse = (
        pos.select(
            F.shiftright("h", 6).cast("int").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(h & 63 as int))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )
    words = [0] * n_words
    for r in sparse.collect():  # metadata-sized: n_bits/8 bytes of filter
        words[r["word_idx"]] = r["word"]
    return spark.createDataFrame([(words,)], "bloom_words array<bigint>")


def bloom_might_contain(key: Column, words: Column, n_bits: int, n_hashes: int) -> Column:
    """All k bits set -> maybe present; any bit clear -> DEFINITELY absent.
    Pure Column expression (element_at + bit_get take Column positions):
    stays inside whole-stage codegen, no shuffle, no Python. NULL key ->
    NULL (callers decide NULL semantics, as in the exact strategies)."""
    cond = F.lit(True)
    for h in _positions(key, n_bits, n_hashes):
        word = F.element_at(words, F.shiftright(h, 6).cast("int") + F.lit(1))
        cond = cond & (F.bit_get(word, h.bitwiseAND(F.lit(63))) == 1)
    return cond


_INTEGRALS = {"tinyint", "smallint", "int", "bigint"}
_NUMERICS = _INTEGRALS | {"float", "double"}


def _hash_type(fact_type: str, dim_type: str) -> str:
    """Common type BOTH sides hash at. xxhash64 is type-sensitive: hashing
    an int fact key against a bigint-built filter matches nothing, so every
    matching row would come back as a 'definite orphan' (found by review —
    a silent wrong answer, not an error). Mirror the equi-join's coercion
    for the families we support; refuse the rest loudly."""
    if fact_type == dim_type:
        return fact_type
    if {fact_type, dim_type} <= _INTEGRALS:
        return "bigint"
    if {fact_type, dim_type} <= _NUMERICS:
        return "double"
    raise ValueError(
        f"bloom_anti_join key types '{fact_type}' and '{dim_type}' have no "
        "safe common hash type; cast the keys to a common type first"
    )


def bloom_anti_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    fpp: float = 0.01,
    n_keys: int | None = None,
) -> DataFrame:
    """EXACT orphans (same rows as a plain left-anti join, tested) via the
    bloom composition. ``n_keys`` sizes the filter; defaults to a count of
    the dim (one cheap agg job — pass the known cardinality at scale).
    NULL fact keys are orphans by definition, matching left-anti (NULL
    never equi-joins).

    Single-scan shape: rows the bloom rejects get a NULLed join key, so the
    whole fact passes through ONE left join — bloom-rejected rows match
    nothing (NULL never equi-joins) and orphans are simply the rows with no
    hit. The alternative (filter-split into a definite branch and a
    residue anti-join) consumes the fact scan twice — the exact shape
    measured at −7.6% in fused.py's Pass C. Definite orphans still skip
    all matching work; under a shuffle join they co-locate on the NULL-key
    partition, which AQE's skew split handles in a mass-orphan incident."""
    common = _hash_type(
        fact.schema[fact_key].dataType.simpleString(),
        dim.schema[dim_key].dataType.simpleString(),
    )
    dim_k = F.col(dim_key).cast(common)
    fact_k = F.col(fact_key).cast(common)
    if n_keys is None:
        n_keys = dim.where(F.col(dim_key).isNotNull()).count()
    n_bits, n_hashes = bloom_params(n_keys, fpp)
    bloom = F.broadcast(
        bloom_build(dim.select(dim_k.alias("__k")), "__k", n_bits, n_hashes)
    )
    probed = fact.join(bloom)  # 1-row broadcast: BroadcastNestedLoop of a scalar
    maybe = F.coalesce(
        bloom_might_contain(fact_k, F.col("bloom_words"), n_bits, n_hashes), F.lit(False)
    )
    tagged = probed.withColumn("__probe_k", F.when(maybe, fact_k)).drop("bloom_words")
    # distinct dim keys: a left join (unlike left-anti) would duplicate fact
    # rows on a non-unique dim; the distinct is dim-sized, partial-aggregated
    hits = dim.select(dim_k.alias("__probe_k")).where(F.col("__probe_k").isNotNull()).distinct()
    hits = hits.withColumn("__hit", F.lit(True))
    return (
        tagged.join(hits, "__probe_k", "left")
        .where(F.col("__hit").isNull())
        .drop("__probe_k", "__hit")
    )

"""Deterministic sampling operators for training-data pipelines.

Training pipelines cannot use ``df.sample`` (seeded per-partition RNG:
results change with partitioning, retries, and cluster size). These
operators hash the ROW KEY instead: a row's membership depends only on
(key, salt), so samples are reproducible across runs, clusters, and
re-partitioning, and the same key always lands on the same side — the
property train/test splits and A/B holdouts actually require.

hash_fn='md5' is bit-reproducible in ANSI SQL (the DuckDB oracle twins);
'xxhash64' is the production path (JVM intrinsic) — same precedent as
MinHash/fingerprint/CMS.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000  # hash-fraction resolution: 1e-6


def _key_bucket(key: Column, salt: str, hash_fn: str) -> Column:
    """Deterministic bucket in [0, 1e6) from (key, salt)."""
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 15), 16, 10).cast(
            "long"
        )
    elif hash_fn == "xxhash64":
        h = F.xxhash64(key.cast("string"), F.lit(salt))
    else:
        raise ValueError(f"unknown hash_fn '{hash_fn}'")
    return F.pmod(h, F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "v1",
    hash_fn: str = "md5",
) -> DataFrame:
    """Keep rows whose key hashes below ``fraction``: deterministic,
    repartition-invariant sampling. All rows of a key are kept or dropped
    TOGETHER (key-consistent), so joins between two hash_sample'd tables
    on the same key/salt stay complete. Pure column predicate — pushed
    into the scan, no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.filter(_key_bucket(F.col(key_col), salt, hash_fn) < int(fraction * _BUCKETS))


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    salt: str = "split-v1",
    hash_fn: str = "md5",
) -> DataFrame:
    """Stable train/test assignment as a COLUMN (not two frames): split is
    a pure function of (key, salt) — no key ever migrates between sides
    across runs or data growth, the leakage guarantee evaluation needs."""
    test = _key_bucket(F.col(key_col), salt, hash_fn) < int(test_fraction * _BUCKETS)
    return df.withColumn("split", F.when(test, F.lit("test")).otherwise(F.lit("train")))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_col: str,
    default_fraction: float = 0.0,
    salt: str = "v1",
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    sources, keep all rare ones): each stratum gets its own keep-fraction;
    unlisted strata get ``default_fraction``. The threshold is a small
    when-chain (strata lists are metadata-sized), the hash is computed
    once — still a pure pushed-down predicate."""
    thr = F.lit(int(default_fraction * _BUCKETS))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(int(frac * _BUCKETS))).otherwise(thr)
    return df.filter(_key_bucket(F.col(key_col), salt, hash_fn) < thr)

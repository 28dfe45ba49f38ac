"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata, exactly
how a 100 TB training-data lake stores them (the bytes live inline in
parquet or as object-store references). The Spark-side plumbing here —
schemas, Arrow batch shapes, ``mapInPandas`` signatures, partition hygiene —
is real and tested; the actual codec step is STUBBED: this container has no
image/audio libraries, so ``decode_features`` computes deterministic
byte-level pseudo-features and the real decoder raises
``NotImplementedError`` behind an import-try (task contract: stub the
decode, make the plumbing real).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("size_bytes", T.LongType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "media_ref string, media_type string, n_bytes long, "
    "byte_mean double, byte_entropy_proxy double, feature_hash string"
)


def media_table(catalog: DataFrame) -> DataFrame:
    """Synthesize a media table (binary content + typed meta) from the
    media_catalog fixture — deterministic bytes derived from the ref."""
    content = F.encode(
        F.concat(F.lit("media-bytes:"), F.col("media_ref"), F.lit(":"), F.repeat(F.lit("\x01\x02"), 64)),
        "UTF-8",
    )
    return catalog.select(
        "media_ref",
        "media_type",
        content.alias("content"),
        F.struct(
            F.col("size_bytes").cast("long").alias("size_bytes"),
            F.when(F.col("media_type") == "image", F.lit(64)).cast("int").alias("width"),
            F.when(F.col("media_type") == "image", F.lit(64)).cast("int").alias("height"),
            F.when(F.col("media_type") == "audio", F.lit(1000)).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_real(content: bytes, media_type: str):  # pragma: no cover
    """Real decoder — requires PIL/librosa, absent in this container."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; decode_features uses the deterministic stub instead"
    )


def _pseudo_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic byte-level stand-ins for decoded features: byte mean,
    distinct-byte ratio (entropy proxy), md5 of content. Vectorizable and
    stable across parallelism levels."""
    import hashlib

    out = {
        "media_ref": pdf["media_ref"],
        "media_type": pdf["media_type"],
        "n_bytes": pdf["content"].map(lambda b: len(b) if b is not None else 0),
        "byte_mean": pdf["content"].map(
            lambda b: float(sum(b)) / len(b) if b else 0.0
        ),
        "byte_entropy_proxy": pdf["content"].map(
            lambda b: len(set(b)) / 256.0 if b else 0.0
        ),
        "feature_hash": pdf["content"].map(
            lambda b: hashlib.md5(b or b"").hexdigest()
        ),
    }
    return pd.DataFrame(out)


def decode_features(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """Per-batch feature extraction over the binary column via mapInPandas
    (Arrow batches in/out — the shape a real decoder UDF would use).

    Tries the real decoder; falls back to the deterministic stub. Batch size
    is bounded so a partition of large blobs can't blow executor memory."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                try:
                    _decode_real(None, "")  # no real decoder in this env
                except NotImplementedError:
                    yield _pseudo_features(chunk)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "media_ref string, media_type string, orig_w int, orig_h int, "
    "out_w int, out_h int, scale double, resized_hash string"
)


def resize_images(media: DataFrame, max_side: int = 32, batch_rows: int = 1024) -> DataFrame:
    """Aspect-preserving image resize over the binary column via mapInPandas
    (Arrow batches — the exact plumbing a PIL/opencv resize UDF uses).

    The geometry (scale factor, output dims) is real; the pixel resample is
    STUBBED like decode (no image libs in this container): the deterministic
    stand-in hashes (content, out_w, out_h) so downstream dedup/caching
    behaves exactly as with real resized bytes. Non-image rows pass through
    with NULL dims. Batch size bounded — a partition of large blobs cannot
    blow executor memory."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                w = chunk["meta"].map(lambda m: m["width"] if m is not None else None)
                h = chunk["meta"].map(lambda m: m["height"] if m is not None else None)
                is_img = chunk["media_type"].eq("image") & w.notna() & h.notna()
                longest = pd.concat([w, h], axis=1).max(axis=1)
                scale = (max_side / longest).clip(upper=1.0).where(is_img)
                out_w = (w * scale).round().astype("Int64").where(is_img)
                out_h = (h * scale).round().astype("Int64").where(is_img)
                scale = scale.astype("Float64")  # nullable: NULL (not NaN) for non-images

                def _hash(row):
                    if not is_img.loc[row.name]:
                        return None
                    try:
                        _decode_real(row["content"], "image")  # no real codec here
                    except NotImplementedError:
                        pass
                    key = (row["content"] or b"") + b"|%dx%d" % (
                        out_w.loc[row.name], out_h.loc[row.name]
                    )
                    return hashlib.md5(key).hexdigest()

                yield pd.DataFrame(
                    {
                        "media_ref": chunk["media_ref"],
                        "media_type": chunk["media_type"],
                        "orig_w": w.astype("Int64"),
                        "orig_h": h.astype("Int64"),
                        "out_w": out_w,
                        "out_h": out_h,
                        "scale": scale.astype("float64"),
                        "resized_hash": chunk.apply(_hash, axis=1) if len(chunk) else pd.Series(dtype=object),
                    }
                )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 500) -> DataFrame:
    """Video/audio frame-sampling *plan*: for each media item, the timestamps
    a decoder would extract. Pure column expressions; the decode itself is
    the stubbed step above."""
    duration = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    ts = F.sequence(F.lit(0), F.greatest(duration - 1, F.lit(0)), F.lit(every_ms))
    return media.select(
        "media_ref",
        "media_type",
        F.when(duration > 0, ts).otherwise(F.array().cast("array<int>")).alias("sample_ts_ms"),
    )

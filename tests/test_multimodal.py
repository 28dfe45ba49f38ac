"""Multimodal plumbing: binary media column, mapInPandas feature extraction
(decode stubbed deterministically), frame-sample planning."""

import hashlib

from sat_val_framework_spark import fixtures as fx
from sat_val_framework_spark.functions import multimodal


def test_media_table_schema_and_content(spark):
    media = multimodal.media_table(fx.media_catalog_df(spark, 50))
    assert [f.name for f in media.schema.fields] == ["media_ref", "media_type", "content", "meta"]
    rows = media.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert isinstance(r["content"], (bytes, bytearray))
        assert r["content"].startswith(b"media-bytes:" + r["media_ref"].encode())
        if r["media_type"] == "image":
            assert r["meta"]["width"] == 64 and r["meta"]["duration_ms"] is None
        else:
            assert r["meta"]["duration_ms"] == 1000 and r["meta"]["width"] is None


def test_decode_features_deterministic_and_correct(spark):
    media = multimodal.media_table(fx.media_catalog_df(spark, 50))
    feats = {r["media_ref"]: r for r in multimodal.decode_features(media).collect()}
    raw = {r["media_ref"]: r["content"] for r in media.collect()}
    assert set(feats) == set(raw)
    for ref, content in raw.items():
        f = feats[ref]
        assert f["n_bytes"] == len(content)
        assert f["feature_hash"] == hashlib.md5(content).hexdigest()
        assert abs(f["byte_mean"] - sum(content) / len(content)) < 1e-9


def test_decode_features_stable_across_parallelism(spark):
    media = multimodal.media_table(fx.media_catalog_df(spark, 50))
    a = sorted(map(tuple, multimodal.decode_features(media.coalesce(1)).collect()))
    b = sorted(map(tuple, multimodal.decode_features(media.repartition(8)).collect()))
    assert a == b


def test_real_decoder_is_explicit_stub():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal._decode_real(b"", "image")


def test_frame_sample_plan(spark):
    media = multimodal.media_table(fx.media_catalog_df(spark, 20))
    plans = {r["media_ref"]: r for r in multimodal.frame_sample_plan(media, every_ms=300).collect()}
    for ref, r in plans.items():
        if r["media_type"] == "audio":  # duration 1000ms -> 0,300,600,900
            assert r["sample_ts_ms"] == [0, 300, 600, 900]
        else:  # images have no duration
            assert r["sample_ts_ms"] == []


def test_resize_images_geometry_and_nulls(spark):
    from sat_val_framework_spark.fixtures import media_catalog_df
    from sat_val_framework_spark.functions.multimodal import media_table, resize_images

    media = media_table(media_catalog_df(spark, 40))
    got = {r["media_ref"]: r for r in resize_images(media, max_side=16).collect()}
    assert len(got) == 40
    for ref, r in got.items():
        i = int(ref.split("-")[1])
        if i % 2 == 0:  # image: 64x64 -> 16x16 at scale 0.25
            assert (r["orig_w"], r["orig_h"], r["out_w"], r["out_h"]) == (64, 64, 16, 16)
            assert r["scale"] == 0.25
            assert r["resized_hash"] is not None and len(r["resized_hash"]) == 32
        else:  # audio: passthrough with NULL geometry
            assert r["out_w"] is None and r["scale"] is None and r["resized_hash"] is None


def test_resize_never_upscales(spark):
    from sat_val_framework_spark.fixtures import media_catalog_df
    from sat_val_framework_spark.functions.multimodal import media_table, resize_images

    media = media_table(media_catalog_df(spark, 10))
    got = resize_images(media, max_side=4096).filter("media_type = 'image'").collect()
    assert all(r["scale"] == 1.0 and r["out_w"] == 64 for r in got)

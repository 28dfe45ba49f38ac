"""Stateful streaming dedup: duplicates arriving in LATER micro-batches are
still dropped (state store carries the seen-set across batches)."""

import pytest
from pyspark.sql import functions as F

from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA
from sat_val_framework_spark.streaming import streaming_dedup


def _doc(doc_id, part_id, text):
    return (doc_id, part_id, [{"kind": "text", "text": text, "media_ref": None, "offset": 0}])


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dstream") / "docs")
    batch1 = spark.createDataFrame([_doc("a1", 0, "alpha"), _doc("b1", 0, "beta")], DOCUMENTS_SCHEMA)
    batch2 = spark.createDataFrame(
        [_doc("a2", 1, "alpha"), _doc("c1", 1, "gamma")], DOCUMENTS_SCHEMA
    )
    # two files -> two micro-batches with maxFilesPerTrigger=1
    batch1.coalesce(1).write.mode("append").parquet(d)
    batch2.coalesce(1).write.mode("append").parquet(d)
    return d


def test_cross_batch_duplicate_dropped(spark, stream_dir):
    q = streaming_dedup(spark, stream_dir, query_name="t_dedup", max_files=1)
    q.processAllAvailable()
    q.stop()
    out = spark.table("t_dedup").collect()
    by_digest = {}
    for r in out:
        assert r["digest"] not in by_digest, "digest emitted twice"
        by_digest[r["digest"]] = r["doc_id"]
    # exactly one row per distinct text, and 'alpha' kept its first doc
    assert sorted(by_digest.values()) == ["a1", "b1", "c1"]

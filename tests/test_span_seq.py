"""B9: canonical span-sequence equality (kind, text, media_ref, order) —
the per-row invariant from BASELINE.json input_hint."""

from pyspark.sql import functions as F

from sat_val_framework_spark.operators.canonicalize import canonicalize_spans, span_seq_check


def test_identity_has_zero_mismatches(docs):
    verdicts, mismatches = span_seq_check(docs, docs)
    assert mismatches.count() == 0
    v = verdicts.toPandas()
    assert (v.status == "PASS").all()
    assert v.violation_count.sum() == 0


def test_array_order_does_not_matter(docs):
    """Physically reversed span arrays canonicalize identically: order is
    defined by (offset, pos), not storage order."""
    reversed_docs = docs.withColumn("spans", F.reverse("spans"))
    _, mismatches = span_seq_check(docs, reversed_docs)
    assert mismatches.count() == 0


def test_text_perturbation_caught_exactly(spark, docs):
    tampered = docs.withColumn(
        "spans",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                F.when(
                    (F.crc32(F.col("doc_id")) % 100 == 0) & s["text"].isNotNull(),
                    F.concat(s["text"], F.lit("!TAMPER")),
                ).otherwise(s["text"]).alias("text"),
                s["media_ref"].alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ),
    )
    # docs whose crc32 bucket hits 0 AND have at least one text span differ
    expected = {
        r["doc_id"]
        for r in docs.filter(
            (F.crc32(F.col("doc_id")) % 100 == 0)
            & F.exists("spans", lambda s: s["text"].isNotNull())
        ).collect()
    }
    assert expected, "perturbation selected no docs; widen the bucket"
    _, mismatches = span_seq_check(docs, tampered)
    got = {r["doc_id"] for r in mismatches.collect()}
    assert got == expected


def test_missing_and_extra_docs_flagged(docs):
    subset = docs.filter(F.col("part_id") != 0)
    _, mismatches = span_seq_check(docs, subset)
    only_p0 = docs.filter(F.col("part_id") == 0).count()
    # every part-0 doc is missing on the expected side
    assert mismatches.count() == only_p0


def test_canonical_strips_to_kind_text_mediaref(docs):
    canon = canonicalize_spans(docs)
    fields = [f.name for f in canon.schema["canon"].dataType.elementType.fields]
    assert fields == ["kind", "text", "media_ref"]

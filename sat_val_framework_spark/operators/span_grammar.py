"""Span-grammar validation: structural invariants of the interleaved
span sequence, per document.

The north rule's input is a table of interleaved text + media documents
with ``spans: array<struct<kind, text, media_ref, offset>>`` and the
per-row invariant "span-sequence equality (kind, text, media_ref,
order)" (reference QC contract: sat_val_framework/implement.py:120-216 —
collocated granules carry parallel span lists whose kinds/refs/order
must agree). ``span_seq`` checks that invariant AGAINST A REFERENCE
table; this operator checks the sequence's INTERNAL grammar with no
reference needed — the rules any interleaved-document ingest must hold:

- ``kind`` drawn from a declared vocabulary (``allowed_kinds``);
- media spans (kind != 'text') carry a non-NULL ``media_ref``;
- text spans carry non-NULL, non-empty ``text`` (optional: reading the
  text leaf costs real scan bytes at 10^12 docs — see ``require_text``);
- ``offset`` strictly increasing in array order (the "order" half of the
  span-sequence invariant: a shuffled or duplicated offset means the
  interleaving is corrupt);
- optionally, the document must have at least one span
  (``require_spans`` — otherwise span-less docs vacuously pass, the
  schema_assert kind already polices NULL arrays).

All rules are JVM-side higher-order functions over the spans array — no
explode, no shuffle beyond the verdict aggregate, and Catalyst prunes
the nested schema to exactly the leaves the enabled rules touch (with
``require_text=False`` the text bytes are never read; measured via
ReadSchema). NULL fields inside a rule's predicate count as violations
(a NULL kind is not in the vocabulary; a NULL offset cannot be ordered).

Violation unit is the DOCUMENT (a doc with any bad span violates once),
matching the unique/ref kinds' row semantics, with per-rule breakdowns
available from :func:`span_grammar_profile`.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sat_val_framework_spark.verdicts import (
    FAIL,
    PASS,
    merged_samples,
    sample_col,
    status_col,
)

#: rule names in sample/profile order
RULES = ("no_spans", "bad_kind", "bad_text", "bad_media", "bad_order")


def span_grammar_flags(
    allowed_kinds: Sequence[str],
    require_text: bool = False,
    require_media_ref: bool = True,
    check_order: bool = True,
    require_spans: bool = False,
    spans_col: str = "spans",
) -> dict[str, Column]:
    """Per-doc boolean flag per rule (False = clean). Disabled rules map to
    literal False so downstream counters stay shape-stable.

    Every rule works over per-LEAF arrays (``spans.kind`` etc. —
    GetArrayStructFields), never over the struct array inside a lambda:
    referencing the whole ``spans`` element (or capturing it via
    ``element_at``) defeats Catalyst's nested-schema pruning and drags the
    text bytes into the scan even when no rule needs them (measured:
    ReadSchema kept all four leaves until this restructuring)."""
    spans = F.col(spans_col)
    return _leaf_flags(
        spans.getField("kind"),
        spans.getField("text") if require_text else None,
        spans.getField("media_ref") if require_media_ref else None,
        spans.getField("offset") if check_order else None,
        allowed_kinds,
        require_spans=require_spans,
    )


def _leaf_flags(
    kind_arr: Column,
    text_arr: Column | None,
    media_arr: Column | None,
    off_arr: Column | None,
    allowed_kinds: Sequence[str],
    require_spans: bool = False,
) -> dict[str, Column]:
    """Rule flags from already-extracted leaf arrays. A disabled rule's
    leaf is None and its flag is literal False."""
    # null/size probed through the extracted leaf (getField propagates
    # NULL): size(spans) would reference the full struct array and defeat
    # the same pruning the docstring describes
    no_spans = kind_arr.isNull() | (F.size(kind_arr) == 0)
    require_text = text_arr is not None
    require_media_ref = media_arr is not None
    check_order = off_arr is not None
    # every rule is vacuously clean on a span-less doc; `no_spans` alone
    # decides its fate (and only when require_spans)
    have = ~no_spans
    kinds = [str(k) for k in allowed_kinds]

    def _any(flag_arr: Column) -> Column:
        # exists() is NULL when the lambda is NULL for some element and
        # never True — each lambda below coalesces internally, but keep a
        # belt-and-braces coalesce so a flag is never NULL
        return F.coalesce(F.exists(flag_arr, lambda b: b), F.lit(False))

    flags: dict[str, Column] = {
        "no_spans": no_spans if require_spans else F.lit(False),
        # NULL kind is "not in the vocabulary"
        "bad_kind": have
        & _any(F.transform(kind_arr, lambda k: ~F.coalesce(k.isin(kinds), F.lit(False)))),
    }
    flags["bad_text"] = (
        have
        & _any(
            F.zip_with(
                kind_arr,
                text_arr,
                lambda k, t: F.coalesce(k == "text", F.lit(False))
                & (t.isNull() | (F.length(t) == 0)),
            )
        )
        if require_text
        else F.lit(False)
    )
    flags["bad_media"] = (
        have
        & _any(
            F.zip_with(
                kind_arr,
                media_arr,
                # kind != 'text' with NULL-kind excluded: a NULL kind is
                # already a bad_kind violation, double-flagging it as a
                # media violation would make counts rule-order-dependent
                lambda k, m: F.coalesce(k != "text", F.lit(False)) & m.isNull(),
            )
        )
        if require_media_ref
        else F.lit(False)
    )
    if check_order:
        # strictly increasing offsets: element i (0-based transform index)
        # violates when offset <= previous offset; element_at is 1-based so
        # element_at(offs, i) IS the previous element. NULL offsets cannot
        # be ordered -> violation (coalesce to True).
        offs = off_arr
        flags["bad_order"] = have & _any(
            F.transform(
                offs,
                lambda o, i: F.when(i == 0, F.lit(False)).otherwise(
                    F.coalesce(o <= F.element_at(offs, i), F.lit(True))
                ),
            )
        )
    else:
        flags["bad_order"] = F.lit(False)
    return flags


def span_grammar_check(
    docs: DataFrame,
    allowed_kinds: Sequence[str],
    part_col: str = "part_id",
    id_col: str = "doc_id",
    require_text: bool = False,
    require_media_ref: bool = True,
    check_order: bool = True,
    require_spans: bool = False,
    spans_col: str = "spans",
    constraint_id: str | None = None,
) -> DataFrame:
    """-> one verdict row per partition (CHECK_OUTPUT_COLS shape): FAIL iff
    any document in the partition breaks any enabled rule;
    ``violation_count`` = number of violating documents; samples are
    ``doc_id:rule1+rule2`` strings (deterministic: two-level bounded
    sampler, sorted, 10 smallest). One scan, one hash-agg.

    The leaf arrays are extracted in an explicit Project BEFORE the
    split-level aggregate: ``spark_partition_id()`` is a nondeterministic
    grouping expression, and Catalyst's NestedColumnAliasing refuses to
    prune nested fields referenced inside such an Aggregate — grouping the
    raw frame directly dragged ALL FOUR leaves (text bytes included) into
    the scan regardless of the enabled rules (measured via ReadSchema;
    regression-tested in test_span_grammar.py)."""
    spans = F.col(spans_col)
    leaf_cols = [spans.getField("kind").alias("__kind")]
    if require_text:
        leaf_cols.append(spans.getField("text").alias("__text"))
    if require_media_ref:
        leaf_cols.append(spans.getField("media_ref").alias("__media"))
    if check_order:
        leaf_cols.append(spans.getField("offset").alias("__off"))
    pre = docs.select(
        F.col(part_col).alias("part_id"),
        F.col(id_col).cast("string").alias("__doc"),
        F.spark_partition_id().alias("__split"),
        *leaf_cols,
    )
    flags = _leaf_flags(
        F.col("__kind"),
        F.col("__text") if require_text else None,
        F.col("__media") if require_media_ref else None,
        F.col("__off") if check_order else None,
        allowed_kinds,
        require_spans=require_spans,
    )
    violated = None
    for f_ in flags.values():
        violated = f_ if violated is None else (violated | f_)
    rules_str = F.concat_ws(
        "+", *[F.when(flags[r], F.lit(r)) for r in RULES]
    )
    annotated = F.format_string("%s:%s", F.col("__doc"), rules_str)
    l1 = pre.groupBy("part_id", "__split").agg(
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(violated.cast("long")).alias("violation_count"),
        sample_col(annotated, violated).alias("sample_violations"),
    )
    cid = constraint_id or f"span_grammar:{spans_col}"
    return (
        l1.groupBy("part_id")
        .agg(
            F.sum("rows_scanned").alias("rows_scanned"),
            F.sum("violation_count").alias("violation_count"),
            merged_samples("sample_violations").alias("sample_violations"),
        )
        .select(
            F.lit(cid).alias("constraint_id"),
            "part_id",
            status_col(F.col("violation_count")).alias("status"),
            "rows_scanned",
            F.col("violation_count").cast("long").alias("violation_count"),
            "sample_violations",
        )
    )


def span_grammar_profile(
    docs: DataFrame,
    allowed_kinds: Sequence[str],
    part_col: str = "part_id",
    require_text: bool = True,
    spans_col: str = "spans",
) -> DataFrame:
    """Diagnostic rollup: per-partition document counts per rule — which
    rule is breaking, where, how often. Same flags, same single hash-agg;
    ``violated_docs`` counts docs breaking >=1 rule (not the sum of the
    per-rule columns: one doc can break several). ``no_spans`` here always
    counts span-less docs (the profile reports, the check gates)."""
    flags = span_grammar_flags(
        allowed_kinds,
        require_text=require_text,
        require_media_ref=True,
        check_order=True,
        require_spans=True,
        spans_col=spans_col,
    )
    violated = None
    for f_ in flags.values():
        violated = f_ if violated is None else (violated | f_)
    return docs.groupBy(F.col(part_col).alias("part_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(flags[r].cast("long")).alias(f"{r}_docs") for r in RULES],
        F.sum(violated.cast("long")).alias("violated_docs"),
    )

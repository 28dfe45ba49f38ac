"""Suite runner: orchestrates checks, stamps lineage, checkpoints, resumes.

This is the engine equivalent of the reference's E2 hot path
(``CollocationEventList.load_with_joint_parameters`` → per-event load → QC →
verdicts; /root/reference/sat_val_framework/usable.py:43-48,
implement.py:177-190): one Spark job per check over all pending partitions,
with QC fused into the scan. Resume skips completed (constraint, partition)
pairs via left-anti join then pushes the pending set down as a partition
filter, so a resumed run re-scans only unfinished partitions.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sat_val_framework_spark import checkpoint as ckpt
from sat_val_framework_spark import profile
from sat_val_framework_spark.fixtures import DOCUMENTS_SCHEMA
from sat_val_framework_spark.operators import (
    column_stats,
    drift_check,
    fd_check,
    referential_check,
    schema_assert,
    span_seq_check,
    uniqueness_check,
)
from sat_val_framework_spark.operators.stats import StatSpec
from sat_val_framework_spark.operators.subset import subset_check
from sat_val_framework_spark.suite import Check, CheckSuite
from sat_val_framework_spark.verdicts import (
    RETRYABLE_ERROR_KINDS,
    error_kind_of,
    error_verdicts,
    finalize_verdicts,
)

DEFAULT_SUITE = CheckSuite(
    checks=[
        Check("schema_assert", params={"not_null": ["spans"]}),
        Check("stats", "n_spans", {"max_null_rate": 0.0, "lo": 1, "hi": 64}),
        Check("unique", "doc_id"),
        Check("ref", "spans.media_ref", {"dim_table_alias": "media_catalog", "strategy": "broadcast"}),
        Check("drift_ks", "n_spans", {"threshold": 0.15}),
        Check("drift_psi", "n_spans", {"threshold": 0.2}),
        Check("drift_ks", "text_len", {"threshold": 0.15}),
        Check("drift_psi", "text_len", {"threshold": 0.2}),
        # distribution profile as a CONSTRAINT: catches a column collapsing
        # to a constant (top-share) or degenerating (entropy floor)
        Check("profile", "n_spans", {"max_top_share": 0.9, "min_entropy": 0.5}),
        # functional dependency: a doc_id must live in exactly one partition
        # (the A3 invariant shape); the seeded dup doc_ids violate it
        Check("fd", "doc_id->part_id"),
        # robust-location bound: the n_spans median must stay in [5, 8] —
        # catches the column's CENTER walking away (the drifted partition's
        # +4 shift fails this where min/max bounds stay silent). approx=False
        # so the fused counter-derived quantile twin is bit-identical
        Check("quantile", "n_spans", {"q": 0.5, "lo": 5, "hi": 8, "approx": False}),
        # categorical drift of the span-kind mix vs the configured baseline
        # (tv = categorical KS-analogue; unordered columns have no bins)
        Check("drift_categorical", "kind", {"tv_threshold": 0.05}),
        # the north rule's own per-row invariant as a default constraint:
        # span-sequence grammar (kind vocabulary, media refs, offset order).
        # require_text=False keeps the fused Pass A text-free; require_spans
        # stays False because schema_assert already polices NULL arrays
        Check(
            "span_grammar",
            "spans",
            {"allowed_kinds": ["text", "image", "audio"], "require_text": False},
        ),
    ]
)

_SERIES = {"n_spans": profile.n_spans_series, "text_len": profile.text_len_series}

DRIFT_KINDS = ("drift_ks", "drift_psi", "drift_emd", "drift_kl")


@dataclass
class RunResult:
    run_id: str
    verdicts: DataFrame
    skipped: list[str] = field(default_factory=list)  # "<constraint>:<part>" resumed pairs


def _cat_series_for(docs: DataFrame, column: str, part_col: str) -> DataFrame:
    """(part_id, value) string series for a categorical drift column.

    'kind' (derived): one row per span with the span's kind, NULL kinds
    coalesced to the '<NULL>' sentinel BEFORE the explode (a NULL category
    is itself a category — a surge of NULLs IS drift). Docs whose spans
    array is NULL/empty contribute a NULL *value* row — the presence-only
    marker convention (categorical_drift_scores) that keeps their partition
    visible for the EmptySeriesError verdict. Top-level columns: one row
    per doc, value cast to string with the same sentinel."""
    if column == "kind":
        kinds = F.transform(
            F.col("spans"), lambda s: F.coalesce(s["kind"], F.lit("<NULL>"))
        )
        return docs.select(
            F.col(part_col).alias(part_col), F.explode_outer(kinds).alias("value")
        )
    if column in docs.schema.fieldNames():
        return docs.select(
            part_col,
            F.coalesce(F.col(column).cast("string"), F.lit("<NULL>")).alias("value"),
        )
    raise ValueError(f"no categorical series derivation for column '{column}'")


def _doc_text(docs: DataFrame, part_col: str) -> DataFrame:
    """(part_id, doc_id, text): per-document text = the doc's text spans
    joined by ' ' — the series the text-quality kinds (repetition,
    contamination) run on. NULL-spans docs keep a NULL text (token-less:
    the downstream tokenizer treats them as empty, never as violations)."""
    texts = F.transform(
        F.filter(F.col("spans"), lambda s: s["kind"] == F.lit("text")),
        lambda s: s["text"],
    )
    return docs.select(
        part_col,
        "doc_id",
        F.when(F.col("spans").isNull(), F.lit(None).cast("string"))
        .otherwise(F.concat_ws(" ", texts))
        .alias("text"),
    )


def _rid_keyed(scoped: DataFrame, part_col: str) -> DataFrame:
    """(part, doc_id, text, __rid) with __rid = '<part>\\x1f<doc_id>': the
    physical-row key the text-similarity kinds (contamination,
    ngram_decontam) hand to dedup functions instead of the raw doc_id —
    duplicate doc_ids spanning partitions (exactly the defect the
    unique/fd checks model) must profile separately, not merge their texts
    under one key with nondeterministic partition attribution (advice r4).
    \\x1f never occurs in ids; a collision could only merge keys that were
    already equal."""
    return scoped.withColumn(
        "__rid",
        F.concat_ws(
            "\x1f", F.col(part_col).cast("string"), F.col("doc_id").cast("string")
        ),
    )


def _violation_verdicts(
    scoped: DataFrame, viol: DataFrame, constraint_id: str, part_col: str
) -> DataFrame:
    """Per-partition verdict rows from a (part_id, violation_key) violator
    frame: exact counts + bounded samples joined onto the scanned-rows
    spine — the shared shape of every flag-the-rows check (uniqueness's
    pattern, reused by the repetition and contamination kinds)."""
    from sat_val_framework_spark.verdicts import FAIL, PASS, bounded_samples

    per_part = scoped.groupBy(F.col(part_col).alias("part_id")).agg(
        F.count(F.lit(1)).alias("rows_scanned")
    )
    viol_agg = bounded_samples(viol, "part_id", "violation_key")
    return per_part.join(viol_agg, "part_id", "left").select(
        F.lit(constraint_id).alias("constraint_id"),
        F.col("part_id"),
        F.when(F.coalesce(F.col("violation_count"), F.lit(0)) > 0, F.lit(FAIL))
        .otherwise(F.lit(PASS))
        .alias("status"),
        F.col("rows_scanned"),
        F.coalesce(F.col("violation_count"), F.lit(0)).cast("long").alias("violation_count"),
        F.coalesce(F.col("sample_violations"), F.array().cast("array<string>")).alias(
            "sample_violations"
        ),
    )


def _numeric_frame(docs: DataFrame, column: str, part_col: str) -> DataFrame:
    """Frame carrying (part_col, <column>, ...) for the quantile/profile
    kinds. ``text_len`` rides the SAME per-text-span exploded series the
    drift kinds use (_SERIES / profile.text_len_series), renamed to the
    check's column — a doc-length quantile bound (quantile:text_len) is
    the most natural constraint a corpus owner declares (VERDICT r4 #2);
    rows_scanned on those verdicts counts SPAN rows, n_obs text spans, and
    a partition with no text spans gets the drift family's
    EmptySeriesError. ``n_spans`` keeps the doc-level with_n_spans frame
    (one row per doc; byte-identical to the fused kernel's exact-counter
    quantile — do not reroute it through a cast-to-double series)."""
    if column == "text_len":
        return profile.text_len_series(docs, part_col).withColumnRenamed("value", "text_len")
    return profile.with_n_spans(docs)


def _series_for(docs: DataFrame, column: str, part_col: str) -> DataFrame:
    """Series frame (part_id, value) for a drift column: a registered
    derived series (n_spans/text_len) or, as the general case, any
    top-level numeric column cast to double — drift checks are not limited
    to the two derived columns (the baseline must carry matching bin edges
    for the column either way; suite.validate already resolved it against
    the schema)."""
    if column in _SERIES:
        return _SERIES[column](docs, part_col)
    if column in docs.schema.fieldNames():
        return docs.select(part_col, F.col(column).cast("double").alias("value"))
    raise ValueError(f"no series derivation for drift column '{column}'")


def run_suite(
    spark: SparkSession,
    docs: DataFrame,
    suite: CheckSuite = DEFAULT_SUITE,
    catalog: DataFrame | None = None,
    baseline: DataFrame | None = None,
    baseline_cat: DataFrame | None = None,
    expected_docs: DataFrame | None = None,
    checkpoint_path: str | None = None,
    violations_path: str | None = None,
    run_id: str | None = None,
    snapshot_id: str = "",
    part_col: str = "part_id",
    raise_on_error: bool = False,
) -> RunResult:
    """Run every check in the suite, checkpointing per-check verdicts.

    Resumable: pairs already in the checkpoint for ``run_id`` are skipped and
    the remaining partitions are pushed down as a filter (partition pruning).

    Errors are values (implement.py:23-56): a check that cannot evaluate —
    missing dim table, unreadable partition, bad predicate — emits one
    ``status=ERROR`` verdict row per pending partition with a typed
    ``error_kind``, instead of killing the run. ``raise_on_error=True``
    restores fail-fast for debugging.
    """
    suite.validate_or_raise(docs, part_col)
    run_id = run_id or uuid.uuid4().hex[:12]

    all_parts = docs.select(F.col(part_col).alias("part_id")).distinct()
    existing = ckpt.read_checkpoint(spark, checkpoint_path) if checkpoint_path else None
    all_part_ids: set[int] | None = None
    done_pairs: set[tuple[str, int]] = set()
    if existing is not None:
        # worklist and completed pairs are metadata-sized (constraints ×
        # partitions), so one driver-side collect replaces a per-check job
        all_part_ids = {r["part_id"] for r in all_parts.collect()}
        done_pairs = {
            (r["constraint_id"], r["part_id"])
            for r in existing.filter(F.col("run_id") == run_id)
            # retryable ERROR verdicts don't count as done: a resumed run
            # re-evaluates exactly those pairs after the environment is fixed
            # (the newest row wins on read, so the ERROR is superseded)
            .filter(~F.coalesce(F.col("error_kind"), F.lit("")).isin(*RETRYABLE_ERROR_KINDS))
            .select("constraint_id", "part_id")
            .distinct()
            .collect()
        }

    collected: list[DataFrame] = []
    skipped: list[str] = []

    # drift checks on the same column share one histogram+score pass; keep
    # the Check objects so each sibling is emitted with ITS OWN params_json
    # and only requested statistics are computed (ADVICE r1)
    drift_cols: dict[str, dict[str, Check]] = {}
    for c in suite.checks:
        if c.kind in DRIFT_KINDS:
            drift_cols.setdefault(c.column, {})[c.kind] = c

    def pending_ids(cids: list[str]) -> list[int] | None:
        """Partition ids with ANY listed constraint not yet checkpointed;
        None = everything pending (no checkpoint). Driver-side only — safe
        to consult BEFORE paying for any scan."""
        if existing is None or all_part_ids is None:
            return None
        done = set(all_part_ids)
        for cid in cids:
            done &= {p for (c, p) in done_pairs if c == cid}
        return sorted(all_part_ids - done)

    def pending_filter(constraint_id: str | list[str], df: DataFrame) -> tuple[DataFrame, bool]:
        """Restrict to partitions not yet checkpointed for this constraint
        (left-anti-join resume, here as a pushed-down isin filter so the
        scan prunes completed partitions). A list means a shared pass: a
        partition is skippable only if EVERY listed constraint is done."""
        cids = [constraint_id] if isinstance(constraint_id, str) else list(constraint_id)
        ids = pending_ids(cids)
        if ids is None or len(ids) == len(all_part_ids):
            return df, True
        if not ids:
            return df, False
        done = sorted(all_part_ids - set(ids))
        skipped.extend(f"{cid}:{p}" for cid in cids for p in done)
        return df.filter(F.col(part_col).isin(ids)), True

    def emit(check_out: DataFrame, params_json: str, t0: float) -> None:
        v = finalize_verdicts(
            check_out, run_id, params_json, snapshot_id, latency_ms=(time.time() - t0) * 1000.0
        )
        if checkpoint_path:
            ckpt.append_verdicts(v, checkpoint_path)
        collected.append(v)

    def emit_doc_violations(scoped: DataFrame, viol: DataFrame, c: Check, t0: float) -> None:
        """Shared tail of every flag-the-docs kind (repetition,
        contamination, ngram_decontam): append the violator rows, emit the
        standard per-partition verdicts — one place to change the
        violations/sampling contract (review finding r4)."""
        if violations_path:
            ckpt.append_violations(
                viol, violations_path, run_id, c.constraint_id, key_col="violation_key"
            )
        emit(_violation_verdicts(scoped, viol, c.constraint_id, part_col), c.params_json, t0)

    def run_check(c: Check, t0: float) -> None:
        if c.kind == "schema_assert":
            scoped, todo = pending_filter(c.constraint_id, docs)
            if not todo:
                skipped.append(c.constraint_id)
                return
            out = schema_assert(
                scoped, DOCUMENTS_SCHEMA, part_col, tuple(c.params.get("not_null", ()))
            )
            emit(out, c.params_json, t0)
        elif c.kind == "stats":
            scoped, todo = pending_filter(c.constraint_id, profile.with_n_spans(docs))
            if not todo:
                skipped.append(c.constraint_id)
                return
            spec = StatSpec(
                c.column,
                max_null_rate=float(c.params.get("max_null_rate", 1.0)),
                lo=c.params.get("lo"),
                hi=c.params.get("hi"),
            )
            out, _metrics = column_stats(scoped, [spec], part_col)
            emit(out, c.params_json, t0)
        elif c.kind == "unique":
            # uniqueness is global: a resumed run must still scan all rows to
            # find cross-partition duplicates — but check the pending set
            # FIRST so a fully-completed resume pays nothing (the violations
            # write below is eager and runs the whole duplicate scan)
            ids = pending_ids([c.constraint_id])
            if ids is not None and not ids:
                skipped.append(c.constraint_id)
                return
            if c.params.get("store_path"):
                # incremental mode: this table is an ingest INCREMENT and
                # uniqueness means "no key already in the persisted corpus
                # index, no key twice in the batch" — the cross-snapshot
                # contract validate_increment defers to (snapshots.py).
                # The store increment lands at params.increment_path (if
                # set) for the orchestrator to append AFTER the batch
                # commits — never auto-appended here, or a failed commit
                # would poison the index.
                from sat_val_framework_spark.operators.uniqueness import (
                    incremental_unique_check,
                )

                store = spark.read.parquet(c.params["store_path"])
                out, viol, inc = incremental_unique_check(
                    docs,
                    store,
                    key=c.column,
                    part_col=part_col,
                    constraint_id=c.constraint_id,
                )
                if c.params.get("increment_path"):
                    inc.write.mode("overwrite").parquet(c.params["increment_path"])
                # in_store/dup_count ride into the violations table's
                # detail_json — the triage columns for WHY a key flagged
            else:
                out, viol = uniqueness_check(docs, c.column, part_col)
            if violations_path:
                ckpt.append_violations(
                    viol, violations_path, run_id, c.constraint_id, key_col="violation_key"
                )
            scoped, _ = pending_filter(c.constraint_id, out.withColumnRenamed("part_id", part_col))
            emit(scoped.withColumnRenamed(part_col, "part_id"), c.params_json, t0)
        elif c.kind == "fd":
            # same global-check shape as 'unique': violating determinant
            # groups span partitions, so a resumed run still scans all rows
            # — but a fully-completed resume pays nothing
            ids = pending_ids([c.constraint_id])
            if ids is not None and not ids:
                skipped.append(c.constraint_id)
                return
            out, viol = fd_check(docs, c.column, part_col)
            if violations_path:
                ckpt.append_violations(
                    viol, violations_path, run_id, c.constraint_id, key_col="violation_key"
                )
            scoped, _ = pending_filter(c.constraint_id, out.withColumnRenamed("part_id", part_col))
            emit(scoped.withColumnRenamed(part_col, "part_id"), c.params_json, t0)
        elif c.kind == "ref":
            if catalog is None:
                raise ValueError("ref check requires catalog=")
            scoped, todo = pending_filter(c.constraint_id, docs)
            if not todo:
                skipped.append(c.constraint_id)
                return
            out, viol = referential_check(
                scoped,
                catalog,
                part_col,
                strategy=c.params.get("strategy", "broadcast"),
                constraint_id=c.constraint_id,
            )
            if violations_path:
                ckpt.append_violations(
                    viol, violations_path, run_id, c.constraint_id, key_col="media_ref"
                )
            emit(out, c.params_json, t0)
        elif c.kind in DRIFT_KINDS:
            if baseline is None:
                raise ValueError("drift checks require baseline=")
            siblings = drift_cols[c.column]  # {kind: Check} for this column
            series = _series_for(docs, c.column, part_col)
            sibling_ids = [sib.constraint_id for sib in siblings.values()]
            scoped, todo = pending_filter(sibling_ids, series)
            if not todo:
                skipped.append(c.constraint_id)
                return
            out, _scores = drift_check(
                scoped,
                baseline,
                c.column,
                ks_threshold=float(siblings["drift_ks"].params["threshold"])
                if "drift_ks" in siblings
                else 0.15,
                psi_threshold=float(siblings["drift_psi"].params["threshold"])
                if "drift_psi" in siblings
                else 0.2,
                emd_threshold=float(siblings["drift_emd"].params["threshold"])
                if "drift_emd" in siblings
                else 1.0,
                kl_threshold=float(siblings["drift_kl"].params["threshold"])
                if "drift_kl" in siblings
                else 0.15,
                part_col=part_col,
                stats=tuple(k.removeprefix("drift_") for k in siblings),
            )
            # one shared pass, but each sibling's rows carry its own params
            for sib in siblings.values():
                emit(out.filter(F.col("constraint_id") == sib.constraint_id), sib.params_json, t0)
        elif c.kind == "drift_categorical":
            if baseline_cat is None:
                raise ValueError("drift_categorical checks require baseline_cat=")
            from sat_val_framework_spark.operators.drift import categorical_drift_check

            series = _cat_series_for(docs, c.column, part_col)
            scoped, todo = pending_filter(c.constraint_id, series)
            if not todo:
                skipped.append(c.constraint_id)
                return
            out, _scores = categorical_drift_check(
                scoped,
                baseline_cat,
                c.column,
                tv_threshold=float(c.params["tv_threshold"]),
                js_threshold=(
                    float(c.params["js_threshold"]) if "js_threshold" in c.params else None
                ),
                part_col=part_col,
            )
            emit(out, c.params_json, t0)
        elif c.kind == "repetition":
            from sat_val_framework_spark.functions.text import repetition_profile

            scoped, todo = pending_filter(c.constraint_id, _doc_text(docs, part_col))
            if not todo:
                skipped.append(c.constraint_id)
                return
            rep = repetition_profile(scoped, carry_cols=[part_col])
            max_dwf = c.params.get("max_dup_word_frac")
            max_tbf = c.params.get("max_top_bigram_frac")
            cond = F.lit(False)
            if max_dwf is not None:
                cond = cond | (F.col("dup_word_frac") > max_dwf)
            if max_tbf is not None:
                cond = cond | (F.col("top_bigram_frac") > max_tbf)
            viol = rep.filter(cond).select(
                F.col(part_col).alias("part_id"), F.col("doc_id").alias("violation_key")
            )
            emit_doc_violations(scoped, viol, c, t0)
        elif c.kind == "contamination":
            from sat_val_framework_spark.functions.dedup import cross_contamination

            scoped, todo = pending_filter(c.constraint_id, _doc_text(docs, part_col))
            if not todo:
                skipped.append(c.constraint_id)
                return
            # a missing/unreadable reference corpus raises here and becomes
            # a retryable ERROR verdict (errors-as-values) via run_check's
            # catch — resume retries after the path is fixed
            ref = spark.read.parquet(c.params["ref_path"])
            # key on (part, doc) — duplicate doc_ids spanning partitions
            # (the defect the unique check models) must NOT merge texts
            # into one LSH signature / nondeterministic attribution
            # (advice r4); \x1f cannot occur in the fixtures' ids and a
            # collision would only merge two already-identical keys
            keyed = _rid_keyed(scoped, part_col)
            max_bucket = c.params.get("max_bucket_size")
            pairs = cross_contamination(
                keyed.select(F.col("__rid").alias("doc_id"), "text"),
                ref,
                threshold=float(c.params.get("threshold", 0.8)),
                max_bucket_size=max_bucket,
            )
            hits = pairs.select(F.col("a_id").alias("__rid")).distinct()
            # contaminated docs are FEW relative to the corpus (else the
            # corpus IS the benchmark) — broadcast the hit set back for
            # partition attribution, same rationale as uniqueness_check
            viol = keyed.join(F.broadcast(hits), "__rid", "left_semi").select(
                F.col(part_col).alias("part_id"), F.col("doc_id").alias("violation_key")
            )
            if max_bucket is not None and violations_path:
                # no-silent-caps contract (dedup.py): when a cap can
                # degrade recall, the oversized-bucket audit is persisted
                # NEXT TO the capped output so the degradation is
                # queryable, never inferred (advice r4). Rebuilds the
                # union signatures with cross_contamination's exact
                # prefixing + token-less filter, so the audited buckets
                # are the ones the capped join actually saw; the extra
                # LSH pass is opt-in with the cap itself.
                from sat_val_framework_spark.functions.dedup import (
                    lsh_oversized_buckets,
                    minhash_signature,
                )
                from sat_val_framework_spark.functions.text import tokens_col

                def _pfx(df: DataFrame, tag: str) -> DataFrame:
                    return df.where(
                        F.size(tokens_col(F.col("text"))) > 0
                    ).select(
                        F.concat(F.lit(tag), F.col("doc_id").cast("string")).alias(
                            "doc_id"
                        ),
                        "text",
                    )

                both = _pfx(
                    keyed.select(F.col("__rid").alias("doc_id"), "text"), "a:"
                ).unionByName(_pfx(ref.select("doc_id", "text"), "b:"))
                audit = lsh_oversized_buckets(
                    minhash_signature(both), max_bucket_size=int(max_bucket)
                )
                ckpt.append_violations(
                    audit,
                    violations_path,
                    run_id,
                    c.constraint_id + "#oversized_buckets",
                    key_col="band_key",
                )
            emit_doc_violations(scoped, viol, c, t0)
        elif c.kind == "ngram_decontam":
            from sat_val_framework_spark.functions.dedup import ngram_hits

            scoped, todo = pending_filter(c.constraint_id, _doc_text(docs, part_col))
            if not todo:
                skipped.append(c.constraint_id)
                return
            # missing reference corpus -> retryable ERROR verdicts, same
            # errors-as-values contract as the contamination kind
            ref = spark.read.parquet(c.params["ref_path"])
            # physical-row key: duplicate doc_ids must not pool their
            # n-gram hit counts across partitions (advice r4)
            keyed = _rid_keyed(scoped, part_col)
            hits = ngram_hits(
                keyed.select(F.col("__rid").alias("doc_id"), "text"), ref,
                n=int(c.params.get("n", 13)),
            ).filter(F.col("n_hits") > int(c.params.get("max_hits", 0)))
            viol = keyed.join(
                F.broadcast(hits.select(F.col("doc_id").alias("__rid"))),
                "__rid",
                "left_semi",
            ).select(
                F.col(part_col).alias("part_id"), F.col("doc_id").alias("violation_key")
            )
            emit_doc_violations(scoped, viol, c, t0)
        elif c.kind == "span_grammar":
            from sat_val_framework_spark.operators.span_grammar import span_grammar_check

            scoped, todo = pending_filter(c.constraint_id, docs)
            if not todo:
                skipped.append(c.constraint_id)
                return
            out = span_grammar_check(
                scoped,
                c.params["allowed_kinds"],
                part_col,
                id_col=c.params.get("id_col", "doc_id"),
                require_text=bool(c.params.get("require_text", False)),
                require_media_ref=bool(c.params.get("require_media_ref", True)),
                check_order=bool(c.params.get("check_order", True)),
                require_spans=bool(c.params.get("require_spans", False)),
                spans_col=c.column,
                constraint_id=c.constraint_id,
            )
            emit(out, c.params_json, t0)
        elif c.kind == "quantile":
            from sat_val_framework_spark.operators.stats import quantile_check

            scoped, todo = pending_filter(c.constraint_id, _numeric_frame(docs, c.column, part_col))
            if not todo:
                skipped.append(c.constraint_id)
                return
            out = quantile_check(
                scoped,
                c.column,
                part_col,
                q=float(c.params.get("q", 0.5)),
                lo=c.params.get("lo"),
                hi=c.params.get("hi"),
                approx=bool(c.params.get("approx", True)),
                accuracy=int(c.params.get("accuracy", 10_000)),
            )
            emit(out, c.params_json, t0)
        elif c.kind == "outlier":
            from sat_val_framework_spark.operators.stats import outlier_check

            # rides the same derived-series plumbing as quantile/profile
            # (n_spans / text_len / any top-level numeric column)
            scoped, todo = pending_filter(c.constraint_id, _numeric_frame(docs, c.column, part_col))
            if not todo:
                skipped.append(c.constraint_id)
                return
            out = outlier_check(
                scoped,
                c.column,
                part_col,
                k=float(c.params.get("k", 1.5)),
                max_outlier_rate=float(c.params["max_outlier_rate"]),
                approx=bool(c.params.get("approx", True)),
                accuracy=int(c.params.get("accuracy", 10_000)),
            )
            emit(out, c.params_json, t0)
        elif c.kind == "distinct":
            from sat_val_framework_spark.operators.stats import distinct_bound_check

            # derived series ride the quantile/profile plumbing; any other
            # schema column (string ids included) is counted as-is — no
            # with_n_spans detour for columns the check doesn't derive
            frame = (
                _numeric_frame(docs, c.column, part_col)
                if c.column in ("n_spans", "text_len")
                else docs
            )
            scoped, todo = pending_filter(c.constraint_id, frame)
            if not todo:
                skipped.append(c.constraint_id)
                return
            out = distinct_bound_check(
                scoped,
                c.column,
                part_col,
                lo=c.params.get("lo"),
                hi=c.params.get("hi"),
                approx=bool(c.params.get("approx", True)),
                rsd=float(c.params.get("rsd", 0.01)),
            )
            emit(out, c.params_json, t0)
        elif c.kind == "profile":
            from sat_val_framework_spark.operators.stats import profile_check

            scoped, todo = pending_filter(c.constraint_id, _numeric_frame(docs, c.column, part_col))
            if not todo:
                skipped.append(c.constraint_id)
                return
            out = profile_check(
                scoped,
                c.column,
                part_col,
                max_top_share=c.params.get("max_top_share"),
                min_entropy=c.params.get("min_entropy"),
                min_distinct_ratio=c.params.get("min_distinct_ratio"),
            )
            emit(out, c.params_json, t0)
        elif c.kind == "subset":
            scoped, todo = pending_filter(c.constraint_id, docs)
            if not todo:
                skipped.append(c.constraint_id)
                return
            _surv, out, viol = subset_check(
                scoped, c.params["predicate"], c.constraint_id, part_col
            )
            if violations_path:
                ckpt.append_violations(
                    viol, violations_path, run_id, c.constraint_id, key_col="violation_key"
                )
            emit(out, c.params_json, t0)
        elif c.kind == "span_seq":
            if expected_docs is None:
                raise ValueError("span_seq check requires expected_docs=")
            scoped, todo = pending_filter(c.constraint_id, docs)
            if not todo:
                skipped.append(c.constraint_id)
                return
            out, _mm = span_seq_check(scoped, expected_docs, part_col)
            emit(out, c.params_json, t0)
        else:  # pragma: no cover - suite.validate blocks unknown kinds
            raise ValueError(f"unhandled check kind {c.kind}")

    seen_drift: set[str] = set()
    for c in suite.checks:
        t0 = time.time()
        if c.kind in DRIFT_KINDS:
            if c.column in seen_drift:
                continue  # sibling stat already handled by the shared pass
            seen_drift.add(c.column)
        try:
            run_check(c, t0)
        except Exception as exc:  # noqa: BLE001 — A1 errors-as-values
            if raise_on_error:
                raise
            # the reference's core trick (implement.py:23-56): a check that
            # cannot evaluate returns a typed error VALUE. Engine form: one
            # status=ERROR verdict row per pending partition, tagged with
            # the error kind — the run continues, the failure is queryable,
            # and resume retries exactly these pairs after the fix.
            kind = error_kind_of(exc)
            affected = (
                list(drift_cols[c.column].values())
                if c.kind in DRIFT_KINDS
                else [c]
            )
            for chk in affected:
                ids = pending_ids([chk.constraint_id])
                parts = all_parts if ids is None else all_parts.filter(F.col("part_id").isin(ids))
                ev = error_verdicts(parts, chk.constraint_id, kind, str(exc))
                try:
                    emit(ev, chk.params_json, t0)
                except Exception:  # noqa: BLE001
                    # the sink itself is broken (e.g. the original failure WAS
                    # the checkpoint append): re-emitting through the same
                    # path would raise out of run_suite. Degrade to in-memory
                    # ERROR verdicts — still returned, just not checkpointed,
                    # so the pair stays pending and retries after the fix.
                    collected.append(
                        finalize_verdicts(ev, run_id, chk.params_json, snapshot_id)
                    )

    if collected:
        verdicts = collected[0]
        for v in collected[1:]:
            verdicts = verdicts.unionByName(v)
    else:
        verdicts = spark.createDataFrame([], ckpt.VERDICT_SCHEMA)
    return RunResult(run_id=run_id, verdicts=verdicts, skipped=skipped)

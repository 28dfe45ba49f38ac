"""Typed, schema-validated constraint-suite config (SURVEY.md B13).

Realizes the reference's ``JointParameters`` contract: per-source
parameterization with type-checked pairing, validated eagerly before any
work runs (/root/reference/sat_val_framework/implement.py:147-162), and its
errors-as-values convention (implement.py:23-56): ``CheckSuite.validate``
*returns* config errors instead of raising.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import types as T

KINDS = frozenset(
    {
        "schema_assert",  # B2
        "stats",          # B3 per-column stats + bounds
        "unique",         # B4 salted uniqueness
        "ref",            # B5/B6 referential integrity
        "drift_ks",       # B7
        "drift_psi",      # B8
        "drift_emd",      # B7 family: Wasserstein-1 on the binned support
        "drift_kl",       # B7 family: KL(observed || baseline) — emerging-value sensitive
        "span_seq",       # B9 canonical span-sequence equality
        "subset",         # A14: parameterized predicate subsetter
        "profile",        # distribution profile as a constraint (top-share /
                          # entropy / distinct-ratio thresholds)
        "fd",             # functional dependency 'determinant->dependent'
                          # (uniqueness generalized: A3 invariants)
        "quantile",       # robust-location bound: q-quantile within [lo, hi]
        "outlier",        # tail-heaviness bound: Tukey-fence outlier rate
                          # (q25±k·IQR, per-partition fences) <= max
        "distinct",       # cardinality-health bound: per-partition distinct
                          # count within [lo, hi] (id collapse/explosion)
        "drift_categorical",  # tv/js vs a configured categorical baseline
                              # (unordered columns: kinds, sources, langs)
        "repetition",     # per-doc Gopher repetition signals thresholded
                          # into per-partition verdicts
        "contamination",  # cross-corpus LSH near-dup vs a reference corpus
        "ngram_decontam",  # exact word-n-gram overlap vs a reference corpus
                           # (the 13-gram benchmark decontamination rule)
        "span_grammar",   # internal grammar of the interleaved span array
                          # (kind vocabulary, media refs, text presence,
                          # strictly increasing offsets) — no reference table
    }
)

# leaf fields of the span struct each span_grammar rule reads; used to
# validate the declared column's element type driver-side
_SPAN_GRAMMAR_BOOL_PARAMS = (
    "require_text",
    "require_media_ref",
    "check_order",
    "require_spans",
)

PROFILE_THRESHOLD_PARAMS = ("max_top_share", "min_entropy", "min_distinct_ratio")


class SuiteConfigError(ValueError):
    """Config error value. Returned (not raised) by CheckSuite.validate."""


@dataclass(frozen=True)
class Check:
    kind: str
    column: str | None = None  # checked column ('' for table-level checks)
    params: dict = field(default_factory=dict)

    @property
    def constraint_id(self) -> str:
        if self.kind == "span_seq":
            return "span_seq_eq"  # FIXTURES.md §4 id; MUST match the operator's
        if self.kind == "schema_assert" or self.column is None:
            return self.kind
        col = self.column
        if self.kind == "unique" and "," in col:
            # canonicalize composite keys in ONE place: the operator emits
            # 'unique:source,doc_id' (stripped components), so a raw
            # 'source, doc_id' here would never match its verdicts and
            # checkpoint resume would re-run the check forever (ADVICE r3 —
            # the CLAUDE.md constraint-id gotcha, composite-unique flavor).
            # No leaf-split for composites: 'a,b.c'.split('.')[-1] would
            # mangle the id to 'c' while the operator emits the full tuple
            # (review finding r4; validate also rejects dotted components)
            return f"{self.kind}:{','.join(k.strip() for k in col.split(','))}"
        # leaf name: 'spans.media_ref' -> 'ref:media_ref' (FIXTURES.md §4 ids)
        return f"{self.kind}:{col.split('.')[-1]}"

    @property
    def params_json(self) -> str:
        return json.dumps(self.params, sort_keys=True)


def _field_type(schema: T.StructType, dotted: str) -> T.DataType | None:
    """Resolve 'spans.media_ref'-style paths through arrays of structs."""
    cur: T.DataType = schema
    for part in dotted.split("."):
        if isinstance(cur, T.ArrayType):
            cur = cur.elementType
        if not isinstance(cur, T.StructType) or part not in cur.fieldNames():
            return None
        cur = cur[part].dataType
    return cur


# columns derivable from the documents shape by profile.py rather than
# present in the schema (n_spans = size(spans); text_len = per-text-span len)
DERIVED_COLUMNS = frozenset({"n_spans", "text_len"})

# categorical series derivable from the documents shape ('kind' = per-span
# kind labels); any top-level schema column also works (cast to string)
CATEGORICAL_DERIVED = frozenset({"kind"})

# thresholds accepted by the repetition kind (at least one required)
REPETITION_THRESHOLD_PARAMS = ("max_dup_word_frac", "max_top_bigram_frac")


@dataclass
class CheckSuite:
    checks: list[Check]

    def validate(
        self,
        df: DataFrame,
        part_col: str = "part_id",
        derived: frozenset[str] = DERIVED_COLUMNS,
    ) -> list[SuiteConfigError]:
        """Driver-side, pre-job validation of every check against the actual
        schema. Returns error values — empty list means the suite is sound."""
        errors: list[SuiteConfigError] = []
        schema = df.schema
        if part_col not in schema.fieldNames():
            errors.append(SuiteConfigError(f"partition column '{part_col}' missing from schema"))
        for c in self.checks:
            if c.kind not in KINDS:
                errors.append(SuiteConfigError(f"unknown check kind '{c.kind}'"))
                continue
            if c.kind == "profile":
                if not any(p in c.params for p in PROFILE_THRESHOLD_PARAMS):
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: at least one of "
                            f"{PROFILE_THRESHOLD_PARAMS} required"
                        )
                    )
                if c.column and c.column not in derived and _field_type(schema, c.column) is None:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: column '{c.column}' not in schema")
                    )
            if c.kind in ("stats", "unique", "drift_ks", "drift_psi", "drift_emd", "drift_kl") and c.column:
                # 'unique' accepts a comma-joined composite key: each
                # component must resolve (e.g. 'source,doc_id')
                parts = (
                    [k.strip() for k in c.column.split(",")]
                    if c.kind == "unique"
                    else [c.column]
                )
                if c.kind == "unique":
                    for p in ("store_path", "increment_path"):
                        val = c.params.get(p)
                        if val is not None and (not isinstance(val, str) or not val):
                            # a non-string path raises mid-job (retryable
                            # ERROR re-run-forever class) — reject eagerly
                            errors.append(
                                SuiteConfigError(
                                    f"{c.constraint_id}: params.{p} must be a non-empty string"
                                )
                            )
                    if c.params.get("increment_path") and not c.params.get("store_path"):
                        errors.append(
                            SuiteConfigError(
                                f"{c.constraint_id}: params.increment_path requires "
                                "params.store_path (incremental mode)"
                            )
                        )
                if c.kind == "unique" and any("." in k for k in parts):
                    # dotted components break constraint-id parity: the
                    # operator embeds the full path, Check.constraint_id
                    # the leaf — the resume-forever class (mirrors the fd
                    # kind's dot rejection; review finding r4)
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: unique key components must be dot-free "
                            f"top-level columns, got '{c.column}'"
                        )
                    )
                    continue
                for col in parts:
                    if col not in derived and _field_type(schema, col) is None:
                        errors.append(
                            SuiteConfigError(f"{c.constraint_id}: column '{col}' not in schema")
                        )
                    elif (
                        c.kind.startswith("drift_")
                        and col not in derived
                        and not isinstance(_field_type(schema, col), T.NumericType)
                    ):
                        # drift now accepts arbitrary columns; a string
                        # column would fail mid-job (ANSI cast raise -> a
                        # retryable ERROR verdict that re-runs forever on
                        # resume) — reject it driver-side instead
                        errors.append(
                            SuiteConfigError(
                                f"{c.constraint_id}: drift column '{col}' must be numeric, "
                                f"got {_field_type(schema, col).simpleString()}"
                            )
                        )
            if c.kind == "outlier":
                rate = c.params.get("max_outlier_rate")
                if rate is None or not isinstance(rate, (int, float)) or not 0 <= rate < 1:
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: params.max_outlier_rate in [0, 1) required"
                        )
                    )
                kk = c.params.get("k", 1.5)
                if not isinstance(kk, (int, float)) or kk <= 0:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: params.k must be positive")
                    )
                if c.column and "." in c.column:
                    # dotted columns break constraint-id parity (operator
                    # embeds the full path, Check.constraint_id the leaf) —
                    # the resume-forever class, same rule as quantile
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: outlier column must be a dot-free "
                            f"top-level column, got '{c.column}'"
                        )
                    )
                elif c.column and c.column not in derived:
                    ft = _field_type(schema, c.column)
                    if ft is None:
                        errors.append(
                            SuiteConfigError(f"{c.constraint_id}: column '{c.column}' not in schema")
                        )
                    elif not isinstance(ft, T.NumericType):
                        errors.append(
                            SuiteConfigError(
                                f"{c.constraint_id}: outlier column '{c.column}' must be "
                                f"numeric, got {ft.simpleString()}"
                            )
                        )
            if c.kind == "distinct":
                lo, hi = c.params.get("lo"), c.params.get("hi")
                if lo is None and hi is None:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: at least one of params.lo/hi required")
                    )
                for name, b in (("lo", lo), ("hi", hi)):
                    # bool is an int subclass but a bound of True is a
                    # config mistake; floats allowed (approx sketch counts)
                    if b is not None and (isinstance(b, bool) or not isinstance(b, (int, float))):
                        errors.append(
                            SuiteConfigError(f"{c.constraint_id}: params.{name} must be numeric")
                        )
                if not c.column:
                    errors.append(SuiteConfigError("distinct: column required"))
                elif "." in c.column:
                    # dotted columns break constraint-id parity (operator
                    # embeds the full path, Check.constraint_id the leaf) —
                    # the resume-forever class, same rule as quantile/outlier
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: distinct column must be a dot-free "
                            f"top-level column, got '{c.column}'"
                        )
                    )
                elif c.column not in derived and _field_type(schema, c.column) is None:
                    # ANY type counts distinct values — no numeric requirement
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: column '{c.column}' not in schema")
                    )
            if c.kind == "quantile":
                qv = c.params.get("q", 0.5)
                if not isinstance(qv, (int, float)) or not 0 < qv < 1:
                    errors.append(SuiteConfigError(f"{c.constraint_id}: params.q must be in (0,1)"))
                lo, hi = c.params.get("lo"), c.params.get("hi")
                if lo is None and hi is None:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: at least one of params.lo/hi required")
                    )
                for name, b in (("lo", lo), ("hi", hi)):
                    # a string bound would either raise mid-job (ANSI cast,
                    # retried forever) or NULL out the breach test (silent
                    # all-PASS) — reject it eagerly
                    if b is not None and not isinstance(b, (int, float)):
                        errors.append(
                            SuiteConfigError(f"{c.constraint_id}: params.{name} must be numeric")
                        )
                if c.column and "." in c.column:
                    # dotted columns break constraint-id parity (the operator
                    # embeds the full path, Check.constraint_id the leaf) and
                    # array-nested numerics can't feed percentile anyway
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: quantile column must be a dot-free "
                            f"top-level column, got '{c.column}'"
                        )
                    )
                elif c.column and c.column not in derived:
                    ft = _field_type(schema, c.column)
                    if ft is None:
                        errors.append(
                            SuiteConfigError(f"{c.constraint_id}: column '{c.column}' not in schema")
                        )
                    elif not isinstance(ft, T.NumericType):
                        errors.append(
                            SuiteConfigError(
                                f"{c.constraint_id}: quantile column '{c.column}' must be "
                                f"numeric, got {ft.simpleString()}"
                            )
                        )
            if c.kind == "fd":
                from sat_val_framework_spark.operators.uniqueness import parse_fd_spec

                try:
                    dets, dep = parse_fd_spec(c.column or "")
                except ValueError as e:
                    errors.append(SuiteConfigError(f"{c.constraint_id}: {e}"))
                else:
                    for col in [*dets, dep]:
                        if col not in derived and _field_type(schema, col) is None:
                            errors.append(
                                SuiteConfigError(
                                    f"{c.constraint_id}: column '{col}' not in schema"
                                )
                            )
            if c.kind == "ref":
                if not c.params.get("dim_table_alias"):
                    errors.append(SuiteConfigError(f"{c.constraint_id}: params.dim_table_alias required"))
                if c.column and _field_type(schema, c.column) is None:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: column '{c.column}' not in schema")
                    )
            if c.kind == "subset":
                pred = c.params.get("predicate")
                if not pred or not isinstance(pred, str):
                    errors.append(SuiteConfigError(f"{c.constraint_id}: params.predicate (SQL string) required"))
                else:
                    try:
                        df.filter(pred).schema  # parse + resolve against df, no job
                    except Exception as e:
                        errors.append(
                            SuiteConfigError(f"{c.constraint_id}: bad predicate {pred!r}: {e}")
                        )
            if c.kind in ("drift_ks", "drift_psi", "drift_emd", "drift_kl"):
                thr = c.params.get("threshold")
                if thr is None or not isinstance(thr, (int, float)) or thr <= 0:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: positive params.threshold required")
                    )
            if c.kind == "drift_categorical":
                tvt = c.params.get("tv_threshold")
                if tvt is None or not isinstance(tvt, (int, float)) or tvt <= 0:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: positive params.tv_threshold required")
                    )
                jst = c.params.get("js_threshold")
                if jst is not None and (not isinstance(jst, (int, float)) or jst <= 0):
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: params.js_threshold must be positive")
                    )
                if (
                    c.column
                    and c.column not in CATEGORICAL_DERIVED
                    and ("." in c.column or _field_type(schema, c.column) is None)
                ):
                    # dotted paths are rejected outright (constraint-id
                    # parity: the operator embeds the column name the runner
                    # derived the series from, Check.constraint_id the leaf)
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: column '{c.column}' must be a derived "
                            f"categorical series {sorted(CATEGORICAL_DERIVED)} or a "
                            "dot-free top-level column"
                        )
                    )
            if c.kind == "repetition":
                if not any(p in c.params for p in REPETITION_THRESHOLD_PARAMS):
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: at least one of "
                            f"{REPETITION_THRESHOLD_PARAMS} required"
                        )
                    )
                for p in REPETITION_THRESHOLD_PARAMS:
                    val = c.params.get(p)
                    if val is not None and (
                        not isinstance(val, (int, float)) or not 0 <= val <= 1
                    ):
                        errors.append(
                            SuiteConfigError(f"{c.constraint_id}: params.{p} must be in [0,1]")
                        )
            if c.kind == "span_grammar":
                ak = c.params.get("allowed_kinds")
                if (
                    not isinstance(ak, list)
                    or not ak
                    or not all(isinstance(k, str) for k in ak)
                ):
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: params.allowed_kinds must be a "
                            "non-empty list of strings"
                        )
                    )
                for p in _SPAN_GRAMMAR_BOOL_PARAMS:
                    val = c.params.get(p)
                    if val is not None and not isinstance(val, bool):
                        errors.append(
                            SuiteConfigError(f"{c.constraint_id}: params.{p} must be a bool")
                        )
                if not c.column:
                    errors.append(SuiteConfigError("span_grammar: column required"))
                elif "." in c.column:
                    # dotted columns break constraint-id parity (operator
                    # embeds the column name, Check.constraint_id the leaf)
                    # and the operator addresses a top-level array column
                    errors.append(
                        SuiteConfigError(
                            f"{c.constraint_id}: span_grammar column must be a dot-free "
                            f"top-level column, got '{c.column}'"
                        )
                    )
                else:
                    ft = _field_type(schema, c.column)
                    elem = ft.elementType if isinstance(ft, T.ArrayType) else None
                    if not isinstance(elem, T.StructType):
                        errors.append(
                            SuiteConfigError(
                                f"{c.constraint_id}: column '{c.column}' must be an "
                                "array of structs"
                            )
                        )
                    else:
                        # each ENABLED rule's leaf must exist — a missing
                        # leaf would otherwise raise at plan time and
                        # become a retryable ERROR verdict that re-runs
                        # forever on resume (the quantile/drift rationale)
                        needed = ["kind"]
                        if c.params.get("require_text", False):
                            needed.append("text")
                        if c.params.get("require_media_ref", True):
                            needed.append("media_ref")
                        if c.params.get("check_order", True):
                            needed.append("offset")
                        missing = [f for f in needed if f not in elem.fieldNames()]
                        if missing:
                            errors.append(
                                SuiteConfigError(
                                    f"{c.constraint_id}: span struct missing "
                                    f"field(s) {missing} required by the enabled rules"
                                )
                            )
            if c.kind in ("contamination", "ngram_decontam"):
                if not c.params.get("ref_path") or not isinstance(c.params.get("ref_path"), str):
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: params.ref_path (parquet path) required")
                    )
            if c.kind == "contamination":
                thr = c.params.get("threshold", 0.8)
                if not isinstance(thr, (int, float)) or not 0 < thr <= 1:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: params.threshold must be in (0,1]")
                    )
            if c.kind == "ngram_decontam":
                nv = c.params.get("n", 13)
                if not isinstance(nv, int) or nv < 2:
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: params.n must be an int >= 2")
                    )
                mh = c.params.get("max_hits", 0)
                if not isinstance(mh, int) or mh < 0:
                    # a string would raise mid-job (int() cast -> retryable
                    # ERROR re-run forever), a float silently truncates —
                    # reject both eagerly like the quantile bounds
                    errors.append(
                        SuiteConfigError(f"{c.constraint_id}: params.max_hits must be an int >= 0")
                    )
        seen: set[str] = set()
        for c in self.checks:
            if c.constraint_id in seen:
                errors.append(SuiteConfigError(f"duplicate constraint_id '{c.constraint_id}'"))
            seen.add(c.constraint_id)
        return errors

    def validate_or_raise(self, df: DataFrame, part_col: str = "part_id") -> None:
        errs = self.validate(df, part_col)
        if errs:
            raise SuiteConfigError("; ".join(str(e) for e in errs))

    def to_json(self) -> str:
        """Suite as data: a JSON array of {kind, column, params} — the form
        a config repo or an orchestrator templates (the reference's
        JointParameters are likewise plain paired values, implement.py:
        147-162). Round-trips through from_json losslessly (tested)."""
        return json.dumps(
            [{"kind": c.kind, "column": c.column, "params": c.params} for c in self.checks],
            indent=2,
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> CheckSuite:
        """Parse a suite from its JSON form. Malformed JSON or non-object
        entries raise SuiteConfigError immediately (config parse is eager,
        driver-side); schema-level problems — unknown kinds, missing
        columns, bad thresholds — surface later through ``validate`` so one
        call reports ALL of them as values, not just the first."""
        try:
            raw = json.loads(s)
        except json.JSONDecodeError as e:
            raise SuiteConfigError(f"suite config is not valid JSON: {e}") from e
        if not isinstance(raw, list):
            raise SuiteConfigError("suite config must be a JSON array of checks")
        checks = []
        for i, item in enumerate(raw):
            if not isinstance(item, dict) or "kind" not in item:
                raise SuiteConfigError(f"check #{i} must be an object with a 'kind'")
            params = item.get("params", {})
            if not isinstance(params, dict):
                raise SuiteConfigError(f"check #{i}: params must be an object")
            col = item.get("column")
            # coerce to str so a numeric column surfaces through validate()
            # as a config-error VALUE instead of crashing constraint_id
            checks.append(Check(str(item["kind"]), None if col is None else str(col), params))
        return CheckSuite(checks)

"""B10: whole-document gating (None-propagation contract).

In the reference, if ANY member of a collocation event fails to load or
subset, the ENTIRE event becomes None and is dropped — and that drop is
observable (/root/reference/sat_val_framework/implement.py:185-187,211-213).
Engine form: a document failing any gating check is excluded as a unit via
LEFT ANTI join against the union of per-check violating doc_ids, and the
rejections are themselves emitted as verdict rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sat_val_framework_spark.verdicts import FAIL, PASS, bounded_samples


def gate_documents(
    docs: DataFrame,
    violating_doc_ids: list[DataFrame],
    part_col: str = "part_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """-> (surviving docs, rejected docs, per-partition gating verdicts).

    ``violating_doc_ids``: DataFrames each having a ``doc_id`` column (the
    violation outputs of other checks). Dedup before the anti join so a doc
    failing three checks is rejected once.
    """
    if not violating_doc_ids:
        bad = docs.select("doc_id").limit(0)
    else:
        bad = violating_doc_ids[0].select("doc_id")
        for v in violating_doc_ids[1:]:
            bad = bad.unionByName(v.select("doc_id"))
    bad = bad.distinct()

    surviving = docs.join(bad, "doc_id", "left_anti")
    rejected = docs.join(bad, "doc_id", "left_semi")

    per_part = docs.groupBy(F.col(part_col).alias("part_id")).agg(
        F.count(F.lit(1)).alias("rows_scanned")
    )
    # bounded sampler (window top-10 + exact count): the rejected frame is
    # all-violators, so a collect_list here would buffer every rejected id
    # per partition — unbounded under a gate that rejects en masse
    rej_agg = bounded_samples(
        rejected.select(F.col(part_col).alias("part_id"), "doc_id"), "part_id", "doc_id"
    )
    verdicts = per_part.join(rej_agg, "part_id", "left").select(
        F.lit("gate:any_violation").alias("constraint_id"),
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
    return surviving, rejected, verdicts

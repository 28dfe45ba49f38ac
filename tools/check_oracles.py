"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry via Spark and its oracle_sql() twin via
DuckDB on the same sf dir; compare row count, column names, and an
order-insensitive value hash. Strict string-equality on values (both sides
round doubles to 6dp in the queries themselves), with an approx fallback
report so float-edge risks are visible before the driver sees them.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod
from sat_val_framework_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 6dp rounding happens in the queries; normalize float repr only
        return repr(round(v, 9))
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest(), lines


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(app_name="check_oracles")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    n_pass = n_fail = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        # the driver's pandas-based canonicalizer crashes on list cells
        # (sort_values -> factorize -> unhashable type 'list') — catch the
        # shape locally even for rows-only queries (r1: frame_plan)
        arr_cols = [f.name for f in sdf.schema.fields if f.dataType.typeName() in ("array", "map", "struct")]
        if arr_cols:
            print(f"FAIL  {name}: array/map/struct output columns {arr_cols} crash the driver canon")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(srows)} (no oracle; rows-only)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            # HUGEINT (e.g. an uncast windowed sum()) survives fetchall() as
            # int but becomes float64 in the driver's pandas canon — flag the
            # TYPE, since values alone pass here but fail there (r1: sessionize)
            huge = [c for c, t in zip(rel.columns, rel.types) if str(t) in ("HUGEINT", "UHUGEINT")]
            if huge:
                raise TypeError(
                    f"oracle emits HUGEINT column(s) {huge}: cast to ::bigint "
                    "(driver pandas canon converts HUGEINT to float64)"
                )
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        sh, slines = frame_fingerprint(scols, srows)
        dh, dlines = frame_fingerprint(dcols, drows)
        if ok_cols and len(srows) == len(drows) and sh == dh:
            print(f"PASS  {name}: rows={len(srows)}")
            n_pass += 1
        else:
            n_fail += 1
            print(
                f"FAIL  {name}: rows {len(srows)} vs {len(drows)}, cols_ok={ok_cols} "
                f"({sorted(scols)} vs {sorted(dcols)}), hash_ok={sh == dh}"
            )
            for a, b in list(zip(slines, dlines))[:200]:
                if a != b:
                    print(f"   spark : {a[:200]}")
                    print(f"   duckdb: {b[:200]}")
                    break
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""Snapshot-versioned table (manifest-based) — the time-travel contract
locally, without the Iceberg runtime.

Production runs this engine over Iceberg (``readers.read_iceberg_table``);
this sandbox has no Iceberg jars, so the SNAPSHOT SEMANTICS the north star
needs — immutable snapshots, append = new snapshot over old+new files,
time-travel reads for reproducible re-validation, snapshot id in verdict
lineage — are realized here the way Iceberg itself does it: a manifest per
snapshot listing immutable data files. Data files are never rewritten or
deleted; a snapshot is a JSON manifest naming the parquet files it covers,
so reading snapshot N is just ``spark.read.parquet(*files_of(N))`` and old
snapshots stay readable after any number of appends/overwrites.

This is NOT Iceberg (no hidden partitioning, no row-level deletes) — it is
the minimal honest realization of the contracts the reference pins down:
durable discovery output that later runs reload and re-parameterize
(usable.py:51-62) and lineage that records exactly which data produced
each verdict (implement.py:81-86) — plus the table-maintenance surface a
lake needs around them: writer-schema tracking + diff, range-clustered
writes with per-file stats and file skipping, small-file compaction, and
write-audit-publish gated on this engine's own verdicts.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import urllib.parse
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _manifest_dir(table_dir: str) -> str:
    return os.path.join(os.path.abspath(table_dir), "snapshots")


def _manifests(table_dir: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(os.path.join(_manifest_dir(table_dir), "*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return sorted(out, key=lambda m: m["seq"])


def snapshots(table_dir: str) -> list[dict]:
    """All snapshots, oldest first: {snapshot_id, seq, n_files, parent}."""
    return [
        {
            "snapshot_id": m["snapshot_id"],
            "seq": m["seq"],
            "n_files": len(m["files"]),
            "parent": m.get("parent"),
        }
        for m in _manifests(table_dir)
    ]


def _strip_scheme(p: str) -> str:
    return p[7:] if p.startswith("file://") else p


def _file_key(p: str) -> tuple[str, str]:
    """(data-dir uuid, part-file name) — the spelling-proof identity of a
    data file. input_file_name() yields a scheme'd, URI-escaped ABSOLUTE
    path while the manifest records the glob'd (possibly relative) path;
    comparing full strings silently matched nothing for relative
    table_dirs, degrading every stats lookup to {} (ADVICE r3 — the same
    path-spelling trap orphan_data_dirs fixed by comparing basenames).
    The data-dir uuid + part name pair is unique per table by
    construction (_stage_data)."""
    p = urllib.parse.unquote(_strip_scheme(p))
    return (os.path.basename(os.path.dirname(p)), os.path.basename(p))


def _file_stats(df_written, files: list[str], stats_cols: list[str]) -> dict:
    """Per-file min/max for the listed columns — the manifest-level column
    statistics Iceberg keeps per data file, computed with ONE hash-agg over
    the just-written files (grouped on input_file_name)."""
    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"min__{c}"), F.max(c).alias(f"max__{c}")]
    rows = (
        df_written.withColumn("__f", F.input_file_name())
        .groupBy("__f")
        .agg(*aggs)
        .collect()  # one row per data file: metadata-sized
    )
    stats: dict = {}
    for r in rows:
        stats[_file_key(r["__f"])] = {
            c: [r[f"min__{c}"], r[f"max__{c}"]] for c in stats_cols
        }
    return {f: stats.get(_file_key(f), {}) for f in files}


def write_snapshot(
    df: DataFrame,
    table_dir: str,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
    n_files: int | None = None,
) -> str:
    """Write ``df`` as a new immutable snapshot; returns its snapshot id.

    mode='append': the new snapshot covers the parent snapshot's files PLUS
    the newly written ones. mode='overwrite': covers only the new files —
    but nothing is deleted, so every older snapshot remains readable
    (time travel). The snapshot id is content-addressed (hash of the file
    list), so identical data states get identical ids across retries.

    ``stats_cols``: record per-file min/max for these columns in the
    manifest (Iceberg's data-file column stats). Later reads with
    ``prune=`` skip files whose range cannot match — file skipping, the
    scan-side pruning a 100 TB table lives on. Parent files keep their
    recorded stats across appends.

    ``cluster_by``: range-cluster the data across files on these columns
    before writing (``repartitionByRange`` — a sample-based range shuffle —
    plus an in-file sort). Without clustering every file spans the whole
    value domain and min/max pruning keeps everything; clustered, the
    per-file ranges are near-disjoint and a range read touches O(selectivity)
    files (Iceberg's write-ordering story, 1-D). One extra shuffle paid once
    at write time, amortized over every pruned read; stats for the cluster
    columns are recorded automatically."""
    _check_mode(mode)  # BEFORE staging: a typo'd mode must not run the write job
    new_files = _stage_data(df, table_dir, cluster_by, n_files)
    if cluster_by:
        stats_cols = list(dict.fromkeys([*(stats_cols or []), *cluster_by]))
    return _publish(df.sparkSession, df.schema, table_dir, new_files, mode, stats_cols)


def _check_mode(mode: str) -> None:
    if mode not in ("append", "overwrite"):
        raise ValueError(f"unknown mode '{mode}'")


def _stage_data(
    df: DataFrame,
    table_dir: str,
    cluster_by: list[str] | None = None,
    n_files: int | None = None,
) -> list[str]:
    """Write data files WITHOUT a manifest — staged, invisible to every
    reader until ``_publish`` drops the manifest (Iceberg's WAP staging)."""
    if cluster_by:
        n = n_files or df.sparkSession.sparkContext.defaultParallelism
        df = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(*cluster_by)
    # abspath at the Python/JVM boundary: Spark resolves a RELATIVE write
    # path against the JVM's launch cwd while glob resolves against the
    # CURRENT cwd — a relative table_dir would write the data one place and
    # manifest another (ADVICE r3 path-spelling family, worst case)
    data_dir = os.path.join(os.path.abspath(table_dir), "data", uuid.uuid4().hex[:12])
    df.write.mode("error").parquet(data_dir)
    return sorted(glob.glob(os.path.join(data_dir, "part-*.parquet")))


def _publish(
    spark: SparkSession,
    schema: T.StructType,
    table_dir: str,
    new_files: list[str],
    mode: str,
    stats_cols: list[str] | None,
) -> str:
    _check_mode(mode)
    prior = _manifests(table_dir)
    parent = prior[-1] if prior else None
    files = (parent["files"] if parent and mode == "append" else []) + new_files
    seq = (parent["seq"] + 1) if parent else 1
    snap_id = hashlib.md5("\n".join(files).encode()).hexdigest()[:16]
    stats: dict = {}
    if parent and mode == "append":
        stats.update(parent.get("stats", {}))
    if stats_cols and new_files:
        stats.update(_file_stats(spark.read.parquet(*new_files), new_files, stats_cols))
    manifest = {
        "snapshot_id": snap_id,
        "seq": seq,
        "files": files,
        "parent": parent["snapshot_id"] if parent else None,
        "mode": mode,
        "stats": stats,
        # writer-schema capture (Iceberg's schema tracking): enables
        # schema_diff between any two snapshots without touching data files
        "schema": {f.name: [f.dataType.simpleString(), f.nullable] for f in schema.fields},
    }
    os.makedirs(_manifest_dir(table_dir), exist_ok=True)
    path = os.path.join(_manifest_dir(table_dir), f"{seq:08d}-{snap_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, path)  # atomic publish: readers never see a torn manifest
    return snap_id


def _manifest_for(table_dir: str, snapshot_id: str | None) -> dict:
    ms = _manifests(table_dir)
    if not ms:
        raise FileNotFoundError(f"no snapshots in table '{table_dir}'")
    if snapshot_id is None:
        return ms[-1]
    matches = [x for x in ms if x["snapshot_id"] == snapshot_id]
    if not matches:
        raise FileNotFoundError(f"snapshot '{snapshot_id}' not found in table '{table_dir}'")
    return matches[-1]


def added_files(table_dir: str, snapshot_id: str | None = None) -> list[str]:
    """Data files snapshot N added over its parent N-1 (everything, for the
    first snapshot or an overwrite). This is the planning input for
    incremental validation: the nightly run of a 100 TB lake validates only
    the appended files, not the whole table."""
    m = _manifest_for(table_dir, snapshot_id)
    parent_files: set[str] = set()
    if m.get("parent"):
        parent_files = set(_manifest_for(table_dir, m["parent"])["files"])
    return [f for f in m["files"] if f not in parent_files]


def read_increment(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: str | None = None,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Read ONLY the rows snapshot N added over N-1 — the snapshot-diff scan
    (Iceberg's incremental read) on the local manifest table. Scans just the
    added files; assert via ``df.inputFiles()``."""
    files = added_files(table_dir, snapshot_id)
    if not files:
        if schema is None:
            raise ValueError(
                f"snapshot diff for '{snapshot_id}' is empty; pass schema= "
                "to read it as an empty DataFrame"
            )
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(*files)


def validate_increment(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: str | None = None,
    schema: T.StructType | None = None,
    **run_suite_kwargs,
):
    """Run the validation suite over ONLY the files snapshot N added over
    N-1, stamping N's snapshot id on every verdict (A19/A20 applied to
    appends: the reference reloads its durable discovery output and re-runs
    with new parameters, usable.py:51-62 — here the 'new parameters' are
    the new data files). Partition-scoped constraints over the increment
    equal the same constraints of a full run when appends carry fresh
    partitions (the date-partitioned-lake regime; tested). GLOBAL
    constraints: declare the 'unique' check with ``params.store_path`` —
    the increment then validates its keys against the corpus's persisted
    distinct-key index (operators/uniqueness.py:incremental_unique_check)
    instead of needing a full rescan; without a store the increment
    cannot see an older snapshot's keys and only within-increment
    uniqueness is checked (stated rather than hidden)."""
    from sat_val_framework_spark.runner import run_suite

    m = _manifest_for(table_dir, snapshot_id)
    inc = read_increment(spark, table_dir, m["snapshot_id"], schema)
    return run_suite(spark, inc, snapshot_id=m["snapshot_id"], **run_suite_kwargs)


def prune_files(
    table_dir: str,
    snapshot_id: str | None,
    col: str,
    lo=None,
    hi=None,
) -> tuple[list[str], int]:
    """-> (files possibly containing rows with col in [lo, hi], total file
    count): manifest-stats file skipping. A file is kept when its recorded
    [min, max] range for ``col`` OVERLAPS the query range — or when it has
    no recorded stats (skipping must never drop a matching row). Pure
    manifest metadata; no Spark job."""
    m = _manifest_for(table_dir, snapshot_id)
    stats = m.get("stats", {})
    kept = []
    for f in m["files"]:
        s = stats.get(f, {}).get(col)
        if s is None or s[0] is None or s[1] is None:
            kept.append(f)  # unknown range: cannot skip safely
            continue
        fmin, fmax = s
        if (lo is None or fmax >= lo) and (hi is None or fmin <= hi):
            kept.append(f)
    return kept, len(m["files"])


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    snapshot_id: str | None = None,
    schema: T.StructType | None = None,
    prune: tuple | None = None,
) -> DataFrame:
    """Read the table as of a snapshot (latest when None) — the A5
    'reproducible re-load' shape: the SAME snapshot id always reads the SAME
    rows, regardless of later appends.

    ``prune=(col, lo, hi)``: skip data files whose manifest min/max range
    for ``col`` cannot intersect [lo, hi] (Iceberg file skipping). Pruning
    only REMOVES whole files — the caller still applies the exact row
    predicate; rows outside the range may survive in kept files."""
    ms = _manifests(table_dir)
    if not ms:
        raise FileNotFoundError(f"no snapshots in table '{table_dir}'")
    if snapshot_id is None:
        m = ms[-1]
    else:
        matches = [x for x in ms if x["snapshot_id"] == snapshot_id]
        if not matches:
            raise FileNotFoundError(
                f"snapshot '{snapshot_id}' not found in table '{table_dir}'"
            )
        m = matches[-1]
    if prune is not None:
        col, lo, hi = prune
        files, _total = prune_files(table_dir, m["snapshot_id"], col, lo, hi)
        if not files:
            if schema is None:
                raise ValueError(
                    "file pruning eliminated every data file; pass schema= "
                    "to read the (empty) result"
                )
            return spark.createDataFrame([], schema)
        reader = spark.read.schema(schema) if schema is not None else spark.read
        return reader.parquet(*files)
    if not m["files"]:
        # a snapshot of an empty DataFrame (Spark may write zero part files)
        # is a legal state: reading it yields an empty frame, not the
        # confusing zero-path spark.read.parquet() error
        if schema is None:
            raise ValueError(
                f"snapshot '{m['snapshot_id']}' lists zero data files; pass "
                "schema= to read it as an empty DataFrame"
            )
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(*m["files"])


def schema_diff(
    table_dir: str,
    from_id: str | None = None,
    to_id: str | None = None,
) -> dict:
    """Schema evolution between two snapshots (defaults: the latest
    snapshot's PARENT vs the latest — "what did the last write change?").

    -> {'added': {col: type}, 'removed': {col: type},
        'type_changed': {col: [old, new]}, 'nullability_changed': [col]}
    from recorded writer schemas — pure manifest metadata, no Spark job,
    no data-file reads (the A19/A20 lineage contract applied to schemas:
    a nightly job diffs before validating, so a column that silently
    changed type fails loudly instead of poisoning downstream casts).
    Snapshots from before schema capture raise a clear error."""
    to_m = _manifest_for(table_dir, to_id)
    if from_id is None:
        if to_m["parent"] is None:
            raise ValueError("latest snapshot has no parent; pass from_id explicitly")
        from_m = _manifest_for(table_dir, to_m["parent"])
    else:
        from_m = _manifest_for(table_dir, from_id)
    for m in (from_m, to_m):
        if "schema" not in m:
            raise ValueError(
                f"snapshot '{m['snapshot_id']}' predates schema capture; "
                "re-write it to record a schema"
            )
    a, b = from_m["schema"], to_m["schema"]
    return {
        "from": from_m["snapshot_id"],
        "to": to_m["snapshot_id"],
        "added": {c: b[c][0] for c in b if c not in a},
        "removed": {c: a[c][0] for c in a if c not in b},
        "type_changed": {c: [a[c][0], b[c][0]] for c in a if c in b and a[c][0] != b[c][0]},
        "nullability_changed": sorted(
            c for c in a if c in b and a[c][0] == b[c][0] and a[c][1] != b[c][1]
        ),
    }


def write_audit_publish(
    df: DataFrame,
    table_dir: str,
    audit_fn,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
    n_files: int | None = None,
) -> tuple[str | None, DataFrame]:
    """Write-Audit-Publish (the Iceberg WAP pattern, driven by this
    engine's own verdicts): stage the data files WITHOUT a manifest, run
    ``audit_fn(staged_df) -> verdicts`` against exactly the bytes that
    would be published, and only drop the manifest if no verdict row is
    FAIL or ERROR.

    -> (snapshot_id, verdicts) — snapshot_id is None when the audit
    rejected the write; every reader then still sees the previous snapshot
    (the staged files are unreferenced, Iceberg-orphan style; a janitor can
    delete data dirs no manifest names). This closes the loop the engine
    exists for: bad data never becomes visible, and the verdicts ARE the
    audit trail either way."""
    _check_mode(mode)  # BEFORE staging AND the audit: fail in milliseconds
    spark = df.sparkSession
    new_files = _stage_data(df, table_dir, cluster_by, n_files)
    staged = spark.read.parquet(*new_files)  # audit the written bytes, not the plan
    verdicts = audit_fn(staged)
    bad = verdicts.where(F.col("status").isin("FAIL", "ERROR")).limit(1).count()
    if bad:
        return None, verdicts
    if cluster_by:
        stats_cols = list(dict.fromkeys([*(stats_cols or []), *cluster_by]))
    return _publish(spark, staged.schema, table_dir, new_files, mode, stats_cols), verdicts


def compact_snapshot(
    spark: SparkSession,
    table_dir: str,
    target_files: int,
    stats_cols: list[str] | None = None,
    cluster_by: list[str] | None = None,
) -> str:
    """Rewrite the latest snapshot's data into ``target_files`` files as a
    new overwrite snapshot — lakehouse small-file compaction. Appends at
    100 TB accrete thousands of small files whose per-file/per-task
    overhead dominates scans; compaction pays one rewrite to restore scan
    efficiency. Time travel is preserved: nothing is deleted, every prior
    snapshot (and its small files) stays readable; ``cluster_by`` re-sorts
    during the rewrite so compaction and range-clustering share the single
    shuffle. ``stats_cols`` defaults to the columns the CURRENT manifest
    records stats for — a plain compaction must not silently degrade
    pruning back to full scans (review finding)."""
    if stats_cols is None:
        m = _manifest_for(table_dir, None)
        stats_cols = sorted({c for s in m.get("stats", {}).values() for c in s}) or None
    current = read_snapshot(spark, table_dir)
    df = current if cluster_by else current.repartition(target_files)
    return write_snapshot(
        df,
        table_dir,
        mode="overwrite",
        stats_cols=stats_cols,
        cluster_by=cluster_by,
        n_files=target_files if cluster_by else None,
    )


def orphan_data_dirs(table_dir: str) -> list[str]:
    """Data directories under ``table_dir/data`` that NO manifest
    references — WAP-rejected stages and crashed writes. Pure metadata
    (manifest file lists vs a directory listing); no Spark job. Run only
    while no write is in flight: a writer that has staged but not yet
    published looks exactly like an orphan (Iceberg's remove_orphan_files
    has the same caveat and solves it with a retention interval).

    Comparison is by data-dir BASENAME (the uuid segment), not by full
    path: manifests store whatever spelling the writer's cwd produced
    (relative, './', symlinked), so any full-path comparison — raw or
    realpath'd — misclassifies every PUBLISHED dir as an orphan when the
    janitor runs with a different spelling or from a different cwd,
    deleting the whole table (review findings, twice). The uuid dir name
    is spelling- and cwd-independent and collision-free by construction."""
    referenced = {
        os.path.basename(os.path.dirname(f))
        for m in _manifests(table_dir)
        for f in m["files"]
    }
    all_dirs = sorted(glob.glob(os.path.join(os.path.abspath(table_dir), "data", "*")))
    return [d for d in all_dirs if os.path.basename(d) not in referenced]


def remove_orphan_dirs(table_dir: str) -> list[str]:
    """Delete orphan data dirs; returns what was removed. Never touches a
    dir any manifest names, so every snapshot stays readable."""
    import shutil

    removed = []
    for d in orphan_data_dirs(table_dir):
        shutil.rmtree(d)
        removed.append(d)
    return removed


def expire_snapshots(table_dir: str, keep_last: int) -> dict:
    """Expire all but the newest ``keep_last`` snapshots: delete their
    manifests, then delete data dirs no SURVIVING manifest references
    (files shared with surviving snapshots — append lineage — are kept).
    Returns {'expired': [snapshot_ids], 'removed_dirs': [...]}. This is the
    retention knob that bounds time-travel storage on a lake where every
    compaction/overwrite would otherwise keep dead files forever.

    Same in-flight caveat as ``orphan_data_dirs`` (which this calls): run
    only while no write is staging, or a not-yet-published stage is
    reclaimed out from under its writer.

    The oldest SURVIVING manifest's ``parent`` pointer is rewritten to null
    when its parent was expired — otherwise every parent-following consumer
    (added_files / read_increment / schema_diff defaults) would crash on a
    dangling snapshot id; with a null parent they treat the survivor as the
    first available snapshot, which after retention it is."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    ms = _manifests(table_dir)
    expired = ms[:-keep_last]
    if not expired:
        return {"expired": [], "removed_dirs": []}
    expired_ids = {m["snapshot_id"] for m in expired}
    # repair the survivor's parent BEFORE removing expired manifests: a
    # crash between the two steps then leaves a fully-consistent table
    # either way (repair-then-crash: all manifests intact, re-run expires
    # again with the repair a no-op; the reverse order would strand a
    # dangling parent forever, because the re-run early-returns above)
    oldest = ms[-keep_last]
    if oldest.get("parent") in expired_ids:
        oldest = dict(oldest, parent=None)
        path = os.path.join(
            _manifest_dir(table_dir), f"{oldest['seq']:08d}-{oldest['snapshot_id']}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(oldest, f)
        os.replace(tmp, path)
    for m in expired:
        path = os.path.join(
            _manifest_dir(table_dir), f"{m['seq']:08d}-{m['snapshot_id']}.json"
        )
        os.remove(path)
    return {
        "expired": [m["snapshot_id"] for m in expired],
        "removed_dirs": remove_orphan_dirs(table_dir),
    }

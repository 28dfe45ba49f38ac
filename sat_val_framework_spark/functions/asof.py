"""As-of join and sessionization — time-series operators Spark lacks as
built-ins, composed from DataFrame primitives (no UDFs, no per-row Python).

As-of join (backward): for each left row, the latest right row with
``right.ts <= left.ts`` per key. The classic scalable Spark formulation:
union the two sides with a side tag, sort within key by (ts, side-order),
and carry the last seen right payload forward with ``last(..., ignorenulls)``
over a window. One shuffle on the key — same cost as a regular join, no
range explosion. (pd.merge_asof per group via applyInPandas is the fallback
for semantics window functions can't express; not needed here.)

Sessionization: gap-based session ids per key via lag + cumulative sum over
a key-ordered window — one shuffle, no state store needed in batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the payload of the as-of matching right row (or nulls).

    direction='backward': latest right with right_ts <= left_ts.
    Ties (right_ts == left_ts) match, mirroring pandas merge_asof.
    """
    if direction != "backward":
        raise ValueError("only direction='backward' is implemented")
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # right (0) sorts before left (1) on ts ties
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.lit(None).cast(
            right.select(F.struct(*[F.col(c) for c in payload_cols]).alias("s")).schema["s"].dataType
        ).alias("_rpay"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("s")).schema["s"].dataType
        ).alias("_lrow"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_rpay"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_asof", F.last("_rpay", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in left.columns],
        *[F.col("_asof")[c].alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Interval (range) join: each left row matched to every right row whose
    [right_start, right_end] contains left_ts, same key — another operator
    Spark lacks natively (a raw non-equi join plans BroadcastNestedLoop,
    O(n·m) and broadcast-bound).

    Bucketized composition: the time axis is cut into ``bucket_width``-sized
    buckets; each right interval EXPLODES into the buckets it covers, each
    left row carries its single bucket, and the join becomes an EQUI-join on
    (key, bucket) + an exact BETWEEN filter. Each (left, right) pair matches
    exactly once — the left row lives in one bucket and the interval appears
    once per bucket. Cost scales with interval_len/bucket_width per right
    row (pick bucket_width ≈ typical interval length), and the shuffle key
    (key, bucket) is high-cardinality — no hot reducer.

    The ts columns must be NUMERIC (cast dates/timestamps to day numbers or
    epochs session-TZ-independently before calling; see q_range_join).
    """
    l_b = F.floor(F.col(left_ts) / F.lit(bucket_width)).cast("long")
    s_b = F.floor(F.col(right_start) / F.lit(bucket_width)).cast("long")
    e_b = F.floor(F.col(right_end) / F.lit(bucket_width)).cast("long")
    l = left.withColumn("__bucket", l_b)
    r = right.withColumn("__bucket", F.explode(F.sequence(s_b, e_b)))
    return (
        l.join(r, [key, "__bucket"])
        .filter(
            (F.col(left_ts) >= F.col(right_start)) & (F.col(left_ts) <= F.col(right_end))
        )
        .drop("__bucket")
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same key exceeds ``gap_seconds``.
    Returns events + (session_seq, session_id)."""
    w = Window.partitionBy(key).orderBy(ts)
    prev = F.lag(F.col(ts)).over(w)
    # interval arithmetic works for TIMESTAMP and TIMESTAMP_NTZ alike and is
    # session-timezone independent (epoch casts are not, for NTZ)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
    new_session = (prev.isNull() | (F.col(ts) - prev > gap)).cast("int")
    seq = F.sum(new_session).over(
        Window.partitionBy(key).orderBy(ts).rowsBetween(Window.unboundedPreceding, 0)
    )
    return events.withColumn("session_seq", seq).withColumn(
        "session_id", F.concat_ws("-", F.col(key).cast("string"), F.col("session_seq"))
    )

"""Temporal joins Spark lacks as built-ins: as-of join and interval join.

Both are implemented as compositions of existing DataFrame ops (the brief's
preferred path for custom operators) — no UDFs, no nested-loop joins, no
driver-side iteration — so Catalyst/AQE keep optimizing around them.

As-of join (each left row matched to the latest right row with
``right_ts <= left_ts`` for the same key) is the classic point-in-time
lookup the reference's SCD2 dimension reads answer via
``effective_from/effective_to`` scans (etl/bronze_to_silver.py:255-263);
here it is a single union + per-key window — **one shuffle on the key**,
never a join explosion:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key) orderBy(ts, side) rows unbounded preceding
      -> last(right_payload, ignoreNulls) carries the as-of state forward
      -> keep left rows

At 100 TB this is shuffle-optimal: volume is |left| + |right| rows exactly
once, partitioned by key; a sort-merge or broadcast as-of would still need
the same exchange plus an O(matches) join. Hot keys cost O(key size) in one
task — for pathological single-key skew pass ``skew_bucket_seconds`` to
pre-bucket by (key, time-range) and as-of within buckets, carrying the last
right state of all previous buckets via a tiny per-(key, bucket) prefix
window (the salting analog of the merge engine's (bucket, conv_id)
repartition). Semantics are identical (property-tested); the hot key's work
spreads across ceil(key_span / skew_bucket_seconds) tasks.

Interval join (left.ts ∈ [right.start, right.end], **no equi key**) would
fall to BroadcastNestedLoopJoin in vanilla Spark — O(|L|·|R|) comparisons.
The bucketed form turns it into an equi-join: explode each right interval
into the fixed-width time buckets it covers, bucket each left timestamp,
join on the bucket, then apply the exact range predicate. Work becomes
O(pairs sharing a bucket) and shuffles hash-partition on the bucket — the
standard overlap-join technique (also how range-join hints work in
closed-source Spark forks). Each qualifying pair appears exactly once
(the left row lives in exactly one bucket), so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"


def asof_join(
    left,
    right,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str] | None = None,
    strict: bool = False,
    tolerance_seconds: float | None = None,
    skew_bucket_seconds: int | None = None,
    right_tiebreak: str | None = None,
):
    """For every left row, attach the latest right row with
    ``right[right_ts] <= left[left_ts]`` (``<`` when ``strict``) sharing the
    key columns ``on``. Right payload columns are null when no right row
    precedes the left row (left-outer as-of semantics, matching DuckDB's
    ``LEFT ASOF JOIN``).

    ``tolerance_seconds`` bounds staleness (pandas ``merge_asof``'s
    ``tolerance``): a carried right row older than the bound is treated as
    no match (payload nulled). Applied post-window — a pure projection, no
    extra shuffle.

    ``right`` must be unique per (key, right_ts) — dedupe upstream if not,
    or the carried row among ties is unspecified. ``right_tiebreak`` (a
    right column name) lifts that requirement WITHOUT the upstream dedup's
    extra shuffle+aggregate: right rows tied on (key, right_ts) order by
    the tiebreak ascending and the LAST one wins, i.e. the carried row is
    exactly ``max_by(payload, tiebreak)`` per (key, ts) — associativity of
    "latest wins" folds the dedup into the window's existing sort (r6:
    removed a full shuffle of the right side from q38). The tiebreak only
    orders right rows among themselves; left-vs-right order at equal ts
    stays decided by the side flag. Right rows with a NULL
    ``right_ts`` never match (DuckDB ASOF / pandas merge_asof semantics).
    Left rows with a NULL ``left_ts`` always get a NULL payload (no match):
    they sort nulls-first in the window, before every right row, and with a
    tolerance set the freshness comparison is NULL too. This matches DuckDB
    ASOF; pandas ``merge_asof`` would instead raise on NULL keys.

    ``skew_bucket_seconds`` is the hot-key escape hatch: instead of one
    window task per key (all rows of a pathological key in one task), rows
    are sub-bucketed by ``floor(ts / skew_bucket_seconds)`` and the window
    runs per (key, bucket); the right state carried into each bucket from
    all earlier buckets is computed by a per-(key, bucket) aggregate plus a
    prefix window over the (tiny) bucket summaries. Output is identical to
    the plain form for every input (property-tested) — choose a bucket
    width that splits the hottest key's time span into a few hundred
    buckets.
    """
    from pyspark.sql import types as T

    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: right payload columns {sorted(clash)} collide with "
            "left columns — rename one side before joining"
        )

    # The whole right payload is carried as ONE struct, so the window's
    # last(ignoreNulls) moves right ROWS atomically — per-column carry would
    # back-fill a legitimately-NULL payload column from an older right row,
    # silently mixing columns of different versions. The matched row's own
    # right_ts rides inside the struct for the tolerance check.
    _RTSF = "__asof_rts"
    _PAY = "__asof_payload"
    pay_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload_cols]
        + [T.StructField(_RTSF, T.TimestampType())]
    )
    _TB = "__asof_tiebreak"
    l_tagged = (
        left.withColumn(_SIDE, F.lit(1))
        .withColumn(_TS, F.col(left_ts).cast("timestamp"))
        .withColumn(_PAY, F.lit(None).cast(pay_type))
    )
    r_tagged = (
        right.filter(F.col(right_ts).isNotNull())  # NULL right_ts: no match
        .withColumn(_SIDE, F.lit(0))
        .withColumn(_TS, F.col(right_ts).cast("timestamp"))
        .withColumn(
            _PAY,
            F.struct(
                *[F.col(c) for c in payload_cols],
                F.col(right_ts).cast("timestamp").alias(_RTSF),
            ),
        )
    )
    if right_tiebreak is not None:
        l_tagged = l_tagged.withColumn(
            _TB, F.lit(None).cast(right.schema[right_tiebreak].dataType)
        )
        r_tagged = r_tagged.withColumn(_TB, F.col(right_tiebreak))
    r_keep = [*keys, _SIDE, _TS, _PAY] + ([_TB] if right_tiebreak is not None else [])
    r_tagged = r_tagged.select(*r_keep)
    for c in l_tagged.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(
                zip(l_tagged.columns, [f.dataType for f in l_tagged.schema.fields])
            )[c]))
    cols = l_tagged.columns
    u = l_tagged.select(cols).unionByName(r_tagged.select(cols))

    # Inclusive: a right row at the same ts is visible to the left row
    # (side 0 sorts before side 1). Strict: left sorts first. The optional
    # tiebreak orders equal-ts right rows among themselves (nulls-first
    # asc, so left rows' NULL tiebreak never reorders them vs each other).
    order = [F.col(_TS).asc(), F.col(_SIDE).asc() if not strict else F.col(_SIDE).desc()]
    if right_tiebreak is not None:
        order.append(F.col(_TB).asc_nulls_first())
    if skew_bucket_seconds is None:
        w = W.partitionBy(*keys).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        filled = u.select(
            *[c for c in cols if c != _PAY],
            F.last(_PAY, ignorenulls=True).over(w).alias(_PAY),
        )
    else:
        _BKT = "__asof_bucket"
        _BL = "__asof_bucket_last"
        _CARRY = "__asof_carry"
        u = u.withColumn(
            _BKT, F.floor(F.col(_TS).cast("double") / F.lit(int(skew_bucket_seconds)))
        )
        # Within-bucket as-of: same window, partitioned by (key, bucket) —
        # a hot key's rows now spread over its time buckets.
        w_in = (
            W.partitionBy(*keys, _BKT).orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
        )
        in_bucket = u.select(
            *[c for c in cols if c != _PAY],
            F.col(_BKT),
            F.last(_PAY, ignorenulls=True).over(w_in).alias(_PAY),
        )
        # Carry-in per bucket: the latest right payload of each (key, bucket)
        # (max_by skips left rows — their ordering expr is NULL), then a
        # prefix window over the bucket summaries (one row per key×bucket,
        # tiny) takes the newest right state from all STRICTLY EARLIER
        # buckets. A carried row is always strictly older than anything in
        # the bucket (equal ts ⇒ equal bucket), so strict/inclusive modes
        # need no extra handling.
        _bl_order = (
            F.col(_TS)
            if right_tiebreak is None
            else F.struct(F.col(_TS), F.col(_TB))
        )
        bucket_last = u.groupBy(*keys, _BKT).agg(
            F.max_by(_PAY, F.when(F.col(_SIDE) == 0, _bl_order)).alias(_BL)
        )
        w_carry = W.partitionBy(*keys).orderBy(_BKT).rowsBetween(W.unboundedPreceding, -1)
        carry = bucket_last.withColumn(
            _CARRY, F.last(_BL, ignorenulls=True).over(w_carry)
        ).select(
            *[F.col(k).alias(f"__c_{k}") for k in keys],
            F.col(_BKT).alias("__c_bkt"),
            _CARRY,
        )
        # Null-safe join: the plain window form groups NULL keys into one
        # partition, so NULL keys must match NULL keys here too. NULL-ts
        # left rows live in the NULL bucket, which sorts first in the carry
        # window → carry NULL → payload NULL, same as the plain form.
        cond = F.col(_BKT).eqNullSafe(F.col("__c_bkt"))
        for k in keys:
            cond = cond & F.col(k).eqNullSafe(F.col(f"__c_{k}"))
        filled = (
            in_bucket.join(carry, cond, "left")
            .withColumn(_PAY, F.coalesce(F.col(_PAY), F.col(_CARRY)))
            .drop(_BKT, _CARRY, "__c_bkt", *[f"__c_{k}" for k in keys])
        )
    out = filled.filter(F.col(_SIDE) == 1)
    pay = F.col(_PAY)
    if tolerance_seconds is not None:
        fresh = (
            F.col(_TS).cast("double") - pay[_RTSF].cast("double")
        ) <= F.lit(float(tolerance_seconds))
        pay = F.when(fresh, pay)
    return out.select(
        *[c for c in cols if c not in (_PAY, _SIDE, _TS, _TB)],
        *[pay[c].alias(c) for c in payload_cols],
    )


def interval_join(
    left,
    right,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 7 * 86400,
):
    """Join left rows to right intervals containing them
    (``right_start <= left_ts <= right_end``) with NO equi key, via
    fixed-width time bucketing. Returns the joined pairs (all columns of
    both inputs); each qualifying pair appears exactly once.

    ``bucket_seconds`` should be on the order of the typical interval
    length: too small explodes right rows into many buckets, too large
    packs unrelated rows into one bucket. Both misconfigurations are
    correct, just slower.

    Right rows with a NULL or inverted interval (``right_end < right_start``
    — bad data, sentinel timestamps) are dropped before the bucket explode:
    they can never satisfy the range predicate, and without the pre-filter
    Spark's ``sequence(start, stop)`` on an inverted pair would generate a
    DESCENDING bucket sequence, silently exploding one malformed row into
    |start_bucket - end_bucket| + 1 rows before the exact filter drops them.
    """
    b = F.lit(bucket_seconds)
    l_b = left.withColumn(
        "__bucket", F.floor(F.col(left_ts).cast("timestamp").cast("double") / b)
    )
    # compare the CAST bounds (same domain the bucketing uses): raw-column
    # comparison would misorder string timestamps in non-canonical formats
    # ('2024-1-9' vs '2024-01-10' lexicographically) and silently drop
    # valid intervals
    _rs = F.col(right_start).cast("timestamp")
    _re = F.col(right_end).cast("timestamp")
    r_b = right.filter(_rs.isNotNull() & _re.isNotNull() & (_rs <= _re)).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start).cast("timestamp").cast("double") / b),
                F.floor(F.col(right_end).cast("timestamp").cast("double") / b),
            )
        ),
    )
    _lt = F.col(left_ts).cast("timestamp")
    joined = l_b.join(r_b, "__bucket").filter((_lt >= _rs) & (_lt <= _re))
    return joined.drop("__bucket")

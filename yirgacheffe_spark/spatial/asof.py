"""As-of join: each left row picks the latest right row at-or-before its
timestamp (optionally within a tolerance), per key.

Spark has no built-in as-of join; the naive range join explodes
quadratically on dense keys.  This is the standard scalable reformulation:
UNION the two sides with a side tag, sort within key partitions by
(time, side), and carry the most recent right row forward with one
``last(ignorenulls)`` window — ONE shuffle on the key, no range join, no
per-row Python, linear in rows.  Ties (equal timestamps) resolve to the
right row (at-or-before semantics, matching ``pandas.merge_asof``).

Skew: the plain window partitions by key, so ONE hot key (one ticker, one
user id) serialises into a single task no matter how many executors exist.
``skew_buckets=N`` engages the two-pass variant: rows sub-partition into N
time-range buckets per key, a small first pass computes each bucket's
carry-in (the latest right row of any earlier bucket — one window over
per-bucket aggregates, <= N rows per key), and the heavy window then runs
per (key, bucket) — N-way parallel even for a single key — with the
carry-in filling left rows that precede their bucket's first right row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              tolerance_ms: "int | None" = None,
              right_prefix: str = "r_",
              tiebreak_col: "str | None" = None,
              skew_buckets: "int | None" = None) -> DataFrame:
    """Left rows + the latest right row with ``right.on <= left.on`` per
    ``by`` key; right columns arrive prefixed.  Rows with no prior right
    row (or none within ``tolerance_ms``) keep NULL right columns.

    ``on`` must be a timestamp or numeric column; ``by`` the equality key.

    Equal-timestamp right rows: ``pandas.merge_asof`` keeps the LAST input
    row, but a DataFrame has no input order, so that rule is undefined
    here.  Instead the winner is the max of ``tiebreak_col`` when given
    (pass a sequence number / ingest offset to reproduce a stream order),
    else the max 64-bit content hash of the right row — arbitrary but
    DETERMINISTIC across runs, partitionings and cluster sizes, where an
    un-tiebroken window returns whichever row the shuffle happened to
    order last.

    ``skew_buckets=N`` splits each key's time range into N sub-partitions
    so a hot key parallelises N ways (see module docstring); output is
    identical to the plain path.
    """
    l_cols = [c for c in left.columns]
    r_cols = [c for c in right.columns if c not in (on, by)]

    # Union with a side tag: right rows sort BEFORE left rows at equal
    # timestamps so an exactly-simultaneous quote is visible to the trade.
    # The tiebreak keeps its OWN type (strings, timestamps and decimals are
    # all orderable) — casting to long would silently NULL a non-numeric
    # sequence column and degrade ties back to shuffle order.
    if tiebreak_col:
        if tiebreak_col not in right.columns:
            raise ValueError(f"tiebreak_col {tiebreak_col!r} not in right")
        tie_type = dict(right.dtypes)[tiebreak_col]
        if tie_type.startswith("map<"):
            raise ValueError("tiebreak_col must be an orderable type, not map")
        tie = F.col(tiebreak_col)
    else:
        tie_type = "bigint"
        tie = F.xxhash64(*[F.col(c) for c in [on] + r_cols])
    lhs = left.select(
        F.col(by), F.col(on),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_type).alias("_rtie"),
        F.struct(*[F.col(c) for c in l_cols]).alias("_l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{dict(right.dtypes)[c]}" for c in [on] + r_cols
            ) + ">"
        ).alias("_r"),
    )
    rhs = right.select(
        F.col(by), F.col(on),
        F.lit(0).alias("_side"),
        tie.alias("_rtie"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"`{c}`:{dict(left.dtypes)[c]}" for c in l_cols
            ) + ">"
        ).alias("_l"),
        F.struct(
            F.col(on), *[F.col(c) for c in r_cols]
        ).alias("_r"),
    )
    merged = lhs.unionByName(rhs)

    order = [F.col(on).asc(), F.col("_side").asc(),
             F.col("_rtie").asc_nulls_first()]
    if skew_buckets is not None and skew_buckets > 1:
        out = _asof_carry_bucketed(merged, on, by, order, int(skew_buckets),
                                   dict(left.dtypes)[on])
    else:
        w = (
            W.partitionBy(by)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        out = merged.withColumn(
            "_last_r", F.last("_r", ignorenulls=True).over(w)
        ).where(F.col("_side") == 1)

    if tolerance_ms is not None:
        on_type = dict(left.dtypes)[on]
        if on_type.startswith("timestamp"):
            age = (F.unix_millis(F.col(on))
                   - F.unix_millis(F.col("_last_r")[on]))
        else:
            age = F.col(on) - F.col("_last_r")[on]
        out = out.withColumn(
            "_last_r",
            F.when(age <= F.lit(tolerance_ms), F.col("_last_r")),
        )
    proj = [F.col("_l")[c].alias(c) for c in l_cols]
    proj += [F.col("_last_r")[on].alias(f"{right_prefix}{on}")]
    proj += [F.col("_last_r")[c].alias(f"{right_prefix}{c}") for c in r_cols]
    return out.select(*proj)


def _asof_carry_bucketed(merged: DataFrame, on: str, by: str, order: list,
                         n_buckets: int, on_type: str) -> DataFrame:
    """Two-pass skew variant over the tagged union frame: returns left rows
    with ``_last_r`` carried, identical to the key-window path.

    Pass 1 (small): per (key, bucket) aggregate the latest right row, then
    one window over those aggregates (<= n_buckets rows per key) yields
    each bucket's carry-in.  Pass 2 (heavy): the carry window partitions by
    (key, bucket) — n_buckets-way parallel per key — and left rows whose
    bucket has no earlier right row coalesce to the carry-in.
    """
    on_num = (F.unix_millis(F.col(on)) if on_type.startswith("timestamp")
              else F.col(on).cast("double"))
    bounds = merged.agg(
        F.min(on_num).alias("mn"), F.max(on_num).alias("mx")
    ).collect()[0]
    mn, mx = bounds["mn"], bounds["mx"]
    if mn is None:
        return merged.withColumn(
            "_last_r", F.lit(None).cast(merged.schema["_r"].dataType)
        ).where(F.col("_side") == 1)
    width = (float(mx) - float(mn)) / n_buckets or 1.0
    merged = merged.withColumn(
        "_bucket",
        F.least(
            F.floor((on_num - F.lit(float(mn))) / F.lit(width)),
            F.lit(n_buckets - 1),
        ).cast("int"),
    )

    # Pass 1: latest right row per (key, bucket) — struct max orders by
    # (on, _rtie), the same rule as the window — then carry across buckets.
    per_bucket = (
        merged.where(F.col("_side") == 0)
        .groupBy(by, "_bucket")
        .agg(F.max(F.struct(
            F.col(on).alias("_o"), F.col("_rtie").alias("_t"),
            F.col("_r").alias("_r"),
        )).alias("_m"))
    )
    domain = merged.select(by, "_bucket").distinct()
    w_prev = (
        W.partitionBy(by).orderBy(F.col("_bucket").asc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry_in = (
        domain.join(per_bucket, [by, "_bucket"], "left")
        .withColumn("_carry", F.last("_m", ignorenulls=True).over(w_prev))
        .select(by, "_bucket", F.col("_carry")["_r"].alias("_carry_r"))
    )

    # Pass 2: the heavy window, now per (key, bucket).
    w_bucket = (
        W.partitionBy(by, "_bucket").orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn(
        "_last_r", F.last("_r", ignorenulls=True).over(w_bucket)
    ).where(F.col("_side") == 1)
    return (
        carried.join(carry_in, [by, "_bucket"], "left")
        .withColumn("_last_r", F.coalesce(F.col("_last_r"), F.col("_carry_r")))
        .drop("_bucket", "_carry_r")
    )


def interval_join(points: DataFrame, intervals: DataFrame, on: str,
                  by: "str | None" = None,
                  start_col: str = "start", end_col: str = "end",
                  bucket_width: "int | None" = None) -> DataFrame:
    """Each point row joined to every interval containing it
    (``start <= on < end``), optionally key-equal on ``by`` — the range
    join Spark would otherwise plan as a broadcast-nested-loop.

    Scale shape: intervals explode to the fixed-width buckets they
    overlap, points map to ONE bucket, and the pairing is a plain
    equi-join on (bucket[, by]) + an exact containment filter — shuffle
    keyed and linear in (rows + interval spans / bucket_width).  Pick
    ``bucket_width`` near the median interval length: too small explodes
    long intervals, too large degrades pruning (the standard trade; the
    default estimates it from a sample of interval lengths).

    ``on``/``start_col``/``end_col`` must share a numeric/epoch type
    (cast timestamps with ``unix_millis`` at the call site); fractional
    values are fine — the bucket cover includes the interval end's bucket
    unconditionally and the exact filter trims the excess.
    """
    if bucket_width is None:
        sample = (
            intervals.select(
                (F.col(end_col) - F.col(start_col)).alias("_len")
            ).where(F.col("_len") > 0).limit(10_000).agg(
                F.percentile_approx("_len", 0.5).alias("m")
            ).collect()[0]["m"]
        )
        bucket_width = max(int(sample or 1), 1)
    b = int(bucket_width)

    ivals = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b).cast("long"),
                # Cover through end's own bucket: floor((end-1)/b) assumed
                # integer grain and silently missed fractional-time matches
                # (interval [0.5, 10.5) vs a point at 10.2); one possibly
                # superfluous bucket per interval is cheap, and the exact
                # containment filter below removes any excess pairs.
                F.floor(F.col(end_col) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_bucket", F.floor(F.col(on) / b).cast("long"))
    keys = ["_bucket"] + ([by] if by else [])
    out = pts.join(ivals, keys, "inner").where(
        (F.col(on) >= F.col(start_col)) & (F.col(on) < F.col(end_col))
    )
    return out.drop("_bucket")

"""As-of join: each left row picks the latest right row at-or-before its
timestamp (optionally within a tolerance), per key.

Spark has no built-in as-of join; the naive range join explodes
quadratically on dense keys.  This is the standard scalable reformulation:
UNION the two sides with a side tag, sort within key partitions by
(time, side), and carry the most recent right row forward with one
``last(ignorenulls)`` window — ONE shuffle on the key, no range join, no
per-row Python, linear in rows.  Ties (equal timestamps) resolve to the
right row (at-or-before semantics, matching ``pandas.merge_asof``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              tolerance_ms: "int | None" = None,
              right_prefix: str = "r_") -> DataFrame:
    """Left rows + the latest right row with ``right.on <= left.on`` per
    ``by`` key; right columns arrive prefixed.  Rows with no prior right
    row (or none within ``tolerance_ms``) keep NULL right columns.

    ``on`` must be a timestamp or numeric column; ``by`` the equality key.
    """
    l_cols = [c for c in left.columns]
    r_cols = [c for c in right.columns if c not in (on, by)]

    # Union with a side tag: right rows sort BEFORE left rows at equal
    # timestamps so an exactly-simultaneous quote is visible to the trade.
    lhs = left.select(
        F.col(by), F.col(on),
        F.lit(1).alias("_side"),
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

    w = (
        W.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = merged.withColumn("_last_r", F.last("_r", ignorenulls=True).over(w))

    out = carried.where(F.col("_side") == 1)
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

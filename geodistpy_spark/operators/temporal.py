"""Temporal join operators for event/training-data pipelines.

The reference has no temporal surface; large-scale pipelines need an
as-of join constantly (attach the latest prior state/label/checkpoint to
every event). The classic range-join formulation explodes (every left
row x every earlier right row before the filter); the scale-safe plan is
union-tag + ordered window carry-forward: ONE shuffle on the key, zero
row blowup, O(rows) work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "user_id",
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              tolerance_s: float | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the LATEST right row with
    ``right_ts <= left_ts`` for the same ``on`` key (backward as-of,
    exact-timestamp matches allowed — pandas ``merge_asof`` semantics).
    Left rows with no prior right row keep nulls.

    Plan: tag right rows 0 / left rows 1, union, and carry the last
    non-null right payload forward over a
    ``Window.partitionBy(on).orderBy(ts, tag)`` running frame — at equal
    timestamps the right row sorts first, so exact matches attach. One
    hash exchange on the key; no range-join row explosion.

    ``tolerance_s``: matches older than this many seconds are nulled
    (the match is dropped, not the left row). ``right_cols`` defaults to
    every right column except the key; the matched timestamp is exposed
    as ``{right_ts}{suffix}``.
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    carried = [f"{right_ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]

    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        # duplicate right rows at the same (key, ts) tie on (__ts,
        # __tag); without a content tie-break the carried row would
        # depend on partition merge order — nondeterministic across
        # runs, which breaks byte-identical checkpoint resume. The
        # payload hash is run-independent: ties resolve to the
        # max-hash row (identical duplicates carry identical payload).
        # Known limit: the carry below is per-column last(ignorenulls),
        # so two tied rows with COMPLEMENTARY null payload fields still
        # blend into an output row matching neither input (now
        # deterministically); "resolves to the max-hash row" holds
        # column-by-column — exactly when the max-hash row has no null
        # payload fields does it hold for the whole row
        F.xxhash64(F.col(right_ts),
                   *[F.col(c) for c in right_cols]).alias("__tb"),
        F.col(right_ts).alias(carried[0]),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(0).cast("long").alias("__tb"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in carried],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc(),
                 F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = r.unionByName(l)
    for c in carried:
        merged = merged.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = merged.filter(F.col("__tag") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        *carried,
    )
    if tolerance_s is not None:
        # materialize staleness BEFORE nulling (the matched ts is itself
        # one of the columns being nulled); microsecond precision —
        # unix_timestamp truncates to whole seconds and mis-evaluates
        # sub-second tolerances / sub-second event data
        out = out.withColumn(
            "__stale",
            (F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(carried[0])))
            > F.lit(float(tolerance_s) * 1e6),
        )
        for c in carried:
            out = out.withColumn(
                c, F.when(F.col("__stale"), F.lit(None)).otherwise(F.col(c)))
        out = out.drop("__stale")
    return out

"""Interval (range) join — keyed non-equi time joins at scale.

A naive ``left.join(right, (key equal) & (ts between ...))`` gives
Catalyst only an equi-key plus an inequality, which on big inputs
degenerates per-key when keys are hot, and with *no* equi part would
be a BroadcastNestedLoopJoin — quadratic. The scale-correct plan for
"right.ts within a bounded window around left.ts" is the classic
bin-bucketing rewrite every streaming engine uses for interval joins:

1. choose a bin width = the window span; assign each right row the
   bin of its timestamp;
2. each left row's window overlaps at most 2 adjacent bins — explode
   the left side to those candidate bins (a fixed ×2, not data-
   dependent);
3. shuffle-equi-join on (key, bin) — ordinary hash join, partition-
   parallel, AQE-skew-splittable;
4. apply the exact range predicate to drop false candidates.

Cost: one hash join over ~2× left rows, instead of per-key cross
products. All arithmetic is exact integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int = 0,
) -> DataFrame:
    """Pairs (left, right) with the same ``on`` key and
    ``right_ts ∈ (left_ts + lower_us, left_ts + upper_us]``
    (exclusive lower, inclusive upper — the "preceding window
    excluding the instant before, including now" convention; pass
    ``lower_us=-300_000_000`` for "the 5 minutes before").

    Returns all left columns plus the right side's columns suffixed
    ``_r`` where they collide. Inner semantics: left rows with no
    match produce no row (zero-fill downstream if needed).
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must be > lower_us")
    span = upper_us - lower_us

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))

    # Right rows land in one bin; left windows overlap ≤2 bins.
    right_b = right.withColumn("_bin", F.floor(r_us / span))
    lo_bin = F.floor((l_us + lower_us) / span)
    hi_bin = F.floor((l_us + upper_us) / span)
    left_b = left.withColumn(
        "_bin", F.explode(F.array_distinct(F.array(lo_bin, hi_bin)))
    )

    renames = {
        c: f"{c}_r" for c in right_b.columns
        if c in left_b.columns and c not in (on, "_bin")
    }
    for src, dst in renames.items():
        right_b = right_b.withColumnRenamed(src, dst)
    rts = renames.get(right_ts, right_ts)

    joined = left_b.join(right_b, [on, "_bin"])
    r_us_j = F.unix_micros(F.col(rts))
    l_us_j = F.unix_micros(F.col(left_ts))
    return joined.filter(
        (r_us_j > l_us_j + lower_us) & (r_us_j <= l_us_j + upper_us)
    ).drop("_bin")

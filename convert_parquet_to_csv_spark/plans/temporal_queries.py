"""Driver-checked temporal operators: as-of join, lag/sequence gaps.

Both run on the ``events`` table (nanosecond parquet timestamps —
read via ``read_parquet_nanos_ts``). Gap arithmetic stays in exact
integer microseconds (``unix_micros``) so the DuckDB oracle
hash-matches without float tolerance games.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from convert_parquet_to_csv_spark.operators.asof import asof_join
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet_nanos_ts


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet_nanos_ts(
        spark, os.path.join(sf_dir, "events.parquet")
    )


# --- as-of join: click → most recent prior view per user ------------------

_ASOF_ORACLE = """
SELECT c.event_id AS click_event_id,
       c.ts AS click_ts,
       v.ts AS view_ts,
       date_diff('microsecond', v.ts, c.ts) AS gap_us
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND c.ts >= v.ts
"""


@query("asof_click_attribution", oracle=_ASOF_ORACLE)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators/asof.py): each click attributed to the
    user's most recent view at-or-before it — the classic attribution
    query. Only the matched timestamp is projected (not the view's
    id), so same-timestamp view ties cannot make the result
    nondeterministic."""
    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_event_id"),
        F.col("user_id"),
        F.col("ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    joined = asof_join(
        clicks, views, on="user_id", ts="ts", right_cols=[], suffix="_view"
    )
    return joined.select(
        F.col("click_event_id"),
        F.col("ts").alias("click_ts"),
        F.col("ts_view").alias("view_ts"),
        (F.unix_micros("ts") - F.unix_micros("ts_view")).alias("gap_us"),
    )


# --- lag window: per-user inter-event gaps --------------------------------

_GAPS_ORACLE = """
WITH g AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(date_diff('microsecond', prev_ts, ts)) AS BIGINT) AS sum_gap_us,
       CAST(MAX(date_diff('microsecond', prev_ts, ts)) AS BIGINT) AS max_gap_us
FROM g
GROUP BY user_id
"""


@query("user_event_gaps", oracle=_GAPS_ORACLE)
def user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() sequence analysis: per-user inter-event gaps, aggregated.

    One shuffle for the window partition (user_id), reused by the
    groupBy on the same key — Catalyst recognizes the child
    distribution and skips the second exchange. Gaps are exact
    integer microseconds.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    gap = F.unix_micros("ts") - F.unix_micros("prev_ts")
    return g.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(gap).cast("bigint").alias("sum_gap_us"),
        F.max(gap).cast("bigint").alias("max_gap_us"),
    )

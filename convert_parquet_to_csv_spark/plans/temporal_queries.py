"""Driver-checked temporal operators: as-of join, lag/sequence gaps.

Both run on the ``events`` table (nanosecond parquet timestamps —
read via ``read_parquet_nanos_ts``). Gap arithmetic stays in exact
integer microseconds (``unix_micros``) so the DuckDB oracle
hash-matches without float tolerance games.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from convert_parquet_to_csv_spark.operators.asof import asof_join
from convert_parquet_to_csv_spark.operators.rangejoin import interval_join
from convert_parquet_to_csv_spark.operators.timeseries import gap_fill_daily
from convert_parquet_to_csv_spark.plans.common import load_table
from convert_parquet_to_csv_spark.plans.registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


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


# --- interval join: clicks in the 5 minutes before each error ------------

_RANGE_ORACLE = """
SELECT e.event_id AS error_id,
       e.ts AS error_ts,
       CAST(COUNT(c.event_id) AS BIGINT) AS n_clicks_5m
FROM (SELECT * FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON c.user_id = e.user_id
 AND c.ts > e.ts - INTERVAL 5 MINUTE
 AND c.ts <= e.ts
GROUP BY e.event_id, e.ts
"""


@query("error_click_pressure", oracle=_RANGE_ORACLE)
def error_click_pressure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join (operators/rangejoin.py): per error event, how
    many clicks the same user made in the preceding 5 minutes.

    The bin-bucketed rewrite turns the non-equi time predicate into a
    hash join on (user_id, bin) — no nested-loop, no per-key cross
    product. Zero-count errors are restored with a left join against
    the aggregated counts.
    """
    ev = _events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        "ts",
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    pairs = interval_join(
        errors,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        lower_us=-300_000_000,
        upper_us=0,
    )
    counts = pairs.groupBy("error_id").agg(
        F.count("click_id").alias("n_clicks_5m")
    )
    return errors.join(counts, "error_id", "left").select(
        "error_id",
        F.col("ts").alias("error_ts"),
        F.coalesce("n_clicks_5m", F.lit(0)).cast("bigint").alias("n_clicks_5m"),
    )


# --- batch sessionization (30-min gap) ------------------------------------

_SESSION_ORACLE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS prev_ts
  FROM events
), s AS (
  SELECT user_id, ts,
         SUM(CASE WHEN prev_ts IS NULL
                    OR date_diff('microsecond', prev_ts, ts) > 1800000000
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id,
       CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end
FROM s
GROUP BY user_id, session_id
"""


@query("sessionize_events", oracle=_SESSION_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a new session starts after a
    >30-min silence; sessions are numbered per user by a running sum
    of session-start flags.

    The batch dual of the streaming session window
    (streaming/events.py) — same semantics, pure window composition
    (lag → flag → running sum → groupBy), one shuffle on user_id
    reused by all three steps.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap.isNull() | (gap > 1_800_000_000), 1)
        .otherwise(0)
        .alias("_new"),
    )
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("_new").over(run).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
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


# --- calendar gap fill (operators/timeseries.py) --------------------------

_GAPFILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         SUM(CAST(value AS DECIMAL(18,4))) AS sv
  FROM events GROUP BY user_id, day
), bounds AS (
  SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM daily GROUP BY user_id
), spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                                     CAST(mx AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT s.user_id, s.day,
       COALESCE(d.n_events, 0) AS n_events,
       CAST(last_value(d.sv IGNORE NULLS) OVER (
              PARTITION BY s.user_id ORDER BY s.day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS day_value
FROM spine s LEFT JOIN daily d USING (user_id, day)
"""


@query("events_daily_gapfill", oracle=_GAPFILL_ORACLE)
def events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-user daily calendar over the irregular event stream
    (operators/timeseries.gap_fill_daily): event counts zero-filled on
    missing days, daily value totals carried forward. The spine is
    sequence+explode per user — keys × days rows, independent of raw
    event volume."""
    ev = _events(spark, sf_dir)
    return gap_fill_daily(
        ev,
        group_cols=["user_id"],
        ts_col="ts",
        aggs=[
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("day_value"),
        ],
        zero_cols=["n_events"],
        ffill_cols=["day_value"],
    ).withColumn("day_value", F.col("day_value").cast("double"))


# --- RANGE-frame trailing window ------------------------------------------

_TRAILING_ORACLE = """
SELECT user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
         AS value_7d,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
"""


@query("trailing_7d_window", oracle=_TRAILING_ORACLE)
def trailing_7d_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing 7-day totals — the RANGE frame (value-based
    window bounds) rather than the ROWS frame every other window query
    uses. Spark's rangeBetween needs a numeric ordering column, so the
    frame runs over unix microseconds with a ±7-day-in-µs bound —
    identical row membership to DuckDB's INTERVAL RANGE frame. One
    shuffle on user_id shared by both window functions."""
    ev = _events(spark, sf_dir)
    us = 7 * 24 * 3600 * 1_000_000  # 7 days in microseconds
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-us, 0)
    )
    return ev.select(
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,4)"))
        .over(w)
        .cast("double")
        .alias("value_7d"),
        F.count("*").over(w).alias("n_7d"),
    )


# --- forward as-of: next error after each purchase ------------------------

_ASOF_FWD_ORACLE = """
SELECT p.event_id, p.user_id, p.ts,
       e.ts AS ts_right, e.event_id AS next_error_id
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
ASOF JOIN (SELECT event_id, user_id, ts FROM events
           WHERE event_type = 'error') e
  ON p.user_id = e.user_id AND e.ts >= p.ts
"""


@query("asof_forward_next_error", oracle=_ASOF_FWD_ORACLE)
def asof_forward_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase attached to the user's next
    error at-or-after it — the mirror of the last-touch backward
    flavor (asof_click_attribution), same single union+window
    exchange, just walked in descending time
    (operators/asof.asof_join(direction='forward')). DuckDB's native
    ASOF JOIN with a >= condition is the oracle."""
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("next_error_id"), "user_id", "ts"
    )
    return asof_join(
        p,
        e,
        on="user_id",
        ts="ts",
        right_cols=["next_error_id"],
        how="inner",
        direction="forward",
    ).select(
        "event_id",
        "user_id",
        "ts",
        "ts_right",
        F.col("next_error_id_right").alias("next_error_id"),
    )


# --- time-weighted average ------------------------------------------------

# Each observation holds until the next one (step interpolation); its
# weight is that duration in exact integer microseconds. Everything
# stays INTEGER-exact to the end: value → fixed-point micro-units,
# weighted sum as a wide integer, then floor division by the span.
# (A decimal→double cast of the ~1e22 numerator is NOT portable:
# Spark rounds once via BigDecimal, DuckDB rounds hugeint→double and
# again dividing by the scale — measured 1-ulp drift on 44/150
# groups. Values are positive, so floor division == truncation and
# Spark's `div` agrees with DuckDB's `//`.)
_TWA_ORACLE = """
WITH seg AS (
  SELECT user_id,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v_fx,
         CAST(datediff('microsecond', ts,
              lead(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id)) AS BIGINT) AS dur_us
  FROM events
)
SELECT user_id,
       CAST(SUM(CAST(v_fx AS HUGEINT) * dur_us)
            // SUM(dur_us) AS BIGINT) AS twa_micro,
       CAST(SUM(CAST(v_fx AS HUGEINT) * dur_us)
            // SUM(dur_us) AS DOUBLE) / 1000000.0 AS twa_value,
       CAST(SUM(dur_us) AS BIGINT) AS span_us
FROM seg WHERE dur_us IS NOT NULL
GROUP BY user_id
"""


@query("time_weighted_avg_value", oracle=_TWA_ORACLE)
def time_weighted_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the value signal per user — the
    irregular-sampling mean (a plain AVG over-weights burst periods).
    Step interpolation: each observation holds until the next, weight
    = exact integer µs duration via one lead() window; the weighted
    mean stays integer-exact to the end (fixed-point micro-units and
    floor division — see the oracle comment for why the decimal→
    double cast is not portable). One user_id exchange shared by the
    window and the aggregate."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("v_fx"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    agg = seg.groupBy("user_id").agg(
        F.sum(
            F.col("v_fx").cast("decimal(38,0)") * F.col("dur_us")
        ).alias("_num"),
        F.sum("dur_us").cast("bigint").alias("span_us"),
    )
    return agg.select(
        "user_id",
        F.expr("CAST(_num div span_us AS BIGINT)").alias("twa_micro"),
        (
            F.expr("CAST(_num div span_us AS BIGINT)").cast("double")
            / F.lit(1_000_000.0)
        ).alias("twa_value"),
        "span_us",
    )


# --- OHLC resample bars ---------------------------------------------------

# Oracle avoids arg_min/arg_max because DuckDB's overload set has no
# composite-key form; the row_number() pair expresses the same
# "first/last by (ts, event_id)" selection. high/low are raw MIN/MAX
# of doubles (pure selection, no summation) so no DECIMAL routing is
# needed anywhere in this query.
_OHLC_ORACLE = """
WITH base AS (
  SELECT event_type, date_trunc('day', ts) AS bar_ts, value, ts, event_id
  FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT event_type, bar_ts, value,
    row_number() OVER (PARTITION BY event_type, bar_ts
                       ORDER BY ts, event_id) AS rn_a,
    row_number() OVER (PARTITION BY event_type, bar_ts
                       ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM base)
SELECT event_type, bar_ts,
  MAX(CASE WHEN rn_a=1 THEN value END) AS open,
  MAX(value) AS high, MIN(value) AS low,
  MAX(CASE WHEN rn_d=1 THEN value END) AS close,
  COUNT(*) AS n_ticks
FROM w GROUP BY event_type, bar_ts
"""


@query("ohlc_bars_events", oracle=_OHLC_ORACLE)
def ohlc_bars_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample the irregular value stream into daily OHLC bars per
    event type — the canonical time-series resample. Spark-native
    form: ``min_by``/``max_by`` keyed on struct(ts, event_id) pick
    open/close inside the same hash aggregate that computes high/low
    and tick count, so the whole bar is ONE partial→final aggregate
    on one (event_type, day) shuffle — no window, no second pass.
    The struct tiebreak (event_id is unique) makes open/close
    deterministic under equal timestamps; the oracle replays the
    selection with a row_number() pair since DuckDB's arg_min lacks
    a composite-key overload."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    return ev.groupBy(
        "event_type", F.date_trunc("DAY", "ts").alias("bar_ts")
    ).agg(
        F.min_by("value", F.struct("ts", "event_id")).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", F.struct("ts", "event_id")).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


# --- trailing EWMA --------------------------------------------------------

# Cross-engine float exactness rests on three facts: (a) alpha=0.5 →
# every weight power(0.5, k) is an exact power of two in IEEE double
# (verified term-by-term against DuckDB), so x*w is an exact scaling;
# (b) both sides fold the 20-term sum STRICTLY left-to-right in the
# same window order (Spark ``aggregate`` and DuckDB ``list_reduce``
# are both defined left folds; an earlier DECIMAL(28,12)-per-term
# draft diverged at 1e-12 because the engines round double→decimal
# differently — shortest-repr vs exact-value); (c) the weight-sum
# divisor 2 - 2^-(n-1) is itself an exact double. Identical IEEE op
# sequence → bit-identical output, no tolerance games.
_EWMA_ORACLE = """
WITH seq AS (
  SELECT user_id, event_id, value,
         list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS vals
  FROM events WHERE value IS NOT NULL)
SELECT user_id, event_id,
  list_reduce(list_transform(vals, (x, i) -> x * power(0.5, len(vals) - i)),
              (acc, x) -> acc + x)
    / (2.0 - power(0.5, len(vals) - 1)) AS ewma
FROM seq
"""


@query("ewma_trailing_value", oracle=_EWMA_ORACLE)
def ewma_trailing_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.5) of each
    user's value signal over a trailing 20-event window — the
    smoothing primitive plain windowed AVG can't express (weights
    decay with distance from the anchor row). The recursive form
    s_i = a*x_i + (1-a)*s_{i-1} isn't window-expressible, but the
    20-term truncation is: one collect_list window (bounded frame →
    bounded array, no unbounded state) feeds a codegen'd
    transform/aggregate fold — no UDF, no self-join row inflation.
    Normalized by the weight sum so short prefixes aren't biased
    toward zero. One user_id exchange total; at 100 TB the frame
    bound keeps per-row cost constant. Exactness notes above the
    oracle."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    seq = ev.select(
        "user_id",
        "event_id",
        F.collect_list("value").over(w).alias("vals"),
    )
    ewma = F.expr(
        """
        aggregate(transform(vals, (x, i) ->
                    x * power(0.5, size(vals) - 1 - i)),
                  CAST(0 AS DOUBLE), (acc, t) -> acc + t)
          / (2.0 - power(0.5, size(vals) - 1))
        """
    ).alias("ewma")
    return seq.select("user_id", "event_id", ewma)


# --- trailing z-score anomaly detection -----------------------------------

# Exactness: fixed-point micro-units make the trailing window's
# count/sum/sum-of-squares exact integers (DECIMAL(38,0) vs DuckDB
# HUGEINT — v² needs ~10^22, past BIGINT), so mean/σ/z reduce to ONE
# shared double expression over exact integers. The frame EXCLUDES
# the current row (20 PRECEDING .. 1 PRECEDING): the baseline must
# not contain the point being scored, or a genuine spike drags the
# mean/σ toward itself and mutes its own z.
_ZSCORE_ORACLE = """
WITH fx AS (
  SELECT user_id, event_id, ts,
         CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
w AS (
  SELECT user_id, event_id, v,
    COUNT(*) OVER fr AS n,
    SUM(CAST(v AS HUGEINT)) OVER fr AS s1,
    SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) OVER fr AS s2
  FROM fx
  WINDOW fr AS (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
z AS (
  SELECT user_id, event_id,
    CASE WHEN n >= 5 AND CAST(n AS HUGEINT) * s2 - s1 * s1 > 0 THEN
      CAST(CAST(n AS HUGEINT) * CAST(v AS HUGEINT) - s1 AS DOUBLE)
        / (CAST(n AS DOUBLE)
           * sqrt(CAST(CAST(n AS HUGEINT) * s2 - s1 * s1 AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))))
    END AS zscore
  FROM w)
SELECT user_id, event_id, zscore,
       (zscore IS NOT NULL AND abs(zscore) > 3.0) AS is_anomaly
FROM z
"""


@query("zscore_anomaly_events", oracle=_ZSCORE_ORACLE)
def zscore_anomaly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection in batch: each event scored
    against its own trailing 20-event baseline (z-score; |z|>3 flags
    ~0.3% under normality). Built-in windowed stddev_samp would be
    order-dependent in doubles — this computes the same statistic
    from exact integer window sums (see the oracle comment), the
    moment_stats_exact trick applied per-frame. One user_id exchange,
    bounded frame, all codegen. Events with under 5 predecessors or a
    constant baseline get NULL zscore (insufficient evidence, not
    z=0) and is_anomaly=false — the flag column is kept non-null
    because NULL booleans render asymmetrically through the gate's
    pandas path."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    fx = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 1_000_000 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    vd = F.col("v").cast("decimal(38,0)")
    w = fx.select(
        "user_id",
        "event_id",
        "v",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum(vd).over(fr).alias("s1"),
        F.sum(vd * vd).over(fr).alias("s2"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    disc = nd * F.col("s2") - F.col("s1") * F.col("s1")
    zscore = F.when(
        (F.col("n") >= 5) & (disc > 0),
        (nd * vd - F.col("s1")).cast("double")
        / (
            F.col("n").cast("double")
            * F.sqrt(
                disc.cast("double")
                / (
                    F.col("n").cast("double")
                    * (F.col("n") - 1).cast("double")
                )
            )
        ),
    ).alias("zscore")
    z = w.select("user_id", "event_id", zscore)
    return z.select(
        "user_id",
        "event_id",
        "zscore",
        (
            F.col("zscore").isNotNull() & (F.abs("zscore") > 3.0)
        ).alias("is_anomaly"),
    )


# --- rolling 28-day active users ------------------------------------------

_MAU_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events),
contrib AS (
  SELECT DISTINCT user_id,
         CAST(unnest(range(CAST(date_trunc('day', ts) AS DATE),
                           CAST(date_trunc('day', ts) AS DATE) + 28,
                           INTERVAL 1 DAY)) AS DATE) AS w_day
  FROM events),
mau AS (
  SELECT w_day, COUNT(*) AS active_users_28d
  FROM contrib GROUP BY w_day)
SELECT m.w_day AS day, m.active_users_28d
FROM mau m CROSS JOIN bounds b
WHERE m.w_day BETWEEN b.d0 AND b.d1
"""


@query("rolling_28d_active_users", oracle=_MAU_ORACLE)
def rolling_28d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-28-day distinct active users per day — the MAU curve,
    and the canonical "sliding distinct" problem: windows can't
    deduplicate across frames, so each activity day is EXPLODED into
    the 28 window-days it funds, deduped (user, window-day) once, and
    counted exactly. The fan-out is a fixed ×28 of the (user, day)
    activity table — already collapsed from raw events, so the
    explode multiplies days-with-activity, not events. At 100 TB the
    alternatives are per-day HLL sketches merged over 28 days
    (operators/sketches.py, ±2%) when exactness can yield; trimmed to
    the observed day span so no partial windows leak out."""
    ev = _events(spark, sf_dir)
    d = F.to_date(F.date_trunc("DAY", F.col("ts")))
    contrib = (
        ev.select(
            "user_id",
            F.explode(F.sequence(d, F.date_add(d, 27))).alias("w_day"),
        )
        .distinct()
    )
    mau = contrib.groupBy("w_day").agg(
        F.count(F.lit(1)).alias("active_users_28d")
    )
    bounds = ev.agg(
        F.min(d).alias("d0"), F.max(d).alias("d1")
    )
    return (
        mau.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("w_day") >= F.col("d0"))
            & (F.col("w_day") <= F.col("d1"))
        )
        .select(F.col("w_day").alias("day"), "active_users_28d")
    )


# --- month-over-month revenue growth --------------------------------------

_MOM_ORACLE = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1)
SELECT month, revenue,
       revenue / lag(revenue) OVER (ORDER BY month) - 1.0
         AS mom_growth
FROM monthly
"""


@query("mom_revenue_growth", oracle=_MOM_ORACLE)
def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the reporting staple: one
    calendar-month aggregate (DECIMAL-exact sums), then a lag over
    the tiny monthly table for the growth ratio (one shared double
    divide; the first month's NULL growth stays NULL). The global-
    order window runs on rows = number of months, never on facts."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.to_date(F.date_trunc("MONTH", "o_orderdate")).alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    return monthly.select(
        "month",
        "revenue",
        (F.col("revenue") / F.lag("revenue").over(w) - 1.0).alias(
            "mom_growth"
        ),
    )


# --- NULL ordering pinned (NULLS FIRST/LAST in ranked limits) -------------

_NULLORD_ORACLE = """
WITH ranked AS (
  SELECT event_id, value,
         CAST(row_number() OVER (
           ORDER BY value DESC NULLS LAST, event_id) AS INT)
           AS rk_val_desc,
         CAST(row_number() OVER (
           ORDER BY value ASC NULLS FIRST, event_id) AS INT)
           AS rk_nulls_first
  FROM events)
SELECT event_id, value, rk_val_desc, rk_nulls_first
FROM ranked
WHERE rk_val_desc <= 5 OR rk_nulls_first <= 5
"""


@query("null_ordering_topk", oracle=_NULLORD_ORACLE)
def null_ordering_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL ordering pinned EXPLICITLY in ranked top-k — the trap the
    null_semantics_zoo doesn't cover: engine DEFAULTS diverge (Spark:
    NULLS FIRST for ASC / LAST for DESC; DuckDB: NULLS LAST unless
    configured), which silently changes which rows a LIMIT keeps
    whenever the sort column is nullable. Any ranked query over
    nullable keys must spell NULLS FIRST/LAST out — with it, both
    engines select identical rows (this gate); without it, a top-5
    by value could be five NULLs on one engine and five maxima on
    the other. Identical SQL text runs on both engines."""
    ev = _events(spark, sf_dir)
    ev.createOrReplaceTempView("events")
    return spark.sql(_NULLORD_ORACLE)


# --- conversion latency percentiles ---------------------------------------

_CONV_LAT_ORACLE = """
WITH p AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
pairs AS (
  SELECT p.event_id, date_diff('microsecond', v.ts, p.ts) AS latency_us
  FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts)
SELECT COUNT(*) AS n_converted,
       CAST(quantile_cont(latency_us, 0.5) AS DOUBLE) AS p50_us,
       CAST(quantile_cont(latency_us, 0.9) AS DOUBLE) AS p90_us
FROM pairs
"""


@query("conversion_latency_percentiles", oracle=_CONV_LAT_ORACLE)
def conversion_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """View→purchase conversion latency, percentile-summarized — the
    funnel-timing readout product teams put next to conversion rates.
    Composes the as-of join operator (union+window, one user_id
    exchange — the same engine asof_click_attribution gates) with
    exact integer-µs gaps and the bitwise-matching exact percentile
    (quantile_prices precedent). Purchases with no prior view drop
    out of the as-of inner match — unconverted traffic belongs to the
    funnel query, not the latency one."""
    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), "user_id", "ts"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts"
    )
    joined = asof_join(
        purchases, views, on="user_id", ts="ts", right_cols=[],
        suffix="_view",
    )
    pairs = joined.select(
        (
            F.unix_micros("ts") - F.unix_micros("ts_view")
        ).alias("latency_us")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.percentile("latency_us", F.lit(0.5))
        .cast("double")
        .alias("p50_us"),
        F.percentile("latency_us", F.lit(0.9))
        .cast("double")
        .alias("p90_us"),
    )


# --- sweep-line interval concurrency --------------------------------------

_CONCURRENCY_ORACLE = """
WITH iv AS (
  SELECT event_type,
         epoch_us(ts) AS s_us,
         epoch_us(ts) + (event_id % 3600) * 1000000 AS e_us
  FROM events
), pts AS (
  SELECT event_type, s_us AS t_us, 1 AS delta FROM iv
  UNION ALL
  SELECT event_type, e_us AS t_us, -1 AS delta FROM iv
), run AS (
  SELECT event_type,
         SUM(delta) OVER (
           PARTITION BY event_type
           ORDER BY t_us, delta
           ROWS UNBOUNDED PRECEDING
         ) AS live
  FROM pts
)
SELECT event_type,
       CAST(MAX(live) AS BIGINT) AS max_concurrent,
       (SELECT COUNT(*) FROM iv i WHERE i.event_type = run.event_type)
         AS n_intervals
FROM run GROUP BY event_type
"""


@query("max_concurrent_intervals", oracle=_CONCURRENCY_ORACLE)
def max_concurrent_intervals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Peak interval concurrency per event type — the sweep-line
    pattern (max simultaneous sessions / calls / jobs): each interval
    emits a +1 at its start and a -1 at its end, one window running
    sum over time gives the live count, max per group is the answer.

    Scale shape: the explode is exactly 2× input rows and the single
    window partitions by event_type — ONE exchange, no self-join (the
    naive interval-overlap count is O(n²)). Skewed groups would
    window-sort within one task; the daily-bucket split (run the
    sweep per day with a carried-in offset) is the documented fix.
    Determinism: interval ends are half-open ([s, e) — a -1 sorts
    before a +1 at the same instant via the ``delta`` tiebreak) and
    all arithmetic is integer microseconds, so the running sums are
    exact in both engines.

    Interval = [ts, ts + (event_id % 3600) s) — a deterministic
    integer duration derived from the key (no RNG, registry rules)."""
    ev = _events(spark, sf_dir)
    iv = ev.select(
        "event_type",
        F.unix_micros("ts").alias("s_us"),
        (
            F.unix_micros("ts")
            + (F.col("event_id") % 3600) * F.lit(1000000)
        ).alias("e_us"),
    )
    pts = iv.select(
        "event_type", F.col("s_us").alias("t_us"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select(
            "event_type",
            F.col("e_us").alias("t_us"),
            F.lit(-1).alias("delta"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t_us", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.withColumn("live", F.sum("delta").over(w))
    peaks = run.groupBy("event_type").agg(
        F.max("live").cast("bigint").alias("max_concurrent")
    )
    counts = iv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals")
    )
    return peaks.join(counts, "event_type")


# --- max drawdown over the daily value curve ------------------------------

_DRAWDOWN_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(floor(value * 10000) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL
  GROUP BY event_type, date_trunc('day', ts)
), curve AS (
  SELECT event_type, day, v4,
         MAX(v4) OVER (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS peak4
  FROM daily
)
SELECT event_type,
       COUNT(*) AS n_days,
       CAST(MAX(peak4 - v4) AS DOUBLE) / 10000.0 AS max_drawdown,
       CAST(MAX(CASE WHEN peak4 > 0 THEN
             CAST(peak4 - v4 AS DOUBLE) / peak4 ELSE 0 END) AS DOUBLE)
         AS max_drawdown_frac
FROM curve GROUP BY event_type
"""


@query("max_drawdown_daily_value", oracle=_DRAWDOWN_ORACLE)
def max_drawdown_daily_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maximum drawdown of each event type's daily value curve — the
    running-peak-minus-current metric (finance's risk statistic,
    equally the "how far did this KPI fall from its best day"
    readout). One daily pre-aggregation collapses the input, then a
    running-max window + final max per group.

    Determinism: daily sums are fixed-point integers (q1 device), so
    peak−value differences are exact; the fractional drawdown is one
    IEEE divide per day and MAX over doubles is order-independent —
    no float summation anywhere."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("DAY", "ts")).alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 10000).cast("bigint")).alias(
            "v4"
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = daily.withColumn("peak4", F.max("v4").over(w))
    return curve.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        (F.max(F.col("peak4") - F.col("v4")).cast("double") / 10000.0)
        .alias("max_drawdown"),
        F.max(
            F.when(
                F.col("peak4") > 0,
                (F.col("peak4") - F.col("v4")).cast("double")
                / F.col("peak4"),
            ).otherwise(F.lit(0.0))
        ).cast("double").alias("max_drawdown_frac"),
    )


# --- gaps-and-islands: longest daily streak -------------------------------

_STREAK_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events
), grp AS (
  SELECT user_id, day,
         day - CAST(ROW_NUMBER() OVER (
             PARTITION BY user_id ORDER BY day) AS INT) AS anchor
  FROM days
), streaks AS (
  SELECT user_id, anchor, COUNT(*) AS len FROM grp
  GROUP BY user_id, anchor
)
SELECT CAST(len AS INT) AS streak_len,
       COUNT(*) AS n_user_streaks,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM streaks GROUP BY len
"""


@query("longest_daily_streak", oracle=_STREAK_ORACLE)
def longest_daily_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands via the date-minus-row-number trick: within a
    user, consecutive active days share ``day − row_number`` (each
    gap shifts the anchor), so one window + one groupBy finds every
    streak with no self-join — the engagement-streak / uptime-run
    primitive. Output is the corpus-wide streak-length histogram
    (stable under the driver's order-insensitive compare).

    Scale shape: distinct (user, day) collapses the event stream
    first; the window and both aggregates share the user_id
    partitioning, and integer date arithmetic keeps both engines
    exact."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    days = ev.select(
        "user_id", F.to_date(F.date_trunc("DAY", "ts")).alias("day")
    ).distinct()
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("day")
    )
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("day"), rn)
    )
    streaks = grp.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).alias("len")
    )
    return streaks.groupBy(
        F.col("len").cast("int").alias("streak_len")
    ).agg(
        F.count(F.lit(1)).alias("n_user_streaks"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


# --- clamped running balance (non-associative fold) -----------------------

_CLAMP_ORACLE = """
WITH d AS (
  SELECT user_id,
         list_transform(
           list_sort(list_zip(
             list(epoch_us(ts)),
             list(CAST(floor((value - 55) * 10000) AS BIGINT)))),
           p -> p[2]) AS deltas
  FROM events WHERE value IS NOT NULL
  GROUP BY user_id
)
SELECT user_id,
       CAST(len(deltas) AS INT) AS n_deltas,
       CAST(list_reduce(
         list_prepend(CAST(0 AS BIGINT), deltas),
         (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x))
         AS BIGINT) AS final_balance4
FROM d
"""


@query("clamped_running_balance", oracle=_CLAMP_ORACLE)
def clamped_running_balance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Floor-clamped running balance per user (inventory that can't
    go negative, a wallet that can't overdraw):
    ``bal ← max(0, bal + Δ)`` is NON-ASSOCIATIVE, so no window frame
    or two-pass trick computes it — the classic "needs a sequential
    scan" recurrence. The engine device: collect each user's deltas
    as an array SORTED by (event-time, delta) and run the recurrence
    with the HIGHER-ORDER FOLD ``F.aggregate`` — sequential semantics
    inside one codegen'd expression, no Python boundary, and the
    oracle replays the identical left fold with DuckDB's
    ``list_reduce``. Integer fixed-point deltas keep every
    intermediate exact.

    Scale shape: one groupBy(user) shuffle; per-user state is the
    array (fine for per-entity event counts in the thousands — the
    applyInPandasWithState streaming operator covers the unbounded
    case). Deltas are (value − 55)·10⁴ so the fixture's balances
    genuinely bounce off the clamp (≈20% end at 0)."""
    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    d = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.unix_micros("ts").alias("t"),
                    F.floor((F.col("value") - 55) * 10000)
                    .cast("bigint")
                    .alias("dx"),
                )
            )
        ).alias("pairs")
    )
    deltas = F.transform(F.col("pairs"), lambda p: p["dx"])
    return d.select(
        "user_id",
        F.size("pairs").cast("int").alias("n_deltas"),
        F.aggregate(
            deltas,
            F.lit(0).cast("bigint"),
            lambda acc, x: F.greatest(F.lit(0).cast("bigint"), acc + x),
        ).cast("bigint").alias("final_balance4"),
    )


# --- WAU/MAU stickiness ---------------------------------------------------

_STICKINESS_ORACLE = """
WITH bounds AS (
  SELECT CAST(MIN(date_trunc('day', ts)) AS DATE) AS d0,
         CAST(MAX(date_trunc('day', ts)) AS DATE) AS d1
  FROM events),
contrib AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS DATE) AS a_day
  FROM events),
wau AS (
  SELECT w_day, COUNT(DISTINCT user_id) AS wau FROM (
    SELECT user_id,
           CAST(unnest(range(a_day, a_day + 7, INTERVAL 1 DAY))
                AS DATE) AS w_day
    FROM contrib) x GROUP BY w_day),
mau AS (
  SELECT w_day, COUNT(DISTINCT user_id) AS mau FROM (
    SELECT user_id,
           CAST(unnest(range(a_day, a_day + 28, INTERVAL 1 DAY))
                AS DATE) AS w_day
    FROM contrib) x GROUP BY w_day)
SELECT w.w_day AS day, w.wau, m.mau,
       CAST(w.wau AS DOUBLE) / m.mau AS stickiness
FROM wau w JOIN mau m ON w.w_day = m.w_day
CROSS JOIN bounds b
WHERE w.w_day BETWEEN b.d0 AND b.d1
"""


@query("wau_mau_stickiness", oracle=_STICKINESS_ORACLE)
def wau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU/MAU-family stickiness: trailing-7d over trailing-28d
    distinct actives per day — the product-engagement ratio ("what
    fraction of the monthly audience shows up weekly"). Both curves
    come from ONE distinct (user, day) table fanned by bounded
    explodes (×7 and ×28), deduped, and counted — the
    rolling_28d_active_users shape, twice, joined on the day spine.
    Integer counts, one closing divide."""
    ev = _events(spark, sf_dir)
    d = F.to_date(F.date_trunc("DAY", F.col("ts")))
    contrib = ev.select("user_id", d.alias("a_day")).distinct()

    def rolling(width: int, name: str) -> DataFrame:
        return (
            contrib.select(
                "user_id",
                F.explode(
                    F.sequence(
                        F.col("a_day"),
                        F.date_add("a_day", width - 1),
                    )
                ).alias("w_day"),
            )
            .distinct()
            .groupBy("w_day")
            .agg(F.count(F.lit(1)).alias(name))
        )

    wau = rolling(7, "wau")
    mau = rolling(28, "mau")
    bounds = ev.agg(F.min(d).alias("d0"), F.max(d).alias("d1"))
    return (
        wau.join(mau, "w_day")
        .crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("w_day") >= F.col("d0"))
            & (F.col("w_day") <= F.col("d1"))
        )
        .select(
            F.col("w_day").alias("day"),
            "wau",
            "mau",
            (F.col("wau").cast("double") / F.col("mau")).alias(
                "stickiness"
            ),
        )
    )


# --- consecutive-duplicate collapse (run-length encoding) -----------------

_COLLAPSE_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), runs AS (
  SELECT user_id, event_type FROM seq
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT event_type,
       (SELECT COUNT(*) FROM events e
        WHERE e.event_type = runs.event_type) AS n_raw,
       COUNT(*) AS n_runs
FROM runs GROUP BY event_type
"""


@query("collapse_consecutive_events", oracle=_COLLAPSE_ORACLE)
def collapse_consecutive_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Telemetry run-length collapse: repeated consecutive events of
    the same type within a user's stream count once per RUN (the
    retry-storm / held-down-key / duplicate-beacon cleanup every
    event pipeline applies before sessionizing). One lag window per
    user marks run heads; raw-vs-collapsed counts per type land in
    the gate. Deterministic ordering via the (ts, event_id)
    tiebreak; single user_id exchange shared by the window."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    runs = seq.filter(
        F.col("prev_type").isNull()
        | (F.col("event_type") != F.col("prev_type"))
    )
    raw = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_raw")
    )
    coll = runs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_runs")
    )
    return raw.join(coll, "event_type").select(
        "event_type", "n_raw", "n_runs"
    )


# --- deterministic per-group mode -----------------------------------------

_MODE_ORACLE = """
WITH c AS (
  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
  FROM orders GROUP BY o_orderstatus, o_orderpriority
), r AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY o_orderstatus
      ORDER BY cnt DESC, o_orderpriority ASC) AS rn
  FROM c
)
SELECT o_orderstatus,
       o_orderpriority AS mode_priority,
       CAST(cnt AS BIGINT) AS mode_count
FROM r WHERE rn = 1
"""


@query("mode_per_group", oracle=_MODE_ORACLE)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group with a PINNED tie rule
    (count desc, then value asc) — the deterministic form of mode.
    The built-in ``F.mode`` is explicitly non-deterministic under
    ties (and DuckDB's ``mode`` picks its own winner), so a gated
    pipeline must spell the tiebreak: count + WindowGroupLimit over
    the collapsed (group, value) table, which also partial-aggregates
    map-side — the built-in can't."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rn = F.row_number().over(
        Window.partitionBy("o_orderstatus").orderBy(
            F.desc("cnt"), F.asc("o_orderpriority")
        )
    )
    return (
        c.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("cnt").cast("bigint").alias("mode_count"),
        )
    )


# --- inter-arrival time histogram (log2 buckets) --------------------------

_INTERARRIVAL_ORACLE = """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT CAST(CASE WHEN gap_us = 0 THEN -1
            ELSE length(bin(gap_us)) - 1 END AS INT) AS log2_bucket,
       COUNT(*) AS n_gaps,
       CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
       CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY 1
"""


@query("interarrival_log2_histogram", oracle=_INTERARRIVAL_ORACLE)
def interarrival_log2_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Inter-event arrival-time histogram in power-of-two buckets —
    the latency/traffic-shape readout (exponential buckets are how
    every telemetry system stores timing distributions). The bucket
    is EXACT integer log₂: ``length(bin(gap)) − 1`` counts the bits
    of the µs gap — no floating log whose libm rounding could differ
    between engines (the PSI/entropy trap this family deliberately
    avoids). Zero gaps (same-µs events) get bucket −1. One lag
    window per user; bucket aggregate reuses nothing heavier."""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (
            F.unix_micros("ts")
            - F.lag(F.unix_micros("ts")).over(w)
        ).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    bucket = F.when(F.col("gap_us") == 0, -1).otherwise(
        F.length(F.bin(F.col("gap_us"))) - 1
    )
    return gaps.groupBy(
        bucket.cast("int").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("gap_us").cast("bigint").alias("min_gap_us"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


# --- IGNORE NULLS forward fill --------------------------------------------

_FFILL_ORACLE = """
WITH sparse AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type = 'purchase'
              THEN CAST(floor(value * 10000) AS BIGINT) END AS v4
  FROM events
), filled AS (
  SELECT user_id,
         last_value(v4 IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS f4
  FROM sparse
)
SELECT user_id,
       COUNT(*) AS n_rows,
       COUNT(f4) AS n_filled,
       CAST(SUM(f4) AS BIGINT) AS filled_sum4
FROM filled GROUP BY user_id
"""


@query("forward_fill_ignore_nulls", oracle=_FFILL_ORACLE)
def forward_fill_ignore_nulls(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forward fill of a SPARSE column (only purchase events carry a
    value; every other row inherits the most recent one) via
    ``last(..., ignorenulls=True)`` over a running frame — THE
    missing-data primitive for state columns sampled irregularly
    (last known price, last config version). Rows before a user's
    first purchase stay NULL — pinned by n_rows vs n_filled. One
    user_id window; fixed-point integers so the fill sums are exact.
    (DuckDB spells it ``last_value(x IGNORE NULLS)`` — same
    standard semantics, different syntax slot.)"""
    from pyspark.sql.window import Window

    ev = _events(spark, sf_dir)
    sparse = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 10000).cast("bigint"),
        ).alias("v4"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = sparse.withColumn(
        "f4", F.last("v4", ignorenulls=True).over(w)
    )
    return filled.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("f4").alias("n_filled"),
        F.sum("f4").cast("bigint").alias("filled_sum4"),
    )


# --- as-of join with staleness tolerance ----------------------------------

_ASOF_TOL_ORACLE = """
WITH j AS (
  SELECT c.event_id AS click_event_id,
         date_diff('microsecond', v.ts, c.ts) AS gap_us
  FROM (SELECT * FROM events WHERE event_type = 'click') c
  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
    ON c.user_id = v.user_id AND c.ts >= v.ts
)
SELECT COUNT(*) AS n_clicks,
       COUNT(gap_us) AS n_matched_any,
       CAST(SUM(CASE WHEN gap_us <= 300000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_matched_fresh,
       CAST(SUM(CASE WHEN gap_us <= 300000000 THEN gap_us END)
            AS BIGINT) AS fresh_gap_sum_us
FROM j
"""


@query("asof_tolerance_attribution", oracle=_ASOF_TOL_ORACLE)
def asof_tolerance_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """As-of join with a STALENESS TOLERANCE (pandas merge_asof's
    ``tolerance`` knob): a click attributes to its most recent prior
    view only if that view is ≤ 5 minutes old — the attribution-
    window rule real marketing pipelines enforce, distinct from plain
    backward as-of (a week-old view should not claim the click).
    Engine shape: the same union+window as-of (ONE exchange —
    operators/asof.py), with the tolerance applied as a filter on
    the integer-µs gap afterward; matched-any vs matched-fresh
    counts quantify what the tolerance rejects."""
    from convert_parquet_to_csv_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")
    j = asof_join(
        clicks,
        views,
        on="user_id",
        ts="ts",
        right_cols=[],
        how="left",
    )
    gap = F.unix_micros("ts") - F.unix_micros("ts_right")
    tol = 300_000_000  # 5 minutes in µs
    g = j.select(gap.alias("gap_us"))
    return g.agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.count("gap_us").alias("n_matched_any"),
        F.sum(
            F.when(F.col("gap_us") <= tol, 1).otherwise(0)
        ).cast("bigint").alias("n_matched_fresh"),
        F.sum(
            F.when(F.col("gap_us") <= tol, F.col("gap_us"))
        ).cast("bigint").alias("fresh_gap_sum_us"),
    )


# --- CUSUM changepoint detection (Page 1954) -------------------------------
#
# r7 addition, day-one gated. Exact-integer device: the centered
# cumulative sum S_t = Σ_{i<=t}(x_i − x̄) is fractional, but n·S_t =
# n·C_t − t·T (C_t = prefix sum, T = total) is an INTEGER — multiply
# the argmax through by n and no float ever enters the selection; the
# reported magnitudes take one closing divide each.

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(floor(value * 10000) AS BIGINT)) AS v4
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
), curve AS (
  SELECT event_type, day, v4,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day)
           AS t,
         SUM(v4) OVER (PARTITION BY event_type ORDER BY day)
           AS c,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(v4) OVER (PARTITION BY event_type) AS total
  FROM daily
), scored AS (
  -- DECIMAL(38,0) like the Spark plan: bigint n*c wraps silently at
  -- ~1e15 daily masses over multi-year series
  SELECT *, abs(CAST(n AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0))
              - CAST(t AS DECIMAL(38,0)) * CAST(total AS DECIMAL(38,0)))
              AS nd,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY abs(CAST(n AS DECIMAL(38,0))
                                         * CAST(c AS DECIMAL(38,0))
                                       - CAST(t AS DECIMAL(38,0))
                                         * CAST(total AS DECIMAL(38,0)))
                              DESC, t ASC) AS rn
  FROM curve
)
SELECT event_type, day AS change_day,
       CAST(n AS BIGINT) AS n_days,
       CAST(nd AS DOUBLE) / n / 10000.0 AS cusum_peak,
       CAST(c AS DOUBLE) / t / 10000.0 AS mean_before,
       CASE WHEN n > t THEN
         CAST(total - c AS DOUBLE) / (n - t) / 10000.0 END
         AS mean_after
FROM scored WHERE rn = 1
"""


@query("cusum_changepoint_daily", oracle=_CUSUM_ORACLE)
def cusum_changepoint_daily(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CUSUM changepoint per event type (Page 1954; the standard
    level-shift detector): the day t maximizing |S_t|, S_t = the
    centered cumulative sum of the daily value series — where the
    series' mean shifted, the KPI-regression readout. Selection is
    EXACT integer arithmetic: n·S_t = n·C_t − t·T evaluates in
    DECIMAL(38,0) (bigint would wrap silently once daily fixed-point
    masses reach ~1e15 over multi-year series; ×10⁴ q1 device on
    values), argmax ties break
    to the earliest day; the peak magnitude and the before/after
    means take one closing divide each (mean_after is NULL when the
    peak lands on the final day — an empty after-segment).

    Scale shape: one daily pre-aggregation collapses the corpus;
    every window after is partitioned by event_type over DAYS
    (dimension-scale, the drawdown class — operators/timeseries.
    cusum_changepoint). At 100 TB the daily rollup is the only
    data-scale stage."""
    from convert_parquet_to_csv_spark.operators.timeseries import (
        cusum_changepoint,
    )

    ev = _events(spark, sf_dir).filter(F.col("value").isNotNull())
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("DAY", "ts")).alias("day"),
    ).agg(
        F.sum(F.floor(F.col("value") * 10000).cast("bigint")).alias(
            "v4"
        )
    )
    return cusum_changepoint(daily, scale=10_000)

"""Driver-checked approximate-sketch coverage (operators/sketches.py).

Sketch estimates can't hash-match a DuckDB oracle (different HLL/GK
implementations), so each query returns EXACT values plus booleans
asserting the sketch landed inside its published error bound; the
oracle returns the same exact values with literal TRUEs. A sketch
drifting out of bound therefore fails the value-hash gate — a real
cross-engine check, not a rows-only count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators.sketches import (
    approx_quantiles,
    cms_estimate,
    cms_tables,
    hll_estimate,
    hll_merge_estimate,
    hll_sketches,
)
from convert_parquet_to_csv_spark.plans.common import load_table
from convert_parquet_to_csv_spark.plans.registry import query

# lgK=14 → relative standard error ~0.8%; 5% is >6 sigma — a bound a
# correct implementation essentially never violates, while a broken
# sketch (or wrong column) blows through it.
_HLL_TOL = 0.05

_HLL_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact,
       TRUE AS hll_within_tol
FROM orders
GROUP BY o_orderstatus
UNION ALL
SELECT 'ALL' AS o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_exact,
       TRUE AS hll_within_tol
FROM orders
"""


@query("hll_distinct_customers", oracle=_HLL_ORACLE)
def hll_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL distinct customers per order status + merged-sketch global.

    The per-status sketches are REUSED for the global row via
    `hll_union_agg` — no second scan of orders, the mergeability
    property that makes sketches the 100 TB COUNT(DISTINCT) plan
    (fixed 2^14 bytes per group vs shuffling every distinct key).
    """
    orders = load_table(spark, sf_dir, "orders")
    sketches = hll_sketches(orders, "o_orderstatus", "o_custkey").cache()
    exact = orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers_exact")
    )
    per_group = (
        hll_estimate(sketches)
        .join(exact, "o_orderstatus")
        .select(
            "o_orderstatus",
            "n_customers_exact",
            (
                F.abs(F.col("n_distinct_est") - F.col("n_customers_exact"))
                <= F.col("n_customers_exact") * _HLL_TOL
            ).alias("hll_within_tol"),
        )
    )
    global_est = sketches.agg(hll_merge_estimate(sketches).alias("n_distinct_est"))
    global_exact = orders.agg(
        F.countDistinct("o_custkey").alias("n_customers_exact")
    )
    global_row = global_est.crossJoin(global_exact).select(
        F.lit("ALL").alias("o_orderstatus"),
        "n_customers_exact",
        (
            F.abs(F.col("n_distinct_est") - F.col("n_customers_exact"))
            <= F.col("n_customers_exact") * _HLL_TOL
        ).alias("hll_within_tol"),
    )
    return per_group.unionByName(global_row)


# percentile_approx's contract is on RANK, not value: the returned
# value's rank is within eps=1/accuracy of the target. So the check
# brackets each approx value between the EXACT percentiles at p±eps.
_QSKETCH_ACCURACY = 1000  # eps = 0.001

_QSKETCH_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.500) AS p50_exact,
       quantile_cont(l_extendedprice, 0.900) AS p90_exact,
       TRUE AS approx_within_rank_eps
FROM lineitem
GROUP BY l_returnflag
"""


@query("approx_quantile_sketch", oracle=_QSKETCH_ORACLE)
def approx_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch vs exact, checked against the rank-eps contract.

    Exact percentiles (which DuckDB `quantile_cont` matches bitwise —
    see quantile_prices) are the returned values; the boolean brackets
    the sketch output between exact percentiles at p±eps. At 100 TB
    the exact columns drop and only the O(accuracy)-memory sketch
    remains.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # 2x margin: the returned value is an order statistic within
    # rank-eps, but the interpolated bracket percentile can sit a hair
    # inside the same order statistic — 2*eps removes the boundary
    # false-negative without weakening the check materially.
    eps = 2.0 / _QSKETCH_ACCURACY
    approx = approx_quantiles(
        li, "l_returnflag", "l_extendedprice", [0.5, 0.9], _QSKETCH_ACCURACY
    ).withColumnsRenamed({"p50": "p50_a", "p90": "p90_a"})
    # Exact values at the targets and at the rank-eps brackets.
    probs = [0.5, 0.9, 0.5 - eps, 0.5 + eps, 0.9 - eps, 0.9 + eps]
    arr = ", ".join(str(p) for p in probs)
    exact = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile(l_extendedprice, array({arr}))").alias("_e")
    )
    return (
        exact.join(approx, "l_returnflag")
        .select(
            "l_returnflag",
            F.col("_e")[0].alias("p50_exact"),
            F.col("_e")[1].alias("p90_exact"),
            (
                F.col("p50_a").between(F.col("_e")[2], F.col("_e")[3])
                & F.col("p90_a").between(F.col("_e")[4], F.col("_e")[5])
            ).alias("approx_within_rank_eps"),
        )
    )


# Count-min: est >= exact is a HARD guarantee (collisions only add),
# checked per heavy hitter; the upper bound est <= exact + N·e/width
# holds with prob 1-e^-depth per key — comfortably deterministic at
# depth 4 for a 20-key check, and a broken hash/merge blows past it.
_CMS_DEPTH, _CMS_WIDTH, _CMS_TOPK = 4, 256, 20

_CMS_ORACLE = f"""
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS exact_count,
       TRUE AS cms_lower_ok,
       TRUE AS cms_upper_ok
FROM events
GROUP BY user_id
ORDER BY COUNT(*) DESC, user_id ASC
LIMIT {_CMS_TOPK}
"""


@query("cms_heavy_hitters", oracle=_CMS_ORACLE)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch point queries for the top-20 heaviest users.

    The sketch is a d×w counter table built by ONE map-side-combinable
    groupBy (shuffle ≤ d·w rows per partition regardless of input
    size); estimates come from a broadcast join against it. Exact
    counts ride along; the booleans assert the CMS contract —
    ``est ≥ exact`` always, ``est ≤ exact + N·e/w`` with the published
    confidence — so a hashing or merge bug fails the value-hash gate.
    """
    ev = load_table(spark, sf_dir, "events")
    sketch = cms_tables(ev, "user_id", _CMS_DEPTH, _CMS_WIDTH)
    exact = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("user_id"))
        .limit(_CMS_TOPK)
    )
    total = ev.count()
    bound = int(total * 2.718281828459045 / _CMS_WIDTH) + 1
    est = cms_estimate(
        exact, sketch, "user_id", _CMS_DEPTH, _CMS_WIDTH
    )
    return est.select(
        "user_id",
        "exact_count",
        (F.col("cms_count") >= F.col("exact_count")).alias("cms_lower_ok"),
        (F.col("cms_count") <= F.col("exact_count") + F.lit(bound)).alias(
            "cms_upper_ok"
        ),
    )


# --- HLL-merged rolling MAU -----------------------------------------------

_MAU_HLL_ORACLE = """
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
  SELECT w_day, COUNT(*) AS exact_users FROM contrib GROUP BY w_day)
SELECT m.w_day AS day, m.exact_users, TRUE AS within_1pct
FROM mau m CROSS JOIN bounds b
WHERE m.w_day BETWEEN b.d0 AND b.d1
"""


@query("rolling_28d_mau_hll", oracle=_MAU_HLL_ORACLE)
def rolling_28d_mau_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rolling_28d_active_users' AT-SCALE form: one lgK=14 HLL sketch
    per activity day (a few KB each), each fanned out to the 28
    window-days it funds and UNION-MERGED per window — the explode
    carries sketches, not (user, day) rows, so window width scales
    free and the daily sketches are reusable for any other window
    (7d, 90d) without touching raw data. The oracle pins the EXACT
    count per day and asserts the estimate lands within 1% of it
    (TRUE for every day — HLL is deterministic, so this is a hard
    gate, the dedup_minhash_recall pattern; at fixture cardinality
    the sparse-mode sketch is exact outright)."""
    ev = load_table(spark, sf_dir, "events")
    d = F.to_date(F.date_trunc("DAY", F.col("ts")))
    daily = (
        ev.select(d.alias("day"), "user_id")
        .groupBy("day")
        .agg(
            F.hll_sketch_agg(
                F.col("user_id").cast("string"), F.lit(14)
            ).alias("sk")
        )
    )
    contrib = daily.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", 27))
        ).alias("w_day"),
        "sk",
    )
    approx = contrib.groupBy("w_day").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx")
    )
    exact = (
        ev.select(
            "user_id",
            F.explode(F.sequence(d, F.date_add(d, 27))).alias("w_day"),
        )
        .distinct()
        .groupBy("w_day")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    bounds = ev.agg(F.min(d).alias("d0"), F.max(d).alias("d1"))
    return (
        approx.join(exact, "w_day")
        .crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("w_day") >= F.col("d0"))
            & (F.col("w_day") <= F.col("d1"))
        )
        .select(
            F.col("w_day").alias("day"),
            "exact_users",
            (
                F.abs(F.col("approx") - F.col("exact_users"))
                <= 0.01 * F.col("exact_users")
            ).alias("within_1pct"),
        )
    )


# --- KMV (k-minimum-values) distinct sketch -------------------------------

# 32-bit hash = first 8 hex chars of md5 — computable bit-identically
# in both engines (the table_checksum_orders device), so unlike the
# HLL/GK sketches above the ENTIRE sketch content hash-matches the
# oracle: kth-min hash values, estimates, and the merged union row are
# all exact cross-engine values, not just bounded ones.
_KMV_K = 64

_KMV_ORACLE = f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)
              AS BIGINT) AS hv
  FROM events
), r AS (
  SELECT event_type, hv,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM h
), g AS (
  SELECT event_type,
         MAX(CASE WHEN rn <= {_KMV_K} THEN hv END) AS kth_min_hash,
         COUNT(*) AS exact_distinct
  FROM r GROUP BY event_type
), ga AS (
  SELECT 'ALL' AS event_type,
         MAX(CASE WHEN rn <= {_KMV_K} THEN hv END) AS kth_min_hash,
         COUNT(*) AS exact_distinct
  FROM (SELECT hv, ROW_NUMBER() OVER (ORDER BY hv) AS rn
        FROM (SELECT DISTINCT hv FROM h)) ru
), u AS (
  SELECT * FROM g UNION ALL SELECT * FROM ga
)
SELECT event_type, kth_min_hash, exact_distinct,
       CASE WHEN exact_distinct >= {_KMV_K}
            THEN {float((_KMV_K - 1) * 4294967296)} / kth_min_hash
            ELSE CAST(exact_distinct AS DOUBLE) END AS est_distinct,
       TRUE AS within_2x
FROM u
"""


@query("kmv_distinct_sketch", oracle=_KMV_ORACLE)
def kmv_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch per event type + a MERGED global row.

    KMV keeps the k smallest 32-bit hash values of the distinct keys;
    the kth-minimum's position in [0, 2^32) estimates density:
    ``est = (k-1)·2^32 / h_k`` (Bar-Yossef et al.'s bottom-k sketch —
    fixed k·8 bytes per group, mergeable by taking the k smallest of
    a union, the cheap cousin of HLL with exact set-operation
    algebra). The ALL row is built by MERGING the per-group sketches
    — the k smallest of the pooled per-group minima are provably the
    global bottom-k, so the union estimate never rescans the data.

    "Exact" distinct counts 32-bit hash values (collisions identical
    in both engines by construction; ≪1 expected at fixture scale).
    All sketch content is integer; the one closing divide is
    IEEE-deterministic — full value-hash gate, no tolerance games.
    The global window runs over ≤ groups×k surviving rows (a few KB),
    not the input."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    h = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8),
            16, 10,
        ).cast("bigint").alias("hv"),
    ).distinct()
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("hv")
    )
    r = h.withColumn("rn", rn)
    per_group = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") <= _KMV_K, F.col("hv"))).alias(
            "kth_min_hash"
        ),
        F.count(F.lit(1)).alias("exact_distinct"),
    )
    # Merge: pooled per-group bottom-k rows → global bottom-k.
    pooled = r.filter(F.col("rn") <= _KMV_K).select("hv").distinct()
    grn = F.row_number().over(Window.orderBy("hv"))
    global_row = (
        pooled.withColumn("rn", grn)
        .agg(
            F.max(
                F.when(F.col("rn") <= _KMV_K, F.col("hv"))
            ).alias("kth_min_hash")
        )
        .crossJoin(
            h.select("hv").distinct().agg(
                F.count(F.lit(1)).alias("exact_distinct")
            )
        )
        .select(
            F.lit("ALL").alias("event_type"),
            "kth_min_hash",
            "exact_distinct",
        )
    )
    u = per_group.unionByName(global_row)
    est = F.when(
        F.col("exact_distinct") >= _KMV_K,
        F.lit(float((_KMV_K - 1) * 4294967296)) / F.col("kth_min_hash"),
    ).otherwise(F.col("exact_distinct").cast("double"))
    # Reuse the est expression directly (not the select alias):
    # lateral-column-alias resolution is a conf-dependent convenience.
    return u.select(
        "event_type",
        "kth_min_hash",
        "exact_distinct",
        est.alias("est_distinct"),
        (
            (est <= 2 * F.col("exact_distinct"))
            & (est * 2 >= F.col("exact_distinct"))
        ).alias("within_2x"),
    )

"""Driver-checked queries: explicit scale techniques (operators/scale.py).

Both are *result-invariant* transformations — salting only changes row
placement, compaction only changes file layout — so each gets a plain
DuckDB oracle over the logical result, proving the scale machinery
never leaks into answers.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators.scale import (
    compact_parquet,
    salted_join,
)
from convert_parquet_to_csv_spark.plans.common import dec as _d
from convert_parquet_to_csv_spark.plans.common import load_table as _t
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.plans.scratch import (
    scratch_dir,
    scratch_table,
)


_SALTED_ORACLE = """
SELECT p_type,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
"""


@query("salted_join_revenue", oracle=_SALTED_ORACLE)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-resilient join via explicit salting
    (operators/scale.salted_join): the fact side gets a random salt in
    [0,16), the dim side is replicated 16× map-side, and the join key
    becomes (partkey, salt) — a pathologically hot part now spreads
    over 16 tasks instead of one straggler.

    The oracle is the PLAIN join: salting must be invisible in the
    result (the salt column only affects placement), and the
    value-hash check proves exactly that."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    joined = salted_join(li, part, on="l_partkey", n_salts=16)
    return joined.groupBy("p_type").agg(
        F.sum(_d(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_COMPACT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


@query("compaction_roundtrip", oracle=_COMPACT_ORACLE)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (operators/scale.compact_parquet),
    value-checked end to end: fragment the events table into 64 tiny
    files (the streaming-landing-zone pathology), compact to
    right-sized files via repartition + rewrite-and-swap, then
    aggregate the compacted copy. The oracle aggregates the ORIGINAL
    table — compaction must be a pure layout change.

    (Timestamps pass through the rewrite as parquet microseconds; the
    aggregate here deliberately avoids the nanos column semantics by
    grouping on event_type only.)"""
    scratch = scratch_dir(sf_dir, "compact_events")
    shutil.rmtree(scratch, ignore_errors=True)
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(scratch)
    compact_parquet(spark, scratch, target_file_bytes=32 * 1024 * 1024)
    back = spark.read.parquet(scratch)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(_d("value")).cast("double").alias("total_value"),
    )


_UPSERT_ORACLE = """
WITH upd AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 0
), ins AS (
  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 10 = 1
), merged AS (
  SELECT * FROM orders WHERE o_orderkey % 10 NOT IN (0, 2)
  UNION ALL SELECT * FROM upd
  UNION ALL SELECT * FROM ins
)
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM merged GROUP BY o_orderstatus
"""


@query("upsert_orders_roundtrip", oracle=_UPSERT_ORACLE)
def upsert_orders_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE on plain parquet (operators/upsert.py), end to end:
    copy orders to a scratch table, apply one batch carrying updates
    (keys %10==0: price doubled), inserts (re-keyed copies of %10==1),
    and delete tombstones (%10==2), then aggregate the table that came
    back. One anti-join + union shuffle; the oracle replays the merge
    relationally — a value-hash match proves update-wins, insert, and
    tombstone semantics all landed."""
    from convert_parquet_to_csv_spark.operators.upsert import upsert_parquet

    orders = _t(spark, sf_dir, "orders")
    scratch = scratch_dir(sf_dir, "upsert_orders")
    shutil.rmtree(scratch, ignore_errors=True)
    orders.write.mode("overwrite").parquet(scratch)

    key = F.col("o_orderkey")
    updates = (
        orders.filter(key % 10 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
        .withColumn("_deleted", F.lit(False))
        .unionByName(
            orders.filter(key % 10 == 1)
            .withColumn("o_orderkey", key + 10_000_000)
            .withColumn("_deleted", F.lit(False))
        )
        .unionByName(
            orders.filter(key % 10 == 2).withColumn("_deleted", F.lit(True))
        )
    )
    upsert_parquet(
        spark, scratch, updates, key_cols=["o_orderkey"], delete_col="_deleted"
    )
    back = spark.read.parquet(scratch)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(_d("o_totalprice")).cast("double").alias("total_price"),
    )


_ZORDER_ORACLE = """
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price,
       COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
WHERE o_custkey BETWEEN 100 AND 500
  AND o_orderdate >= TIMESTAMP '1994-01-01'
  AND o_orderdate <  TIMESTAMP '1995-01-01'
"""


@query("zorder_layout_scan", oracle=_ZORDER_ORACLE)
def zorder_layout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustered layout, value-checked end to end:
    rewrite orders clustered by interleaving (o_custkey,
    days-since-1992) bits, then run a 2-D range predicate over the
    clustered copy. Both predicate columns get tight parquet min/max
    stats from ONE layout — a plain sort would serve only its leading
    column. The oracle runs the same predicate on the original table:
    layout must be value-invariant."""
    from convert_parquet_to_csv_spark.operators.scale import write_zordered

    orders = _t(spark, sf_dir, "orders")
    scratch = scratch_dir(sf_dir, "zorder_orders")
    shutil.rmtree(scratch, ignore_errors=True)
    write_zordered(
        orders,
        scratch,
        dim_a=F.col("o_custkey"),
        dim_b=F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")),
        n_partitions=16,
    )
    back = spark.read.parquet(scratch)
    return back.filter(
        F.col("o_custkey").between(100, 500)
        & (F.col("o_orderdate") >= "1994-01-01")
        & (F.col("o_orderdate") < "1995-01-01")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(_d("o_totalprice")).cast("double").alias("total_price"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


_CHECKSUM_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST('0x' || substring(md5(
             CAST(o_orderkey AS VARCHAR) || chr(31) ||
             o_orderstatus || chr(31) ||
             CAST(o_custkey AS VARCHAR)), 1, 10) AS BIGINT)) AS BIGINT)
         AS checksum
FROM orders
"""


@query("table_checksum_orders", oracle=_CHECKSUM_ORACLE)
def table_checksum_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum: SUM over a 40-bit prefix of
    each row's md5 — the replica/migration verification primitive (two
    engines or two copies agree iff contents agree, no sort needed).
    Addition commutes, so partial aggregation is map-side and the
    shuffle is one row per partition. 40-bit values keep the BIGINT
    sum exact to ~10M rows; at real scale route the sum through
    DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) instead."""
    o = _t(spark, sf_dir, "orders")
    row_hash = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "\x1f",
                    F.col("o_orderkey").cast("string"),
                    F.col("o_orderstatus"),
                    F.col("o_custkey").cast("string"),
                )
            ),
            1,
            10,
        ),
        16,
        10,
    ).cast("long")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.sum(row_hash).alias("checksum"),
    )


_SKEW_ORACLE = """
WITH per_key AS (
  SELECT user_id, CAST(COUNT(*) AS DOUBLE) AS n
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_keys,
       CAST(MAX(n) AS BIGINT) AS max_rows,
       quantile_cont(n, 0.5) AS p50_rows,
       quantile_cont(n, 0.99) AS p99_rows,
       CAST(MAX(n) / (SUM(n) / COUNT(*)) AS DOUBLE) AS skew_ratio
FROM per_key
"""


@query("skew_diagnostic_events", oracle=_SKEW_ORACLE)
def skew_diagnostic_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-join skew check every big pipeline should run: the
    per-key row-count distribution (count, max, p50/p99, max/mean
    ratio) that tells you whether a key needs salting/AQE before it
    becomes a straggler. Two small aggregations — per-key counts, then
    stats over the counts (second stage input = one row per key)."""
    ev = _t(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(
        F.count("*").cast("double").alias("n")
    )
    return per_key.agg(
        F.count("*").alias("n_keys"),
        F.max("n").cast("bigint").alias("max_rows"),
        F.expr("percentile(n, 0.5)").alias("p50_rows"),
        F.expr("percentile(n, 0.99)").alias("p99_rows"),
        (F.max("n") / (F.sum("n") / F.count("*")))
        .cast("double")
        .alias("skew_ratio"),
    )


_INCR_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM orders GROUP BY o_orderstatus
"""


@query("incremental_agg_refresh", oracle=_INCR_ORACLE)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-aggregate maintenance without recompute: the base
    aggregate (orders before 1996) is stored, the delta batch (1996+)
    is aggregated alone, and the refresh merges the two partial states
    (counts add, decimal sums add) — touching only the delta, the way
    a daily refresh over an append-only 100 TB fact table must work.
    The oracle aggregates the full table directly: merged partials
    must equal the full recompute exactly (decimal sums are exact, so
    associativity holds)."""
    o = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1996-01-01")

    def _agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count("*").alias("n_orders"),
            F.sum(_d("o_totalprice")).alias("_sum_dec"),
        )

    base = _agg(o.filter(F.col("o_orderdate") < cutoff))
    delta = _agg(o.filter(F.col("o_orderdate") >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("o_orderstatus")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("_sum_dec").alias("_sum_dec"),
        )
    )
    return merged.select(
        "o_orderstatus",
        "n_orders",
        F.col("_sum_dec").cast("double").alias("total_price"),
    )


_DIFF_ORACLE = """
WITH old_t AS (
  SELECT o_orderkey,
         md5(COALESCE(o_orderstatus, chr(0)) || chr(31) ||
             COALESCE(CAST(o_totalprice AS VARCHAR), chr(0))) AS fp
  FROM orders
), new_t AS (
  SELECT o_orderkey,
         md5(COALESCE(o_orderstatus, chr(0)) || chr(31) ||
             COALESCE(CAST(CASE WHEN o_orderkey % 7 = 0
                           THEN o_totalprice * 2
                           ELSE o_totalprice END AS VARCHAR), chr(0))) AS fp
  FROM orders WHERE o_orderkey % 5 != 0
)
SELECT CASE WHEN o.fp IS NULL THEN 'added'
            WHEN n.fp IS NULL THEN 'removed'
            WHEN o.fp != n.fp THEN 'changed'
            ELSE 'unchanged' END AS change,
       COUNT(*) AS n_keys
FROM old_t o FULL OUTER JOIN new_t n USING (o_orderkey)
GROUP BY change
"""


@query("snapshot_diff_orders", oracle=_DIFF_ORACLE)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff (operators/upsert.snapshot_diff): the
    'new' snapshot deterministically drops keys %5==0 and doubles
    prices of keys %7==0; the diff must classify exactly those as
    removed/changed and the rest unchanged. One full-outer join on the
    key over md5 row signatures — constant bytes per row regardless of
    width. Each engine hashes its OWN value rendering; that is fine
    because classification depends only on within-engine fingerprint
    equality (old-vs-new under the same renderer), never on the two
    engines producing identical hashes."""
    from convert_parquet_to_csv_spark.operators.upsert import snapshot_diff

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        orders.filter(F.col("o_orderkey") % 5 != 0)
        .withColumn(
            "o_totalprice",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2
            ).otherwise(F.col("o_totalprice")),
        )
    )
    diff = snapshot_diff(
        orders, new, key_cols=["o_orderkey"],
        compare_cols=["o_orderstatus", "o_totalprice"],
    )
    return diff.groupBy("change").agg(F.count("*").alias("n_keys"))


# --- schema evolution: append with a new column ---------------------------

_EVOLVE_ORACLE = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS priority_tag
  FROM orders WHERE o_orderkey % 2 = 0),
v2 AS (
  SELECT o_orderkey, o_totalprice,
         'P-' || o_orderpriority AS priority_tag
  FROM orders WHERE o_orderkey % 2 = 1),
merged AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
SELECT COALESCE(priority_tag, '_missing') AS priority_tag,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM merged GROUP BY 1
"""


@query("schema_evolution_append", oracle=_EVOLVE_ORACLE)
def schema_evolution_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on a growing parquet dataset: generation 1 is
    written WITHOUT ``priority_tag``, generation 2 appends WITH it,
    and a ``mergeSchema`` read reconciles the footers — old files
    surface the new column as NULL, by-name alignment (the write-side
    twin of the reference's ``union_by_name`` ingest, SURVEY §2 Op-1).
    The files really land on disk with different physical schemas;
    without mergeSchema the scan would pick one footer and silently
    drop the column for half the data. At 100 TB this is the routine
    "new field added upstream" event — evolution costs a footer merge
    at planning time, never a rewrite of old files."""
    orders = _t(spark, sf_dir, "orders")
    dst = scratch_dir(sf_dir, "schema_evolution")
    shutil.rmtree(dst, ignore_errors=True)
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_totalprice",
        F.concat(F.lit("P-"), F.col("o_orderpriority")).alias(
            "priority_tag"
        ),
    )
    v1.write.mode("overwrite").parquet(dst)
    v2.write.mode("append").parquet(dst)
    back = spark.read.option("mergeSchema", True).parquet(dst)
    return (
        back.withColumn(
            "priority_tag",
            F.coalesce("priority_tag", F.lit("_missing")),
        )
        .groupBy("priority_tag")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
    )


_BUCKETED_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price,
       TRUE AS join_shuffle_free
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


@query("bucketed_join_no_exchange", oracle=_BUCKETED_ORACLE)
def bucketed_join_no_exchange(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via write-time bucketing
    (operators/scale.write_bucketed): lineitem and orders are
    persisted ``bucketBy(8, orderkey)`` + in-bucket sorted, so the
    fact-fact equi-join on the bucket key plans with ZERO Exchange —
    the shuffle was paid once at write time and is amortized across
    every later join/agg on that key. At 100 TB this turns the
    recurring biggest-shuffle-in-the-warehouse into a layout
    property.

    ``join_shuffle_free`` is computed from the PHYSICAL PLAN STRING of
    the join stage (no ``Exchange``/``BroadcastExchange`` operator —
    the merge hint keeps AQE from substituting a broadcast, which
    would trivialize the proof); the oracle pins the same aggregate
    off the plain tables with a literal TRUE, so either a wrong
    answer OR a planned shuffle fails the value-hash gate."""
    from convert_parquet_to_csv_spark.operators.scale import (
        write_bucketed,
    )

    # The in-memory catalog forgets tables across sessions but their
    # warehouse directories persist — drop BOTH or a rerun in a fresh
    # session dies on LOCATION_ALREADY_EXISTS.
    warehouse = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    li_tbl = scratch_table(sf_dir, "cptc_gate_li_bucketed")
    o_tbl = scratch_table(sf_dir, "cptc_gate_o_bucketed")
    for tbl in (li_tbl, o_tbl):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    write_bucketed(
        li, li_tbl,
        bucket_by="l_orderkey", n_buckets=8, sort_by="l_orderkey",
    )
    write_bucketed(
        o, o_tbl,
        bucket_by="o_orderkey", n_buckets=8, sort_by="o_orderkey",
    )
    li_b = spark.table(li_tbl)
    o_b = spark.table(o_tbl)
    joined = li_b.hint("merge").join(
        o_b, li_b.l_orderkey == o_b.o_orderkey
    )
    plan = _plan_string(joined)
    # only the physical section matters; "Exchange" in the parsed/
    # analyzed sections cannot appear, so the plain scan is safe
    shuffle_free = "Exchange" not in plan.split("== Physical Plan ==")[-1]
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(_d("l_extendedprice")).cast("double").alias("total_price"),
        F.max(F.lit(shuffle_free)).alias("join_shuffle_free"),
    )


_DPO_ORACLE = """
WITH final AS (
  SELECT o_orderkey, o_totalprice,
         CAST(year(o_orderdate) AS INT) AS order_year
  FROM orders WHERE year(o_orderdate) <> 1995
  UNION ALL
  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice,
         CAST(year(o_orderdate) AS INT) AS order_year
  FROM orders WHERE year(o_orderdate) = 1995
)
SELECT order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM final GROUP BY order_year
"""


@query("dynamic_partition_overwrite", oracle=_DPO_ORACLE)
def dynamic_partition_overwrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-scoped reload: with
    ``partitionOverwriteMode=dynamic``, an overwrite-mode write
    replaces ONLY the partitions present in the incoming batch —
    the daily-reload idiom (re-land one day into a years-deep table
    without touching the rest; STATIC mode would silently truncate
    every other partition, the classic data-loss footgun). Here the
    1995 partition is re-landed with doubled prices; the oracle pins
    the expected blended table, so survival of the untouched years
    AND replacement (not append) of 1995 are both value-checked."""
    orders = _t(spark, sf_dir, "orders")
    base = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.year("o_orderdate").cast("int").alias("order_year"),
    )
    dst = scratch_dir(sf_dir, "dpo_orders")
    shutil.rmtree(dst, ignore_errors=True)
    base.write.partitionBy("order_year").mode("overwrite").parquet(dst)
    patch = base.filter(F.col("order_year") == 1995).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    patch.write.partitionBy("order_year").mode("overwrite").option(
        "partitionOverwriteMode", "dynamic"
    ).parquet(dst)
    back = spark.read.parquet(dst)
    return back.groupBy("order_year").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_d("o_totalprice")).cast("double").alias("total_price"),
    )


def _plan_string(df) -> str:
    """Physical-plan text via the PUBLIC ``DataFrame.explain`` API
    (ADVICE r3: ``_jdf.queryExecution()`` is not a stable surface).
    Capturing explain() is planning-time only — no data is read."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    return buf.getvalue()


_HINT_ORACLE = """
SELECT n_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
         AS total_acctbal,
       TRUE AS broadcast_used, TRUE AS smj_used, TRUE AS shj_used
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


@query("join_hint_strategies", oracle=_HINT_ORACLE)
def join_hint_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hints are a RESULT-INVARIANT planner override:
    the same customer×nation join runs under BROADCAST, MERGE, and
    SHUFFLE_HASH hints; each physical plan is string-asserted to
    contain its requested operator, and all three must produce the
    value-identical aggregate the oracle pins. This is the knob an
    operator reaches for when AQE's choice is wrong for a specific
    100 TB join (e.g. forcing SMJ when the build side would OOM, or
    forcing broadcast when stats under-estimate a dimension)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")

    def joined(hint: str):
        return cust.join(
            nation.hint(hint),
            cust.c_nationkey == nation.n_nationkey,
        )

    flags = {}
    for hint, marker, col in (
        ("broadcast", "BroadcastHashJoin", "broadcast_used"),
        ("merge", "SortMergeJoin", "smj_used"),
        ("shuffle_hash", "ShuffledHashJoin", "shj_used"),
    ):
        plan = _plan_string(joined(hint))
        flags[col] = marker in plan
    base = joined("broadcast")
    agg = base.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_d("c_acctbal")).cast("double").alias("total_acctbal"),
    )
    # Cross-strategy value invariance: MERGE-hint aggregate must match
    # the broadcast one exactly (anti-join both ways is empty).
    other = joined("merge").groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(_d("c_acctbal")).cast("double").alias("total_acctbal"),
    )
    # Lazy mismatch count (ADVICE r3: the old eager .count() side
    # jobs at plan-build time skewed any timing of this entry): the
    # two-way anti-diff rides the returned plan and lands in the
    # broadcast_used flag itself.
    mismatch = (
        agg.exceptAll(other)
        .unionByName(other.exceptAll(agg))
        .agg(F.count(F.lit(1)).alias("n_mismatch"))
    )
    return agg.crossJoin(F.broadcast(mismatch)).select(
        "n_name",
        "n_customers",
        "total_acctbal",
        (
            F.lit(flags["broadcast_used"])
            & (F.col("n_mismatch") == 0)
        ).alias("broadcast_used"),
        F.lit(flags["smj_used"]).alias("smj_used"),
        F.lit(flags["shj_used"]).alias("shj_used"),
    )

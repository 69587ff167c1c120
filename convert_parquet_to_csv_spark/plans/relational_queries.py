"""Driver-checked relational coverage: pivot, pushdown agg, semi/anti
joins, rollup.

``pivot_status_by_year`` is the gated form of SURVEY.md §2 Op-18 (the
reference's long→wide results pivot, utils.py:28-32) applied to a data
table so the DuckDB oracle can check it. The rest widens the
relational surface SURVEY.md §2.1 marks absent in the reference
(semi/anti joins, grouping sets) — all built-in Catalyst, no custom
rules, and all scale-safe: dimension sides broadcast, aggregates are
partial→final around one shuffle.

Float determinism: SUMs over doubles route through DECIMAL(18,4)
(plans/registry.py rules).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.plans.common import dec as _d
from convert_parquet_to_csv_spark.plans.common import load_table as _t
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet


# --- Op-18: long→wide pivot, gated on a data table ------------------------

_PIVOT_ORACLE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(SUM(CASE WHEN o_orderstatus = 'O'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "O",
       CAST(SUM(CASE WHEN o_orderstatus = 'F'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "F",
       CAST(SUM(CASE WHEN o_orderstatus = 'P'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "P"
FROM orders
GROUP BY order_year
"""


@query("pivot_status_by_year", oracle=_PIVOT_ORACLE)
def pivot_status_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot (reference export_results, utils.py:28-32):
    one row per year, one column per order status.

    ``pivot`` with an explicit value list compiles to a two-level
    aggregate (groupBy(year, status) then pivot-project per year —
    verified 2 exchanges on the executed plan), both keyed on tiny
    cardinalities. Listing the values (vs letting Spark discover
    them) avoids an extra values-discovery job — the scalable form.
    """
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(_d("o_totalprice")).cast("double"))
    )


# --- Q6-style: pushdown-heavy filter + global aggregate -------------------

_Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 24
"""


@query("q6_revenue_filter", oracle=_Q6_ORACLE)
def q6_revenue_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: multi-predicate scan → scalar aggregate.

    The whole WHERE clause reaches the parquet reader as
    ``PushedFilters`` (range on shipdate, range on discount, lt on
    quantity) and ``ReadSchema`` prunes to the 4 referenced columns —
    at 100 TB this is the difference between scanning TBs and GBs
    (row-group statistics skip non-matching groups entirely).
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_d("l_extendedprice") * _d("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# --- semi / anti joins ----------------------------------------------------

_ANTI_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                    AND o.o_orderdate < TIMESTAMP '1996-01-01')
GROUP BY c_nationkey
"""


@query("customers_inactive_1995_anti", oracle=_ANTI_ORACLE)
def customers_inactive_1995_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join: customers with no 1995 order, counted by nation.

    Anti join ships only the join key of the right side; with the
    date filter pushed into the orders scan the build side is small
    enough to broadcast — no shuffle of the customer side at all.
    """
    c = _t(spark, sf_dir, "customer")
    o95 = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        c.join(F.broadcast(o95), c.c_custkey == o95.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


_SEMI_ORACLE = """
SELECT c_nationkey, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_orderdate >= TIMESTAMP '1995-01-01'
                AND o.o_orderdate < TIMESTAMP '1996-01-01')
GROUP BY c_nationkey
"""


@query("customers_active_1995_semi", oracle=_SEMI_ORACLE)
def customers_active_1995_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join: the EXISTS dual of the anti query — customers
    with at least one 1995 order, counted by nation. Semi join
    deduplicates the build side internally; no distinct needed."""
    c = _t(spark, sf_dir, "customer")
    o95 = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        c.join(F.broadcast(o95), c.c_custkey == o95.o_custkey, "left_semi")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
    )


# --- exact quantiles ------------------------------------------------------

_QUANTILE_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5)  AS p50,
       quantile_cont(l_extendedprice, 0.9)  AS p90,
       quantile_cont(l_extendedprice, 0.99) AS p99,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
"""


@query("quantile_prices", oracle=_QUANTILE_ORACLE)
def quantile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group.

    Spark ``percentile`` and DuckDB ``quantile_cont`` share the same
    definition and match bitwise (verified), so this is oracle-exact
    with no decimal routing. Exact percentile holds the group's values
    — at 100 TB per-group cardinality, switch to ``percentile_approx``
    (t-digest sketch, mergeable, bounded memory); it's the same call
    site with one function-name change.
    """
    li = _t(spark, sf_dir, "lineitem")
    q = F.expr("percentile(l_extendedprice, array(0.5, 0.9, 0.99))")
    return (
        li.groupBy("l_returnflag")
        .agg(q.alias("_q"), F.count("*").alias("n_rows"))
        .select(
            "l_returnflag",
            F.col("_q")[0].alias("p50"),
            F.col("_q")[1].alias("p90"),
            F.col("_q")[2].alias("p99"),
            "n_rows",
        )
    )


# --- exact distinct aggregation -------------------------------------------

_DISTINCT_ORACLE = """
SELECT o_orderstatus,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@query("distinct_customers_by_status", oracle=_DISTINCT_ORACLE)
def distinct_customers_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) coverage: Spark plans it as a two-stage
    expand+aggregate (partial distinct per partition, then final) —
    no driver-side set. The approximate drop-in at extreme cardinality
    is ``approx_count_distinct`` (HLL++, mergeable sketch)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.count("*").alias("n_orders"),
    )


# --- array aggregation + higher-order functions ---------------------------

_ARRAYAGG_ORACLE = """
SELECT l_returnflag, l_linestatus,
       array_to_string(list_transform(
           list(DISTINCT l_quantity ORDER BY l_quantity),
           x -> CAST(x AS VARCHAR)), ',') AS quantities,
       CAST(len(list(DISTINCT l_quantity)) AS INT) AS n_distinct,
       CAST(list_aggregate(list(DISTINCT l_quantity), 'sum')
            AS DOUBLE) AS qty_sum
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("quantity_array_agg", oracle=_ARRAYAGG_ORACLE)
def quantity_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + higher-order functions: collect the distinct
    quantity set per group (sorted, so both engines agree element-wise),
    then reduce it with ``F.aggregate`` — arrays as first-class values
    in the gate, the column shape embeddings pipelines live on.
    Quantities are exact half-integers, so the array sum is exact.

    The ``quantities`` array is serialized to a comma-joined string on
    BOTH engines: the driver's pandas canonicalizer cannot sort raw
    list cells (round-1 ERR), and Spark and DuckDB render
    CAST(double AS STRING) identically for these values."""
    li = _t(spark, sf_dir, "lineitem")
    grouped = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.array_sort(F.collect_set("l_quantity")).alias("qarr"))
    )
    return (
        grouped.select(
            "l_returnflag",
            "l_linestatus",
            F.array_join(
                F.transform("qarr", lambda x: x.cast("string")), ","
            ).alias("quantities"),
            F.size("qarr").cast("int").alias("n_distinct"),
            F.aggregate(
                "qarr", F.lit(0.0), lambda acc, x: acc + x
            ).cast("double").alias("qty_sum"),
        )
    )


# --- correlated scalar subquery (SQL front door + decorrelation) ----------

# The SAME SQL text runs on both engines: Spark executes it through
# spark.sql over a temp view, DuckDB over its parquet view. The
# "price > 1.5 × customer average" predicate is stated multiplicatively
# (2·price·count > 3·sum) so the arithmetic stays exact
# (decimal × integer), immune to float-average ulp drift.
_CORR_SQL = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o
WHERE 2 * CAST(o.o_totalprice AS DECIMAL(18,4))
        * (SELECT COUNT(*) FROM orders o2
           WHERE o2.o_custkey = o.o_custkey)
    > 3 * (SELECT SUM(CAST(o2.o_totalprice AS DECIMAL(18,4)))
           FROM orders o2
           WHERE o2.o_custkey = o.o_custkey)
"""


@query("orders_above_customer_avg", oracle=_CORR_SQL)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries through the SQL front door.

    Catalyst's RewriteCorrelatedScalarSubquery decorrelates both
    subqueries into one aggregate joined back on o_custkey — no
    per-row re-execution (the naive reading would be O(n²)). The
    oracle is the *identical* SQL string, so this also pins Spark's
    ANSI subquery semantics against DuckDB's.
    """
    read_parquet(
        spark, os.path.join(sf_dir, "orders.parquet")
    ).createOrReplaceTempView("orders")
    return spark.sql(_CORR_SQL)


# --- scalar function surface: string / math / date ------------------------

_SCALAR_ORACLE = """
SELECT n_nationkey,
       upper(n_name) AS name_upper,
       substring(n_name, 1, 3) AS name_prefix,
       CAST(length(n_name) AS INT) AS name_len,
       CAST(abs(n_nationkey - 12) AS BIGINT) AS key_dist,
       sqrt(CAST(n_nationkey AS DOUBLE)) AS key_root,
       concat(n_name, '#', CAST(n_regionkey AS VARCHAR)) AS tagged
FROM nation
"""


@query("scalar_functions_nation", oracle=_SCALAR_ORACLE)
def scalar_functions_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level scalar surface: string (upper/substring/length/concat)
    and math (abs, sqrt — IEEE-754 exact, so bitwise across engines).
    All inside one codegen'd projection; no UDFs."""
    n = _t(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.upper("n_name").alias("name_upper"),
        F.substring("n_name", 1, 3).alias("name_prefix"),
        F.length("n_name").cast("int").alias("name_len"),
        F.abs(F.col("n_nationkey") - 12).cast("bigint").alias("key_dist"),
        F.sqrt(F.col("n_nationkey").cast("double")).alias("key_root"),
        F.concat(
            F.col("n_name"), F.lit("#"), F.col("n_regionkey").cast("string")
        ).alias("tagged"),
    )


_QUARTER_ORACLE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS order_quarter,
       COUNT(*) AS n_orders,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY order_year, order_quarter
"""


@query("orders_by_quarter", oracle=_QUARTER_ORACLE)
def orders_by_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part surface: year/quarter extraction + timestamp min/max
    per bucket (calendar semantics pinned against the oracle)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .withColumn("order_quarter", F.quarter("o_orderdate").cast("int"))
        .groupBy("order_year", "order_quarter")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        )
    )


# --- ROLLUP (grouping sets) -----------------------------------------------

_ROLLUP_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@query("cube_revenue", oracle=_CUBE_ORACLE)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four subtotal combinations in one pass
    (adds the status-only set ROLLUP omits) — still a single shuffle
    over the expanded rows."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_d("l_extendedprice")).cast("double").alias("sum_price"),
        F.count("*").alias("n_rows"),
    )


@query("rollup_revenue", oracle=_ROLLUP_ORACLE)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: (flag, status), (flag), () subtotals in
    one pass. Spark expands grouping sets before the partial
    aggregate, so it's still a single shuffle; subtotal rows carry
    NULL group keys in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_d("l_extendedprice")).cast("double").alias("sum_price"),
        F.count("*").alias("n_rows"),
    )


_GSETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
"""


@query("grouping_sets_revenue", oracle=_GSETS_ORACLE)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the irregular set list neither ROLLUP
    nor CUBE expresses ((flag-only) + (linestatus-only), no combined or
    grand-total row). DataFrame API has cube/rollup only, so this goes
    through the SQL front door — same Expand→partial→final single
    shuffle underneath."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS sum_price,
               COUNT(*) AS n_rows
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
         CAST(SUM(CASE WHEN o_orderstatus = 'O'
                  THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "O",
         CAST(SUM(CASE WHEN o_orderstatus = 'F'
                  THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "F",
         CAST(SUM(CASE WHEN o_orderstatus = 'P'
                  THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS "P"
  FROM orders GROUP BY order_year
)
SELECT order_year, status, total_price
FROM wide UNPIVOT (total_price FOR status IN ("O", "F", "P"))
"""


@query("unpivot_status_totals", oracle=_UNPIVOT_ORACLE)
def unpivot_status_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt) — the inverse of Op-18's pivot,
    roundtripped: pivot to one column per status, then ``unpivot``
    back to (year, status, value) rows. Map-side Expand, no shuffle
    beyond the pivot's own aggregation. NULL cells (statuses absent in
    a year) are dropped EXPLICITLY: Spark's DataFrame ``unpivot``
    retains NULL value rows while SQL UNPIVOT (both engines) excludes
    them — the filter aligns the two."""
    wide = pivot_status_by_year(spark, sf_dir)
    return wide.unpivot(
        ids=["order_year"],
        values=["O", "F", "P"],
        variableColumnName="status",
        valueColumnName="total_price",
    ).filter(F.col("total_price").isNotNull())


_WINDOW_ZOO_ORACLE = """
WITH yearly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
         o_orderpriority,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
  FROM orders
  GROUP BY order_year, o_orderpriority
)
SELECT order_year, o_orderpriority, total_price,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(ntile(2) OVER w AS INT) AS half,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       first_value(o_orderpriority) OVER w AS top_priority,
       nth_value(o_orderpriority, 2) OVER
         (PARTITION BY order_year ORDER BY total_price DESC, o_orderpriority
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_priority
FROM yearly
WINDOW w AS (PARTITION BY order_year
             ORDER BY total_price DESC, o_orderpriority)
"""


@query("window_zoo_yearly_priority", oracle=_WINDOW_ZOO_ORACLE)
def window_zoo_yearly_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking/distribution window-function surface in one pass:
    rank, ntile, percent_rank, cume_dist, first_value, nth_value over
    a deterministic (total, priority) ordering. All functions share
    one window spec → a single sort per partition; nth_value needs the
    full-frame variant to see the 2nd row from every position."""
    o = _t(spark, sf_dir, "orders")
    yearly = (
        o.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .groupBy("order_year", "o_orderpriority")
        .agg(F.sum(_d("o_totalprice")).cast("double").alias("total_price"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("order_year").orderBy(
        F.desc("total_price"), F.asc("o_orderpriority")
    )
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return yearly.select(
        "order_year",
        "o_orderpriority",
        "total_price",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.ntile(2).over(w).cast("int").alias("half"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("o_orderpriority").over(w).alias("top_priority"),
        F.nth_value("o_orderpriority", 2).over(w_full).alias("second_priority"),
    )


# --- TPC-H-shape coverage (adapted to the fixture schema) -----------------
#
# The fixtures carry a slimmed TPC-H star (no partsupp/l_shipmode/
# p_container — TESTDATA.md), so the classic query *shapes* are kept and
# the predicates adapted: q14 → promo revenue ratio, q18 → large-order
# HAVING subquery, q19 → disjunctive multi-table pushdown.

_PROMO_ORACLE = """
SELECT CAST(EXTRACT(year FROM l_shipdate) AS INT) AS ship_year,
       CAST(EXTRACT(month FROM l_shipdate) AS INT) AS ship_month,
       100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4)) ELSE 0 END) AS DOUBLE)
            / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(18,4))) AS DOUBLE) AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ship_year, ship_month
"""


@query("promo_revenue_ratio", oracle=_PROMO_ORACLE)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q14 shape: monthly % of discounted revenue from PROMO
    parts. Conditional aggregation over a fact⨝dim join — part (2k
    rows) is explicitly broadcast, so the only shuffle is the final
    (year, month) aggregation; the CASE stays in codegen."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    disc = _d(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(
            F.year("l_shipdate").cast("int").alias("ship_year"),
            F.month("l_shipdate").cast("int").alias("ship_month"),
        )
        .agg(
            # Both DECIMAL sums are exact; cast each to DOUBLE *before*
            # the divide so the ratio is one IEEE-exactly-rounded op on
            # both engines. Dividing the decimals directly takes each
            # engine's (different) decimal-division scale rules and
            # drifts a ulp (r2 fixture exposed this).
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", disc).otherwise(
                        F.lit(0)
                    )
                ).cast("double")
                / F.sum(disc).cast("double")
            ).alias("promo_pct")
        )
    )


_BIG_ORDERS_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice,
       CAST(sum_qty AS DOUBLE) AS sum_qty
FROM orders
JOIN (SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 280) big
  ON o_orderkey = big.l_orderkey
"""


@query("large_orders_having", oracle=_BIG_ORDERS_ORACLE)
def large_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: orders whose total line quantity exceeds 280.
    The HAVING subquery aggregates lineitem FIRST (one shuffle on
    l_orderkey), shrinking the join input from ~4 lines/order to the
    ~1% of orders that qualify — at 100 TB the post-HAVING side is
    small enough that AQE converts the join to broadcast at runtime."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_d("l_quantity")).alias("_sq"))
        .filter(F.col("_sq") > 280)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_sq").cast("double").alias("sum_qty"),
        )
    )


_DISJUNCT_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


@query("disjunctive_filter_parts", oracle=_DISJUNCT_ORACLE)
def disjunctive_filter_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q19 shape: OR-of-ANDs across both join sides. Catalyst
    factors the disjunction: the brand-set filter
    (`p_brand IN (12,23,34)`-equivalent) pushes to the part scan and
    `l_quantity BETWEEN 1 AND 30` pushes to the lineitem scan
    (PushedFilters on both), before the broadcast join evaluates the
    full residual predicate."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 25) & q.between(10, 20))
        | ((b == "Brand#34") & s.between(1, 35) & q.between(20, 30))
    )
    return j.filter(pred).agg(
        F.sum(_d(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_RECON_ORACLE = """
WITH y94 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS t94,
         COUNT(*) AS n94
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1994
  GROUP BY o_custkey
), y95 AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS t95,
         COUNT(*) AS n95
  FROM orders WHERE EXTRACT(year FROM o_orderdate) = 1995
  GROUP BY o_custkey
)
SELECT COALESCE(a.o_custkey, b.o_custkey) AS custkey,
       a.t94, a.n94, b.t95, b.n95,
       CASE WHEN a.o_custkey IS NULL THEN 'new'
            WHEN b.o_custkey IS NULL THEN 'churned'
            ELSE 'retained' END AS cohort
FROM y94 a FULL OUTER JOIN y95 b ON a.o_custkey = b.o_custkey
"""


@query("customer_cohort_reconciliation", oracle=_RECON_ORACLE)
def customer_cohort_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join reconciliation — the join flavor nothing else
    exercises: 1994 vs 1995 per-customer totals, unmatched sides
    classified churned/new. Both inputs pre-aggregate on the join key,
    so the shuffled full-outer join carries one row per (customer,
    year) — aggregate-before-join, the 100 TB ordering."""
    o = _t(spark, sf_dir, "orders").withColumn(
        "_yr", F.year("o_orderdate")
    )

    def _year(yr: int, t: str, n: str) -> DataFrame:
        return (
            o.filter(F.col("_yr") == yr)
            .groupBy("o_custkey")
            .agg(
                F.sum(_d("o_totalprice")).cast("double").alias(t),
                F.count("*").alias(n),
            )
        )

    a = _year(1994, "t94", "n94")
    b = _year(1995, "t95", "n95").withColumnRenamed("o_custkey", "_ck_b")
    j = a.join(b, a.o_custkey == F.col("_ck_b"), "full_outer")
    return j.select(
        F.coalesce("o_custkey", "_ck_b").alias("custkey"),
        "t94",
        "n94",
        "t95",
        "n95",
        F.when(F.col("o_custkey").isNull(), "new")
        .when(F.col("_ck_b").isNull(), "churned")
        .otherwise("retained")
        .alias("cohort"),
    )


_LEFT_ENRICH_ORACLE = """
SELECT e.event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_unmatched,
       COUNT(c.c_name) AS n_enriched
FROM events e
LEFT JOIN (SELECT * FROM customer WHERE c_custkey < 50) c
  ON e.user_id = c.c_custkey
GROUP BY e.event_type
"""


@query("left_join_enrichment", oracle=_LEFT_ENRICH_ORACLE)
def left_join_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER enrichment with deliberate misses (only customers
    with key < 50 exist on the right): unmatched facts survive with
    NULLs and are counted, the partial-dimension reality of every
    landing zone. The filtered dim broadcasts; null-counting
    distinguishes preserved-but-unmatched from enriched rows."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") < 50)
    j = ev.join(
        F.broadcast(cust), ev.user_id == cust.c_custkey, "left"
    )
    return j.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("c_custkey").isNull().cast("long")).alias("n_unmatched"),
        F.count("c_name").alias("n_enriched"),
    )


_RIGHT_ENRICH_ORACLE = """
SELECT c.c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CASE WHEN e.user_id IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_without_events,
       CAST(COALESCE(SUM(e.n_events), 0) AS BIGINT) AS total_events
FROM (SELECT user_id, COUNT(*) AS n_events
      FROM events GROUP BY user_id) e
RIGHT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
"""


@query("right_join_enrichment", oracle=_RIGHT_ENRICH_ORACLE)
def right_join_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER mirror of left_join_enrichment, completing the
    join-type matrix (left / right / full / semi / anti): all
    customers are preserved even when no event row matches — misses
    are ON THE LEFT (most customers never produced an event). The
    per-user pre-aggregation keeps the left side one-row-per-key, so
    the preserved-side row count is exactly |customer| and the plan is
    one shuffle for the pre-agg + a broadcastable right join."""
    ev = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"))
    )
    cust = _t(spark, sf_dir, "customer")
    j = ev.join(cust, ev.user_id == cust.c_custkey, "right")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("user_id").isNull().cast("long")).alias(
            "n_without_events"
        ),
        F.coalesce(F.sum("n_events"), F.lit(0))
        .cast("bigint")
        .alias("total_events"),
    )


# --- NULL semantics zoo ---------------------------------------------------

# The fixture has no NULLs, so the query synthesizes them (nullif) and
# then exercises every aggregate/predicate NULL rule that differs
# between naive implementations: count(*) vs count(col), count
# distinct, conditional counting of NULLs, coalesce defaults,
# null-safe equality, and avg's ignore-null denominator.
_NULLZOO_ORACLE = """
WITH base AS (
  SELECT o_orderstatus,
         nullif(o_custkey % 7, 0) AS nk,
         o_totalprice
  FROM orders
)
SELECT o_orderstatus,
       COUNT(*) AS n_rows,
       COUNT(nk) AS n_nonnull,
       CAST(COUNT(DISTINCT nk) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN nk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(SUM(coalesce(nk, -1)) AS BIGINT) AS sum_defaulted,
       CAST(SUM(CASE WHEN nk IS NOT DISTINCT FROM NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq,
       CAST(SUM(CAST(nk AS DECIMAL(18,4))) AS DOUBLE)
         / CAST(COUNT(nk) AS DOUBLE) AS avg_ignoring_null
FROM base
GROUP BY o_orderstatus
"""


@query("null_semantics_zoo", oracle=_NULLZOO_ORACLE)
def null_semantics_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics surface, pinned cross-engine: count(*) counts
    NULL rows, count(col)/count_distinct/avg skip them, coalesce
    defaults them, `<=>` (IS NOT DISTINCT FROM) matches them. One
    grouped aggregate — everything fuses into a single scan pass."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderstatus",
        F.nullif(F.col("o_custkey") % 7, F.lit(0)).alias("nk"),
    )
    return base.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.count("nk").alias("n_nonnull"),
        F.count_distinct("nk").cast("bigint").alias("n_distinct"),
        F.sum(F.when(F.col("nk").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null"),
        F.sum(F.coalesce("nk", F.lit(-1))).cast("bigint").alias(
            "sum_defaulted"
        ),
        F.sum(
            F.when(F.col("nk").eqNullSafe(F.lit(None)), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_nullsafe_eq"),
        # exact decimal sum, then ONE double divide (each engine's
        # avg-over-decimal has different internal scale rules)
        (
            F.sum(F.col("nk").cast("decimal(18,4)")).cast("double")
            / F.count("nk").cast("double")
        ).alias("avg_ignoring_null"),
    )


# --- datetime zoo ---------------------------------------------------------

# Calendar-function parity: month truncation, month-end, ISO weekday
# and week numbers, day arithmetic against an epoch, month shifting,
# and string formatting. Spark's dayofweek is 1=Sunday while DuckDB's
# is 0=Sunday, so both sides use the ISO convention (Spark weekday+1 ==
# DuckDB isodow, Monday=1) — the classic off-by-one this query pins.
_DATEZOO_ORACLE = """
SELECT o_orderkey,
       date_trunc('month', o_orderdate) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(isodow(o_orderdate) AS INT) AS iso_weekday,
       CAST(week(CAST(o_orderdate AS DATE)) AS INT) AS iso_week,
       CAST(datediff('day', DATE '1992-01-01',
                     CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch,
       CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
       strftime(o_orderdate, '%Y-%m') AS month_label
FROM orders
WHERE o_orderkey % 101 = 0
"""


@query("datetime_zoo", oracle=_DATEZOO_ORACLE)
def datetime_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function surface with the cross-engine conventions
    pinned: ISO weekday (Monday=1; Spark ``weekday``+1 == DuckDB
    ``isodow``), ISO week-of-year, month truncation/end, day diffs,
    month arithmetic, and yyyy-MM formatting. Pure projection under
    a pushed modulus filter."""
    o = _t(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 101 == 0).select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day("o_orderdate").alias("month_end"),
        (F.weekday("o_orderdate") + 1).cast("int").alias("iso_weekday"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
        .cast("int")
        .alias("days_since_epoch"),
        F.add_months("o_orderdate", 3).alias("plus_3_months"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month_label"),
    )


# --- empty-input aggregate semantics --------------------------------------

_EMPTYZOO_ORACLE = """
WITH empty AS (SELECT * FROM orders WHERE o_totalprice < 0)
SELECT 'global_agg' AS probe,
       COUNT(*) AS n_rows,
       CAST(COUNT(o_custkey) AS BIGINT) AS n_vals,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_price,
       CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
       CAST(AVG(o_totalprice) AS DOUBLE) AS avg_price
FROM empty
UNION ALL
SELECT 'grouped_agg' AS probe,
       COUNT(*) AS n_rows,
       CAST(0 AS BIGINT) AS n_vals,
       CAST(NULL AS DOUBLE) AS sum_price,
       CAST(NULL AS DOUBLE) AS max_price,
       CAST(NULL AS DOUBLE) AS avg_price
FROM (SELECT o_orderstatus FROM empty GROUP BY o_orderstatus)
"""


@query("empty_input_semantics_zoo", oracle=_EMPTYZOO_ORACLE)
def empty_input_semantics_zoo(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The empty-relation parity trap: an UNGROUPED aggregate over
    zero rows returns ONE row (COUNT=0, SUM/MAX/AVG=NULL — the SQL
    standard both engines follow), while a GROUPED aggregate returns
    ZERO rows — the difference that breaks naive "same query with
    GROUP BY" refactors and every downstream join that assumed a row
    would exist. The grouped probe folds its row COUNT (0) through a
    second ungrouped aggregate so the contract lands in the gate as
    values, not absence."""
    empty = _t(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") < 0
    )
    global_agg = empty.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_custkey").cast("bigint").alias("n_vals"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        F.avg("o_totalprice").cast("double").alias("avg_price"),
    ).select(F.lit("global_agg").alias("probe"), "*")
    grouped_rows = (
        empty.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("_c"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.lit("grouped_agg").alias("probe"),
            "n_rows",
            F.lit(0).cast("bigint").alias("n_vals"),
            F.lit(None).cast("double").alias("sum_price"),
            F.lit(None).cast("double").alias("max_price"),
            F.lit(None).cast("double").alias("avg_price"),
        )
    )
    return global_agg.unionByName(grouped_rows)


# --- non-equi band join ---------------------------------------------------

_BAND_ORACLE = """
WITH bands(band, lo, hi) AS (
  VALUES ('budget',   0.0,  930.0),
         ('mid',    930.0,  966.0),
         ('premium', 966.0, 1e9)
)
SELECT b.band,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM part p JOIN bands b
  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band
"""


@query("band_join_nonequi", oracle=_BAND_ORACLE)
def band_join_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi join (price-band rate-card lookup): no equality
    conjunct exists, so Spark plans BroadcastNestedLoopJoin — the
    ONLY correct strategy here, and fine at 100 TB precisely because
    the band table is tiny (each fact row scans B bands map-side;
    cost B·|fact|, no shuffle). The scale rule this query documents:
    BNLJ is safe iff one side is broadcastable — a fact-fact non-equi
    join must be rewritten (binning → interval_join, the
    error_click_pressure pattern)."""
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 930.0), ("mid", 930.0, 966.0),
         ("premium", 966.0, 1e9)],
        "band STRING, lo DOUBLE, hi DOUBLE",
    )
    joined = part.join(
        F.broadcast(bands),
        (part.p_retailprice >= bands.lo)
        & (part.p_retailprice < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.col("p_retailprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price"),
    )


# --- null-key join semantics ----------------------------------------------

_NULLJOIN_ORACLE = """
WITH l AS (
  SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
              ELSE o_orderkey % 7 END AS k
  FROM orders
), r AS (
  SELECT CASE WHEN n_nationkey % 5 = 0 THEN NULL
              ELSE CAST(n_nationkey % 7 AS BIGINT) END AS k
  FROM nation
)
SELECT 'equi' AS join_kind, COUNT(*) AS n_rows
FROM l JOIN r ON l.k = r.k
UNION ALL
SELECT 'null_safe' AS join_kind, COUNT(*) AS n_rows
FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
"""


@query("null_safe_join_semantics", oracle=_NULLJOIN_ORACLE)
def null_safe_join_semantics(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The NULL-key join trap, gated as a pair: ordinary ``=`` drops
    every NULL-keyed row (NULL = NULL is NULL, not TRUE), while the
    null-safe operator (Spark ``eqNullSafe`` / SQL ``<=>``, DuckDB
    ``IS NOT DISTINCT FROM``) matches NULLs to each other —
    multiplying the NULL groups together. Both cardinalities land in
    one gated row set, so an engine (or refactor) silently switching
    semantics fails the hash. Null-safe equality also changes the
    PHYSICAL plan: NULLs hash to one partition — at scale a null-safe
    join on a NULL-heavy key needs the salted-join treatment."""
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    left = orders.select(
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderkey") % 7)
        .alias("k")
    )
    right = nation.select(
        F.when(F.col("n_nationkey") % 5 == 0, None)
        .otherwise((F.col("n_nationkey") % 7).cast("bigint"))
        .alias("k")
    )
    equi = left.join(
        right, left["k"] == right["k"]
    ).agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit("equi").alias("join_kind"), "n_rows"
    )
    nsafe = left.join(
        right, left["k"].eqNullSafe(right["k"])
    ).agg(F.count(F.lit(1)).alias("n_rows")).select(
        F.lit("null_safe").alias("join_kind"), "n_rows"
    )
    return equi.unionByName(nsafe)


# --- NOT IN vs NOT EXISTS with NULLs --------------------------------------

_NOTIN_ORACLE = """
WITH sub AS (
  SELECT CASE WHEN n_nationkey = 0 THEN NULL
              ELSE n_nationkey END AS k
  FROM nation
)
SELECT 'not_in' AS probe, COUNT(*) AS n_rows
FROM customer WHERE c_nationkey NOT IN (SELECT k FROM sub)
UNION ALL
SELECT 'not_exists' AS probe, COUNT(*) AS n_rows
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM sub s WHERE s.k = c.c_nationkey)
"""


@query("not_in_null_trap", oracle=_NOTIN_ORACLE)
def not_in_null_trap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE classic SQL semantics trap, pinned cross-engine: one NULL
    in a ``NOT IN`` subquery makes the predicate UNKNOWN for every
    row (x <> NULL is never TRUE), so ``not_in`` returns 0 rows while
    ``NOT EXISTS`` — which most authors actually mean — still
    anti-joins correctly. Physically the two also diverge: NOT IN
    needs a null-aware anti join (Spark: BroadcastNestedLoopJoin for
    correctness), NOT EXISTS plans a plain left-anti hash join — on a
    100 TB fact the difference between a map-side anti-join and a
    nested loop. Both counts ride one gated row set through the SQL
    front door so the decorrelation paths are exercised verbatim."""
    _view = _t(spark, sf_dir, "customer")
    _view.createOrReplaceTempView("customer")
    _t(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        WITH sub AS (
          SELECT CASE WHEN n_nationkey = 0 THEN NULL
                      ELSE n_nationkey END AS k
          FROM nation
        )
        SELECT 'not_in' AS probe, COUNT(*) AS n_rows
        FROM customer WHERE c_nationkey NOT IN (SELECT k FROM sub)
        UNION ALL
        SELECT 'not_exists' AS probe, COUNT(*) AS n_rows
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM sub s
                          WHERE s.k = c.c_nationkey)
        """
    )


# --- binary codec / digest zoo --------------------------------------------

_CODECZOO_ORACLE = """
SELECT doc_id,
       md5(text) AS h_md5,
       sha256(text) AS h_sha256,
       base64(encode(text)) AS b64,
       lower(hex(encode(substring(text, 1, 8)))) AS hex_prefix,
       octet_length(from_base64(base64(encode(text)))) AS b64_roundtrip_len
FROM documents WHERE doc_id % 25 = 0
"""


@query("binary_codec_zoo", oracle=_CODECZOO_ORACLE)
def binary_codec_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digest and codec parity zoo: md5 / sha-256 / base64 / hex are
    the content-addressing primitives (dedup fingerprints, cache
    keys, integrity manifests) and any engine divergence here
    corrupts cross-system joins silently. Each is pinned bit-exact
    against the oracle on UTF-8 document text, plus a
    base64→decode→length roundtrip. Two divergences documented in
    code: Spark's base64 is MIME-chunked (CRLF per 76 chars) vs
    DuckDB's continuous form, and sha-1 exists only on the Spark
    side. All JVM codegen, no shuffle beyond the gate's own sort."""
    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 25 == 0
    )
    return docs.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2(F.col("text"), 256).alias("h_sha256"),
        # Spark's base64 is the Java MIME encoder — it chunks output
        # with CRLF every 76 chars; DuckDB emits continuous base64.
        # Normalize by stripping the line breaks (decoders accept
        # both). THE documented divergence of this zoo.
        F.regexp_replace(
            F.base64(F.col("text").cast("binary")), "[\r\n]", ""
        ).alias("b64"),
        F.lower(F.hex(F.substring("text", 1, 8).cast("binary"))).alias(
            "hex_prefix"
        ),
        F.length(
            F.unbase64(F.base64(F.col("text").cast("binary")))
        ).alias("b64_roundtrip_len"),
    )


# --- surrogate-key dimension build ----------------------------------------

_SK_ORACLE = """
WITH dim AS (
  SELECT DISTINCT source, lang FROM documents
)
SELECT CAST(DENSE_RANK() OVER (ORDER BY source, lang) AS BIGINT)
         AS surrogate_key,
       source, lang,
       (SELECT COUNT(*) FROM documents d
        WHERE d.source = dim.source AND d.lang = dim.lang) AS n_docs
FROM dim
"""


@query("surrogate_key_dimension", oracle=_SK_ORACLE)
def surrogate_key_dimension(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Warehouse dimension build: assign STABLE integer surrogate
    keys to distinct (source, lang) combos via dense_rank over the
    natural-key order. The device this query exists to document:
    ``monotonically_increasing_id`` / ``zipWithIndex`` keys are
    partition-layout-dependent — two runs of the same data can
    disagree — while rank over a deterministic ordering is
    reproducible anywhere (the price: one sort of the already-tiny
    distinct dimension, not of the fact stream). Fact-side counts
    ride along to prove the key join-back."""
    from pyspark.sql.window import Window

    docs = _t(spark, sf_dir, "documents")
    dim = docs.select("source", "lang").distinct()
    keyed = dim.withColumn(
        "surrogate_key",
        F.dense_rank()
        .over(Window.orderBy("source", "lang"))
        .cast("bigint"),
    )
    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return keyed.join(counts, ["source", "lang"]).select(
        "surrogate_key", "source", "lang", "n_docs"
    )


# --- grouping_id labels over ROLLUP ---------------------------------------

_GID_ORACLE = """
SELECT CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
       CASE GROUPING(o_orderstatus, o_orderpriority)
         WHEN 0 THEN 'cell' WHEN 1 THEN 'status_subtotal'
         ELSE 'grand_total' END AS level_label,
       coalesce(o_orderstatus, '_all') AS status,
       coalesce(o_orderpriority, '_all') AS priority,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@query("rollup_grouping_id_labels", oracle=_GID_ORACLE)
def rollup_grouping_id_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ROLLUP rows labeled by ``grouping_id()`` — the bitmask that
    tells a report row apart from a subtotal apart from the grand
    total (COALESCE alone can't: a literal '_all' value in the data
    would collide). rollup_revenue gated the aggregate values; this
    gates the LEVEL-IDENTIFICATION machinery, the part every rollup
    consumer actually branches on. Bitmask semantics (first grouping
    column = highest bit) agree between engines and are pinned by
    the hash."""
    orders = _t(spark, sf_dir, "orders")
    # grouping_id() is only resolvable INSIDE the rollup aggregate —
    # a later projection has no grouping context.
    agg = orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.grouping_id("o_orderstatus", "o_orderpriority").alias("_gid"),
    )
    gid = F.col("_gid")
    return (
        agg.select(
            gid.cast("int").alias("gid"),
            F.when(gid == 0, "cell")
            .when(gid == 1, "status_subtotal")
            .otherwise("grand_total")
            .alias("level_label"),
            F.coalesce("o_orderstatus", F.lit("_all")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("_all")).alias(
                "priority"
            ),
            "n_orders",
        )
    )


# --- filtered-aggregate function zoo --------------------------------------

_AGGFILTER_ORACLE = """
SELECT o_orderstatus,
       CAST(count_if(o_totalprice > 150000.0) AS BIGINT) AS n_big,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
         AS n_urgent,
       bool_and(o_totalprice > 0) AS all_positive,
       bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
            FILTER (WHERE o_orderpriority = '1-URGENT') AS DOUBLE)
         AS urgent_price
FROM orders GROUP BY o_orderstatus
"""


@query("agg_filter_zoo", oracle=_AGGFILTER_ORACLE)
def agg_filter_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/boolean aggregate surface in one pass: ``count_if``,
    the SQL:2003 ``FILTER (WHERE ...)`` clause on COUNT and SUM, and
    ``bool_and``/``bool_or`` — the idioms that replace N self-joins
    or CASE-wrapped sums in report queries, all fusing into ONE
    hash aggregate (each filtered aggregate is a conditional update
    in the same operator, not a second scan). Both engines implement
    the standard surface; the gate pins agreement including the
    NULL-on-empty-filter SUM."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               count_if(o_totalprice > 150000.0) AS n_big,
               COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')
                 AS n_urgent,
               bool_and(o_totalprice > 0) AS all_positive,
               bool_or(o_orderpriority = '1-URGENT') AS any_urgent,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                    FILTER (WHERE o_orderpriority = '1-URGENT')
                    AS DOUBLE) AS urgent_price
        FROM orders GROUP BY o_orderstatus
        """
    )

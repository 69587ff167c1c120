"""TPC-H suite beyond the four flagship queries (q1/q3/q5/q6 live in
conversion/relational modules; q14≈promo_revenue_ratio,
q18≈large_orders_having, q19≈disjunctive_filter_parts).

This module adds the remaining *feasible* TPC-H shapes over the
driver's simplified schema. The fixture has no ``partsupp`` table and
drops several columns (l_commitdate/l_receiptdate/l_shipmode,
c_phone/o_comment/p_container), so queries that depend on them are
ADAPTED — the relational shape (correlated EXISTS, scalar subqueries,
nation-pair joins, CASE aggregation) is preserved and each docstring
states the substitution. q16 survives via the DISTINCT
(l_partkey, l_suppkey) pairs of lineitem standing in for partsupp;
q2/q11/q20 use :func:`synth_partsupp` — the same DISTINCT pairs with
deterministic hash-derived supplycost/availqty VALUES (md5 of the key
pair, identical in Spark and DuckDB, VERDICT r2 item 3) — completing
the 22-query shape matrix.

Scale notes common to all: dimension tables (nation/region/supplier/
part at fixture scale; on a real TPC-H layout part is mid-size and
AQE decides) broadcast; fact⋈fact joins shuffle on their keys once;
every aggregate is partial→final. Money sums route through
DECIMAL(18,4) and are cast to DOUBLE only in the final projection so
both engines round identically (plans/registry.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.plans.common import dec as _d
from convert_parquet_to_csv_spark.plans.common import load_table as _t
from convert_parquet_to_csv_spark.plans.registry import query

_REV = "l_extendedprice * (1 - l_discount)"


def _rev() -> F.Column:
    return _d(F.col("l_extendedprice") * (1 - F.col("l_discount")))


# --- synthesized partsupp (enables q2/q11/q20) ----------------------------

# DuckDB rendering of the same derivation — prepended to the q2/q11/q20
# oracles as a WITH prefix so both engines compute partsupp from
# identical inputs with identical hashes.
_PARTSUPP_CTE = """
ps_keys AS (
  SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
  FROM lineitem
), partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         CAST(1 + CAST('0x' || substring(md5(CAST(ps_partkey AS VARCHAR)
              || '|' || CAST(ps_suppkey AS VARCHAR)), 1, 8) AS BIGINT)
              % 1000 AS DECIMAL(12,2)) AS ps_supplycost,
         CAST(1 + CAST('0x' || substring(md5(CAST(ps_partkey AS VARCHAR)
              || '|' || CAST(ps_suppkey AS VARCHAR)), 9, 8) AS BIGINT)
              % 9999 AS INT) AS ps_availqty
  FROM ps_keys
)
"""


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ``partsupp`` from the fixture's lineitem: the
    DISTINCT (l_partkey, l_suppkey) pairs (every TPC-H lineitem
    references a partsupp row — same derivation q16 uses) with
    hash-synthesized values:

    - ``ps_supplycost`` = 1 + md5(pk|sk)[0:8] % 1000, an
      integer-valued DECIMAL(12,2) — whole dollars, so downstream
      cost×qty arithmetic is exact in BIGINT and no engine pair can
      disagree in a last ulp;
    - ``ps_availqty``  = 1 + md5(pk|sk)[8:16] % 9999 (INT).

    No RNG anywhere (registry rule): DuckDB replays the identical
    table from `_PARTSUPP_CTE`, which is what lets q2/q11/q20 be
    hash-gated rather than rows-only. One distinct-pair shuffle; the
    hash projection is codegen'd (md5/conv built-ins)."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    h = F.md5(
        F.concat(
            F.col("ps_partkey").cast("string"),
            F.lit("|"),
            F.col("ps_suppkey").cast("string"),
        )
    )
    h1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    return ps.select(
        "ps_partkey",
        "ps_suppkey",
        (F.lit(1) + h1 % 1000).cast("decimal(12,2)").alias("ps_supplycost"),
        (F.lit(1) + h2 % 9999).cast("int").alias("ps_availqty"),
    )


# --- q4: order priority checking (correlated EXISTS) ----------------------

# Adapted: the fixture drops l_commitdate/l_receiptdate, so "late" is
# l_shipdate > o_orderdate + 60 days instead of receipt > commit.
_Q4_ORACLE = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_ORACLE)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q4: priorities of one quarter's orders that had at least
    one late line — the canonical correlated EXISTS, expressed as a
    LEFT SEMI join with a non-equi conjunct. Catalyst keeps the equi
    part (orderkey) as the join key and evaluates the date predicate
    as a join condition, so the plan is one shuffle pair (or
    broadcast under AQE once the quarter filter shrinks orders) —
    no per-row subquery execution anywhere."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = (
        F.col("l_orderkey") == F.col("o_orderkey")
    ) & (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- q7: volume shipping (nation-pair fact join) --------------------------

_Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                       AND TIMESTAMP '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_ORACLE)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q7: bilateral trade volume between two nations by year.

    The one genuinely big join here is lineitem⋈orders (fact⋈fact,
    shuffled on orderkey); supplier/customer/nation are broadcast.
    The nation-pair disjunction is applied after both nation joins —
    Catalyst pushes the single-nation IN-filters
    (n_name ∈ {N1,N2}) into each broadcast side, so the fact rows
    surviving to the pair check are already pre-pruned."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(
        F.col("n_nationkey").alias("_sn_key"),
        F.col("n_name").alias("supp_nation"),
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = n.select(
        F.col("n_nationkey").alias("_cn_key"),
        F.col("n_name").alias("cust_nation"),
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    pair = (
        (F.col("supp_nation") == "NATION_1")
        & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2")
        & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("_sn_key"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("_cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


# --- q8: national market share (ratio of conditional sums) ----------------

_Q8_ORACLE = """
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
         n2.n_name AS supp_nation
  FROM part, supplier, lineitem, orders, customer,
       nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
                        AND TIMESTAMP '1997-12-31'
    AND p_type = 'ECONOMY'
) all_nations
GROUP BY o_year
"""


@query("q8_market_share", oracle=_Q8_ORACLE)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q8: one supplier nation's share of a region's market for
    one part type, by order year — a conditional-sum ratio over a
    5-way snowflake. Every dimension (part-after-filter, supplier,
    customer, nation×2, region) broadcasts; lineitem⋈orders is the
    lone shuffled join. Both sums come out of ONE aggregate (CASE
    inside SUM), so the ratio costs no extra pass."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1996-01-01", "1997-12-31")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nation = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("_cn_key"))
    supp_nation = n.select(
        F.col("n_nationkey").alias("_sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    vol = F.sum(_rev())
    nat = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(cust_nation),
            F.col("c_nationkey") == F.col("_cn_key"),
            "left_semi",
        )
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("_sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (nat.cast("double") / vol.cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
    )


# --- q9: product type profit (adapted supply cost) ------------------------

# Adapted: no partsupp ⇒ no ps_supplycost; the cost term substitutes
# 0.5 * p_retailprice * l_quantity, keeping the shape (two-sided
# expression over a part⋈lineitem⋈supplier⋈nation join, grouped by
# nation × year).
_Q9_ORACLE = """
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation,
         CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount)
              - 0.5 * p_retailprice * l_quantity
              AS DECIMAL(18,4)) AS amount
  FROM part, supplier, lineitem, orders, nation
  WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
    AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
    AND p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
"""


@query("q9_product_profit", oracle=_Q9_ORACLE)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q9 (adapted): profit on 'red' parts by supplier nation
    and order year. The p_name LIKE filter prunes part BEFORE its
    broadcast (semi-join shape: only p_partkey+p_retailprice travel);
    lineitem⋈orders shuffles once on orderkey. The amount expression
    is per-row double math cast to DECIMAL(18,4) before the sum, so
    aggregation order can't perturb the result."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    amount = _d(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


# --- q10: returned item reporting (top-20 by revenue) ---------------------

_Q10_ORACLE = """
SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue,
       c_acctbal, n_name
FROM (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         SUM(CAST(l_extendedprice * (1 - l_discount)
             AS DECIMAL(18,4))) AS revenue
  FROM customer, orders, lineitem, nation
  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
    AND o_orderdate >= TIMESTAMP '1996-10-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
    AND l_returnflag = 'R' AND c_nationkey = n_nationkey
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_ORACLE)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10: top-20 customers by revenue lost to returns in one
    quarter. Returnflag + date filters push to the fact scans; the
    customer join broadcasts; ordering is (revenue DESC, custkey) so
    the LIMIT boundary is deterministic for both engines (revenue
    stays DECIMAL through the sort — exact ties, exact order). A
    global top-20 after an aggregate is driver-safe: TakeOrdered
    keeps only 20 rows per partition."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("_rev").cast("double").alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


# --- q12: shipping priority classes (CASE aggregation) --------------------

# Adapted: no l_shipmode/l_receiptdate/l_commitdate ⇒ group by
# l_linestatus and define "late" as shipped > 90 days after order.
_Q12_ORACLE = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
"""


@query("q12_late_line_priority", oracle=_Q12_ORACLE)
def q12_late_line_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q12 (adapted): among lines shipped >90 days after their
    order in 1996, how many belonged to urgent/high-priority orders,
    per line status. The year filter pushes to the lineitem scan; the
    date-arithmetic lateness predicate evaluates as a join condition
    on the single orderkey shuffle; both CASE counts come out of one
    partial-aggregable pass."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- q13: customer order-count distribution -------------------------------

# Adapted: the fixture has no o_comment, so the NOT LIKE
# '%special%requests%' carve-out is absent — this is the plain
# distribution over ALL orders.
_Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
"""


@query("q13_customer_distribution", oracle=_Q13_ORACLE)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13: how many customers placed 0, 1, 2, … orders. The
    LEFT OUTER is load-bearing — customers with no orders must land
    in the c_count=0 bucket, which an inner join would silently drop.
    COUNT(o_orderkey) (not COUNT(*)) makes the no-match rows count 0.
    Plan: orders pre-aggregates per custkey BEFORE the join at scale;
    here the two groupBys flank one broadcast-left join, and the
    second groupBy's key space (distinct counts) is tiny."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count("*").alias("custdist")
    )


# --- q15: top supplier (aggregate view + scalar-max subquery) -------------

_Q15_ORACLE = """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount)
             AS DECIMAL(18,4))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier, revenue0
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
"""


@query("q15_top_supplier", oracle=_Q15_ORACLE)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q15: supplier(s) achieving the maximum quarterly revenue
    — the aggregate-view + scalar-subquery pattern, expressed as a
    rank-1 window over the aggregated view instead of a persist +
    self-join: the revenue table is already tiny (one row per
    supplier), so a single-partition max-rank costs nothing, computes
    the view exactly once with no cache-lifetime management (a
    persist with no unpersist pins executor storage per invocation —
    review finding), and keeps ties (rank, not row_number). Revenue
    stays DECIMAL for the max-equality — comparing doubles would be
    engine-dependent."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue0 = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev()).alias("total_revenue")
    )
    from pyspark.sql.window import Window as _W

    w = _W.orderBy(F.col("total_revenue").desc())
    return (
        revenue0.withColumn("_rk", F.rank().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# --- q17: small-quantity-order revenue (correlated scalar subquery) -------

# Adapted: p_container doesn't exist; the part filter is
# p_brand = 'Brand#23' AND p_type = 'SMALL'.
_Q17_ORACLE = """
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
  AND p_type = 'SMALL'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = p_partkey)
"""


@query("q17_small_quantity_revenue", oracle=_Q17_ORACLE)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q17: revenue from orders of less than 20% of a part's
    average quantity. The correlated scalar subquery decorrelates to
    a per-part aggregate joined back on partkey — one extra groupBy
    on the fact table instead of a subquery per row. NB the average
    is over ALL lineitems of the part (not just the filtered brand),
    so the per-part agg runs before the part filter narrows anything;
    at scale a semi-join pre-prune on the ~1/1000 filtered parts
    would shrink it (documented trade, kept faithful here)."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#23") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.2).alias("_qty_cut")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_qty_cut"))
        .agg(
            (F.sum(_d("l_extendedprice")).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --- q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS) ---------

# Adapted lateness: l_shipdate > o_orderdate + 90 days (no
# receipt/commit dates in the fixture).
_Q21_ORACLE = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY s_name
"""


@query("q21_suppliers_waiting", oracle=_Q21_ORACLE)
def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q21: late lines by suppliers who were the SOLE late
    supplier on a multi-supplier finished order.

    The EXISTS / NOT-EXISTS pair decorrelates to one aggregation:
    per (order, supplier) count late lines; per order count suppliers
    and late suppliers; a late line qualifies iff its order has >1
    supplier and exactly 1 late one (necessarily this line's). That
    turns two correlated subqueries into two groupBys over the SAME
    orderkey-partitioned shuffle — Catalyst reuses the partitioning,
    and nothing is evaluated per-row. numwait counts late LINES
    (matching the oracle's COUNT over l1 rows), not orders."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late = (
        F.col("l_shipdate")
        > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    ).cast("int")
    per_os = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.sum(late).alias("_late_lines"))
    )
    per_o = per_os.groupBy("l_orderkey").agg(
        F.count("*").alias("_nsupp"),
        F.count_if(F.col("_late_lines") > 0).alias("_nlate"),
    )
    return (
        per_os.filter(F.col("_late_lines") > 0)
        .join(
            per_o.filter((F.col("_nsupp") > 1) & (F.col("_nlate") == 1)),
            "l_orderkey",
            "left_semi",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("_late_lines").cast("bigint").alias("numwait"))
    )


# --- q22: global sales opportunity (scalar subquery + NOT EXISTS) ---------

# Adapted: no c_phone ⇒ the "country code" is c_nationkey, and the
# candidate set is nationkeys 0-6. Every fixture customer has at least
# one order (verified — the faithful NOT EXISTS is vacuously empty),
# so "never ordered" becomes "no order since 1999-01-01": same
# anti-join shape, non-trivial result.
_Q22_ORACLE = """
SELECT cntrycode, CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
FROM (
  SELECT CAST(c_nationkey AS INT) AS cntrycode, c_acctbal
  FROM customer
  WHERE c_nationkey IN (0, 1, 2, 3, 4, 5, 6)
    AND c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                     WHERE c_acctbal > 0.0
                       AND c_nationkey IN (0, 1, 2, 3, 4, 5, 6))
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01')
) custsale
GROUP BY cntrycode
"""


@query("q22_sales_opportunity", oracle=_Q22_ORACLE)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q22: well-funded customers in selected countries who
    never ordered. Three classic shapes in one: an uncorrelated
    scalar subquery (the average — computed once, crossed in as a
    1-row broadcast), a NOT EXISTS (left-anti join against orders,
    deduped to custkeys), and a final small-key aggregate. The anti
    join is the only shuffle on a big table; the average's filter
    condition matches the outer pre-filter so the scan is shared."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(0, 1, 2, 3, 4, 5, 6)
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("int").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_d("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


# --- q16: parts/supplier relationship (adapted) ---------------------------

# The fixture has no partsupp; the DISTINCT (l_partkey, l_suppkey)
# pairs of lineitem ARE a faithful part-supplier association (every
# TPC-H lineitem references a partsupp row), so q16's shape — count
# distinct suppliers per part profile, excluding a supplier denylist
# via NOT IN — survives with that substitution. p_container is also
# absent; the profile keys on (p_brand, p_type, p_size).
_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem) partsupp
JOIN part ON p_partkey = ps_partkey
WHERE p_brand <> 'BRAND_1'
  AND p_type NOT LIKE 'TYPE_1%'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


@query("q16_parts_supplier_relationship", oracle=_Q16_ORACLE)
def q16_parts_supplier_relationship(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H q16 shape: distinct-supplier counts per part profile with
    a NOT-IN supplier denylist (negative-balance suppliers stand in
    for the complaints LIKE — the column is absent). partsupp is
    derived as DISTINCT (l_partkey, l_suppkey) from lineitem — see
    module docstring; the other partsupp queries (q2/q11/q20) need
    supplycost/availqty values that have no analog, so the shape alone
    survives only here.

    Plan: the distinct-pair derivation is one lineitem shuffle; part
    (filtered, small) broadcasts onto it; the denylist is a broadcast
    LEFT ANTI (NULL-safe NOT IN is safe here — s_suppkey is a
    non-null key, stated in the plan rather than discovered at
    runtime)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    ps = li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).distinct()
    p = part.filter(
        (F.col("p_brand") != "BRAND_1")
        & (~F.col("p_type").startswith("TYPE_1"))
        & (F.col("p_size").isin([1, 4, 7, 10, 13, 16, 19, 22]))
    )
    deny = supplier.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("ps_suppkey")
    )
    return (
        ps.join(F.broadcast(deny), "ps_suppkey", "left_anti")
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(
            F.count_distinct("ps_suppkey")
            .cast("bigint")
            .alias("supplier_cnt")
        )
    )


# --- q2: minimum-cost supplier (correlated scalar MIN subquery) -----------

# Adapted: supplier has no s_address/s_phone/s_comment and part no
# p_mfgr in the fixture — the output keeps (s_acctbal, s_name, n_name,
# p_partkey) and substitutes p_brand for p_mfgr; the part filter is
# p_size = 15 alone (a p_type conjunct leaves 1 row at sf0.01 —
# too thin to exercise the min-tie shape).
_Q2_ORACLE = f"""
WITH {_PARTSUPP_CTE}
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM partsupp, part, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(ps2.ps_supplycost)
    FROM partsupp ps2, supplier s2, nation n2, region r2
    WHERE ps2.ps_partkey = partsupp.ps_partkey
      AND s2.s_suppkey = ps2.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_ORACLE)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q2: for each size-15 part, the European supplier(s)
    offering it at the region's minimum supply cost — the canonical
    correlated scalar-MIN subquery. Decorrelated PAST the textbook
    per-part-aggregate + join-back (which scans partsupp twice and
    shuffles both branches): a single ``min().over(partitionBy
    partkey)`` window computes the minimum and filters in ONE pass —
    one partkey exchange total, partsupp scanned once. The
    region-supplier dimension (supplier⋈nation⋈region) broadcasts in
    front of the window so non-European rows never enter the shuffle.
    Cost equality compares DECIMAL to DECIMAL (exact; a double
    round-trip could drop ties — the window preserves ties by
    construction). Top-100 order is tie-broken to full row uniqueness
    for a deterministic LIMIT boundary."""
    from pyspark.sql.window import Window as _W

    ps = synth_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey", "p_brand")
    )
    eu_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    min_w = _W.partitionBy("ps_partkey")
    return (
        ps.join(F.broadcast(eu_supp), ps.ps_suppkey == eu_supp.s_suppkey)
        .withColumn("_min_cost", F.min("ps_supplycost").over(min_w))
        .filter(F.col("ps_supplycost") == F.col("_min_cost"))
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(
            F.desc("s_acctbal"), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


# --- q11: important stock identification (group vs global aggregate) ------

# The threshold is SCALE-FREE: a part qualifies when its value
# exceeds 3× the nation's MEAN per-part value (value·n_parts >
# 3·total, all BIGINT). TPC-H's literal 0.0001 needs manual 1/SF
# rescaling per scale factor (and returns 0 rows at sf0.1 here); the
# mean-relative form keeps a similar selective-but-non-empty fraction
# at every SF (31/1204 at sf0.01). supplycost is integer-valued by
# construction, so no float appears anywhere in the compare.
_Q11_ORACLE = f"""
WITH {_PARTSUPP_CTE}
SELECT ps_partkey,
       CAST(SUM(CAST(ps_supplycost AS BIGINT) * ps_availqty) AS BIGINT)
         AS part_value
FROM partsupp, supplier, nation
WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
  AND n_name = 'NATION_3'
GROUP BY ps_partkey
HAVING SUM(CAST(ps_supplycost AS BIGINT) * ps_availqty) *
       (SELECT COUNT(DISTINCT ps_partkey)
        FROM partsupp, supplier, nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_3') >
       3 * (SELECT SUM(CAST(ps_supplycost AS BIGINT) * ps_availqty)
            FROM partsupp, supplier, nation
            WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_3')
"""


@query("q11_important_stock", oracle=_Q11_ORACLE)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q11: parts whose stock value at one nation's suppliers
    exceeds a threshold of that nation's total stock value — the
    group-filter-by-global-aggregate shape. The nation-filtered
    partsupp is computed once; the per-part aggregate feeds BOTH the
    output and (re-aggregated — one extra tiny agg, no re-scan of
    partsupp) the 1-row (total, n_parts) that crosses back in as a
    broadcast. The threshold is scale-free and integer-exact:
    value·n_parts > 3·total, i.e. 3× the nation's mean per-part value
    — supplycost is whole-dollar by construction, so no decimal/double
    boundary can flip a row between engines at any SF."""
    ps = synth_partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        _t(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    nat_supp = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey")
    ps_n = ps.join(
        F.broadcast(nat_supp), ps.ps_suppkey == nat_supp.s_suppkey
    ).select(
        "ps_partkey",
        (
            F.col("ps_supplycost").cast("bigint") * F.col("ps_availqty")
        ).alias("_val"),
    )
    per_part = ps_n.groupBy("ps_partkey").agg(
        F.sum("_val").alias("part_value")
    )
    scalars = per_part.agg(
        F.sum("part_value").alias("_total"),
        F.count("*").alias("_n_parts"),
    )
    return (
        per_part.join(F.broadcast(scalars))
        .filter(
            F.col("part_value") * F.col("_n_parts") > 3 * F.col("_total")
        )
        .select("ps_partkey", F.col("part_value").cast("bigint").alias("part_value"))
    )


# --- q20: potential part promotion (nested IN with correlated agg) --------

# Adapted: the availability threshold is availqty > 150 × the pair's
# 1996 shipped quantity (TPC-H's 0.5 factor saturates here — synthetic
# availqty spans [1, 9999] while a fixture pair ships ~26/year, so
# every supplier qualified; 150 keeps 11 of 15 EUROPE suppliers, a
# proper subset). supplier has no s_address — s_acctbal stands in.
# The nation filter widens to region EUROPE (a single fixture nation
# holds only ~4 suppliers).
_Q20_ORACLE = f"""
WITH {_PARTSUPP_CTE}
SELECT s_name, s_acctbal
FROM supplier, nation, region
WHERE s_suppkey IN (
  SELECT ps_suppkey FROM partsupp
  WHERE ps_partkey IN (SELECT p_partkey FROM part
                       WHERE p_name LIKE 'red w%')
    AND CAST(ps_availqty AS BIGINT) > 150 * (
      SELECT SUM(CAST(l_quantity AS BIGINT)) FROM lineitem
      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'))
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
"""


@query("q20_potential_promotion", oracle=_Q20_ORACLE)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q20: suppliers holding surplus stock of 'red w…' parts —
    a nested IN chain with a correlated per-pair aggregate. Shape:
    the part-name filter broadcasts onto partsupp; the correlated
    quantity subquery decorrelates to one (partkey, suppkey) groupBy
    of the date-filtered lineitem joined back on the pair key (an
    inner join — a pair with no 1996 shipments fails the NULL
    comparison in SQL and is equally absent here); survivors dedupe
    to supplier keys and semi-join the region's suppliers. The only
    big-table shuffles are the pair groupBy and the partsupp⋈qty
    join, both on the same pair key. Quantities sum as BIGINT
    (integral doubles in the fixture) so the 150× threshold is
    integer-exact."""
    ps = synth_partsupp(spark, sf_dir)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    red = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red w%"))
        .select("p_partkey")
    )
    qty = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("_qty"))
    surplus = (
        ps.join(F.broadcast(red), ps.ps_partkey == red.p_partkey)
        .join(qty, ["ps_partkey", "ps_suppkey"])
        .filter(F.col("ps_availqty").cast("bigint") > 150 * F.col("_qty"))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            surplus, s.s_suppkey == surplus.ps_suppkey, "left_semi"
        )
        .select("s_name", "s_acctbal")
    )

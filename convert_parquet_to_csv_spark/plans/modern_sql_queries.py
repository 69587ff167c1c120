"""Driver-checked queries: the Spark 4 SQL surface (recursive CTEs,
VARIANT, GROUP BY ALL, SQL UDFs, SQL pipe syntax, LATERAL correlated
subqueries, string collations).

These go through the SQL front door (``spark.sql``) on purpose — the
features are SQL-first, and the oracle side runs the closest DuckDB
dialect form (DuckDB pioneered GROUP BY ALL; its WITH RECURSIVE and
JSON functions are standard).
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession

from convert_parquet_to_csv_spark.plans.common import load_table as _t
from convert_parquet_to_csv_spark.plans.registry import query


def _view(spark: SparkSession, sf_dir: str, name: str) -> None:
    _t(spark, sf_dir, name).createOrReplaceTempView(name)


# --- recursive CTE --------------------------------------------------------

# Implicit binary-tree hierarchy over supplier keys (parent = k div 2):
# no parent column exists in the fixture, but the arithmetic relation
# gives every engine the same tree, and the recursion walks each
# node's ancestor chain to the root — the org-chart / BOM shape.
_RECURSIVE_ORACLE = """
WITH RECURSIVE anc AS (
  SELECT s_suppkey AS node, s_suppkey AS cur, 0 AS depth
  FROM supplier
  UNION ALL
  SELECT node, cur // 2 AS cur, depth + 1
  FROM anc WHERE cur > 1
)
SELECT node AS s_suppkey,
       CAST(MAX(depth) AS INT) AS depth_to_root,
       CAST(SUM(cur) AS BIGINT) AS ancestor_key_sum
FROM anc GROUP BY node
"""

_RECURSIVE_SPARK = """
WITH RECURSIVE anc AS (
  SELECT s_suppkey AS node, s_suppkey AS cur, 0 AS depth
  FROM supplier
  UNION ALL
  SELECT node, cur div 2 AS cur, depth + 1
  FROM anc WHERE cur > 1
)
SELECT node AS s_suppkey,
       CAST(MAX(depth) AS INT) AS depth_to_root,
       CAST(SUM(cur) AS BIGINT) AS ancestor_key_sum
FROM anc GROUP BY node
"""


@query("recursive_cte_hierarchy", oracle=_RECURSIVE_ORACLE)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4): each supplier's ancestor chain in the
    implicit parent=key÷2 binary tree — depth to root and the chain's
    key sum. Spark executes the recursion as iterated UnionLoop steps
    until fixpoint; the per-node chain is O(log key) so total work is
    N·log N rows. Only dialect diff vs DuckDB: integer division is
    ``div`` vs ``//``."""
    _view(spark, sf_dir, "supplier")
    return spark.sql(_RECURSIVE_SPARK)


# --- VARIANT (schema-less semi-structured) --------------------------------

_VARIANT_ORACLE = """
SELECT event_id,
       CAST(CASE WHEN props IS NOT NULL AND json_valid(props)
                 THEN json_extract(props, '$.k') END AS INT) AS k_val,
       CASE WHEN props IS NULL OR NOT json_valid(props) THEN NULL
            WHEN json_type(json(props)) = 'OBJECT' THEN 'OBJECT'
            ELSE 'OTHER' END AS top_type
FROM events
WHERE event_id % 17 = 0
"""


@query("variant_json_path", oracle=_VARIANT_ORACLE)
def variant_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT (Spark 4's semi-structured type): ``parse_json`` the
    props column once, then path-extract typed values with
    ``variant_get`` — no schema declaration, unlike the from_json
    path in events_json_extract. The VARIANT itself never reaches the
    output (binary encoding isn't hashable cross-engine); extraction
    yields concrete INT/STRING columns. DuckDB's JSON type plays the
    oracle role."""
    _view(spark, sf_dir, "events")
    # try_parse_json + explicit NULL branch: NULL or corrupt props
    # must surface as NULL (as the oracle's json_valid guard does) —
    # plain parse_json would throw on corrupt rows, and NULL LIKE
    # '...' would silently fall through to 'OTHER'. The current
    # fixture has neither, but fixtures regenerate every round.
    return spark.sql(
        """
        SELECT event_id,
               variant_get(try_parse_json(props), '$.k', 'int')
                 AS k_val,
               CASE WHEN try_parse_json(props) IS NULL
                    THEN CAST(NULL AS STRING)
                    WHEN schema_of_variant(try_parse_json(props))
                         LIKE 'OBJECT%' THEN 'OBJECT'
                    ELSE 'OTHER' END AS top_type
        FROM events
        WHERE event_id % 17 = 0
        """
    )


# --- GROUP BY ALL / ORDER BY ALL sugar ------------------------------------

_GBA_ORACLE = """
SELECT o_orderstatus,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders
FROM orders
GROUP BY ALL
"""


@query("group_by_all_sugar", oracle=_GBA_ORACLE)
def group_by_all_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL — DuckDB-pioneered sugar Spark 4 adopted: every
    non-aggregate select item becomes a grouping key. Same physical
    plan as the explicit form (partial→final agg on one shuffle)."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               CAST(year(o_orderdate) AS INT) AS order_year,
               COUNT(*) AS n_orders
        FROM orders
        GROUP BY ALL
        """
    )


# --- SQL UDFs (CREATE FUNCTION ... RETURN) --------------------------------

_SQLUDF_ORACLE = """
SELECT n_nationkey,
       upper(n_name) || '/' || CAST(n_regionkey AS VARCHAR) AS region_tag
FROM nation
"""


@query("sql_udf_scalar", oracle=_SQLUDF_ORACLE)
def sql_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL UDF (Spark 4 ``CREATE FUNCTION … RETURN expr``): a scalar
    function defined in pure SQL — inlined by Catalyst into the
    calling plan (no Python, no serialization boundary, full codegen;
    check the plan: just a Project over the scan). The oracle inlines
    the same expression; DuckDB's equivalent is a MACRO."""
    _view(spark, sf_dir, "nation")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION region_tag(
            name STRING, rk INT) RETURNS STRING
        RETURN upper(name) || '/' || CAST(rk AS STRING)
        """
    )
    return spark.sql(
        """
        SELECT n_nationkey, region_tag(n_name, n_regionkey) AS region_tag
        FROM nation
        """
    )


# --- SQL pipe syntax (|>) -------------------------------------------------

_PIPE_ORACLE = """
SELECT o_orderstatus,
  CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4)))
       AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
WHERE EXTRACT(year FROM o_orderdate) = 1995
GROUP BY o_orderstatus
"""


@query("sql_pipe_syntax", oracle=_PIPE_ORACLE)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4.0, SPARK-49555): the same
    filter→join→aggregate plan written as a left-to-right ``|>``
    chain. Pure front-end sugar — Catalyst resolves each pipe stage
    into the identical logical operators (the plan is the same
    broadcast join + one-shuffle partial/final agg as the classic
    form), so the oracle is the classic-syntax equivalent. Revenue
    goes through DECIMAL per the registry determinism rules."""
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        FROM orders
        |> WHERE year(o_orderdate) = 1995
        |> JOIN lineitem ON l_orderkey = o_orderkey
        |> AGGREGATE CAST(SUM(CAST(l_extendedprice*(1-l_discount)
                                   AS DECIMAL(18,4))) AS DOUBLE)
                       AS revenue,
                     COUNT(*) AS n_lines
           GROUP BY o_orderstatus
        """
    )


# --- LATERAL correlated subquery ------------------------------------------

_LATERAL_ORACLE = """
SELECT n.n_nationkey, c.c_custkey, c.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) c
"""


@query("lateral_topn_per_nation", oracle=_LATERAL_ORACLE)
def lateral_topn_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (Spark 3.2+ syntax, correlated
    ORDER BY/LIMIT supported in 4.x): top-3 customers by account
    balance per nation, the classic top-n-per-group written as a
    per-row subquery instead of a window. Catalyst decorrelates it
    (DecorrelateInnerQuery) into a join + per-key ranking — same
    scale shape as the explicit window form, no nested-loop per
    nation row. Tie-broken on c_custkey so both engines pick the
    same rows."""
    _view(spark, sf_dir, "nation")
    _view(spark, sf_dir, "customer")
    return spark.sql(_LATERAL_ORACLE)


# --- string collations (UTF8_LCASE) ---------------------------------------

_COLLATE_ORACLE = """
SELECT lower(seg) AS segment, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
         AS acctbal_sum
FROM (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                  ELSE lower(c_mktsegment) END AS seg, c_acctbal
      FROM customer)
GROUP BY lower(seg)
"""


@query("collation_casefold_group", oracle=_COLLATE_ORACLE)
def collation_casefold_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collations (Spark 4.0): grouping on a ``UTF8_LCASE``
    collated key folds case inside the hash aggregate itself — no
    lower() rewrite of the data. The fixture has no case diversity,
    so the inner SELECT deterministically re-cases half the rows by
    key parity; under the collation both casings land in one group.
    Output casing is normalized explicitly (lower of MIN — group
    members differ only by case, so lower() of any representative is
    deterministic) and CAST back to plain STRING so no collation
    leaks into the result schema. Oracle folds with lower() — the
    pre-collation idiom the feature replaces."""
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT lower(CAST(MIN(seg_mixed) AS STRING)) AS segment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 AS acctbal_sum
        FROM (SELECT collate(CASE WHEN c_custkey % 2 = 0
                                  THEN upper(c_mktsegment)
                                  ELSE lower(c_mktsegment) END,
                             'UTF8_LCASE') AS seg_mixed,
                     c_acctbal
              FROM customer)
        GROUP BY seg_mixed
        """
    )


# --- DataFrame.transpose (Spark 4.0) --------------------------------------

# Column names of the transposed frame come from the first column's
# VALUES — pinned by the IN ('F','O','P') guard in both engines so a
# fixture drift can't silently change the output schema. transpose
# casts every measure to the least-common type (DOUBLE here), so the
# oracle casts too.
_TRANSPOSE_ORACLE = """
SELECT 'n_orders' AS key,
  CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS DOUBLE) AS F,
  CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS DOUBLE) AS O,
  CAST(SUM(CASE WHEN o_orderstatus='P' THEN 1 ELSE 0 END) AS DOUBLE) AS P
FROM orders WHERE o_orderstatus IN ('F','O','P')
UNION ALL
SELECT 'total_price' AS key,
  CAST(SUM(CASE WHEN o_orderstatus='F'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
  CAST(SUM(CASE WHEN o_orderstatus='O'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS O,
  CAST(SUM(CASE WHEN o_orderstatus='P'
                THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS P
FROM orders WHERE o_orderstatus IN ('F','O','P')
"""


@query("transpose_status_summary", oracle=_TRANSPOSE_ORACLE)
def transpose_status_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.transpose`` (new in Spark 4.0): flip a small
    aggregate summary so measures become rows and the status values
    become columns — the report-layout twin of pivot/unpivot
    (pivot_status_by_year / unpivot_status_totals cover the long↔wide
    axes; transpose covers the full flip). Scale note: transpose
    collects the FIRST COLUMN's values to name the output columns, so
    it is only for already-aggregated frames — here a 3-row summary —
    never raw data; the aggregation beneath it is the usual one-shuffle
    partial/final agg."""
    from pyspark.sql import functions as F

    _view(spark, sf_dir, "orders")
    summary = (
        spark.table("orders")
        .filter(F.col("o_orderstatus").isin("F", "O", "P"))
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(
                "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
            ).alias("total_price"),
        )
    )
    return summary.transpose()


# --- listagg / string_agg (SQL:2023, Spark 4.0) ---------------------------

_LISTAGG_ORACLE = """
SELECT r.r_name,
       string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
       COUNT(*) AS n_nations
FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
"""


@query("listagg_nations_by_region", oracle=_LISTAGG_ORACLE)
def listagg_nations_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``listagg(...) WITHIN GROUP (ORDER BY ...)`` — the SQL:2023
    ordered string aggregation Spark 4.0 added (DuckDB's spelling is
    string_agg with an inline ORDER BY). The WITHIN GROUP ordering is
    what makes a concatenation aggregate deterministic at all — an
    unordered listagg concatenates in partition-arrival order and can
    never hash-match anything. Same one-shuffle partial/final agg
    shape as any group-by; the per-group sort runs inside the
    aggregate buffer."""
    _view(spark, sf_dir, "region")
    _view(spark, sf_dir, "nation")
    return spark.sql(
        """
        SELECT r.r_name,
               listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
                 AS nations,
               COUNT(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    )


# --- TRY_CAST semantics zoo ------------------------------------------------

# Engine-parity notes: TRY_CAST agrees between Spark and DuckDB on
# malformed→NULL, whitespace trimming, overflow→NULL, scientific
# notation, 'inf', leap days, and boolean words. The one divergence
# found probing: '3.9' → INT is NULL in Spark (no implicit
# truncation through strings) but ROUNDS to 4 in DuckDB — excluded
# below; portable code casts string→DOUBLE first and rounds
# explicitly. Same family: '1e3' -> INT is NULL in Spark but 1000
# in DuckDB (scientific notation only parses for floating targets in
# Spark), so the sci literal is probed against DOUBLE where both
# agree. Plain CAST(3.7 AS INT) diverges the same way
# (truncate vs round), which is why every fixed-point conversion in
# this repo spells floor(x + 0.5) out.
_TRYCAST_ORACLE = """
WITH probe AS (
  SELECT c_custkey,
         CASE c_custkey % 5
           WHEN 0 THEN '123' WHEN 1 THEN '12abc' WHEN 2 THEN ''
           WHEN 3 THEN ' 42 ' ELSE '999' END AS s,
         c_custkey * 1000000000 AS big
  FROM customer)
SELECT c_custkey,
       TRY_CAST(s AS INT) AS as_int,
       TRY_CAST(s AS DOUBLE) AS as_double,
       TRY_CAST('1e3' AS DOUBLE) AS sci_double,
       CAST(TRY_CAST(s AS BOOLEAN) AS STRING) AS as_bool_str,
       TRY_CAST(big AS INT) AS overflow_null,
       TRY_CAST('2024-02-29' AS DATE) AS leap_ok,
       CAST(TRY_CAST('2024-02-30' AS DATE) AS STRING) AS bad_date_str
FROM probe
"""


@query("try_cast_zoo", oracle=_TRYCAST_ORACLE)
def try_cast_zoo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRY_CAST semantics across the classic dirty-input shapes —
    malformed strings, empty strings, padded whitespace, scientific
    notation, BIGINT→INT overflow, impossible dates — all NULL-safe
    and engine-identical (the one probed divergence is documented
    above the oracle). The identical SQL text runs on both engines;
    the value-hash match is the point: ingest code using TRY_CAST
    gets the same nulls everywhere."""
    _view(spark, sf_dir, "customer")
    return spark.sql(_TRYCAST_ORACLE)


# --- LIMIT/OFFSET pagination ----------------------------------------------

_PAGINATE_ORACLE = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate, o_orderkey
LIMIT 50 OFFSET 200
"""


@query("paginate_orders_page5", oracle=_PAGINATE_ORACLE)
def paginate_orders_page5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless pagination (page 5 of 50): ``DataFrame.offset`` (Spark
    3.4+) under a TOTAL order — the (o_orderdate, o_orderkey)
    tiebreak is what makes a page deterministic at all; an ORDER BY
    on a non-unique key hands back different pages run to run.
    Physical shape: GlobalLimit(offset+limit) over a
    TakeOrderedAndProject — executors keep only the top 250 rows
    each, the driver drops the first 200. The docstring caveat every
    pagination user needs: OFFSET cost grows with page depth (each
    page re-ranks offset+limit rows); deep pagination should switch
    to keyset/seek pagination (WHERE key > last_seen ORDER BY key
    LIMIT n, which stays O(limit) forever)."""
    _view(spark, sf_dir, "orders")
    return (
        spark.table("orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .offset(200)
        .limit(50)
    )


# --- SQL DDL/DML: catalog-table lifecycle ---------------------------------

_DML_ORACLE = """
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM orders
GROUP BY o_orderstatus
"""


@query("sql_table_lifecycle_dml", oracle=_DML_ORACLE)
def sql_table_lifecycle_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-table lifecycle through the SQL front door — CTAS half
    the rows, INSERT INTO the other half, aggregate the managed
    table: the DDL/DML surface (every other query here is
    path-based). The table is USING PARQUET with an explicit /tmp
    LOCATION (no Hive metastore in play — Spark's in-memory catalog
    carries the schema; the files are plain parquet any path-based
    reader could scan). INSERT INTO appends files atomically via the
    same task-commit protocol as DataFrameWriter; the oracle proves
    no row was lost or doubled across the two DML generations."""
    import shutil
    import tempfile

    _view(spark, sf_dir, "orders")
    from convert_parquet_to_csv_spark.plans.scratch import (
        scratch_dir,
        scratch_table,
    )

    loc = scratch_dir(sf_dir, "sql_dml_tbl")
    tbl = scratch_table(sf_dir, "cptc_orders_dml")
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    shutil.rmtree(loc, ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {tbl} USING PARQUET LOCATION '{loc}'
        AS SELECT o_orderkey, o_orderstatus, o_totalprice
           FROM orders WHERE o_orderkey % 2 = 0
        """
    )
    spark.sql(
        f"""
        INSERT INTO {tbl}
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 1
        """
    )
    return spark.sql(
        f"""
        SELECT o_orderstatus, COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_price
        FROM {tbl}
        GROUP BY o_orderstatus
        """
    )


# --- parameterized SQL ----------------------------------------------------

_PARAM_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM orders
WHERE o_totalprice >= 150000.0 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@query("sql_parameterized_args", oracle=_PARAM_ORACLE)
def sql_parameterized_args(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (``spark.sql(..., args={...})``) — the
    injection-safe front door an application layer should use instead
    of f-string splicing: parameters bind as TYPED literals in the
    parsed plan (visible to Catalyst constant folding / pushdown
    exactly like hand-written literals), so the text of the query is
    a stable cache key across parameter values. The oracle runs the
    same query with the literals spliced — binding must be
    value-invariant."""
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_price
        FROM orders
        WHERE o_totalprice >= :min_price AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_price": 150000.0, "status": "F"},
    )


# --- UDTF with TABLE argument ---------------------------------------------

_UDTF_TABLE_ORACLE = """
WITH g AS (
  SELECT user_id, ts,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS INT) AS n_events,
       CAST(COALESCE(MAX(gap_us), -1) AS BIGINT) AS max_gap_us
FROM g GROUP BY user_id
HAVING COUNT(*) >= 40
"""


@query("udtf_table_argument", oracle=_UDTF_TABLE_ORACLE)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF consuming a TABLE argument with ``PARTITION BY …
    ORDER BY …`` — the Spark-4 shape for per-entity SEQUENTIAL logic
    that doesn't fit a window frame (session replay, custom state
    machines): one UDTF instance per user sees that user's events in
    timestamp order, carries imperative state between ``eval`` calls,
    and emits on ``terminate``. Here it tracks event count and the
    max inter-event gap (integer µs — exactly replayable by a lag
    window, which is what the oracle does; a real use would carry
    state no window can express).

    Scale shape: PARTITION BY induces ONE hash exchange on user_id;
    each partition streams through its instance — memory is O(state),
    not O(partition). HAVING ≥40 keeps the gate row set stable."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events int, max_gap_us bigint")
    class UserGapStats:
        def __init__(self):
            self._uid = None
            self._n = 0
            self._prev_us = None
            self._max_gap = -1

        def eval(self, row):
            self._uid = row["user_id"]
            # Exact integer micros: row ts is a naive UTC datetime
            # (timegm, not mktime — no local-TZ dependence).
            import calendar

            us = (
                calendar.timegm(row["ts"].timetuple()) * 1_000_000
                + row["ts"].microsecond
            )
            if self._prev_us is not None:
                gap = us - self._prev_us
                if gap > self._max_gap:
                    self._max_gap = gap
            self._prev_us = us
            self._n += 1

        def terminate(self):
            if self._uid is not None and self._n >= 40:
                yield self._uid, self._n, self._max_gap

    spark.udtf.register("cptc_user_gap_stats", UserGapStats)
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT * FROM cptc_user_gap_stats(
          TABLE(SELECT user_id, ts, event_id FROM events)
          PARTITION BY user_id
          ORDER BY (ts, event_id)
        )
        """
    )

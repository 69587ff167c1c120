"""Driver-checked queries: the Spark 4 SQL surface (recursive CTEs,
VARIANT, GROUP BY ALL, SQL UDFs).

These go through the SQL front door (``spark.sql``) on purpose — the
features are SQL-first, and the oracle side runs the closest DuckDB
dialect form (DuckDB pioneered GROUP BY ALL; its WITH RECURSIVE and
JSON functions are standard).
"""

from __future__ import annotations

import os

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

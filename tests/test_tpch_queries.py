"""TPC-H suite smoke + invariant tests.

Value-level correctness is the DuckDB oracle gate's job
(tools/oracle_check.py / the driver's CORRECTNESS file); here we pin
registration completeness and two structural invariants that an
oracle comparison can't express (they must hold at ANY scale factor).
"""

from __future__ import annotations

import pytest

from convert_parquet_to_csv_spark.plans import registry

TPCH = [
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q12_late_line_priority",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q21_suppliers_waiting",
    "q22_sales_opportunity",
]


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_all_tpch_queries_registered_with_oracles():
    for name in TPCH:
        assert name in registry.QUERIES, name
        assert name in registry.ORACLES, name


def test_q13_distribution_accounts_for_every_customer(spark, sf_small):
    """Σ custdist == |customer|: the LEFT OUTER keeps 0-order
    customers, so the distribution is a partition of all customers."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.plans.common import load_table

    dist = registry.QUERIES["q13_customer_distribution"](spark, sf_small)
    total = dist.agg(F.sum("custdist")).collect()[0][0]
    n_cust = load_table(spark, sf_small, "customer").count()
    assert total == n_cust


def test_q15_returns_the_max_revenue_supplier(spark, sf_small):
    """Every returned supplier's revenue equals the global max —
    the scalar-subquery equality can't return a non-max row."""
    rows = registry.QUERIES["q15_top_supplier"](spark, sf_small).collect()
    assert rows, "q15 must name at least one top supplier"
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1

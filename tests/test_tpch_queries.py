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
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q20_potential_promotion",
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


def test_synth_partsupp_is_deterministic_and_keyed(spark, sf_small):
    """partsupp synthesis: one row per DISTINCT lineitem pair, values
    a pure function of the key (two builds agree), supplycost
    integer-valued (the property q11's exact BIGINT math relies on)."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.plans.tpch_queries import (
        synth_partsupp,
    )

    a = synth_partsupp(spark, sf_small)
    n_pairs = a.count()
    assert a.select("ps_partkey", "ps_suppkey").distinct().count() == n_pairs
    b = synth_partsupp(spark, sf_small)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    frac = a.filter(
        F.col("ps_supplycost") != F.col("ps_supplycost").cast("bigint").cast(
            "decimal(12,2)"
        )
    ).count()
    assert frac == 0  # whole-dollar costs: BIGINT-exact downstream


def test_q2_order_and_limit_boundary(spark, sf_small):
    """Top-100 must come back s_acctbal-descending (deterministic
    LIMIT boundary) and non-empty at any fixture scale."""
    rows = registry.QUERIES["q2_min_cost_supplier"](spark, sf_small).collect()
    assert rows and len(rows) <= 100
    bals = [r.s_acctbal for r in rows]
    assert bals == sorted(bals, reverse=True)


def test_q11_rows_beat_the_national_threshold(spark, sf_small):
    """Every returned part's value must exceed 3× the nation's mean
    per-part value (the scale-free threshold), with total and n_parts
    recomputed independently over the same synthesized partsupp — and
    at least one part must fall below it (the filter must bind)."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.plans.common import load_table
    from convert_parquet_to_csv_spark.plans.tpch_queries import (
        synth_partsupp,
    )

    ps = synth_partsupp(spark, sf_small)
    s = load_table(spark, sf_small, "supplier")
    n = load_table(spark, sf_small, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    per_part = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost").cast("bigint") * F.col("ps_availqty")
            ).alias("v")
        )
    )
    total, n_parts = per_part.agg(
        F.sum("v"), F.count("*")
    ).collect()[0]
    rows = registry.QUERIES["q11_important_stock"](spark, sf_small).collect()
    assert rows
    assert all(r.part_value * n_parts > 3 * total for r in rows)
    assert len(rows) < n_parts  # the threshold binds


def test_q20_returns_proper_subset_of_region_suppliers(spark, sf_small):
    """The surplus predicate must bind: some EUROPE supplier qualifies
    and some does not (a saturated predicate tests nothing)."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.plans.common import load_table

    rows = registry.QUERIES["q20_potential_promotion"](
        spark, sf_small
    ).collect()
    s = load_table(spark, sf_small, "supplier")
    n = load_table(spark, sf_small, "nation")
    r = load_table(spark, sf_small, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    n_region = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .count()
    )
    assert 0 < len(rows) < n_region

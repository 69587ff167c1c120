"""Sketch operator tests: HLL error bound + mergeability identity,
quantile-sketch rank contract, determinism."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators.sketches import (
    approx_quantiles,
    hll_estimate,
    hll_merge_estimate,
    hll_sketches,
)
from convert_parquet_to_csv_spark.sources import read_parquet


@pytest.fixture(scope="module")
def orders(spark, sf_small):
    return read_parquet(spark, os.path.join(sf_small, "orders.parquet")).cache()


def test_hll_estimate_within_bound(spark, orders):
    got = {
        r.o_orderstatus: r.n_distinct_est
        for r in hll_estimate(hll_sketches(orders, "o_orderstatus", "o_custkey")).collect()
    }
    exact = {
        r.o_orderstatus: r.n
        for r in orders.groupBy("o_orderstatus")
        .agg(F.countDistinct("o_custkey").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) <= max(1, 0.05 * e), (k, got[k], e)


def test_hll_merge_equals_global_sketch(spark, orders):
    """Merging per-group sketches == sketching the whole table: the
    identity that lets day-level sketches roll up without rescans."""
    per_group = hll_sketches(orders, "o_orderstatus", "o_custkey")
    merged = per_group.agg(hll_merge_estimate(per_group).alias("est")).first().est
    whole = (
        orders.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("o_custkey").cast("string"), F.lit(14))
            ).alias("est")
        )
        .first()
        .est
    )
    assert merged == whole


def test_hll_deterministic(spark, orders):
    a = sorted(
        (r.o_orderstatus, r.n_distinct_est)
        for r in hll_estimate(hll_sketches(orders, "o_orderstatus", "o_custkey")).collect()
    )
    b = sorted(
        (r.o_orderstatus, r.n_distinct_est)
        for r in hll_estimate(hll_sketches(orders, "o_orderstatus", "o_custkey")).collect()
    )
    assert a == b


def test_approx_quantiles_rank_contract(spark, sf_small):
    li = read_parquet(spark, os.path.join(sf_small, "lineitem.parquet"))
    acc = 1000
    got = {
        r.l_returnflag: (r.p50, r.p90)
        for r in approx_quantiles(
            li, "l_returnflag", "l_extendedprice", [0.5, 0.9], acc
        ).collect()
    }
    # Bracket every approx value between exact percentiles at p +/- 2eps.
    eps = 2.0 / acc
    exact = {
        r.l_returnflag: r.e
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(
                "percentile(l_extendedprice, "
                f"array({0.5 - eps}, {0.5 + eps}, {0.9 - eps}, {0.9 + eps}))"
            ).alias("e")
        )
        .collect()
    }
    for k, (p50, p90) in got.items():
        lo50, hi50, lo90, hi90 = exact[k]
        assert lo50 <= p50 <= hi50, (k, p50, lo50, hi50)
        assert lo90 <= p90 <= hi90, (k, p90, lo90, hi90)


def test_quantile_sketch_columns_named_by_prob(spark, sf_small):
    li = read_parquet(spark, os.path.join(sf_small, "lineitem.parquet"))
    out = approx_quantiles(li, "l_returnflag", "l_quantity", [0.25, 0.75])
    assert out.columns == ["l_returnflag", "p25", "p75"]

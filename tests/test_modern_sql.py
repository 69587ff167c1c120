"""Spark-4 SQL-surface invariants (pipe syntax, LATERAL, collations).

Value-level correctness is the DuckDB oracle gate's job; these pin
engine-internal equivalences that hold at ANY scale factor — each
sugar form must produce exactly what the classic form it replaces
produces.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.plans import registry
from convert_parquet_to_csv_spark.plans.common import load_table


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_pipe_syntax_matches_classic_form(spark, sf_small):
    """|> chain and the classic SELECT resolve to the same result —
    pipe syntax is front-end sugar, not a different evaluator."""
    piped = registry.QUERIES["sql_pipe_syntax"](spark, sf_small)
    classic = spark.sql(
        """
        SELECT o_orderstatus,
          CAST(SUM(CAST(l_extendedprice*(1-l_discount)
                        AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_lines
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        WHERE year(o_orderdate) = 1995
        GROUP BY o_orderstatus
        """
    )
    assert sorted(piped.collect()) == sorted(classic.collect())


def test_lateral_topn_matches_window_form(spark, sf_small):
    """The correlated LATERAL LIMIT must select exactly the window
    row_number() top-3 (same ordering, same tiebreak)."""
    lat = registry.QUERIES["lateral_topn_per_nation"](spark, sf_small)
    cust = load_table(spark, sf_small, "customer")
    nation = load_table(spark, sf_small, "nation")
    from pyspark.sql.window import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    win = (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .join(nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .select("n_nationkey", "c_custkey", "c_acctbal")
    )
    assert sorted(lat.collect()) == sorted(win.collect())


def test_collation_grouping_folds_case(spark, sf_small):
    """Groups under UTF8_LCASE == distinct lower(segment); every
    customer lands in exactly one group."""
    res = registry.QUERIES["collation_casefold_group"](spark, sf_small)
    rows = res.collect()
    cust = load_table(spark, sf_small, "customer")
    segs = {
        r[0]
        for r in cust.select(F.lower("c_mktsegment")).distinct().collect()
    }
    assert {r["segment"] for r in rows} == segs
    assert sum(r["n_customers"] for r in rows) == cust.count()


def test_transpose_round_trips_the_summary(spark, sf_small):
    """transpose() of the status summary: measures become rows,
    statuses become columns, and values survive the flip exactly
    (modulo the documented least-common-type cast to DOUBLE)."""
    res = registry.QUERIES["transpose_status_summary"](spark, sf_small)
    rows = {r["key"]: r.asDict() for r in res.collect()}
    assert set(rows) == {"n_orders", "total_price"}
    orders = load_table(spark, sf_small, "orders").filter(
        F.col("o_orderstatus").isin("F", "O", "P")
    )
    counts = {
        r["o_orderstatus"]: r["n"]
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for status, n in counts.items():
        assert rows["n_orders"][status] == float(n)


def test_moment_stats_match_builtin_within_float_tolerance(spark, sf_small):
    """The exact fixed-point variance must agree with Spark's own
    var_samp to ~1e-9 relative (the builtin is order-dependent in
    the last ulps, which is the whole reason the exact path exists;
    the fixed-point grid adds at most cent-quantization noise)."""
    res = registry.QUERIES["moment_stats_exact"](spark, sf_small)
    got = {r["flag"]: r for r in res.collect()}
    li = load_table(spark, sf_small, "lineitem")
    ref = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.var_samp("l_extendedprice").alias("v"),
            F.stddev_samp("l_extendedprice").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert set(got) == set(ref)
    for flag, r in got.items():
        assert r["n"] == ref[flag]["n"]
        assert abs(r["var_price"] - ref[flag]["v"]) < 1e-6 * ref[flag]["v"]
        assert (
            abs(r["stddev_price"] - ref[flag]["s"]) < 1e-6 * ref[flag]["s"]
        )


def test_weighted_median_reduces_to_plain_median_on_unit_weights(
    spark, sf_small
):
    """With every weight forced to 1 the weighted median must land on
    a price that splits rows half-and-half (lower-median property),
    and the real query's result is bracketed by per-flag min/max."""
    res = registry.QUERIES["weighted_median_price"](spark, sf_small)
    rows = {r["flag"]: r for r in res.collect()}
    li = load_table(spark, sf_small, "lineitem")
    bounds = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("w"),
        )
        .collect()
    }
    assert set(rows) == set(bounds)
    for flag, r in rows.items():
        assert bounds[flag]["lo"] <= r["weighted_median"] <= bounds[flag]["hi"]
        assert r["total_weight"] == bounds[flag]["w"]
        # crossing property: weight at or below the median >= half
        below = (
            li.filter(
                (F.col("l_returnflag") == flag)
                & (F.col("l_extendedprice") <= r["weighted_median"])
            )
            .agg(F.sum(F.col("l_quantity").cast("bigint")))
            .collect()[0][0]
        )
        assert 2 * below >= r["total_weight"]


def test_winsorize_caps_and_counts(spark, sf_small):
    """~5% of each group's rows fall in each tail; the winsorized sum
    is bounded by n*lo <= sum <= n*hi and differs from the raw sum
    only through the tails."""
    res = registry.QUERIES["winsorize_prices"](spark, sf_small)
    rows = {r["flag"]: r for r in res.collect()}
    li = load_table(spark, sf_small, "lineitem")
    per_flag = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(rows) == set(per_flag)
    for flag, r in rows.items():
        n = per_flag[flag]
        assert r["lo_cap"] < r["hi_cap"]
        # percentile tails: between 0 and ~7% of the group each
        assert 0 <= r["n_lo"] <= 0.07 * n
        assert 0 <= r["n_hi"] <= 0.07 * n
        assert n * r["lo_cap"] <= r["winsorized_sum"] <= n * r["hi_cap"]


def test_pareto_frontier_is_mutually_nondominating(spark, sf_small):
    """No skyline member dominates another, and every non-member is
    dominated by some member (frontier completeness)."""
    res = registry.QUERIES["pareto_frontier_parts"](spark, sf_small)
    sky = [(r["p_retailprice"], r["p_size"]) for r in res.collect()]
    assert sky
    for i, (pa, sa) in enumerate(sky):
        for j, (pb, sb) in enumerate(sky):
            if i != j:
                dominates = (
                    pb <= pa and sb >= sa and (pb < pa or sb > sa)
                )
                assert not dominates, ((pa, sa), (pb, sb))
    part = load_table(spark, sf_small, "part")
    allp = [
        (r["p_retailprice"], r["p_size"])
        for r in part.select("p_retailprice", "p_size").collect()
    ]
    skyset = set(sky)
    for pa, sa in allp:
        if (pa, sa) in skyset:
            continue
        assert any(
            pb <= pa and sb >= sa and (pb < pa or sb > sa)
            for pb, sb in sky
        ), (pa, sa)


def test_ab_assignment_is_consistent_and_balanced(spark, sf_small):
    """A user lands in exactly one arm (hash consistency), and the
    split is roughly balanced (the md5 coin is fair to within a wide
    tolerance on a few hundred users)."""
    res = registry.QUERIES["ab_experiment_readout"](spark, sf_small)
    rows = {r["arm"]: r for r in res.collect()}
    assert set(rows) == {"A", "B"}
    ev = load_table(spark, sf_small, "events").filter(
        F.col("value").isNotNull()
    )
    n_users = ev.select("user_id").distinct().count()
    assert rows["A"]["n_users"] + rows["B"]["n_users"] == n_users
    assert rows["A"]["n_obs"] + rows["B"]["n_obs"] == ev.count()
    frac = rows["A"]["n_users"] / n_users
    if n_users >= 100:
        assert 0.3 < frac < 0.7
    else:
        # sf0.001 has ~15 distinct users — binomial noise swamps any
        # tight bound; both arms populated is the meaningful check
        assert rows["A"]["n_users"] >= 1 and rows["B"]["n_users"] >= 1


def test_hhi_bounds_and_even_market_floor(spark, sf_small):
    """1/n_customers <= hhi <= 1 for every nation (equality at the
    floor iff order counts are perfectly even)."""
    res = registry.QUERIES["market_concentration_hhi"](spark, sf_small)
    rows = res.collect()
    assert rows
    for r in rows:
        assert 1.0 / r["n_customers"] - 1e-12 <= r["hhi"] <= 1.0 + 1e-12


def test_ks_statistic_properties(spark, sf_small):
    """0 <= KS <= 1; the hash-coin split of one population should be
    statistically indistinguishable (KS well under the ~5%
    two-sample critical value at these n)."""
    row = registry.QUERIES["ks_drift_ab_arms"](spark, sf_small).collect()[0]
    assert 0.0 <= row["ks_stat"] <= 1.0
    assert row["ks_num"] <= row["n_a"] * row["n_b"]
    import math

    crit = 1.63 * math.sqrt(
        (row["n_a"] + row["n_b"]) / (row["n_a"] * row["n_b"])
    )
    assert row["ks_stat"] < crit


def test_correlation_matches_builtin_within_tolerance(spark, sf_small):
    """The exact power-sum Pearson agrees with Spark's corr() to
    float tolerance, and is bounded in [-1, 1]."""
    res = registry.QUERIES["correlation_exact"](spark, sf_small)
    got = {r["flag"]: r["corr_qty_price"] for r in res.collect()}
    li = load_table(spark, sf_small, "lineitem")
    ref = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    assert set(got) == set(ref)
    for flag, c in got.items():
        assert -1.0 <= c <= 1.0
        # cent quantization of price perturbs corr by <1e-6 here
        assert abs(c - ref[flag]) < 1e-5


def test_audience_overlap_inclusion_exclusion(spark, sf_small):
    """n_both <= min(n_a, n_b); jaccard in (0, 1]; symmetric pair set
    covers every unordered type pair exactly once."""
    rows = registry.QUERIES["audience_overlap_matrix"](
        spark, sf_small
    ).collect()
    assert rows
    pairs = set()
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert r["n_both"] <= min(r["n_a"], r["n_b"])
        assert 0.0 <= r["jaccard"] <= 1.0
        pairs.add((r["type_a"], r["type_b"]))
    types = sorted({t for p in pairs for t in p})
    # with the fixture's small user base every pair should appear
    assert len(pairs) == len(types) * (len(types) - 1) // 2


def test_transition_matrix_rows_normalize(spark, sf_small):
    """Outgoing probabilities sum to 1 per from_status; counts
    account for every non-first order in a customer sequence."""
    rows = registry.QUERIES["status_transition_matrix"](
        spark, sf_small
    ).collect()
    assert rows
    from collections import defaultdict

    psum = defaultdict(float)
    total = 0
    for r in rows:
        psum[r["from_status"]] += r["p_transition"]
        total += r["n_transitions"]
    for s, p in psum.items():
        assert abs(p - 1.0) < 1e-9, (s, p)
    orders = load_table(spark, sf_small, "orders")
    n_orders = orders.count()
    n_customers = orders.select("o_custkey").distinct().count()
    assert total == n_orders - n_customers


def test_ols_trend_matches_builtin_regression(spark, sf_small):
    """The exact power-sum OLS agrees with Spark's regr_slope /
    regr_intercept to float tolerance (cent quantization aside)."""
    res = registry.QUERIES["ols_price_trend"](spark, sf_small)
    got = {r["flag"]: r for r in res.collect()}
    li = load_table(spark, sf_small, "lineitem").selectExpr(
        "l_returnflag AS flag",
        "CAST(datediff(CAST(l_shipdate AS DATE), DATE '1992-01-01')"
        " AS DOUBLE) AS x",
        "l_extendedprice AS y",
    )
    ref = {
        r["flag"]: r
        for r in li.groupBy("flag")
        .agg(
            F.expr("regr_slope(y, x)").alias("slope"),
            F.expr("regr_intercept(y, x)").alias("icpt"),
        )
        .collect()
    }
    for flag, r in got.items():
        assert abs(r["slope_dollars_per_day"] - ref[flag]["slope"]) < 1e-4
        assert abs(r["intercept_dollars"] - ref[flag]["icpt"]) < 1.0


def test_gini_bounds_and_uniform_expectation(spark, sf_small):
    """0 <= gini < 1; TPC-H's ~uniform order values land near 1/3
    (wide tolerance — it's a sanity anchor, not a spec)."""
    rows = registry.QUERIES["gini_order_value"](spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["gini"] < 1.0
        assert 0.15 < r["gini"] < 0.55


def test_ltv_curve_monotone_and_totals(spark, sf_small):
    """Cumulative revenue is non-decreasing within each cohort, and
    the final cumulative values sum to total book revenue (every
    order lands in exactly one cohort cell)."""
    rows = registry.QUERIES["cohort_ltv_curve"](spark, sf_small).collect()
    assert rows
    from collections import defaultdict

    by_cohort = defaultdict(list)
    for r in rows:
        by_cohort[r["cohort"]].append((r["age_months"], r["cum_revenue"]))
    finals = 0.0
    n_orders = 0
    for seq in by_cohort.values():
        seq.sort()
        for (a1, c1), (a2, c2) in zip(seq, seq[1:]):
            assert c2 >= c1
        finals += seq[-1][1]
    n_orders = sum(r["n_orders"] for r in rows)
    orders = load_table(spark, sf_small, "orders")
    assert n_orders == orders.count()
    total = (
        orders.agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
        ).collect()[0][0]
        / 100.0
    )
    assert abs(finals - total) < 1e-6 * total


def test_rfm_segments_partition_customers(spark, sf_small):
    """Segment sizes sum to the customer base with orders; quintile
    codes are 1..5; revenue partitions exactly."""
    rows = registry.QUERIES["rfm_segmentation"](spark, sf_small).collect()
    assert rows
    orders = load_table(spark, sf_small, "orders")
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        assert 1 <= r["r"] <= 5 and 1 <= r["f"] <= 5 and 1 <= r["m"] <= 5
    total_cents = orders.agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
    ).collect()[0][0]
    assert sum(r["segment_cents"] for r in rows) == total_cents

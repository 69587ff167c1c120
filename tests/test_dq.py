"""Tests for operators/dq.py — the expectations gate must actually
catch seeded violations (a DQ framework that only ever passes is
untested by construction)."""

from __future__ import annotations

from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators import dq as Q


def _report_map(df):
    return {
        r.check_name: (r.n_violations, r.ok) for r in df.collect()
    }


def test_rowlevel_checks_catch_seeded_violations(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0),
            (2, None, -5.0),   # bad status (null), negative price
            (3, "X", 20.0),    # bad status (domain)
            (None, "F", 30.0), # null key
        ],
        "k LONG, status STRING, price DOUBLE",
    )
    rep = Q.dq_report(
        [
            Q.check_rowlevel(
                df,
                [
                    Q.not_null("k"),
                    Q.accepted_values("status", ["O", "F", "P"]),
                    Q.in_range("price", lo=0.0),
                ],
            )
        ]
    )
    got = _report_map(rep)
    assert got["not_null(k)"] == (1, False)
    # NULL status: isin(NULL) is NULL → NOT NULL is NULL → row not
    # counted; the null case belongs to not_null, domain check counts
    # only non-null out-of-domain values.
    assert got["accepted_values(status)"] == (1, False)
    assert got["in_range(price,lo=0.0)"] == (1, False)


def test_unique_and_fk_checks(spark):
    parent = spark.createDataFrame([(1,), (2,)], "pk LONG")
    child = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 9)], "ck LONG, fk LONG"
    )
    dup = spark.createDataFrame([(1,), (1,), (2,)], "k LONG")
    rep = Q.dq_report(
        [
            Q.check_unique(dup, ["k"]),
            Q.check_foreign_key(child, "fk", parent, "pk"),
        ]
    )
    got = _report_map(rep)
    assert got["unique(k)"] == (1, False)
    assert got["fk(fk->pk)"] == (1, False)


def test_clean_table_all_ok(spark):
    df = spark.createDataFrame([(1, "O"), (2, "F")], "k LONG, s STRING")
    rep = Q.dq_report(
        [
            Q.check_rowlevel(
                df,
                [Q.not_null("k"), Q.accepted_values("s", ["O", "F"])],
            ),
            Q.check_unique(df, ["k"]),
        ]
    )
    assert all(r.ok for r in rep.collect())


def test_rowlevel_is_single_scan(spark):
    """Every row-level constraint must fuse into one aggregate over one
    scan — no per-constraint re-reads."""
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    )
    plan = (
        Q.check_rowlevel(
            df, [Q.not_null("k"), Q.in_range("v", lo=0, hi=3)]
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Range (0, 100") <= 1


def test_empty_table_passes_all_checks(spark):
    """An empty table violates nothing: n_violations must be 0 (not
    NULL — a NULL ok flag silently drops the check from pass AND fail
    filters)."""
    df = spark.createDataFrame([], "k LONG, s STRING")
    rep = Q.dq_report(
        [
            Q.check_rowlevel(
                df,
                [Q.not_null("k")],
                unique=[["k"]],
            )
        ]
    )
    rows = rep.collect()
    assert all(r.n_violations == 0 and r.ok is True for r in rows)


def test_rowlevel_rejects_zero_constraints(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "k LONG")
    with pytest.raises(ValueError):
        Q.check_rowlevel(df, [])


def test_rowlevel_rejects_unsafe_and_duplicate_names(spark):
    """Names are spliced into a stack() literal: quotes/backticks must
    be rejected, and two constraints compiling to the same name (e.g.
    identical expression_ok labels) must fail loudly instead of
    colliding as duplicate aggregate aliases."""
    import pytest

    df = spark.createDataFrame([(1,)], "k LONG")
    with pytest.raises(ValueError, match="quote or backtick"):
        Q.check_rowlevel(
            df, [Q.expression_ok("bad'name", F.col("k") > 0)]
        )
    with pytest.raises(ValueError, match="duplicate"):
        Q.check_rowlevel(
            df,
            [
                Q.expression_ok("same", F.col("k") > 0),
                Q.expression_ok("same", F.col("k") < 100),
            ],
        )


def test_in_range_names_include_bounds(spark):
    """Two in_range checks on one column with different bounds must
    produce distinct names (the bare in_range(col) name collided)."""
    df = spark.createDataFrame([(5,)], "v LONG")
    rep = Q.dq_report(
        [
            Q.check_rowlevel(
                df,
                [Q.in_range("v", lo=0), Q.in_range("v", lo=10, hi=20)],
            )
        ]
    )
    got = _report_map(rep)
    assert got["in_range(v,lo=0)"] == (0, True)
    assert got["in_range(v,lo=10,hi=20)"] == (1, False)


def test_fk_ignores_null_parent_keys(spark):
    """A NULL parent key must not mask real orphans (SQL NOT IN
    degenerates to zero violations when the parent side has a NULL;
    the left_anti path filters parent NULLs and keeps reporting)."""
    parent = spark.createDataFrame([(1,), (None,)], "pk LONG")
    child = spark.createDataFrame(
        [(1, 1), (2, 9)], "ck LONG, fk LONG"
    )
    got = _report_map(
        Q.dq_report([Q.check_foreign_key(child, "fk", parent, "pk")])
    )
    assert got["fk(fk->pk)"] == (1, False)


def test_fk_skips_null_child_keys(spark):
    parent = spark.createDataFrame([(1,)], "pk LONG")
    child = spark.createDataFrame(
        [(1, 1), (2, None), (3, 9)], "ck LONG, fk LONG"
    )
    got = _report_map(
        Q.dq_report([Q.check_foreign_key(child, "fk", parent, "pk")])
    )
    # only ck=3 (fk=9) is an orphan; the NULL fk is not counted
    assert got["fk(fk->pk)"] == (1, False)


def test_observe_metrics_match_direct_aggregate(spark, sf_small):
    """The observed (piggybacked) metrics must equal the same
    aggregates computed as a plain query — observe() changes where
    the metrics are evaluated, never their values."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.plans import registry
    from convert_parquet_to_csv_spark.plans.common import load_table

    registry.load_all()
    row = registry.QUERIES["observe_metrics_single_pass"](
        spark, sf_small
    ).collect()[0]
    li = load_table(spark, sf_small, "lineitem")
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("l_discount") > 0.05).alias("nd"),
        F.count_if(F.col("l_shipdate").isNull()).alias("nn"),
    ).collect()[0]
    assert row["n_rows"] == direct["n"]
    assert row["n_discounted"] == direct["nd"]
    assert row["n_null_ship"] == direct["nn"]


def test_sorted_neighborhood_pairs(spark):
    """Window-w neighbors in sort order, partition-bounded, no
    self-join: each record pairs with exactly its w-1 successors;
    jittered near-values are adjacent even when exact keys differ."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.operators.dq import (
        sorted_neighborhood_pairs,
    )

    rows = [
        (1, "X", 10.0), (2, "X", 10.4), (3, "X", 11.0), (4, "X", 99.0),
        (5, "Y", 10.1),
    ]
    df = spark.createDataFrame(rows, "rec_key LONG, blk STRING, v DOUBLE")
    got = {
        (r["key_a"], r["key_b"], r["neighbor_rank"])
        for r in sorted_neighborhood_pairs(
            df, sort_cols=["v"], window=3, partition_cols=["blk"]
        ).collect()
    }
    expect = {
        (1, 2, 1), (1, 3, 2), (2, 3, 1), (2, 4, 2), (3, 4, 1),
    }
    assert got == expect  # Y's singleton emits nothing; no cross-block
    # candidate count law: sum over records of min(w-1, successors)
    assert len(got) == 5


def test_fs_link_scores_rejects_empty_fields(spark):
    import pytest as _pytest

    from convert_parquet_to_csv_spark.operators.dq import (
        fs_link_scores,
    )

    a = spark.createDataFrame([(1, 1)], "a_key LONG, blk INT")
    b = spark.createDataFrame([(2, 1)], "b_key LONG, blk INT")
    with _pytest.raises(ValueError, match="at least one field"):
        fs_link_scores(a, b, "blk", [])

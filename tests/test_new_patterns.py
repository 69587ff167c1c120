"""Unit tests for the round-3 continuation patterns: sweep-line
concurrency boundary semantics, KMV bottom-k merge identity, and the
power-iteration requantization helper.

The gated queries verify these end-to-end against DuckDB; these tests
pin the EDGE-CASE semantics on hand-built inputs the fixtures don't
exercise (touching intervals, sub-k groups, negative requant)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sweep_max(spark, intervals):
    """Reference sweep-line over (start, end) integer intervals —
    the same +1/-1 window pattern as max_concurrent_intervals."""
    df = spark.createDataFrame(intervals, "s LONG, e LONG")
    pts = df.select(
        F.col("s").alias("t"), F.lit(1).alias("d")
    ).unionByName(df.select(F.col("e").alias("t"), F.lit(-1).alias("d")))
    w = (
        Window.orderBy("t", "d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return pts.withColumn("live", F.sum("d").over(w)).agg(
        F.max("live")
    ).collect()[0][0]


def test_sweepline_touching_intervals_do_not_overlap(spark):
    """[0,10) and [10,20) are half-open: the -1 at t=10 sorts before
    the +1 (delta tiebreak), so peak concurrency is 1, not 2."""
    assert _sweep_max(spark, [(0, 10), (10, 20)]) == 1


def test_sweepline_nested_and_staggered(spark):
    # [0,100) ⊃ [10,20) ⊃ [12,15): triple overlap at t=12..14.
    assert _sweep_max(spark, [(0, 100), (10, 20), (12, 15)]) == 3
    # staggered chain: pairwise overlaps only.
    assert _sweep_max(spark, [(0, 10), (5, 15), (11, 20)]) == 2


def test_kmv_merge_equals_global_bottom_k(spark):
    """The union-merge identity the ALL row relies on: the k smallest
    of the pooled per-group bottom-k sets == the global bottom-k of
    the full distinct-hash population (including sub-k groups)."""
    k = 4
    rows = [
        ("a", h) for h in [5, 1, 9, 13, 21, 33]
    ] + [("b", h) for h in [2, 40]] + [  # sub-k group
        ("c", h) for h in [3, 7, 11, 15, 19]
    ]
    df = spark.createDataFrame(rows, "g STRING, hv LONG").distinct()
    rn = F.row_number().over(Window.partitionBy("g").orderBy("hv"))
    pooled = (
        df.withColumn("rn", rn)
        .filter(F.col("rn") <= k)
        .select("hv")
        .distinct()
    )
    merged_bottom_k = sorted(
        r.hv for r in pooled.orderBy("hv").limit(k).collect()
    )
    global_bottom_k = sorted(
        r.hv for r in df.select("hv").distinct().orderBy("hv").limit(k).collect()
    )
    assert merged_bottom_k == global_bottom_k == [1, 2, 3, 5]


def test_requant_sign_and_range(spark):
    """sign·((abs·2^20) div max) maps the max-magnitude entry to
    ±2^20 exactly, preserves sign, and truncates toward zero —
    the contract the power-iteration oracle replays with //."""
    from convert_parquet_to_csv_spark.plans.similarity_queries import (
        _requant,
    )

    df = spark.createDataFrame(
        [(1, -400), (2, 100), (3, 399), (4, 0)], "k INT, y LONG"
    ).select("k", F.col("y").cast("decimal(38,0)").alias("y"))
    out = {r.k: r.q for r in _requant(df, "y", "k").collect()}
    assert out[1] == -(1 << 20)  # max magnitude, negative
    assert out[2] == (100 * (1 << 20)) // 400  # exact trunc-div
    assert out[3] == (399 * (1 << 20)) // 400
    assert out[4] == 0
    assert all(abs(v) <= (1 << 20) for v in out.values())


def test_clamped_fold_matches_python_reference(spark):
    """F.aggregate's left fold must equal the imperative recurrence."""
    deltas = [5, -3, -10, 4, -1, 7, -20, 2]
    bal = 0
    for d in deltas:
        bal = max(0, bal + d)
    df = spark.createDataFrame(
        [(1, list(enumerate(deltas)))],
        "k INT, pairs ARRAY<STRUCT<t: INT, dx: INT>>",
    )
    out = df.select(
        F.aggregate(
            F.transform(F.col("pairs"), lambda p: p["dx"].cast("long")),
            F.lit(0).cast("bigint"),
            lambda acc, x: F.greatest(F.lit(0).cast("bigint"), acc + x),
        ).alias("bal")
    ).collect()[0].bal
    assert out == bal == 2


def test_mode_tiebreak_prefers_lowest_value(spark):
    """Equal counts must resolve to the lexicographically smallest
    value — the pinned rule the built-in mode leaves unspecified."""
    df = spark.createDataFrame(
        [("g", "b"), ("g", "b"), ("g", "a"), ("g", "a"), ("g", "c")],
        "grp STRING, v STRING",
    )
    c = df.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("cnt"))
    rn = F.row_number().over(
        Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("v"))
    )
    win = c.withColumn("rn", rn).filter(F.col("rn") == 1).collect()[0]
    assert (win.v, win.cnt) == ("a", 2)


def test_survivorship_rule_stack_order(spark):
    """Trusted source beats richer untrusted record; richness breaks
    ties within a tier; doc_id is the final tiebreak."""
    rows = [
        # cluster A: untrusted src9 has MORE chars but src0 must win
        (1, "dup-a", "src0", 10),
        (2, "dup-a", "src9", 99),
        # cluster B: both trusted; richer record wins
        (3, "dup-b", "src1", 5),
        (4, "dup-b", "src2", 50),
        # cluster C: identical tier+richness; lower doc_id wins
        (5, "dup-c", "src7", 7),
        (6, "dup-c", "src8", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, source STRING, n_chars LONG"
    )
    from convert_parquet_to_csv_spark.functions.text import (
        doc_fingerprint,
    )

    ranked = df.withColumn("_fp", doc_fingerprint("text")).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("_fp").orderBy(
                F.when(
                    F.col("source").isin("src0", "src1", "src2"), 0
                ).otherwise(1),
                F.desc("n_chars"),
                F.asc("doc_id"),
            )
        ),
    )
    winners = {
        r.text: r.doc_id
        for r in ranked.filter(F.col("rn") == 1).collect()
    }
    assert winners == {"dup-a": 1, "dup-b": 4, "dup-c": 5}


# --- property: the engine fold equals the imperative recurrence -----------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    deltas=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=0,
        max_size=60,
    )
)
def test_clamped_fold_property(spark, deltas):
    """For ANY integer delta sequence, F.aggregate's clamped left fold
    equals the Python recurrence — the property the gated query's
    cross-engine claim rests on (DuckDB list_reduce replays the same
    fold)."""
    bal = 0
    for d in deltas:
        bal = max(0, bal + d)
    df = spark.createDataFrame([(deltas,)], "deltas ARRAY<LONG>")
    out = df.select(
        F.aggregate(
            F.col("deltas"),
            F.lit(0).cast("bigint"),
            lambda acc, x: F.greatest(F.lit(0).cast("bigint"), acc + x),
        ).alias("bal")
    ).collect()[0].bal
    assert out == bal

"""Harness tests (Ops 13-18): stems, shuffle, timing, pivot, export."""

from __future__ import annotations

import os

from convert_parquet_to_csv_spark.pivotbench import (
    export_results,
    filestem_df,
    get_filestems,
    pivot_results,
    results_to_long_df,
    shuffle_run_order,
    time_kernel,
)
from convert_parquet_to_csv_spark.sources import read_csv

RESULTS = {
    "duckdb_times": {100: 0.5, 1000: 1.5},
    "polars_times": {1000: 0.9, 100: 0.1},
}


def test_get_filestems_first_dot_and_ext_filter():
    """Reference edge cases (FIXTURES.md A2): first-dot split, wrong ext."""
    names = ["a.parquet", "a.b.parquet", "x.csv", "noext"]
    assert get_filestems(names, ".parquet") == ["a", "a"]
    assert get_filestems(names, ".csv") == ["x"]
    assert get_filestems([], ".parquet") == []


def test_filestem_df_distributed(spark):
    df = spark.createDataFrame(
        [("a.parquet",), ("a.b.parquet",), ("x.csv",)], "filename STRING"
    )
    out = filestem_df(df, "filename", ".parquet")
    assert [r["stem"] for r in out.orderBy("filename").collect()] == ["a", "a"]


def test_shuffle_run_order_seeded():
    stems, sizes = ["a", "b", "c", "d"], [1, 2, 3, 4]
    p1 = shuffle_run_order(stems, sizes, seed=7)
    p2 = shuffle_run_order(stems, sizes, seed=7)
    assert p1 == p2
    assert sorted(p1) == sorted(zip(stems, sizes))  # a permutation


def test_time_kernel_measures_and_repeats():
    calls = []
    t = time_kernel(lambda: calls.append(1), warmup=2, repeat=3)
    assert len(calls) == 5 and t >= 0


def test_pivot_shape(spark):
    """Expected wide shape: rows=#sizes ascending, cols=1+#methods
    (FIXTURES.md A3), `_times` suffix stripped (utils.py:24)."""
    wide = pivot_results(results_to_long_df(spark, RESULTS))
    assert wide.columns == ["size", "duckdb", "polars"]
    rows = wide.collect()
    assert [r["size"] for r in rows] == [100, 1000]
    assert rows[0]["duckdb"] == 0.5 and rows[1]["polars"] == 0.9


def test_export_results_csv(spark, tmp_path):
    fp = str(tmp_path / "results.csv")
    export_results(RESULTS, spark, fp)
    assert os.path.isfile(fp)
    back = read_csv(spark, fp, schema="size LONG, duckdb DOUBLE, polars DOUBLE")
    assert back.count() == 2

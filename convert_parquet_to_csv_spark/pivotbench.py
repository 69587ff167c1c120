"""Benchmark harness: timing, results pivot, export (Ops 13-18).

Re-expresses the reference's driver (main.py:10-40) and results export
(utils.py:11-34) Spark-first. The results table is a long-format
DataFrame ``(method, size, time)`` pivoted wide with Spark's native
``groupBy().pivot()`` — the direct primitive for the reference's
polars ``pivot(index="size", on="method", values="time")``.
"""

from __future__ import annotations

import random
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.sources import write_csv


def get_filestems(filenames: list[str], ext: str) -> list[str]:
    """Filename→stem filter + projection (reference utils.py:37-44).

    Keeps names ending in ``ext``; strips at the *first* dot — the
    reference's intentional behavior (``f.split(".")[0]``), so
    ``a.b.parquet`` → ``a``. Driver-side list comp, mirroring the
    reference: the manifest is tiny by construction.
    """
    return [f.split(".")[0] for f in filenames if f.endswith(ext)]


def filestem_df(df: DataFrame, filename_col: str, ext: str) -> DataFrame:
    """Distributed flavor of :func:`get_filestems` for when the file
    list is itself a big table: filter + first-dot split, pushed into
    the scan by Catalyst."""
    return df.filter(F.col(filename_col).endswith(ext)).withColumn(
        "stem", F.split(F.col(filename_col), r"\.")[0]
    )


def time_kernel(fn: Callable[[], None], warmup: int = 0, repeat: int = 1) -> float:
    """Wall-clock seconds for one kernel invocation (reference
    main.py:31-35 ``timeit(..., number=1)``).

    Spark caveat (SURVEY.md §4.4): ``fn`` must run an *action*; plan
    construction is free. ``warmup``/``repeat`` default to the
    reference's single-shot methodology but let callers amortize JVM
    and code-gen warmup (the reference itself concedes the noise,
    README.md:332).
    """
    for _ in range(warmup):
        fn()
    best = float("inf")
    for _ in range(max(1, repeat)):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def shuffle_run_order(
    stems: list[str], sizes: list[int], seed: int | None = None
) -> list[tuple[str, int]]:
    """Randomize benchmark execution order to avoid size-ordered bias
    (reference main.py:19-22, README.md:322). The reference shuffles
    unseeded; we accept a seed for reproducibility."""
    pairs = list(zip(stems, sizes))
    rng = random.Random(seed)
    rng.shuffle(pairs)
    return pairs


def results_to_long_df(spark: SparkSession, results: dict[str, dict[int, float]]) -> DataFrame:
    """Flatten the ``{method: {size: seconds}}`` bookkeeping dict
    (reference main.py:24-28) to a long DataFrame ``(method, size,
    time)`` (reference utils.py:18-26), stripping any ``_times``
    suffix like the reference's ``method.replace("_times", "")``."""
    rows = [
        (method.replace("_times", ""), int(size), float(t))
        for method, per_size in results.items()
        for size, t in sorted(per_size.items())
    ]
    return spark.createDataFrame(rows, "method STRING, size LONG, time DOUBLE")


def pivot_results(long_df: DataFrame) -> DataFrame:
    """Long→wide pivot: one row per size ascending, one column per
    method (reference utils.py:28-32). ``agg(first)`` matches the
    reference's one-value-per-cell contract.

    Scale note: ``pivot`` without an explicit value list triggers a
    distinct scan of methods; the method set is tiny and this table is
    tiny — per-cell data, not row data.
    """
    return (
        long_df.groupBy("size")
        .pivot("method")
        .agg(F.first("time"))
        .orderBy("size")
    )


def export_results(
    results: dict[str, dict[int, float]] | DataFrame,
    spark: SparkSession,
    filepath: str,
) -> DataFrame:
    """Pivot + write ``results.csv`` (reference utils.py:11-34,
    ``export_results``). Accepts the raw dict or a pre-built long DF;
    returns the wide DataFrame for inspection."""
    long_df = (
        results
        if isinstance(results, DataFrame)
        else results_to_long_df(spark, results)
    )
    wide = pivot_results(long_df)
    write_csv(wide, filepath, single_file=True)
    return wide

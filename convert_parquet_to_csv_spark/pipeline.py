"""End-to-end workflows mirroring the reference's two entry points.

- :func:`extract_dataset` ≙ ``extract_data.py`` + ``utils.create_samples``
  (merge-scan sources, seeded exact-n samples → parquet, manifest CSV).
- :func:`run_benchmark` ≙ ``main.py`` (manifest load/sort, stem filter,
  shuffled timed sweep over kernel presets, per-method sort).
- :func:`run_full` glues both, ending in the pivoted ``results.csv``.

Error policy matches the reference: per-kernel try/except that logs
and continues the sweep (utils.py:134-137), artifact cleanup after
timing (the benchmark measures write cost then discards output).
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from convert_parquet_to_csv_spark.operators.sample import (
    DEFAULT_SEED,
    sample_exact_n,
)
from convert_parquet_to_csv_spark.pivotbench import (
    export_results,
    get_filestems,
    shuffle_run_order,
    time_kernel,
)
from convert_parquet_to_csv_spark.sources import (
    convert_parquet_to_csv,
    read_csv,
    read_parquet_merged,
    write_csv,
    write_parquet,
)

MANIFEST_SCHEMA = "num_rows LONG, filename STRING"

# The reference's public source-URL pattern (utils.py:97-105): one
# parquet file per month from the NYC TLC public CDN.
DEFAULT_URL_TEMPLATE = (
    "https://d37ci6vzurychx.cloudfront.net/trip-data/"
    "yellow_tripdata_2024-{month:02d}.parquet"
)


def build_month_urls(
    month_start: int,
    month_stop: int,
    url_template: str = DEFAULT_URL_TEMPLATE,
) -> list[str]:
    """Month range → source URL list (reference utils.py:97-99)."""
    validate_months(month_start, month_stop)
    return [
        url_template.format(month=m)
        for m in range(month_start, month_stop + 1)
    ]


def fetch_to_local(
    urls: list[str],
    dest_dir: str,
    max_workers: int = 4,
    skip_if_exists: bool = True,
) -> list[str]:
    """Download each URL into ``dest_dir``; returns local paths in
    input order.

    This is ORCHESTRATION, not a distributed operator: the reference
    streams four ~100 MB HTTPS files once (utils.py:97-105), and Spark
    has no https:// Hadoop filesystem, so the parity path is a
    threaded driver-side fetch feeding :func:`read_parquet_merged`.
    At a real 100 TB scale the landing step is a distributed copy
    (distcp / cloud transfer service) into object storage that Spark
    then scans directly — this helper exists so entry point A
    (extract_data.py:8-14) runs end-to-end from a URL list.

    ``file://`` URLs work too (urllib handles them), which is how the
    e2e test exercises the path hermetically. Partial downloads are
    written to a ``.part`` name and renamed only on success, so an
    interrupted fetch never leaves a truncated file that
    ``skip_if_exists`` would later trust.
    """
    import shutil as _shutil
    import urllib.parse
    import urllib.request
    from concurrent.futures import ThreadPoolExecutor

    os.makedirs(dest_dir, exist_ok=True)

    def _fetch(url: str) -> str:
        name = os.path.basename(urllib.parse.urlparse(url).path)
        if not name:
            raise ValueError(f"URL has no file component: {url}")
        dest = os.path.join(dest_dir, name)
        if skip_if_exists and os.path.exists(dest):
            return dest
        part = dest + ".part"
        with urllib.request.urlopen(url) as resp, open(part, "wb") as out:
            _shutil.copyfileobj(resp, out)
        os.replace(part, dest)
        return dest

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        return list(pool.map(_fetch, urls))


def extract_dataset_from_urls(
    spark: SparkSession,
    urls: list[str],
    workdir: str,
    sample_sizes: list[int],
    manifest_path: str,
    **extract_kwargs,
) -> list[tuple[int, str]]:
    """Entry point A end-to-end from a URL list (reference
    extract_data.py:8-14 → utils.py:97-111): fetch each source to a
    local staging dir, then merge-scan + sample + manifest via
    :func:`extract_dataset`."""
    staging = os.path.join(workdir, "staging")
    local_paths = fetch_to_local(urls, staging)
    return extract_dataset(
        spark,
        local_paths,
        output_dir=os.path.join(workdir, "data", "parquet"),
        sample_sizes=sample_sizes,
        manifest_path=manifest_path,
        **extract_kwargs,
    )


def validate_months(month_start: int, month_stop: int) -> None:
    """Input validation (reference utils.py:64-68, Op-3)."""
    if not (1 <= month_start <= 12) or not (1 <= month_stop <= 12):
        raise ValueError(
            "month_start and month_stop must be between 1 (Jan) and 12 (Dec)."
        )
    if month_start > month_stop:
        raise ValueError("month_start cannot be greater than month_stop.")


def extract_dataset(
    spark: SparkSession,
    source_paths: list[str],
    output_dir: str,
    sample_sizes: list[int],
    manifest_path: str,
    seed: int = DEFAULT_SEED,
    month_start: int = 1,
    month_stop: int = 4,
    name_prefix: str = "taxi_data_2024",
    skip_if_exists: bool = True,
) -> list[tuple[int, str]]:
    """Fixture builder ≙ extract_data.py:5-14 + utils.py:47-111.

    Merge-scans ``source_paths`` (union-by-name + provenance), writes
    one exact-named parquet sample per size, then the
    ``(num_rows, filename)`` manifest CSV. Returns the manifest rows.

    ``skip_if_exists`` reproduces the guarded entry (extract_data.py:
    8-14). The reference pulls its sources over HTTPS; fetching is
    orchestration, not an operator (SURVEY.md §2 Op-1) — callers hand
    us already-reachable paths.
    """
    validate_months(month_start, month_stop)
    if skip_if_exists and os.path.isdir(output_dir) and os.listdir(output_dir):
        return []
    os.makedirs(output_dir, exist_ok=True)

    df = read_parquet_merged(spark, source_paths, provenance_col="filename")
    # One persisted scan feeds every sample size (the reference holds
    # the merged frame in memory, utils.py:105-107).
    df = df.persist()
    try:
        records: list[tuple[int, str]] = []
        for n in sample_sizes:
            fname = f"{name_prefix}-{month_start:02d}{month_stop:02d}_{n}.parquet"
            sample = sample_exact_n(df, n, seed=seed)
            write_parquet(
                sample, os.path.join(output_dir, fname), single_file=True
            )
            records.append((n, fname))
        manifest = spark.createDataFrame(records, MANIFEST_SCHEMA)
        write_csv(manifest, manifest_path, single_file=True)
        return records
    finally:
        df.unpersist()


# ---------------------------------------------------------------------------
# Kernel presets ≙ the reference's five libraries (SURVEY.md §2 Ops 7-11).
# Each takes (spark, stem, input_dir, output_dir) and runs one timed
# conversion. All are the same Spark pipeline under different configs.
# ---------------------------------------------------------------------------

def _kernel(sql_flavor=False, single_file=False, max_records=None, with_index=False):
    def run(spark: SparkSession, stem: str, input_dir: str, output_dir: str) -> None:
        src = os.path.join(input_dir, f"{stem}.parquet")
        dst = (
            os.path.join(output_dir, f"{stem}.csv")
            if single_file
            else os.path.join(output_dir, stem)
        )
        convert_parquet_to_csv(
            spark,
            src,
            dst,
            sql_flavor=sql_flavor,
            single_file=single_file,
            max_records_per_file=max_records,
            with_index=with_index,
        )

    return run


KERNEL_PRESETS: dict[str, Callable[[SparkSession, str, str, str], None]] = {
    # DuckDB COPY(SELECT *) → SQL front door, one named file (utils.py:114-137)
    "spark_sql": _kernel(sql_flavor=True, single_file=True),
    # pandas chunked+index (utils.py:140-165)
    "spark_indexed": _kernel(with_index=True),
    # pyarrow batch-columnar (utils.py:168-192) → plain vectorized path
    "spark_df": _kernel(),
    # polars eager single file (utils.py:195-214)
    "spark_single": _kernel(single_file=True),
    # polars lazy PartitionMaxSize sink (utils.py:217-244) — most Spark-native
    "spark_chunked": _kernel(max_records=500_000),
}


def run_benchmark(
    spark: SparkSession,
    manifest_path: str,
    input_dir: str,
    output_dir: str,
    kernels: dict[str, Callable] | None = None,
    shuffle_seed: int | None = 721,
    warmup: int = 0,
    repeat: int = 1,
) -> dict[str, dict[int, float]]:
    """Benchmark driver ≙ main.py:10-40.

    Manifest load→sort→collect (tiny table: driver-side is correct,
    SURVEY.md §2 Op-13), stem filter, shuffled (stem, size) sweep,
    per-(kernel, dataset) timing, artifacts discarded after each
    kernel like the reference's ``finally: rmtree``.
    """
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"manifest not found: {manifest_path} — run extract_dataset first"
        )
    manifest = (
        read_csv(spark, manifest_path, schema=MANIFEST_SCHEMA)
        .orderBy("num_rows")
        .collect()
    )
    sizes = [r["num_rows"] for r in manifest]
    stems = get_filestems([r["filename"] for r in manifest], ".parquet")

    kernels = kernels if kernels is not None else KERNEL_PRESETS
    results: dict[str, dict[int, float]] = {name: {} for name in kernels}
    for stem, n in shuffle_run_order(stems, sizes, seed=shuffle_seed):
        for name, kernel in kernels.items():
            try:
                results[name][n] = time_kernel(
                    lambda: kernel(spark, stem, input_dir, output_dir),
                    warmup=warmup,
                    repeat=repeat,
                )
            except Exception as ex:  # noqa: BLE001 — reference policy:
                # print-and-continue per kernel (utils.py:134-135)
                print(f"Error processing '{stem}' using {name}: {ex}")
            finally:
                shutil.rmtree(output_dir, ignore_errors=True)
    return results


def run_full(
    spark: SparkSession,
    source_paths: list[str],
    workdir: str,
    sample_sizes: list[int],
    results_path: str | None = None,
    **bench_kwargs,
) -> DataFrame:
    """extract → sample → manifest → sweep → pivoted results.csv."""
    parquet_dir = os.path.join(workdir, "data", "parquet")
    csv_dir = os.path.join(workdir, "data", "csv")
    manifest_path = os.path.join(workdir, "extracted_files.csv")
    extract_dataset(
        spark, source_paths, parquet_dir, sample_sizes, manifest_path
    )
    results = run_benchmark(
        spark, manifest_path, parquet_dir, csv_dir, **bench_kwargs
    )
    results_path = results_path or os.path.join(workdir, "results.csv")
    return export_results(results, spark, results_path)

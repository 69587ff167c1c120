"""End-to-end workflow test (SURVEY.md §5.2 layer 4): extract → sample
→ manifest → benchmark sweep → pivoted results.csv, on local fixtures."""

from __future__ import annotations

import os

import pytest

from convert_parquet_to_csv_spark.pipeline import (
    KERNEL_PRESETS,
    extract_dataset,
    run_benchmark,
    run_full,
    validate_months,
)
from convert_parquet_to_csv_spark.sources import read_csv, read_parquet


def test_validate_months():
    validate_months(1, 4)
    with pytest.raises(ValueError):
        validate_months(0, 4)
    with pytest.raises(ValueError):
        validate_months(1, 13)
    with pytest.raises(ValueError):
        validate_months(5, 2)


def test_extract_dataset(spark, sf_small, tmp_path):
    out = str(tmp_path / "parquet")
    manifest = str(tmp_path / "extracted_files.csv")
    src = [os.path.join(sf_small, "orders.parquet")]
    records = extract_dataset(
        spark, src, out, [50, 150], manifest, name_prefix="orders"
    )
    assert [n for n, _ in records] == [50, 150]
    for n, fname in records:
        df = read_parquet(spark, os.path.join(out, fname))
        assert df.count() == n
        assert "filename" in df.columns  # provenance survived
    m = read_csv(spark, manifest, schema="num_rows LONG, filename STRING")
    assert m.count() == 2
    # guarded entry: second call skips (extract_data.py:8-14)
    assert extract_dataset(spark, src, out, [50, 150], manifest) == []


def test_extract_dataset_from_urls(spark, sf_small, tmp_path):
    """Entry point A from a URL manifest (hermetic via file:// URLs):
    fetch → staging → merge-scan → samples → manifest CSV."""
    from convert_parquet_to_csv_spark.pipeline import (
        build_month_urls,
        extract_dataset_from_urls,
        fetch_to_local,
    )

    urls = [
        "file://" + os.path.join(sf_small, "orders.parquet"),
        "file://" + os.path.join(sf_small, "customer.parquet"),
    ]
    workdir = str(tmp_path / "wd")
    manifest = str(tmp_path / "extracted_files.csv")
    records = extract_dataset_from_urls(
        spark, urls, workdir, [40, 120], manifest, name_prefix="mix"
    )
    assert [n for n, _ in records] == [40, 120]
    # staged copies exist and fed the merged scan
    staged = sorted(os.listdir(os.path.join(workdir, "staging")))
    assert staged == ["customer.parquet", "orders.parquet"]
    for n, fname in records:
        df = read_parquet(
            spark, os.path.join(workdir, "data", "parquet", fname)
        )
        assert df.count() == n
        assert "filename" in df.columns  # provenance survived the merge

    # re-fetch is idempotent (skip_if_exists)
    paths = fetch_to_local(urls, os.path.join(workdir, "staging"))
    assert [os.path.basename(p) for p in paths] == [
        "orders.parquet", "customer.parquet",
    ]

    # URL builder reproduces the reference's month template
    built = build_month_urls(1, 4)
    assert len(built) == 4 and built[0].endswith("2024-01.parquet")
    with pytest.raises(ValueError):
        build_month_urls(5, 2)


def test_run_benchmark_missing_manifest(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        run_benchmark(spark, str(tmp_path / "nope.csv"), ".", ".")


def test_full_workflow(spark, sf_small, tmp_path):
    """The complete main.py-equivalent sweep with 2 kernels."""
    wd = str(tmp_path / "wd")
    kernels = {k: KERNEL_PRESETS[k] for k in ["spark_sql", "spark_chunked"]}
    wide = run_full(
        spark,
        [os.path.join(sf_small, "orders.parquet")],
        wd,
        sample_sizes=[40, 80],
        kernels=kernels,
    )
    assert wide.columns == ["size", "spark_chunked", "spark_sql"]
    rows = wide.collect()
    assert [r["size"] for r in rows] == [40, 80]
    assert all(r["spark_sql"] > 0 and r["spark_chunked"] > 0 for r in rows)
    assert os.path.isfile(os.path.join(wd, "results.csv"))
    # benchmark artifacts discarded after timing (utils.py:134-137)
    assert not os.path.exists(os.path.join(wd, "data", "csv"))


def test_benchmark_error_policy(spark, sf_small, tmp_path, capsys):
    """Per-kernel print-and-continue (utils.py:134-135)."""
    wd = str(tmp_path / "wd2")
    manifest = os.path.join(wd, "extracted_files.csv")
    extract_dataset(
        spark,
        [os.path.join(sf_small, "region.parquet")],
        os.path.join(wd, "parquet"),
        [3],
        manifest,
        name_prefix="region",
    )

    def boom(spark_, stem, i, o):
        raise RuntimeError("kaboom")

    results = run_benchmark(
        spark,
        manifest,
        os.path.join(wd, "parquet"),
        os.path.join(wd, "csv"),
        kernels={"bad": boom, "good": KERNEL_PRESETS["spark_df"]},
    )
    assert results["bad"] == {}
    assert 3 in results["good"]
    assert "kaboom" in capsys.readouterr().out

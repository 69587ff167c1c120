"""bench.py contract: the override map and noise-floor set must stay
consistent with the registry — a stale name would silently drop a
trend number (bench skips unknown names) or time the wrong plan."""

from __future__ import annotations

import importlib
import os
import sys

import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


@pytest.fixture(scope="module")
def bench():
    return importlib.import_module("bench")


def test_override_names_are_benchmarked_registry_queries(bench):
    """Every BENCH_PLAN_OVERRIDES key must be both a registered query
    (the override exists to keep the bench number like-for-like with
    the pre-r6 raw plan while the registry entry became a property
    gate) and an actual bench query name (otherwise the override is
    dead weight that would mask a future rename)."""
    from convert_parquet_to_csv_spark.plans import registry

    registry.load_all()
    for name in bench.BENCH_PLAN_OVERRIDES:
        assert name in registry.QUERIES, name
        assert name in bench.BENCH_QUERY_NAMES, name


def test_noise_floor_names_are_benchmarked(bench):
    for name in bench.NOISE_FLOOR_NAMES:
        assert name in bench.BENCH_QUERY_NAMES, name


def test_dual_methodology_names_are_benchmarked(bench):
    """A DUAL_METHODOLOGY name not in the bench list would silently
    drop its `_warm` companion key from the artifact."""
    for name in bench.DUAL_METHODOLOGY_NAMES:
        assert name in bench.BENCH_QUERY_NAMES, name


def test_overrides_build_raw_operator_plans(bench, spark, sf_small):
    """Each override must produce its raw operator's row shape — NOT
    the registry's property-gate single-row shape (similarity top-k)
    or md5 oracle-replay flavor (dsir/winnow) — so BENCH trend numbers
    keep measuring the production operator."""
    expected = {
        "similarity_topk_lsh": {"query_id", "neighbor_id", "similarity"},
        "similarity_topk_ivf": {"query_id", "neighbor_id", "similarity"},
        "similarity_topk_pq": {"query_id", "neighbor_id", "similarity"},
        "dsir_importance_weights": {"doc_id", "score_micro"},
        "dedup_winnow_fingerprints": {"doc_id", "pos", "fp"},
    }
    assert set(bench.BENCH_PLAN_OVERRIDES) == set(expected)
    for name, fn in bench.BENCH_PLAN_OVERRIDES.items():
        df = fn(spark, sf_small)
        assert set(df.columns) == expected[name], name
        rows = df.count()
        assert rows > 0, name

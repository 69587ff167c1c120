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


# --------------------------------------------------------------------------
# bench_compare drift anchor (VERDICT r7 item 1)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def bench_compare():
    return importlib.import_module("tools.bench_compare")


def _cap(bc, old_q, new_q, **kw):
    import io

    buf = io.StringIO()
    flagged = bc.compare(
        {"queries": old_q, "value": None},
        {"queries": new_q, "value": None},
        out=buf,
        **kw,
    )
    return flagged, buf.getvalue()


def test_anchor_normalizes_uniform_vm_drift(bench_compare):
    """A uniform slowdown that tracks the same-run DuckDB anchor is
    VM drift, not code — zero flags after normalization (the r6→r7
    lesson: median +14% across 35 untouched queries with the anchor
    itself +18%)."""
    a = bench_compare.ANCHOR_DEFAULT
    old = {a: 4.0, "q_x": 1.0, "q_y": 2.0}
    new = {a: 5.0, "q_x": 1.25, "q_y": 2.5}  # everything x1.25
    flagged, txt = _cap(bench_compare, old, new, tol=0.1)
    assert flagged == []
    assert "x1.250" in txt
    # without the anchor the same numbers would all flag
    flagged_raw, _ = _cap(bench_compare, old, new, tol=0.1, anchor=None)
    assert set(flagged_raw) == {"q_x", "q_y"}


def test_anchor_still_flags_real_regressions(bench_compare):
    """A query that slowed MORE than the VM did stays flagged."""
    a = bench_compare.ANCHOR_DEFAULT
    old = {a: 4.0, "q_x": 1.0}
    new = {a: 4.4, "q_x": 2.0}  # VM x1.1, query x2
    flagged, _ = _cap(bench_compare, old, new, tol=0.25)
    assert flagged == ["q_x"]


def test_two_anchor_cpu_drift_explains_cpu_bound_key(bench_compare):
    """r10 two-anchor protocol (VERDICT r9 item 1): a CPU-bound key
    that doubled on a box whose CPU anchor also doubled is VM drift
    — the IO anchor alone (flat) would have flagged it. And the
    disagreement between the anchors prints the PROFILE SHIFT
    banner."""
    a_io = bench_compare.ANCHOR_DEFAULT
    a_cpu = bench_compare.ANCHOR_CPU
    old = {a_io: 4.0, a_cpu: 1.0, "q_x": 1.0}
    new = {a_io: 4.0, a_cpu: 2.0, "q_x": 2.0}
    flagged, txt = _cap(bench_compare, old, new, tol=0.25)
    assert flagged == []
    assert "PROFILE SHIFT" in txt
    assert "CPU-drift explained" in txt


def test_two_anchor_still_flags_real_regressions(bench_compare):
    """Both anchors flat + query doubled -> neither profile explains
    it -> flagged. The second anchor must not widen the net."""
    a_io = bench_compare.ANCHOR_DEFAULT
    a_cpu = bench_compare.ANCHOR_CPU
    old = {a_io: 4.0, a_cpu: 1.0, "q_x": 1.0}
    new = {a_io: 4.2, a_cpu: 1.05, "q_x": 2.0}
    flagged, txt = _cap(bench_compare, old, new, tol=0.25)
    assert flagged == ["q_x"]
    assert "PROFILE SHIFT" not in txt  # x1.05 vs x1.05 agree


def test_cpu_anchor_absent_falls_back_to_single_anchor(bench_compare):
    """Pre-r10 records carry no CPU anchor — behavior must reduce to
    the r9 single-anchor protocol exactly (no adjcpu column)."""
    a_io = bench_compare.ANCHOR_DEFAULT
    old = {a_io: 4.0, "q_x": 1.0}
    new = {a_io: 5.0, "q_x": 1.25}
    flagged, txt = _cap(bench_compare, old, new, tol=0.1)
    assert flagged == []
    assert "adjcpu" not in txt


def test_spread_key_marks_delta_as_noise(bench_compare):
    """An adjusted delta below the recorded `_spread_pct` dispersion
    is noise by the r6 noise-floor doctrine — reported, not flagged."""
    old = {"q_x": 1.0, "q_x_spread_pct": 50.0}
    new = {"q_x": 1.4, "q_x_spread_pct": 20.0}
    flagged, txt = _cap(bench_compare, old, new, tol=0.25, anchor=None)
    assert flagged == []
    assert "noise" in txt
    # ...but a delta past both the tolerance and the spread flags
    new2 = {"q_x": 1.8, "q_x_spread_pct": 20.0}
    flagged2, _ = _cap(bench_compare, old, new2, tol=0.25, anchor=None)
    assert flagged2 == ["q_x"]


def test_tail_recovery_parses_driver_records(bench_compare, tmp_path):
    """Pre-r8 driver BENCH records (parsed: null, 2000-char tail of
    one huge JSON line) must yield per-query numbers by regex."""
    import json

    rec = {
        "n": 7,
        "rc": 0,
        "cpus": 32,
        "sf": 0.1,
        "tail": '_warm": 1.3388, "q6_revenue_filter": 0.3164, '
        '"q6_revenue_filter_spread_pct": 16.6}, "headline": '
        '{"convert_10m_rows": 2.12}}',
        "parsed": None,
    }
    p = tmp_path / "BENCH_rX.json"
    p.write_text(json.dumps(rec, indent=1))
    got = bench_compare.load(str(p))
    assert got["queries"]["q6_revenue_filter"] == 0.3164
    assert got["queries"]["convert_10m_rows"] == 2.12
    # meta fields must NOT masquerade as query timings
    assert "cpus" not in got["queries"]


def test_final_summary_line_parses_alone(bench_compare, tmp_path):
    """The r8 bench contract: stdout's LAST line is a complete,
    small JSON object (metric/value/unit/sf/headline) so the
    driver's tail always ends in parseable JSON — bench_compare
    must prefer it when the big line is truncated away."""
    big = '{"metric": "parquet_to_csv_10m_rows_job_sec", "value": 2.0'
    small = (
        '{"metric": "parquet_to_csv_10m_rows_job_sec", "value": 2.0, '
        '"unit": "sec", "sf": 0.1, '
        '"headline": {"convert_10m_rows": 2.0, '
        '"baseline_duckdb_convert_10m": 4.0}}'
    )
    p = tmp_path / "stdout.txt"
    p.write_text(big[:40] + "\n" + small + "\n")
    got = bench_compare.load(str(p))
    assert got["queries"]["baseline_duckdb_convert_10m"] == 4.0
    assert got["value"] == 2.0


def test_local_sibling_preferred_over_driver_tail(bench_compare, tmp_path):
    """r9 bench contract (VERDICT r8 item 1b): loading a driver
    BENCH_r{N}.json must use the committed complete
    BENCH_LOCAL_r{N}.json sibling ALONE (headline value falls back)
    — tail fragments must NOT merge in, or truncation-mangled
    fragment keys (the r8 'opk_bruteforce' artifact) become phantom
    queries in cross-round compares (review r9)."""
    import json

    # driver record: tail-mangled key (the r8 `opk_bruteforce`
    # artifact) + one key the local file lacks
    driver = {
        "n": 7,
        "rc": 0,
        "tail": '"opk_bruteforce": 1.0, "q_only_in_tail": 3.0, '
        '"q_shared": 9.99}}',
        "parsed": None,
    }
    local = {
        "value": 2.0,
        "queries": {
            "similarity_topk_bruteforce": 1.0,
            "q_shared": 1.23,
        },
        "headline": {"convert_10m_rows": 2.0},
    }
    (tmp_path / "BENCH_r09.json").write_text(json.dumps(driver, indent=1))
    (tmp_path / "BENCH_LOCAL_r9.json").write_text(json.dumps(local))
    got = bench_compare.load(str(tmp_path / "BENCH_r09.json"))
    # complete local map ONLY; no tail fragments, no phantom keys
    assert got["queries"]["q_shared"] == 1.23
    assert got["queries"]["similarity_topk_bruteforce"] == 1.0
    assert "opk_bruteforce" not in got["queries"]
    assert "q_only_in_tail" not in got["queries"]
    assert got["value"] == 2.0
    # no sibling -> plain driver-record behavior, unchanged
    got2 = bench_compare.load_one(str(tmp_path / "BENCH_r09.json"))
    assert got2["queries"]["q_shared"] == 9.99


def test_headline_carries_spread_protocol(bench):
    """VERDICT r8 item 1a: the headline convert_10m_rows key must
    ship with a `_spread_pct` dispersion key (source-pinned — the
    artifact is only produced by a full bench run)."""
    import inspect

    src = inspect.getsource(bench.main)
    assert '"convert_10m_rows_spread_pct"' in src
    assert "rr_samples" in src and "natural_samples" in src
    # and the full payload goes to the committed local record
    assert "_write_local_record(full_payload)" in src


def test_local_record_driver_runs_cannot_clobber_committed_name(
    bench, monkeypatch, tmp_path
):
    """VERDICT r10 item 5b: the driver's end-of-round bench re-run
    overwrote the builder's committed quiet-box BENCH_LOCAL record
    (230%-spread degraded-box artifact over the 40.7% record). The
    committed filename is now opt-in via SPARK_GRAFT_BENCH_COMMIT=1;
    any other run (the driver's) lands on a distinct, gitignored
    ``.driver.json`` name."""
    monkeypatch.setattr(bench, "REPO_DIR", str(tmp_path))
    monkeypatch.setenv("SPARK_GRAFT_ROUND", "11")
    monkeypatch.delenv("SPARK_GRAFT_BENCH_COMMIT", raising=False)
    p = bench._write_local_record({"k": 1})
    assert p.endswith("BENCH_LOCAL_r11.driver.json")
    monkeypatch.setenv("SPARK_GRAFT_BENCH_COMMIT", "1")
    p = bench._write_local_record({"k": 1})
    assert p.endswith("BENCH_LOCAL_r11.json")
    # the driver name must be gitignored so `git add -A` can't pick it up
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo_root, ".gitignore")) as f:
        assert "BENCH_LOCAL_r*.driver.json" in f.read()

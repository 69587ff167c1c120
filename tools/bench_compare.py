"""Per-query bench regression check between two bench JSON captures.

The driver records ``BENCH_r{N}.json`` each round; this diffs any two
(or a BENCH file vs a fresh ``python bench.py`` capture) and flags
regressions, so a round that speeds up the headline but quietly
doubles a secondary query gets caught.

Cross-run drift anchor (VERDICT r7 item 1): bench VMs differ in raw
speed round to round — r7 measured the identical DuckDB job +18%
slower than r6, and every untouched query drifted with it. A raw
old-vs-new delta therefore conflates VM drift with code. Both bench
runs time DuckDB converting the same 10M-row input on their own box
(``baseline_duckdb_convert_10m``), so the ratio of those two numbers
is a same-workload, Spark-independent measure of the VM speed change;
per-query deltas are normalized by it BEFORE flagging:

    drift    = anchor_new / anchor_old
    adjusted = (new / drift − old) / old

A query also carrying a ``<name>_spread_pct`` dispersion key (the r6
noise-floor protocol) is flagged only when the adjusted delta exceeds
BOTH the tolerance and the larger of the two runs' recorded spreads —
within-run dispersion marks deltas below it as VM noise by doctrine.

Two-anchor decomposition (r10, VERDICT r9 item 1): the IO-shaped
CSV-write anchor alone cannot tell a slow-disk box from a slow-CPU
box (it failed in opposite directions in r8 and r9). When both
records also carry ``baseline_duckdb_q1_agg`` (same 10M rows, pure
scan+aggregate, no file write), per-query deltas are adjusted under
BOTH drifts and a query is flagged only when NEITHER profile
explains it — min(adj_io, adj_cpu) must clear tolerance and spread.
Anchors disagreeing by >25% print a PROFILE SHIFT banner.

Input formats: a bench.py stdout capture (one or two JSON lines — the
final compact line added in r8 parses on its own), or a driver
``BENCH_r{N}.json`` record; when the driver's ``parsed`` field is
null (pre-r8 truncation), per-query numbers are recovered from the
stored 2000-char ``tail`` by regex.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--tol 0.25]
        [--anchor baseline_duckdb_convert_10m | --no-anchor]

Exit code 1 if any shared query slowed by more than --tol (default
25%, generous because local[32] job times jitter by scheduler noise)
after drift adjustment.
"""

from __future__ import annotations

import argparse
import json
import re
import sys

ANCHOR_DEFAULT = "baseline_duckdb_convert_10m"
# r10 (VERDICT r9 item 1): the second, CPU-shaped anchor. The single
# IO-shaped anchor failed to decompose a VM profile shift two rounds
# running (r8: anchor moved opposite to CPU-bound keys; r9: a
# degraded disk blew the anchor up 8x while CPU keys sat flat). With
# both anchors, a per-query delta is VM drift if EITHER profile's
# normalization explains it — a real code regression slows the query
# under both.
ANCHOR_CPU = "baseline_duckdb_q1_agg"

# driver-record fields that regex recovery must not mistake for
# query timings
_META_KEYS = {"n", "rc", "cpus", "sf", "value", "rows_10m"}


def _queries_from_tail(tail: str) -> dict[str, float]:
    """Recover ``"name": number`` pairs from a truncated stdout tail.

    The tail is the trailing window of one huge JSON line, so it is
    not parseable as JSON; the per-query keys it retains are still
    well-formed ``"key": 1.234`` fragments. Keys repeated by the
    trailing ``headline`` re-emit resolve to their LAST occurrence
    (identical values by construction)."""
    out: dict[str, float] = {}
    for m in re.finditer(r'"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', tail):
        name, val = m.group(1), float(m.group(2))
        if name not in _META_KEYS:
            out[name] = val
    return out


def _local_sibling(path: str) -> str | None:
    """For a driver ``BENCH_r{N}.json`` record, the committed
    complete per-query file ``BENCH_LOCAL_r{N}.json`` bench.py wrote
    during the same round's run (VERDICT r8 item 1b), if present."""
    import os

    m = re.match(r"BENCH_r0*(\d+)\.json$", os.path.basename(path))
    if not m:
        return None
    n = int(m.group(1))
    for cand in (
        f"BENCH_LOCAL_r{n}.json",
        f"BENCH_LOCAL_r{n:02d}.json",
    ):
        p = os.path.join(os.path.dirname(path), cand)
        if os.path.exists(p):
            return p
    return None


def load(path: str) -> dict:
    """Return a ``{"queries": {...}, "value": float|None}`` view of
    either a bench stdout capture or a driver BENCH record.

    A driver ``BENCH_r{N}.json`` is PREFERRED-MERGED with its
    committed ``BENCH_LOCAL_r{N}.json`` sibling when one exists
    (VERDICT r8 item 1b): the local file is the COMPLETE per-query
    map bench.py wrote to git during the same run, so its keys win
    (first-merged) and the truncated driver tail only fills gaps —
    cross-round comparison no longer leans on regex recovery of a
    2000-char window.

    MERGES every parseable record in the file instead of returning
    the first hit: an r8 bench capture holds TWO JSON lines — the big
    per-query line and the final compact summary whose `queries`
    field is only the ~8-key headline subset — and preferring one
    line would silently drop every secondary query from the
    comparison (the review-caught r8 bug: a doubled
    dedup_minhash_500k_docs would pass as "no regressions"). Driver
    records likewise merge `parsed` with a regex recovery over the
    stored tail, so keys the compact line lacks still surface."""
    local = _local_sibling(path)
    if local:
        # The committed record is COMPLETE by construction (bench.py
        # writes the whole per-query map), so the driver tail adds
        # nothing — and merging it would re-import truncation-mangled
        # fragment keys (the r8 tail starts mid-key: "opk_bruteforce")
        # as phantom queries (review r9). Only the headline `value`
        # falls back.
        base = load_one(local)
        if base["value"] is None:
            base["value"] = load_one(path)["value"]
        return base
    return load_one(path)


def load_one(path: str) -> dict:
    """``load`` for a single file, no sibling preference."""
    with open(path) as f:
        text = f.read().strip()
    # candidates: the whole file (driver records are pretty-printed
    # multi-line JSON), then each line in FILE ORDER (the big
    # per-query line precedes the compact summary; first-seen wins on
    # key collisions, and colliding values are identical by
    # construction anyway).
    candidates = [text] + [
        ln.strip() for ln in text.splitlines() if ln.strip()
    ]
    queries: dict[str, float] = {}
    value = None
    found = False

    def _merge(*maps: dict) -> None:
        for m in maps:
            for k, v in m.items():
                queries.setdefault(k, v)

    for cand in candidates:
        try:
            rec = json.loads(cand)
        except json.JSONDecodeError:
            continue
        if not isinstance(rec, dict):
            continue
        if "queries" in rec or "headline" in rec:
            found = True
            _merge(rec.get("queries", {}), rec.get("headline", {}))
            if value is None:
                value = rec.get("value")
        elif "tail" in rec:  # driver record
            found = True
            parsed = rec.get("parsed")
            if isinstance(parsed, dict):
                _merge(
                    parsed.get("queries", {}),
                    parsed.get("headline", {}),
                )
                if value is None:
                    value = parsed.get("value")
            _merge(_queries_from_tail(rec.get("tail", "")))
    if not found:
        raise ValueError(f"no parseable bench record in {path}")
    return {"queries": queries, "value": value}


def compare(
    old: dict,
    new: dict,
    tol: float = 0.25,
    anchor: str | None = ANCHOR_DEFAULT,
    anchor_values: tuple[float, float] | None = None,
    out=sys.stdout,
) -> list[str]:
    """Print the comparison table; return the flagged query names.

    ``anchor_values``: explicit (old, new) anchor seconds for records
    that predate the r8 summary line and lost the anchor key to the
    driver's 2000-char tail truncation (e.g. BENCH_r06's DuckDB
    calibration, 3.81 s per the r6 ledger)."""
    oq, nq = dict(old["queries"]), dict(new["queries"])
    if anchor and anchor_values:
        oq.setdefault(anchor, anchor_values[0])
        nq.setdefault(anchor, anchor_values[1])
    drift = 1.0
    if anchor and oq.get(anchor) and nq.get(anchor):
        drift = nq[anchor] / oq[anchor]
        print(
            f"drift anchor {anchor}: {oq[anchor]:.3f} -> "
            f"{nq[anchor]:.3f} (x{drift:.3f} VM speed change; "
            f"per-query deltas normalized by it)",
            file=out,
        )
    elif anchor:
        print(
            f"drift anchor {anchor} missing from one side — "
            f"raw deltas only",
            file=out,
        )
    # Two-anchor decomposition (r10): the CPU-shaped anchor rides
    # along whenever both records carry it. A query is flagged only
    # if NEITHER profile's drift explains its delta — min(adj_io,
    # adj_cpu) must clear tolerance and spread. When the two drifts
    # disagree by >25% the box's profile shifted (the r8/r9 failure
    # mode) and the header says so.
    drift_cpu: float | None = None
    if anchor and oq.get(ANCHOR_CPU) and nq.get(ANCHOR_CPU):
        drift_cpu = nq[ANCHOR_CPU] / oq[ANCHOR_CPU]
        print(
            f"cpu anchor {ANCHOR_CPU}: {oq[ANCHOR_CPU]:.3f} -> "
            f"{nq[ANCHOR_CPU]:.3f} (x{drift_cpu:.3f})",
            file=out,
        )
        if drift and max(drift, drift_cpu) / min(drift, drift_cpu) > 1.25:
            print(
                "PROFILE SHIFT: IO and CPU anchors disagree "
                f"(x{drift:.2f} vs x{drift_cpu:.2f}) — flagging only "
                "deltas unexplained by EITHER profile",
                file=out,
            )

    shared = sorted(set(oq) & set(nq))
    regressions: list[str] = []
    hdr = f"{'query':<36} {'old':>8} {'new':>8} {'raw':>8} {'adj':>8}"
    if drift_cpu is not None:
        hdr += f" {'adjcpu':>8}"
    print(hdr, file=out)
    for name in shared:
        o, n = oq[name], nq[name]
        raw = (n - o) / o if o else 0.0
        adj = (n / drift - o) / o if o else 0.0
        adj_cpu = (
            (n / drift_cpu - o) / o
            if (o and drift_cpu is not None)
            else None
        )
        # the flagging delta: VM drift if EITHER anchor explains it
        adj_eff = adj if adj_cpu is None else min(adj, adj_cpu)
        # `_spread_pct` keys are DISPERSION metadata (r6 noise-floor
        # protocol), `_`-prefixed keys are corpus-size metadata, and
        # the anchor/calibration keys time DUCKDB (the VM-speed
        # measure itself) — none is an engine job time, so none can
        # "regress".
        is_timing = not (
            name.endswith("_spread_pct")
            or name.startswith("_")
            or name == ANCHOR_DEFAULT
            or name == ANCHOR_CPU
            or name == "calibration_ratio_vs_duckdb"
        )
        spread = max(
            oq.get(f"{name}_spread_pct", 0.0),
            nq.get(f"{name}_spread_pct", 0.0),
        ) / 100.0
        flag = ""
        if is_timing and adj_eff > tol and adj_eff > spread:
            flag = "  << REGRESSION"
            regressions.append(name)
        elif is_timing and adj_eff > tol:
            flag = f"  (within {spread:.0%} spread — noise)"
        elif is_timing and adj > tol and adj_cpu is not None:
            flag = "  (CPU-drift explained)"
        line = (
            f"{name:<36} {o:>8.3f} {n:>8.3f} {raw:>+7.1%} "
            f"{adj:>+7.1%}"
        )
        if drift_cpu is not None:
            line += f" {adj_cpu:>+7.1%}"
        print(line + flag, file=out)
    for name in sorted(set(nq) - set(oq)):
        print(f"{name:<36} {'-':>8} {nq[name]:>8.3f}     new", file=out)
    for name in sorted(set(oq) - set(nq)):
        print(f"{name:<36} {oq[name]:>8.3f} {'-':>8}     removed", file=out)

    hv_o, hv_n = old.get("value"), new.get("value")
    if hv_o and hv_n:
        print(
            f"\nheadline: {hv_o:.3f} -> {hv_n:.3f} "
            f"({(hv_n - hv_o) / hv_o:+.1%} raw)",
            file=out,
        )
    return regressions


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tol", type=float, default=0.25)
    ap.add_argument("--anchor", default=ANCHOR_DEFAULT)
    ap.add_argument(
        "--no-anchor", action="store_true",
        help="raw deltas only (pre-r8 behavior)",
    )
    ap.add_argument(
        "--anchor-values", default=None,
        help="OLD,NEW anchor seconds for records whose anchor key "
        "was truncated away (pre-r8 driver tails)",
    )
    args = ap.parse_args()

    anchor_values = None
    if args.anchor_values:
        a, b = args.anchor_values.split(",")
        anchor_values = (float(a), float(b))
    regressions = compare(
        load(args.old),
        load(args.new),
        tol=args.tol,
        anchor=None if args.no_anchor else args.anchor,
        anchor_values=anchor_values,
    )
    if regressions:
        print(
            f"\n{len(regressions)} regression(s): "
            f"{', '.join(regressions)}"
        )
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())

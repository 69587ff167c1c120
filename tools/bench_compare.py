"""Per-query bench regression check between two bench JSON lines.

The driver records ``BENCH_r{N}.json`` each round; this diffs any two
(or a BENCH file vs a fresh ``python bench.py`` capture) and flags
regressions, so a round that speeds up the headline but quietly
doubles a secondary query gets caught.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--tol 0.25]

Exit code 1 if any shared query slowed by more than --tol (default
25%, generous because local[32] job times jitter by scheduler noise).
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        text = f.read().strip()
    # tolerate a file holding exactly one JSON line (driver format)
    return json.loads(text.splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--tol", type=float, default=0.25)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))
    regressions = []
    print(f"{'query':<32} {'old':>8} {'new':>8} {'delta':>8}")
    for name in shared:
        o, n = oq[name], nq[name]
        delta = (n - o) / o if o else 0.0
        flag = ""
        # `_spread_pct` keys are DISPERSION metadata (r6 noise-floor
        # protocol), `_`-prefixed keys are corpus-size metadata —
        # neither is a job time, so neither can "regress".
        is_timing = not (
            name.endswith("_spread_pct") or name.startswith("_")
        )
        if is_timing and delta > args.tol:
            flag = "  << REGRESSION"
            regressions.append(name)
        print(f"{name:<32} {o:>8.3f} {n:>8.3f} {delta:>+7.1%}{flag}")
    for name in sorted(set(nq) - set(oq)):
        print(f"{name:<32} {'-':>8} {nq[name]:>8.3f}     new")
    for name in sorted(set(oq) - set(nq)):
        print(f"{name:<32} {oq[name]:>8.3f} {'-':>8}     removed")

    hv_o, hv_n = old.get("value"), new.get("value")
    if hv_o and hv_n:
        print(f"\nheadline: {hv_o:.3f} -> {hv_n:.3f} ({(hv_n - hv_o) / hv_o:+.1%})")
    if regressions:
        print(f"\n{len(regressions)} regression(s): {', '.join(regressions)}")
        return 1
    print("\nno regressions")
    return 0


if __name__ == "__main__":
    sys.exit(main())

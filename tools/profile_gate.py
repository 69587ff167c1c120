"""Time individual registered queries at a given SF (default sf0.01).

Usage: python tools/profile_gate.py [--sf DIR] [--repeat N] name [name...]
Prints per-query wall seconds for plan+execute (count()), mirroring the
gate's cost shape without the DuckDB side.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from convert_parquet_to_csv_spark.plans import registry
    from convert_parquet_to_csv_spark.session import get_spark

    registry.load_all()
    spark = get_spark(master="local[8]")
    for name in args.names:
        fn = registry.QUERIES[name]
        for r in range(args.repeat):
            t0 = time.perf_counter()
            n = fn(spark, args.sf).count()
            dt = time.perf_counter() - t0
            print(f"{name} run{r}: {dt:.2f}s ({n} rows)", flush=True)


if __name__ == "__main__":
    main()

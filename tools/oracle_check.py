"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry on Spark and, where an oracle exists,
the matching SQL on DuckDB over the same parquet tables; compares
row count, schema (column names), and an order-insensitive value hash
with float normalization. Lets us find hash mismatches *before* the
round's official CORRECTNESS_r{N}.json does.

Usage: python tools/oracle_check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    """Normalize a value for hashing, tolerant of float representation."""
    import datetime as dt

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # round-trip repr at 12 significant digits absorbs ulp noise
        return f"{v:.12g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, dt.datetime):
        return v.isoformat()
    return str(v)


def frame_signature(cols: list[str], rows: list[tuple]) -> str:
    """Order-insensitive content hash with columns sorted by name."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from convert_parquet_to_csv_spark import get_spark

    spark = get_spark(app_name="oracle-check")
    qs, oracles = e.queries(), e.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name in names:
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, args.sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {ex}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only check, {len(srows)} rows "
                  f"({time.perf_counter()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = rel.columns
            drows = rel.fetchall()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            hs = frame_signature(scols, srows)
            hd = frame_signature(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                # show a diff sample
                s_set = set(
                    "\x1f".join(_norm_cell(r[i]) for i in
                                sorted(range(len(scols)), key=lambda i: scols[i]))
                    for r in srows)
                d_set = set(
                    "\x1f".join(_norm_cell(r[i]) for i in
                                sorted(range(len(dcols)), key=lambda i: dcols[i]))
                    for r in drows)
                only_s = list(s_set - d_set)[:3]
                only_d = list(d_set - s_set)[:3]
                for x in only_s:
                    print(f"        spark-only: {x[:200]}")
                for x in only_d:
                    print(f"        duck-only:  {x[:200]}")
        dt_s = time.perf_counter() - t0
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)} ({dt_s:.1f}s)")
            failures.append(name)
        else:
            print(f"PASS  {name}: {len(srows)} rows ({dt_s:.1f}s)")

    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

"""A/B harness: is the disk the confounder behind the 500k-doc
spill-heavy bench keys? (r10, VERDICT r9 "What's wrong" item 2 —
span_dedup_c4_500k_docs has been >2x its r8 level for two rounds on
boxes whose DuckDB CSV anchor also blew up, but "the disk did it"
stayed a hypothesis because no healthy box appeared.)

The experiment takes the disk out of the equation ON THE SAME BOX:
run the watch kernels once with the default ``spark.local.dir``
(shuffle/spill hits the degraded disk) and once with
``spark.local.dir=/dev/shm/...`` (tmpfs — RAM-backed, no disk in the
spill path). spark.local.dir is fixed at JVM start, so each variant
runs in its own subprocess. If the tmpfs run lands back at the
healthy-box (r8) level while the default run stays inflated, the
residual is the disk, not the code.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/disk_profile_ab.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def _docs_path() -> str:
    import hashlib

    key = hashlib.md5(SF_DIR.encode()).hexdigest()[:8]
    return f"/tmp/cptc_bench_docs500k_{key}.parquet"


def _child(local_dir: str | None) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from convert_parquet_to_csv_spark import get_spark
    from convert_parquet_to_csv_spark.operators.curation import (
        remove_duplicated_spans,
    )
    from convert_parquet_to_csv_spark.operators.dedup import (
        minhash_dedup,
    )
    from convert_parquet_to_csv_spark.sources import read_parquet

    extra = {"spark.sql.shuffle.partitions": CPUS}
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        extra["spark.local.dir"] = local_dir
    spark = get_spark(
        app_name="disk-ab",
        master=f"local[{CPUS}]",
        extra_conf=extra,
    )
    docs = read_parquet(spark, _docs_path())
    kernels = {
        "span_dedup_c4_500k": lambda: remove_duplicated_spans(
            docs, n=4, max_docs=2
        ),
        "minhash_500k": lambda: minhash_dedup(
            docs, num_perm=32, bands=8, threshold=0.5
        ),
    }
    out: dict[str, float] = {}
    for name, fn in kernels.items():
        best = float("inf")
        for _ in range(2):  # min-of-2, cache-cleared (curve protocol)
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        out[name] = round(best, 3)
    print("CHILD_RESULT " + json.dumps(out))


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        local_dir = sys.argv[i + 1] if len(sys.argv) > i + 1 else ""
        _child(local_dir or None)
        return
    if not os.path.exists(os.path.join(_docs_path(), "_SUCCESS")):
        raise SystemExit(
            f"500k corpus missing at {_docs_path()} — run bench.py first"
        )
    results: dict[str, dict[str, float]] = {}
    for label, local_dir in (
        ("disk", ""),
        ("tmpfs", "/dev/shm/cptc_disk_ab"),
    ):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", local_dir],
            capture_output=True,
            text=True,
            env=os.environ,
        )
        line = [
            ln
            for ln in proc.stdout.splitlines()
            if ln.startswith("CHILD_RESULT ")
        ]
        if not line:
            sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
            raise SystemExit(f"variant {label} failed")
        results[label] = json.loads(line[0][len("CHILD_RESULT "):])
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))
    for k in results["disk"]:
        d, t = results["disk"][k], results["tmpfs"][k]
        print(
            f"{k}: disk {d:.2f}s vs tmpfs {t:.2f}s "
            f"({d / t:.2f}x — {'DISK-BOUND' if d / t > 1.5 else 'cpu-bound'})"
        )


if __name__ == "__main__":
    main()

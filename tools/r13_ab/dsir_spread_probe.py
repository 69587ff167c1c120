"""dsir_importance_weights same-box spread probe (VERDICT r12 item 5 /
What's-wrong #4): the driver's r12 box read 4.30 s where the builder's
committed record read 1.43 s on the same tree. Adjudicate with the
exact treatment that closed the topk_ivf watch in r12: N same-session,
cache-cleared runs of the bench's own plan (`_dsir_plan`, xxhash64
flavor, sf0.1), reporting every sample + min + spread.

Usage: python tools/r13_ab/dsir_spread_probe.py [runs]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import _dsir_plan  # noqa: E402
from convert_parquet_to_csv_spark.session import (  # noqa: E402
    get_spark,
    pin_runtime_conf,
)

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 7


def main() -> None:
    spark = get_spark(
        app_name="dsir-spread-probe",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    samples = []
    for i in range(RUNS + 1):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        _dsir_plan(spark, "/root/testdata/sf0.1").write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        if i > 0:  # first pass is the untimed warmup
            samples.append(round(dt, 3))
    lo = min(samples)
    print(
        json.dumps(
            {
                "samples": samples,
                "min": lo,
                "spread_pct": round((max(samples) - lo) / lo * 100, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

"""One timed cache-cleared run of remove_duplicated_spans on the 500k
bench corpus — the per-process unit of the r13 g2-release A/B (run
alternately from the r12 worktree and the r13 tree; each process
prints one JSON line). sys.path[0] decides which tree's code runs.

Usage: python <tree>/tools/r13_ab/span_once.py [label] [runs]
"""

import json
import os
import sys
import time

TREE = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, TREE)

from convert_parquet_to_csv_spark.operators.curation import (  # noqa: E402
    remove_duplicated_spans,
)
from convert_parquet_to_csv_spark.session import (  # noqa: E402
    get_spark,
    pin_runtime_conf,
)
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet  # noqa: E402

LABEL = sys.argv[1] if len(sys.argv) > 1 else TREE
RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def main() -> None:
    spark = get_spark(
        app_name="span-once-" + LABEL,
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    docs = read_parquet(spark, "/tmp/cptc_bench_docs500k_ddbe1476.parquet")
    samples = []
    for _ in range(RUNS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        remove_duplicated_spans(docs, n=4, max_docs=2).write.format(
            "noop"
        ).mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 2))
    print(json.dumps({"label": LABEL, "tree": TREE, "samples": samples, "min": min(samples)}))


if __name__ == "__main__":
    main()

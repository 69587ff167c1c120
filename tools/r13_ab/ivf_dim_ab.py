"""Micro A/B for the r13 dim-unrolled cosine path (VERDICT r12 item
6): the bench's topk_ivf plan and the bruteforce gate plan with
dim=None (HOF zip_with/aggregate lambdas) vs dim=64 (unrolled codegen)
— same session, interleaved min-of-N. Sub-second keys; expect modest
deltas, the point is the plan shape (zip_with count drops to 0).

Usage: python tools/r13_ab/ivf_dim_ab.py [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from convert_parquet_to_csv_spark.operators import similarity as S  # noqa: E402
from convert_parquet_to_csv_spark.session import (  # noqa: E402
    get_spark,
    pin_runtime_conf,
)
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet  # noqa: E402

ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(
        app_name="ivf-dim-ab",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    vecs = read_parquet(spark, os.path.join(SF, "embeddings.parquet"))
    queries = vecs.filter(F.col("vec_id") < 5)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    variants = {
        "ivf_hof": lambda: S.topk_ivf(
            vecs, queries, k=3, n_centroids=16, nprobe=8
        ),
        "ivf_dim64": lambda: S.topk_ivf(
            vecs, queries, k=3, n_centroids=16, nprobe=8, dim=64
        ),
        "brute_hof": lambda: S.topk_bruteforce(vecs, queries, k=3),
        "brute_dim64": lambda: S.topk_bruteforce(
            vecs, queries, k=3, dim=64
        ),
    }
    res = {k: [] for k in variants}
    for i in range(ROUNDS + 1):
        for k, fn in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            noop(fn())
            if i > 0:  # round 0 is the untimed warmup
                res[k].append(round(time.perf_counter() - t0, 3))
    print(
        json.dumps(
            {"min": {k: min(v) for k, v in res.items()}, "samples": res}
        )
    )


if __name__ == "__main__":
    main()

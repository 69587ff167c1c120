"""Interleaved A/B for the r12 md5-featurization rewrite.

Times, at sf0.1 on the CURRENT working tree (run once on the old tree
via `git stash`, once on the new — or use the in-process toggle when
both forms live in the file):

  feat   — hashed_ngram_buckets(md5) -> groupBy(id,_b) counts, noop sink
  qtrain — the registered quality_classifier_train plan, noop sink
  dsir   — the registered dsir_importance_weights (md5 flavor), noop sink

Protocol: one untimed warmup per key, then N timed cache-cleared runs
interleaved across keys; report per-key min + all samples.

Usage: python tools/md5_featurize_ab.py --label new --repeat 3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from convert_parquet_to_csv_spark import get_spark  # noqa: E402
from convert_parquet_to_csv_spark.operators import curation as C  # noqa: E402
from convert_parquet_to_csv_spark.plans import registry  # noqa: E402
from convert_parquet_to_csv_spark.session import pin_runtime_conf  # noqa: E402
from convert_parquet_to_csv_spark.sources import read_parquet  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", required=True)
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    spark = get_spark(app_name=f"md5-ab-{args.label}", master="local[32]")
    pin_runtime_conf(spark)
    registry.load_all()

    docs = read_parquet(spark, os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )

    def run_feat():
        C.hashed_ngram_buckets(
            docs, num_buckets=512, hash_fn="md5"
        ).groupBy("doc_id", "_b").count().write.format("noop").mode(
            "overwrite"
        ).save()

    def run_qtrain():
        registry.QUERIES["quality_classifier_train"](spark, SF).write.format(
            "noop"
        ).mode("overwrite").save()

    def run_dsir():
        registry.QUERIES["dsir_importance_weights"](spark, SF).write.format(
            "noop"
        ).mode("overwrite").save()

    keys = [("feat", run_feat), ("qtrain", run_qtrain), ("dsir", run_dsir)]
    samples: dict[str, list[float]] = {k: [] for k, _ in keys}
    for it in range(args.repeat + 1):
        for name, fn in keys:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"{name} pass {it}")
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if it > 0:
                samples[name].append(dt)
    out = {
        "label": args.label,
        "sf": SF,
        "min": {k: round(min(v), 3) for k, v in samples.items()},
        "samples": {k: [round(x, 3) for x in v] for k, v in samples.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Stage decomposition of the dedup_minhash_500k_docs bench key
(VERDICT r12 item 2: 'stage decomposition first, then the cheapest
structural fix').

Times each stage of minhash_dedup separately by materializing the
pipeline cut-by-cut inside one session (cache cleared before each
round, min of N rounds per stage). The stage costs are CUMULATIVE cuts
re-run from cold so a stage's own cost = cut[i] - cut[i-1] computed on
the SAME round (box swings make cross-round subtraction meaningless).

Usage: python tools/r13_ab/minhash_stage_decomp.py [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from convert_parquet_to_csv_spark.operators.dedup import (  # noqa: E402
    _hashed_shingle_table,
    drop_near_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
)
from convert_parquet_to_csv_spark.session import (  # noqa: E402
    get_spark,
    pin_runtime_conf,
)
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet  # noqa: E402

DOCS = "/tmp/cptc_bench_docs500k_ddbe1476.parquet"  # sf0.1 bench corpus
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 2


def main() -> None:
    spark = get_spark(
        app_name="minhash-stage-decomp",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    docs = read_parquet(spark, DOCS)
    print("docs:", docs.count(), file=sys.stderr)

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    stages: dict[str, list[float]] = {
        "1_signatures": [],
        "2_candidates": [],
        "3_verify_sets": [],
        "4_verify_join_survivors": [],
        "total_pipeline": [],
    }
    counts: dict[str, int] = {}

    for r in range(ROUNDS):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        sigs = minhash_signatures(docs, k=3, num_perm=32).persist()
        noop(sigs)
        t1 = time.perf_counter()
        stages["1_signatures"].append(t1 - t0)

        cand = lsh_candidate_pairs(sigs, num_perm=32, bands=8, max_bucket=1000).persist()
        noop(cand)
        t2 = time.perf_counter()
        stages["2_candidates"].append(t2 - t1)

        ids = (
            cand.select(F.col("id_a").alias("doc_id"))
            .union(cand.select(F.col("id_b").alias("doc_id")))
            .distinct()
        )
        cand_docs = docs.join(F.broadcast(ids), "doc_id", "left_semi")
        need = (
            _hashed_shingle_table(cand_docs, "doc_id", "text", 3)
            .groupBy("doc_id")
            .agg(F.collect_set(F.col("_sh")).alias("_set"))
            .persist()
        )
        noop(need)
        t3 = time.perf_counter()
        stages["3_verify_sets"].append(t3 - t2)

        sa = need.select(F.col("doc_id").alias("id_a"), F.col("_set").alias("_sa"))
        sb = need.select(F.col("doc_id").alias("id_b"), F.col("_set").alias("_sb"))
        inter = F.size(F.array_intersect("_sa", "_sb"))
        verified = (
            cand.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("_i", inter)
            .withColumn(
                "jaccard",
                F.col("_i").cast("double")
                / (F.size("_sa") + F.size("_sb") - F.col("_i")).cast("double"),
            )
            .filter(F.col("jaccard") >= 0.5)
            .select("id_a", "id_b", "jaccard")
        )
        noop(drop_near_duplicates(docs, verified, "doc_id"))
        t4 = time.perf_counter()
        stages["4_verify_join_survivors"].append(t4 - t3)
        stages["total_pipeline"].append(t4 - t0)

        if r == 0:
            counts["sig_rows"] = sigs.count()
            counts["cand_pairs"] = cand.count()
            counts["verify_docs"] = need.count()

    out = {
        "min_sec": {k: round(min(v), 3) for k, v in stages.items()},
        "samples": {k: [round(x, 2) for x in v] for k, v in stages.items()},
        "counts": counts,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""A/B harness (r6): does pre-partitioning span-dedup's gram table on
the gram key — one exchange shared by the pre-screen groupBy and the
cand/hot joins — beat the shipped single-groupBy-exchange form at 2M
docs, where the candidate/hot tables (~2.27M rows) outgrow broadcast
and the joins go shuffle? Measured answer: NO (MIN over 3 interleaved
cache-cleared rounds: base 23.96 s, repart 27.65 s, repart+persist
24.55 s) — the explicit exchange ships the full (id, pos, gram)
payload while the groupBy exchange ships partially-aggregated
key/count pairs. Recorded in operators/curation.remove_duplicated_
spans' docstring. Build the 2M corpus first via tools/scale_curve.py.

Usage: python tools/span_repart_ab.py
"""

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from convert_parquet_to_csv_spark.session import get_spark
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet

SF_DIR = "/root/testdata/sf0.1"
N_DOCS = 2000000
key = hashlib.md5(f"{SF_DIR}:{N_DOCS}".encode()).hexdigest()[:8]
spark = get_spark(app_name="span-repart", master="local[32]",
                  extra_conf={"spark.sql.shuffle.partitions": "32"})
docs = read_parquet(spark, f"/tmp/cptc_curve_docs_{key}.parquet")
n, max_docs, id_col = 4, 2, "doc_id"

def plan(mode):
    arr = docs.select(id_col, F.split(F.col("text"), " ").alias("_a"))
    starts = F.when(F.size("_a") >= n, F.sequence(F.lit(0), F.size("_a") - n)).otherwise(F.array().cast("array<int>"))
    grams = arr.select(id_col, F.explode(starts).alias("pos"), F.col("_a")).select(
        id_col, "pos", F.xxhash64(F.expr(f"slice(_a, pos + 1, {n})")).alias("gram"))
    if mode in ("repart", "repart_persist"):
        grams = grams.repartition(32, "gram")
    if mode == "repart_persist":
        grams = grams.persist()
    cand = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("_ct")).filter(F.col("_ct") > max_docs).select("gram")
    hot = grams.join(cand, "gram").groupBy("gram").agg(F.count_distinct(F.col(id_col)).alias("_nd")).filter(F.col("_nd") > max_docs).select("gram")
    covered = grams.join(hot, "gram").select(F.col(id_col).alias("_cid"),
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (n-1))).alias("cpos")).distinct()
    cov = covered.groupBy("_cid").agg(F.collect_set("cpos").alias("_cov"))
    joined = arr.join(cov, F.col(id_col) == F.col("_cid"), "left")
    kept = F.expr(
        "filter(transform(_a, (w, i) -> CASE WHEN _cov IS NULL OR NOT "
        "array_contains(_cov, i) THEN w END), x -> x IS NOT NULL)")
    return joined.select(
        F.col(id_col),
        F.when(F.col("_a").isNull(), F.lit(None).cast("string")).otherwise(F.concat_ws(" ", kept)).alias("clean_text"),
        F.coalesce(F.size(kept), F.lit(0)).cast("bigint").alias("n_kept"),
        F.coalesce(F.size("_a") - F.size(kept), F.lit(0)).cast("bigint").alias("n_removed"))

times = {}
for r in range(3):
    for mode in ("base", "repart", "repart_persist"):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        plan(mode).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter()-t0
        times.setdefault(mode, []).append(dt)
        print(f"{mode}: {dt:.2f}s", flush=True)
for m, s in times.items():
    print(f"MIN {m}: {min(s):.2f}s  all={[round(x,1) for x in s]}", flush=True)

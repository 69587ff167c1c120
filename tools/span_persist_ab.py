"""A/B harness: does persisting remove_duplicated_spans' shared
subtrees (arr tokenize / grams explode) beat the current
recompute-twice cold path at 500k docs?

Interleaved min-of-2 per variant (VM steal-time doctrine from
bench.py). Uses the bench 500k corpus for the given SF_DIR; run AFTER
building it via bench.py (or this builds it).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/span_persist_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from convert_parquet_to_csv_spark import get_spark  # noqa: E402
from convert_parquet_to_csv_spark.sources import read_parquet  # noqa: E402

N = 4
MAX_DOCS = 2


def span_plan(docs, persist_arr: bool, persist_grams: bool):
    """Mirror of operators/curation.remove_duplicated_spans with
    optional persists on the two shared subtrees (the operator's
    docstring documents the production decision this measures)."""
    id_col, text_col = "doc_id", "text"
    arr = docs.select(id_col, F.split(F.col(text_col), " ").alias("_a"))
    if persist_arr:
        arr = arr.persist()
    starts = F.when(
        F.size("_a") >= N, F.sequence(F.lit(0), F.size("_a") - N)
    ).otherwise(F.array().cast("array<int>"))
    grams = arr.select(
        id_col, F.explode(starts).alias("pos"), F.col("_a")
    ).select(
        id_col,
        "pos",
        F.xxhash64(F.expr(f"slice(_a, pos + 1, {N})")).alias("gram"),
    )
    if persist_grams:
        grams = grams.persist()
    hot = (
        grams.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") > MAX_DOCS)
        .select("gram")
    )
    covered = (
        grams.join(hot, "gram")
        .select(
            F.col(id_col).alias("_cid"),
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (N - 1))
            ).alias("cpos"),
        )
        .distinct()
    )
    words = arr.select(id_col, F.posexplode("_a").alias("pos", "word"))
    joined = words.join(
        covered,
        (F.col(id_col) == F.col("_cid")) & (F.col("pos") == F.col("cpos")),
        "left",
    ).select(id_col, "pos", "word", "cpos")
    return joined.groupBy(id_col).agg(
        F.sum(F.when(F.col("cpos").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.count("cpos").cast("bigint").alias("n_removed"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="span-persist-ab",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    import hashlib

    path = "/tmp/cptc_bench_docs500k_{}.parquet".format(
        hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise SystemExit(f"build the 500k corpus first (bench.py): {path}")
    docs = read_parquet(spark, path)

    variants = {
        "baseline": (False, False),
        "persist_arr": (True, False),
        "persist_grams": (False, True),
        "persist_both": (True, True),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _round in range(2):
        for name, (pa, pg) in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            span_plan(docs, pa, pg).write.format("noop").mode(
                "overwrite"
            ).save()
            times[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"{name:14s} min={min(ts):7.2f}s  runs={[round(t,2) for t in ts]}")


if __name__ == "__main__":
    main()

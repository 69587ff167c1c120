"""A/B: simhash_pairs self-join vs r13 bucket-explode (the
lsh_candidate_pairs rewrite applied to its structural twin). Times the
full simhash_dedup pipeline and the pairs stage alone on the 500k
bench corpus; the legacy form is reconstructed inline (the r4/r5
persist+anti-join+self-join shape, verbatim from the r12 tree).

Usage: python tools/r13_ab/simhash_bucket_ab.py [rounds]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from convert_parquet_to_csv_spark.operators import dedup as D  # noqa: E402
from convert_parquet_to_csv_spark.session import (  # noqa: E402
    get_spark,
    pin_runtime_conf,
)
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet  # noqa: E402

DOCS = "/tmp/cptc_bench_docs500k_ddbe1476.parquet"
ROUNDS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def simhash_pairs_legacy(
    signatures, id_col="doc_id", max_hamming=3, chunks=4, max_bucket=1000
):
    width = 64 // chunks
    mask = (1 << width) - 1
    chunk_cols = F.array(*[
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), c * width)
            .bitwiseAND(F.lit(mask).cast("long"))
            .alias("cv"),
        )
        for c in range(chunks)
    ])
    chunked = signatures.select(
        id_col, "simhash", F.explode(chunk_cols).alias("_c")
    ).select(
        id_col, "simhash",
        F.col("_c.chunk").alias("_chunk"), F.col("_c.cv").alias("_cv"),
    ).persist()
    hot = (
        chunked.groupBy("_chunk", "_cv")
        .count()
        .filter(F.col("count") > max_bucket)
        .select("_chunk", "_cv")
    )
    chunked = chunked.join(hot, ["_chunk", "_cv"], "left_anti").persist()
    a = chunked.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("_sa"), "_chunk", "_cv"
    )
    b = chunked.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("_sb"), "_chunk", "_cv"
    )
    return (
        a.join(b, ["_chunk", "_cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= 3)
    )


def main() -> None:
    spark = get_spark(
        app_name="simhash-bucket-ab",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    docs = read_parquet(spark, DOCS)
    print("docs:", docs.count(), file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # equivalence at corpus scale
    sigs = D.simhash_signatures(docs).persist()
    sigs.count()
    a = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs_legacy(sigs).collect()}
    spark.catalog.clearCache()
    sigs = D.simhash_signatures(docs).persist()
    sigs.count()
    b = {(r.id_a, r.id_b, r.hamming) for r in D.simhash_pairs(sigs).collect()}
    assert a == b, f"{len(a)} vs {len(b)}, sym diff {len(a ^ b)}"
    print(f"equivalence OK: {len(a)} pairs identical", file=sys.stderr)
    spark.catalog.clearCache()

    res = {"pairs_legacy": [], "pairs_bucket": [], "dedup_legacy": [], "dedup_bucket": []}
    orig = D.simhash_pairs
    for _ in range(ROUNDS):
        spark.catalog.clearCache()
        s = D.simhash_signatures(docs).persist()
        noop(s)
        t0 = time.perf_counter()
        noop(simhash_pairs_legacy(s))
        res["pairs_legacy"].append(round(time.perf_counter() - t0, 2))

        spark.catalog.clearCache()
        s = D.simhash_signatures(docs).persist()
        noop(s)
        t0 = time.perf_counter()
        noop(D.simhash_pairs(s))
        res["pairs_bucket"].append(round(time.perf_counter() - t0, 2))

        spark.catalog.clearCache()
        D.simhash_pairs = simhash_pairs_legacy
        try:
            t0 = time.perf_counter()
            noop(D.simhash_dedup(docs))
            res["dedup_legacy"].append(round(time.perf_counter() - t0, 2))
        finally:
            D.simhash_pairs = orig
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(D.simhash_dedup(docs))
        res["dedup_bucket"].append(round(time.perf_counter() - t0, 2))
        print(json.dumps(res), file=sys.stderr)

    print(json.dumps({"min": {k: min(v) for k, v in res.items()}, "samples": res}))


if __name__ == "__main__":
    main()

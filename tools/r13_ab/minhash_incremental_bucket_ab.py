"""A/B: minhash_dedup_incremental's all×NEW banded join vs a
bucket-collect variant (the r13 lsh/simhash rewrite applied to the
incremental admission shape).

Variant: ONE groupBy(_band, _bh) collecting (id, new) members plus a
codegen has-new flag; buckets filtered to [2, max_bucket] AND
has-new (old-only buckets never explode), pairs exploded in-partition
with the same (~new_a | id_a < id_b) admission rule. Replaces
[persist ×2 + hot-count + anti-join + all×new join].

Usage: python tools/r13_ab/minhash_incremental_bucket_ab.py [n_docs] [rounds]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
import importlib.util

spec = importlib.util.spec_from_file_location(
    "scale_curve", "/root/repo/tools/scale_curve.py"
)
sc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sc)

from pyspark.sql import functions as F  # noqa: E402

from convert_parquet_to_csv_spark.operators import dedup as D  # noqa: E402
from convert_parquet_to_csv_spark.operators.dedup import (  # noqa: E402
    _hashed_shingle_table,
    minhash_signatures,
)
from convert_parquet_to_csv_spark.session import (  # noqa: E402
    get_spark,
    pin_runtime_conf,
)
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def incremental_bucket(
    df, is_new, id_col="doc_id", text_col="text", k=3, num_perm=32,
    bands=8, threshold=0.5, max_bucket=1000,
):
    flagged = df.withColumn("_new", is_new)
    sigs = minhash_signatures(flagged, id_col, text_col, k, num_perm).join(
        flagged.select(id_col, "_new"), id_col
    ).persist()
    r = num_perm // bands
    band_cols = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.xxhash64(*[F.col(f"h{j * r + i}") for i in range(r)]).alias("bh"),
        )
        for j in range(bands)
    ])
    banded = (
        sigs.select(id_col, "_new", F.explode(band_cols).alias("_b"))
        .select(
            id_col, "_new",
            F.col("_b.band").alias("_band"), F.col("_b.bh").alias("_bh"),
        )
    )
    buckets = (
        banded.groupBy("_band", "_bh")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("_i"), F.col("_new").alias("_n"))
            ).alias("_m"),
            F.max(F.col("_new").cast("int")).alias("_has_new"),
        )
        .filter(
            (F.size("_m") >= 2)
            & (F.size("_m") <= max_bucket)
            & (F.col("_has_new") == 1)
        )
        .select("_m")
    )
    cand = (
        buckets.select(F.explode("_m").alias("_a"), "_m")
        .select("_a", F.explode("_m").alias("_b"))
        .filter(F.col("_b._n"))
        .filter((~F.col("_a._n")) | (F.col("_a._i") < F.col("_b._i")))
        .filter(F.col("_a._i") != F.col("_b._i"))
        .select(F.col("_a._i").alias("id_a"), F.col("_b._i").alias("id_b"))
        .distinct()
        .persist()
    )
    ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    cand_docs = df.join(F.broadcast(ids), id_col, "left_semi")
    need = (
        _hashed_shingle_table(cand_docs, id_col, text_col, k)
        .groupBy(id_col)
        .agg(F.collect_set(F.col("_sh")).alias("_set"))
        .persist()
    )
    sa = need.select(F.col(id_col).alias("id_a"), F.col("_set").alias("_sa"))
    sb = need.select(F.col(id_col).alias("id_b"), F.col("_set").alias("_sb"))
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
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b")
    )
    matches = verified.groupBy("id_b").agg(
        F.min("id_a").cast("bigint").alias("matched_id")
    )
    new_rows = flagged.filter(F.col("_new")).select(id_col)
    return new_rows.join(
        matches, F.col(id_col).eqNullSafe(F.col("id_b")), "left"
    ).select(
        F.col(id_col),
        F.col("matched_id").isNull().alias("kept"),
        "matched_id",
    )


def main() -> None:
    spark = get_spark(
        app_name="minhash-inc-bucket-ab",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    docs = read_parquet(spark, sc._build_corpus(spark, N_DOCS))
    print("docs:", docs.count(), file=sys.stderr)
    is_new = (F.col("doc_id") % 7) == 0  # the scale-curve batch convention

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # equivalence
    a = {
        tuple(r)
        for r in D.minhash_dedup_incremental(docs, is_new).collect()
    }
    spark.catalog.clearCache()
    b = {tuple(r) for r in incremental_bucket(docs, is_new).collect()}
    assert a == b, f"{len(a)} vs {len(b)}, sym diff {len(a ^ b)}"
    print("equivalence OK:", len(a), "admission rows identical", file=sys.stderr)
    spark.catalog.clearCache()

    res = {"legacy": [], "bucket": []}
    for i in range(ROUNDS + 1):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(D.minhash_dedup_incremental(docs, is_new))
        if i > 0:
            res["legacy"].append(round(time.perf_counter() - t0, 2))
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(incremental_bucket(docs, is_new))
        if i > 0:
            res["bucket"].append(round(time.perf_counter() - t0, 2))
        print(json.dumps(res), file=sys.stderr)
    print(json.dumps({"n_docs": N_DOCS, "min": {k: min(v) for k, v in res.items()}, "samples": res}))


if __name__ == "__main__":
    main()

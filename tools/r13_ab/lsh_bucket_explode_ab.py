"""A/B: lsh_candidate_pairs self-join vs bucket-explode rewrite
(VERDICT r12 item 2 — the dedup_minhash_500k_docs structural fix).

Current shape (r4): banded table persisted TWICE (hot-bucket guard +
self-join sides), hot buckets removed by anti-join, pairs from a
bucket self-join, then distinct.

Candidate shape (r13): ONE groupBy(_band, _bh) collecting member ids,
filtered to 2 <= size <= max_bucket, pairs exploded from the member
list in-partition. Replaces [persist x2 + hot agg + anti-join +
self-join] with [one agg + double explode]; the collect_list buffer
is bounded by max_bucket. Pair set must be IDENTICAL (checked here).

Usage: python tools/r13_ab/lsh_bucket_explode_ab.py [rounds]
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


def lsh_pairs_bucket_explode(
    signatures, id_col="doc_id", num_perm=32, bands=8, max_bucket=1000
):
    r = num_perm // bands
    band_cols = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.xxhash64(*[F.col(f"h{j * r + i}") for i in range(r)]).alias("bh"),
        )
        for j in range(bands)
    ])
    banded = (
        signatures.select(id_col, F.explode(band_cols).alias("_b"))
        .select(id_col, F.col("_b.band").alias("_band"), F.col("_b.bh").alias("_bh"))
    )
    buckets = (
        banded.groupBy("_band", "_bh")
        .agg(F.collect_list(F.col(id_col)).alias("_ids"))
        .filter(
            (F.size("_ids") >= 2) & (F.size("_ids") <= max_bucket)
        )
        .select("_ids")
    )
    return (
        buckets.select(F.explode("_ids").alias("id_a"), "_ids")
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def main() -> None:
    spark = get_spark(
        app_name="lsh-bucket-explode-ab",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    docs = read_parquet(spark, DOCS)
    print("docs:", docs.count(), file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # --- equivalence first: identical pair sets from the same sigs
    sigs = D.minhash_signatures(docs, k=3, num_perm=32).persist()
    sigs.count()
    a = set(
        (r.id_a, r.id_b)
        for r in D.lsh_candidate_pairs(sigs, max_bucket=1000).collect()
    )
    b = set(
        (r.id_a, r.id_b)
        for r in lsh_pairs_bucket_explode(sigs, max_bucket=1000).collect()
    )
    assert a == b, f"pair sets differ: {len(a)} vs {len(b)}, sym diff {len(a ^ b)}"
    print(f"equivalence OK: {len(a)} pairs identical", file=sys.stderr)
    spark.catalog.clearCache()

    # --- timing: candidate stage alone (from re-persisted sigs), then
    # the full pipeline with each variant monkeypatched in.
    res = {
        "cand_selfjoin": [],
        "cand_bucket": [],
        "pipeline_selfjoin": [],
        "pipeline_bucket": [],
    }
    orig = D.lsh_candidate_pairs

    def patched(signatures, id_col="doc_id", num_perm=32, bands=8, max_bucket=1000):
        return lsh_pairs_bucket_explode(
            signatures, id_col, num_perm, bands, max_bucket
        )

    for _ in range(ROUNDS):
        # candidate stage alone: persist+materialize sigs outside the clock
        spark.catalog.clearCache()
        s = D.minhash_signatures(docs, k=3, num_perm=32).persist()
        noop(s)
        t0 = time.perf_counter()
        noop(D.lsh_candidate_pairs(s, max_bucket=1000))
        res["cand_selfjoin"].append(round(time.perf_counter() - t0, 2))

        spark.catalog.clearCache()
        s = D.minhash_signatures(docs, k=3, num_perm=32).persist()
        noop(s)
        t0 = time.perf_counter()
        noop(lsh_pairs_bucket_explode(s, max_bucket=1000))
        res["cand_bucket"].append(round(time.perf_counter() - t0, 2))

        # full pipeline, cold-cache (the bench key's shape)
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(D.minhash_dedup(docs, num_perm=32, bands=8, threshold=0.5))
        res["pipeline_selfjoin"].append(round(time.perf_counter() - t0, 2))

        spark.catalog.clearCache()
        D.lsh_candidate_pairs = patched
        try:
            t0 = time.perf_counter()
            noop(D.minhash_dedup(docs, num_perm=32, bands=8, threshold=0.5))
            res["pipeline_bucket"].append(round(time.perf_counter() - t0, 2))
        finally:
            D.lsh_candidate_pairs = orig
        print(json.dumps(res), file=sys.stderr)

    print(
        json.dumps(
            {"min": {k: min(v) for k, v in res.items()}, "samples": res}
        )
    )


if __name__ == "__main__":
    main()

"""Three-way A/B for the LSH candidate stage at 500k AND 2M docs:

  legacy        r4: persist x2 + hot anti-join + self-join of ALL <=mb buckets
  bucket        first r13 cut: collect_list over ALL (band,bh) groups + explode
  count_filter  r13 final: count per bucket (8-byte map-combinable state),
                keep 2..max_bucket buckets, self-join ONLY that slice

Motivation: the bucket form won at 500k (2.96->2.61 s stage) but lost
at 2M (mins 15.4 legacy vs 21.9 bucket) — on mangled corpora buckets
are overwhelmingly singletons and a collect_list buffer per group is
heavy aggregate state, while the legacy self-join pays sort/probe for
16M rows that emit nothing. count_filter removes both costs: the
count aggregate's state is a long per group, and only pair-productive
rows reach the join.

Usage: python tools/r13_ab/lsh_count_filter_ab.py [n_docs] [rounds]
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
from convert_parquet_to_csv_spark.session import (  # noqa: E402
    get_spark,
    pin_runtime_conf,
)
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet  # noqa: E402

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 2


def _banded(signatures, id_col, num_perm, bands):
    r = num_perm // bands
    band_cols = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.xxhash64(*[F.col(f"h{j * r + i}") for i in range(r)]).alias("bh"),
        )
        for j in range(bands)
    ])
    return (
        signatures.select(id_col, F.explode(band_cols).alias("_b"))
        .select(id_col, F.col("_b.band").alias("_band"), F.col("_b.bh").alias("_bh"))
    )


def lsh_pairs_legacy(signatures, id_col="doc_id", num_perm=32, bands=8, max_bucket=1000):
    banded = _banded(signatures, id_col, num_perm, bands).persist()
    hot = (
        banded.groupBy("_band", "_bh").count()
        .filter(F.col("count") > max_bucket).select("_band", "_bh")
    )
    banded = banded.join(hot, ["_band", "_bh"], "left_anti").persist()
    a = banded.select(F.col(id_col).alias("id_a"), "_band", "_bh")
    b = banded.select(F.col(id_col).alias("id_b"), "_band", "_bh")
    return (
        a.join(b, ["_band", "_bh"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def lsh_pairs_bucket(signatures, id_col="doc_id", num_perm=32, bands=8, max_bucket=1000):
    banded = _banded(signatures, id_col, num_perm, bands)
    buckets = (
        banded.groupBy("_band", "_bh")
        .agg(F.collect_list(F.col(id_col)).alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_bucket))
        .select("_ids")
    )
    return (
        buckets.select(F.explode("_ids").alias("id_a"), "_ids")
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def lsh_pairs_count_filter(signatures, id_col="doc_id", num_perm=32, bands=8, max_bucket=1000):
    banded = _banded(signatures, id_col, num_perm, bands).persist()
    good = (
        banded.groupBy("_band", "_bh")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter((F.col("_c") >= 2) & (F.col("_c") <= max_bucket))
        .select("_band", "_bh")
    )
    cand = banded.join(good, ["_band", "_bh"]).persist()
    a = cand.select(F.col(id_col).alias("id_a"), "_band", "_bh")
    b = cand.select(F.col(id_col).alias("id_b"), "_band", "_bh")
    return (
        a.join(b, ["_band", "_bh"]).filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


VARIANTS = {
    "legacy": lsh_pairs_legacy,
    "bucket": lsh_pairs_bucket,
    "count_filter": lsh_pairs_count_filter,
}


def main() -> None:
    spark = get_spark(
        app_name="lsh-count-filter-ab",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    path = sc._build_corpus(spark, N_DOCS)
    docs = read_parquet(spark, path)
    print("docs:", docs.count(), file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # equivalence across all three, once
    sigs = D.minhash_signatures(docs, k=3, num_perm=32).persist()
    sigs.count()
    sets = {}
    for name, fn in VARIANTS.items():
        sets[name] = {(r.id_a, r.id_b) for r in fn(sigs).collect()}
        spark.catalog.clearCache()
        sigs = D.minhash_signatures(docs, k=3, num_perm=32).persist()
        sigs.count()
    assert sets["legacy"] == sets["bucket"] == sets["count_filter"], {
        k: len(v) for k, v in sets.items()
    }
    print("equivalence OK:", len(sets["legacy"]), "pairs", file=sys.stderr)
    spark.catalog.clearCache()

    res = {f"pipeline_{k}": [] for k in VARIANTS}
    orig = D.lsh_candidate_pairs
    for _ in range(ROUNDS):
        for name, fn in VARIANTS.items():
            spark.catalog.clearCache()
            D.lsh_candidate_pairs = (
                lambda sigs, id_col="doc_id", num_perm=32, bands=8,
                max_bucket=1000, _f=fn: _f(sigs, id_col, num_perm, bands, max_bucket)
            )
            try:
                t0 = time.perf_counter()
                noop(D.minhash_dedup(docs, num_perm=32, bands=8, threshold=0.5))
                res[f"pipeline_{name}"].append(round(time.perf_counter() - t0, 2))
            finally:
                D.lsh_candidate_pairs = orig
        print(json.dumps(res), file=sys.stderr)
    print(
        json.dumps(
            {"n_docs": N_DOCS, "min": {k: min(v) for k, v in res.items()}, "samples": res}
        )
    )


if __name__ == "__main__":
    main()

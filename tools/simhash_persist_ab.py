"""A/B harness: does persisting simhash_pairs' anti-joined chunk
table (the self-join's double reference) beat recomputing the
anti-join per side? (ADVICE r5: lsh_candidate_pairs persists at both
points; simhash_pairs persisted only before the hot-bucket probe.)

Interleaved cache-cleared min-of-2 per variant (the bench.py VM
steal-time doctrine). Times the full dedup_simhash survivor count at
the given SF_DIR.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/simhash_persist_ab.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from convert_parquet_to_csv_spark import get_spark  # noqa: E402
from convert_parquet_to_csv_spark.operators import dedup as D  # noqa: E402
from convert_parquet_to_csv_spark.sources import read_parquet  # noqa: E402


def plan(docs, persist_after_anti: bool):
    """Mirror of simhash_signatures → simhash_pairs → survivors with
    the post-anti-join persist toggleable."""
    sigs = D.simhash_signatures(docs)
    chunks, max_hamming, max_bucket = 4, 3, 1000
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
    chunked = sigs.select(
        "doc_id", "simhash", F.explode(chunk_cols).alias("_c")
    ).select(
        "doc_id", "simhash",
        F.col("_c.chunk").alias("_chunk"), F.col("_c.cv").alias("_cv"),
    ).persist()
    hot = (
        chunked.groupBy("_chunk", "_cv")
        .count()
        .filter(F.col("count") > max_bucket)
        .select("_chunk", "_cv")
    )
    chunked = chunked.join(hot, ["_chunk", "_cv"], "left_anti")
    if persist_after_anti:
        chunked = chunked.persist()
    a = chunked.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sa"),
        "_chunk", "_cv",
    )
    b = chunked.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sb"),
        "_chunk", "_cv",
    )
    pairs = (
        a.join(b, ["_chunk", "_cv"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return D.drop_near_duplicates(docs, pairs, "doc_id")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark()
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    times: dict[bool, list[float]] = {True: [], False: []}
    for _round in range(2):
        for variant in (False, True):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            n = plan(docs, variant).count()
            times[variant].append(time.monotonic() - t0)
            print(f"persist_after_anti={variant}: "
                  f"{times[variant][-1]:.2f}s n={n}", flush=True)
    for variant in (False, True):
        print(f"MIN persist_after_anti={variant}: "
              f"{min(times[variant]):.2f}s")


if __name__ == "__main__":
    main()

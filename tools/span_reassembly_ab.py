"""A/B harness: word-stream vs array-native reassembly in
remove_duplicated_spans.

The r1-r4 form posexploded every word, left-joined the (broadcast)
coverage table, and reassembled documents with
``array_sort(collect_list(struct(pos, word)))`` on ONE doc-key
exchange — i.e. the full word corpus crossed an exchange as structs.
The array-native form (PRODUCTION since r5, this harness's measured
win: 5.9 vs 13.1 s at the sf0.01-derived 500k corpus, 6.1 vs 15.7 s
at the sf0.1-derived one) never explodes the word branch: it
aggregates covered positions per doc (shuffling ONLY covered
positions, typically boilerplate-sized), joins that small table back
to the tokenized docs at doc granularity, and filters the token array
with an index lambda. Trade: zero word-stream shuffle vs per-doc
``array_contains`` (O(len * cov) comparisons) running OUTSIDE
whole-stage codegen (HOF-lambda lesson, operators/dedup.py
``_hashed_shingle_table`` docstring) — the word-stream form is kept
inline here so the A/B re-runs against future corpora.

Both variants compute the FULL operator output (clean_text, n_kept,
n_removed) — clean_text construction is exactly the code being
compared, unlike span_persist_ab.py which could drop it.

Interleaved, cache-cleared, min-of-2 per variant (bench.py VM
steal-time doctrine). Requires the bench 500k corpus for SF_DIR.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/span_reassembly_ab.py
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from convert_parquet_to_csv_spark import get_spark  # noqa: E402
from convert_parquet_to_csv_spark.operators.curation import (  # noqa: E402
    remove_duplicated_spans,
)
from convert_parquet_to_csv_spark.sources import read_parquet  # noqa: E402

N = 4
MAX_DOCS = 2


def _grams_and_covered(docs, id_col="doc_id", text_col="text"):
    """Shared front half (identical in both variants): tokenize,
    hashed-gram heavy-hitter pass, per-(doc,pos) coverage."""
    arr = docs.select(id_col, F.split(F.col(text_col), " ").alias("_a"))
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
    return arr, covered


def word_stream(docs, id_col="doc_id"):
    """The r1-r4 production form, kept inline as the A/B baseline:
    posexplode every word, left-join coverage on (doc, pos),
    reassemble via array_sort(collect_list(struct)) on a doc-key
    exchange."""
    arr, covered = _grams_and_covered(docs, id_col)
    words = arr.select(id_col, F.posexplode("_a").alias("pos", "word"))
    joined = words.join(
        covered,
        (F.col(id_col) == F.col("_cid")) & (F.col("pos") == F.col("cpos")),
        "left",
    ).select(id_col, "pos", "word", "cpos")
    return joined.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.expr(
                "transform(array_sort(collect_list("
                "CASE WHEN cpos IS NULL THEN struct(pos, word) END"
                ")), x -> x.word)"
            ),
        ).alias("clean_text"),
        F.sum(F.when(F.col("cpos").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.count("cpos").cast("bigint").alias("n_removed"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="span-reassembly-ab",
        master=f"local[{cpus}]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    path = "/tmp/cptc_bench_docs500k_{}.parquet".format(
        hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raise SystemExit(f"build the 500k corpus first (bench.py): {path}")
    docs = read_parquet(spark, path)

    # Equivalence first: identical (doc_id, n_kept, n_removed,
    # clean_text) multiset or the timing is meaningless.
    a = word_stream(docs)
    b = remove_duplicated_spans(docs, n=N, max_docs=MAX_DOCS)
    mism = (
        a.select("doc_id", "clean_text", "n_kept", "n_removed")
        .exceptAll(b.select("doc_id", "clean_text", "n_kept", "n_removed"))
        .count()
    )
    if mism:
        raise SystemExit(f"variant outputs differ: {mism} rows only in baseline")
    print("equivalence: OK")

    variants = {
        "word_stream": lambda: word_stream(docs),
        "array_native": lambda: remove_duplicated_spans(
            docs, n=N, max_docs=MAX_DOCS
        ),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    for _round in range(2):
        for name, build in variants.items():
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            times[name].append(time.perf_counter() - t0)
            spark.catalog.clearCache()
    for name, ts in times.items():
        print(f"{name:14s} min={min(ts):7.2f}s  runs={[round(t, 2) for t in ts]}")


if __name__ == "__main__":
    main()

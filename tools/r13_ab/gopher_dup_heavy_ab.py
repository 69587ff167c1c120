"""Dup-heavy-corpus A/B for the r12 doc-keyed exchange consolidation
(VERDICT r12 item 3 / What's-wrong #2).

The r12 consolidation (curation.py `_gopher_gram_masses`,
`train_linear_classifier`) replaced partial-agg'd exchanges with ONE
raw-stream repartition(id). Its trade was ARGUED on crawl-shaped text
("gram keys ~unique within a doc" => forfeited map-side combine ~= 0)
but never measured on the adversarial shape: repetition-heavy text,
where per-(id,n,gh) combine compresses the first exchange most. This
tool builds that corpus — every doc is a short distinct token slice
repeated REPEATS times, so every within-doc gram occurs ~REPEATS
times — and interleave-times both forms.

Variants (min over ROUNDS, cache cleared per run, noop sink):
  masses_consolidated  _gopher_gram_masses(_consolidate=True)  [shipped]
  masses_legacy        _gopher_gram_masses(_consolidate=False) [pre-r12]
  counts_consolidated  b.repartition(id).groupBy(id,_b).agg    [shipped]
  counts_legacy        b.groupBy(id,_b).agg.repartition(id)    [pre-r12]

Usage: python tools/r13_ab/gopher_dup_heavy_ab.py [n_docs] [repeats] [rounds]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from convert_parquet_to_csv_spark.operators.curation import (  # noqa: E402
    _gopher_gram_masses,
    hashed_ngram_buckets,
)
from convert_parquet_to_csv_spark.session import (  # noqa: E402
    get_spark,
    pin_runtime_conf,
)
from convert_parquet_to_csv_spark.sources.io_ops import read_parquet  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
REPEATS = int(sys.argv[2]) if len(sys.argv) > 2 else 40
ROUNDS = int(sys.argv[3]) if len(sys.argv) > 3 else 2
PATH = f"/tmp/cptc_dupheavy_{N_DOCS}_{REPEATS}.parquet"


def _build(spark) -> str:
    """Each output doc: its source doc's first 8 tokens repeated
    REPEATS times (distinct across docs via the replica mangle, so the
    corpus-wide gram population stays diverse while WITHIN-doc gram
    counts are ~REPEATS — maximal map-side-combine leverage)."""
    if os.path.exists(os.path.join(PATH, "_SUCCESS")):
        return PATH
    import shutil

    shutil.rmtree(PATH, ignore_errors=True)
    base = read_parquet(spark, os.path.join(SF_DIR, "documents.parquet"))
    base_n = base.count()
    copies = max(1, -(-N_DOCS // base_n))
    rep = spark.range(copies).select(F.col("id").alias("_copy"))
    big = base.crossJoin(F.broadcast(rep)).select(
        (F.col("doc_id") * copies + F.col("_copy")).alias("doc_id"),
        F.concat_ws(
            " ",
            F.flatten(
                F.array_repeat(
                    F.slice(
                        F.split(
                            F.concat_ws(
                                "", F.col("text"), F.col("_copy").cast("string")
                            ),
                            " ",
                        ),
                        1,
                        8,
                    ),
                    REPEATS,
                )
            ),
        ).alias("text"),
    )
    big.repartition(32).write.mode("overwrite").parquet(PATH)
    return PATH


def main() -> None:
    spark = get_spark(
        app_name="gopher-dup-heavy-ab",
        master="local[32]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    pin_runtime_conf(spark)
    docs = read_parquet(spark, _build(spark))
    n = docs.count()
    ntok = docs.select(F.avg(F.size(F.split("text", " ")))).first()[0]
    print(f"docs={n} avg_tokens={ntok:.0f}", file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(fn):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        noop(fn())
        return round(time.perf_counter() - t0, 2)

    def counts_of(consolidated: bool):
        b = hashed_ngram_buckets(docs, "doc_id", "text", 4096, (1, 2), "xxhash64")
        if consolidated:
            return b.repartition("doc_id").groupBy("doc_id", "_b").agg(
                F.count(F.lit(1)).alias("_c")
            )
        return (
            b.groupBy("doc_id", "_b")
            .agg(F.count(F.lit(1)).alias("_c"))
            .repartition("doc_id")
        )

    variants = {
        "masses_consolidated": lambda: _gopher_gram_masses(
            docs, "doc_id", "text", _consolidate=True
        ),
        "masses_legacy": lambda: _gopher_gram_masses(
            docs, "doc_id", "text", _consolidate=False
        ),
        "counts_consolidated": lambda: counts_of(True),
        "counts_legacy": lambda: counts_of(False),
    }
    res = {k: [] for k in variants}
    for _ in range(ROUNDS):
        for k, fn in variants.items():
            res[k].append(timed(fn))
        print(json.dumps(res), file=sys.stderr)
    print(
        json.dumps(
            {
                "n_docs": n,
                "repeats": REPEATS,
                "avg_tokens": round(ntok),
                "min": {k: min(v) for k, v in res.items()},
                "samples": res,
            }
        )
    )


if __name__ == "__main__":
    main()

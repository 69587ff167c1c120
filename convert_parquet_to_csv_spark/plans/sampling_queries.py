"""Driver-checked queries for the sampling operator (Op-4)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators.sample import (
    sample_exact_n,
    sample_stratified_exact_n,
)
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet

# Deterministic "random" order shared by both engines: md5 of the key.
# The hash strategy exists exactly so the sample is oracle-checkable —
# RNG-based strategies can never hash-match a foreign engine
# (SURVEY.md §2 Op-4 semantic note).
_N = 1000


@query(
    "sample_exact_n_hash",
    oracle=f"""
    SELECT * FROM orders
    ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
    LIMIT {_N}
    """,
)
def sample_exact_n_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-n deterministic sample of orders via hash ordering.

    Physical plan is TakeOrderedAndProject: per-partition top-n heaps,
    no full shuffle — the scale-safe shape (SURVEY.md §4.4 warns off
    naive orderBy(rand()).limit at size).
    """
    df = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    return sample_exact_n(df, _N, strategy="hash", key_cols=["o_orderkey"])


@query(
    "sample_stratified_hash",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rn
      FROM documents
    ) WHERE rn <= 50
    """,
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified exact-n: 50 documents per language, hash-ordered so
    the picks are engine-independent (the "k docs per language"
    training-data op)."""
    df = read_parquet(spark, os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id", "lang", "source"
    )
    return sample_stratified_exact_n(
        df, strata_cols=["lang"], n=50, key_cols=["doc_id"]
    )


@query(
    "sample_exact_n_rand",
    oracle=f"""
    SELECT CAST({_N} AS BIGINT) AS n_sampled,
           CAST({_N} AS BIGINT) AS n_distinct_keys,
           CAST(0 AS BIGINT) AS n_foreign
    """,
)
def sample_exact_n_rand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded rand-strategy sample (the reference's own semantics,
    utils.py:73), gated as a single-row PROPERTY check (VERDICT r4
    item 8): DuckDB cannot replay Spark's RNG, so the picked rows are
    engine-specific — but the properties that make it a correct
    exact-n without-replacement sample are not. The oracle asserts
    exactly n rows came back (``n_sampled``), none twice
    (``n_distinct_keys``), and every one is a genuine orders row
    (``n_foreign`` via left-anti join = 0). The hash-strategy flavor
    (``sample_exact_n_hash``) keeps the full row-level value-hash
    oracle; the sampled-row plumbing itself is also pytest-pinned."""
    df = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    samp = sample_exact_n(df, _N, seed=721, strategy="rand")
    stats = samp.agg(
        F.count("*").cast("bigint").alias("n_sampled"),
        F.countDistinct("o_orderkey").cast("bigint").alias(
            "n_distinct_keys"
        ),
    )
    foreign = (
        samp.select("o_orderkey")
        .join(df.select("o_orderkey"), "o_orderkey", "left_anti")
        .agg(F.count("*").cast("bigint").alias("n_foreign"))
    )
    # 1-row × 1-row close — the allowlisted bounded-aggregate
    # crossJoin(broadcast(...)) pattern.
    return stats.crossJoin(F.broadcast(foreign))


# --- weighted sampling (Efraimidis-Spirakis, hash-derived uniforms) -------

_WEIGHTED_ORACLE = """
WITH s AS (
  SELECT doc_id, n_chars,
         (CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)
               AS BIGINT) + 0.5) / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, n_chars
FROM s
ORDER BY -ln(u) / CAST(n_chars AS DOUBLE), doc_id
LIMIT 50
"""


@query("sample_weighted_docs", oracle=_WEIGHTED_ORACLE)
def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (A-ES via exponential
    draws, operators/sample.sample_weighted_n): 50 documents chosen
    proportional to length. The uniform comes from md5(doc_id) — no
    RNG, so DuckDB draws the identical sample and the oracle checks
    the exact chosen row set. TakeOrderedAndProject physical shape:
    per-partition heaps, no global sort."""
    from convert_parquet_to_csv_spark.operators.sample import (
        sample_weighted_n,
    )

    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "n_chars")
    return sample_weighted_n(
        docs, n=50, weight_col="n_chars", key_cols=["doc_id"]
    )


# --- deterministic stratified train/val/test split ------------------------

_SPLIT_ORACLE = """
WITH r AS (
  SELECT lang, source,
         row_number() OVER (
            PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS n
  FROM documents
)
SELECT lang,
       CASE WHEN floor(n * 8 / 10) > floor((n - 1) * 8 / 10) THEN 'train'
            WHEN floor(n * 9 / 10) > floor((n - 1) * 9 / 10) THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM r GROUP BY lang, split
"""


@query("split_train_val_test", oracle=_SPLIT_ORACLE)
def split_train_val_test_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8/1/1 train/val/test split, stratified by language
    (operators/sample.split_train_val_test): Bresenham-interleaved
    dealing over the md5 order keeps every stratum's split sizes
    within one row of exact at every prefix — hash-threshold splits
    only achieve the ratio in expectation. No RNG, so the oracle deals
    the identical split."""
    from convert_parquet_to_csv_spark.operators.sample import (
        split_train_val_test,
    )

    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    out = split_train_val_test(
        docs, strata_cols=["lang"], key_cols=["doc_id"]
    )
    return out.groupBy("lang", "split").agg(F.count("*").alias("n_docs"))


# --- leakage-safe group-integrity split (r7 addition, day-one gated) ------

_GROUP_SPLIT_ORACLE = """
WITH sizes AS (
  SELECT source, COUNT(*) AS gn FROM documents GROUP BY source
), cum AS (
  SELECT source, gn,
         SUM(gn) OVER (
           ORDER BY md5(source), source) AS c,
         SUM(gn) OVER () AS t
  FROM sizes
), labeled AS (
  SELECT source,
         CASE WHEN c * 10 <= t * 8 THEN 'train'
              WHEN c * 10 <= t * 9 THEN 'val'
              ELSE 'test' END AS split
  FROM cum
)
SELECT l.split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_groups
FROM documents d JOIN labeled l USING (source)
GROUP BY l.split
"""


@query("split_group_safe", oracle=_GROUP_SPLIT_ORACLE)
def split_group_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe 8/1/1 split by SOURCE group (operators/sample.
    split_by_group): whole sources land in one split, so same-site
    near-duplicates can never straddle train and test — the
    contamination row-level splits structurally allow (and the split
    you actually want after dedup, with cluster ids as the group).
    Groups are hash-ordered and dealt by cumulative ROW MASS against
    exact integer thresholds; the oracle replays the cumsum and the
    threshold algebra. Reports per-split doc and group counts."""
    from convert_parquet_to_csv_spark.operators.sample import (
        split_by_group,
    )

    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    )
    out = split_by_group(docs, ["source"])
    return out.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_groups"),
    )

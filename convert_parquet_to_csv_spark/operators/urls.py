"""URL- and domain-level dedup — the pre-content dedup pass.

Web pipelines (RefinedWeb §3.1, CCNet) dedup by canonical URL before
any text-based dedup: a recrawl of the same page, or the same link
carrying different tracking parameters, is a duplicate detectable
from metadata alone — one string normalization plus one shuffle,
orders of magnitude cheaper than shingle/minhash passes, and it
shrinks the corpus those passes then run on.

Scale shape: :func:`url_dedup` is structurally identical to
``dedup.drop_exact_duplicates`` — one hash shuffle on the canonical
key, ``row_number`` rank-1 pruned by Spark's WindowGroupLimit
(map-side partial top-1, no full sort of the group). Domain census
is two partial-agg shuffles. Canonicalization itself is map-side
Column algebra (functions/web.py) — free at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from convert_parquet_to_csv_spark.functions.web import (
    url_canonicalize,
    url_registered_domain,
)


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """One survivor per canonical URL (min id — the repo's standard
    deterministic keep policy), with the canonical key attached.

    Returns the input columns + ``canonical_url``. A production
    deployment that wants registered-domain semantics beyond the
    simplified last-two-labels rule joins ``url_host`` against a
    broadcast public-suffix table here — the seam is the
    ``canonical_url`` projection, nothing downstream changes.
    """
    w = Window.partitionBy("canonical_url").orderBy(id_col)
    return (
        docs.withColumn("canonical_url", url_canonicalize(url_col))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def url_dup_groups(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-canonical-URL dedup report: (canonical_url, domain,
    n_docs, survivor_id) — the audit table a removal run cites.
    One partial-agg shuffle on the canonical key; min() gives the
    survivor without a window."""
    return (
        docs.select(
            F.col(id_col),
            url_canonicalize(url_col).alias("canonical_url"),
            url_registered_domain(url_col).alias("domain"),
        )
        .groupBy("canonical_url", "domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("survivor_id"),
        )
    )


def domain_census(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-registered-domain crawl profile: raw doc count, canonical
    URL count, and the duplicate fraction — the table that decides
    per-domain caps (a domain with dup_frac 0.9 is a crawler trap;
    one with 10⁶ canonical pages may still need a mixture cap).

    Two stages: per-(domain, canonical) counts (one shuffle), then
    per-domain rollup (second, smaller shuffle). ``dup_frac`` is the
    repo-standard one-closing-divide: (n_docs - n_canonical) /
    n_docs, both exact longs.
    """
    per_url = (
        docs.select(
            F.col(id_col),
            url_canonicalize(url_col).alias("canonical_url"),
            url_registered_domain(url_col).alias("domain"),
        )
        .groupBy("domain", "canonical_url")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return per_url.groupBy("domain").agg(
        F.sum("_n").cast("bigint").alias("n_docs"),
        F.count(F.lit(1)).cast("bigint").alias("n_canonical"),
        (
            (F.sum("_n") - F.count(F.lit(1))).cast("double")
            / F.sum("_n").cast("double")
        ).alias("dup_frac"),
    )

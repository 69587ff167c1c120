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


def blocklist_filter(
    docs: DataFrame,
    blocklist: list[str],
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-blocklist verdict per document (UT1/adult-list style,
    the RefinedWeb §3.1 URL-filtering stage): a document is blocked
    when its host equals a blocklist entry OR falls under one as a
    dot-suffix (``cdn.bad.example.org`` matches entry
    ``bad.example.org`` — the standard wildcard-subdomain semantics
    of domain blocklists).

    Scale shape: the host's dot-suffixes are generated per row
    (bounded by the label count, ≤~10 for real hosts — a transform
    over a sequence, map-side) and equi-joined against the BROADCAST
    blocklist (real lists are a few MB — UT1 is ~4M lines), so the
    corpus never shuffles: one explode bounded by labels×docs, one
    broadcast hash join, one per-doc min. No LIKE-per-entry scans —
    suffix-explode turns the wildcard match into an equi-join, which
    is the only shape that survives a million-entry list.

    ALL suffix lengths ≥ 1 are generated, so single-label hosts
    (intranet-style ``localhost``) neither crash the sequence
    arithmetic nor escape single-label entries — and a bare-TLD
    entry like ``org`` blocks everything under it, which IS the
    suffix semantics (the caller curates the list).

    Output: (id, host, blocked_by) — ``blocked_by`` is the
    alphabetically-first matching entry, NULL when the document is
    kept (deterministic under multi-entry matches).
    """
    from convert_parquet_to_csv_spark.functions.web import url_host

    spark = docs.sparkSession
    entries = spark.createDataFrame(
        [(e,) for e in sorted(set(blocklist))], "_entry string"
    )
    base = docs.select(
        id_col, url_host(url_col).alias("host")
    ).withColumn("_labels", F.split(F.col("host"), r"\."))
    suffixes = base.select(
        id_col,
        F.explode(
            F.expr(
                "transform(sequence(0, size(_labels) - 1), "
                "i -> array_join(slice(_labels, i + 1, "
                "size(_labels) - i), '.'))"
            )
        ).alias("_suffix"),
    )
    matches = (
        suffixes.join(
            F.broadcast(entries),
            suffixes["_suffix"] == entries["_entry"],
        )
        .groupBy(id_col)
        .agg(F.min("_entry").alias("blocked_by"))
    )
    return base.select(id_col, "host").join(
        matches, id_col, "left"
    ).select(id_col, "host", "blocked_by")


def url_keep_newest(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str = "fetch_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """Crawl-snapshot dedup, keep-NEWEST policy: group documents by
    canonical URL and elect the most recent fetch (max ``ts_col``,
    ties → min ``id_col``) — the CommonCrawl recrawl rule, where the
    latest snapshot of a page supersedes the rest (unlike
    :func:`url_dedup`'s min-id/first-crawled policy; both are one
    election away from the same canonical key). Output: one row per
    canonical URL — ``(canonical_url, n_crawls, kept_id, kept_ts)``.

    One groupBy on the canonical key with a struct-max argmax
    (max(struct(ts, −id)) — order-independent, map-side combinable,
    no window sort; the keep_best_per_cluster device on a timestamp).
    ``ts_col`` must be numeric or timestamp; ids numeric (the
    repo-wide convention)."""
    keyed = docs.select(
        url_canonicalize(url_col).alias("canonical_url"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    agg = keyed.groupBy("canonical_url").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_crawls"),
        F.max(
            F.struct(
                F.col("_ts").alias("_bts"),
                (-F.col("_id")).alias("_negid"),
            )
        ).alias("_b"),
    )
    return agg.select(
        "canonical_url",
        "n_crawls",
        (-F.col("_b._negid")).cast("bigint").alias("kept_id"),
        F.col("_b._bts").alias("kept_ts"),
    )


def robots_policy_filter(
    docs: DataFrame,
    policies: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Robots/AI-directive compliance filter: annotate every document
    with its host's crawl policy and the keep verdict. ``policies``
    is a per-HOST table ``(host, disallow_crawl, noai)`` — the
    distilled form a robots.txt/X-Robots-Tag ingestion job produces
    (parsing robots.txt itself is an ingest concern; this operator is
    the corpus-side enforcement join). A host absent from the table
    is ALLOWED — the robots default — via left join + coalesce
    FALSE, never a NULL verdict. ``kept`` = neither flag set.

    Scale shape: the policy table is host-cardinality (millions of
    rows at web scale, kilobytes here) — broadcast, so enforcement
    is one map-side hash join composed into the scan; the corpus
    never shuffles. Host extraction is the same Column algebra as
    every other URL operator (functions/web.py)."""
    from convert_parquet_to_csv_spark.functions.web import url_host

    base = docs.withColumn("host", url_host(url_col))
    pol = policies.select(
        "host",
        F.col("disallow_crawl").alias("_dc"),
        F.col("noai").alias("_na"),
    )
    joined = base.join(F.broadcast(pol), "host", "left")
    return joined.select(
        F.col(id_col),
        "host",
        F.coalesce(F.col("_dc"), F.lit(False)).alias("disallow_crawl"),
        F.coalesce(F.col("_na"), F.lit(False)).alias("noai"),
        (
            ~F.coalesce(F.col("_dc"), F.lit(False))
            & ~F.coalesce(F.col("_na"), F.lit(False))
        ).alias("kept"),
    )

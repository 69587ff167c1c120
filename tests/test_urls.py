"""URL canonicalization + URL/domain-level dedup (functions/web.py,
operators/urls.py) — spec-clause edge cases the synthetic fixture
can't all reach (fragments, mixed-case hosts, gclid, root path)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from convert_parquet_to_csv_spark.functions.web import (  # noqa: E402
    url_canonicalize,
    url_host,
    url_registered_domain,
)
from convert_parquet_to_csv_spark.operators import urls as U  # noqa: E402

CASES = [
    # (raw, canonical, host, domain)
    (
        "https://www.Example.COM/Path/To/Page/?utm_source=x&b=2&a=1#frag",
        "example.com/Path/To/Page?a=1&b=2",
        "example.com",
        "example.com",
    ),
    (
        "http://example.com/",
        "example.com",
        "example.com",
        "example.com",
    ),
    (
        "https://cdn.news.example.org/a?gclid=zzz&fbclid=yyy",
        "cdn.news.example.org/a",
        "cdn.news.example.org",
        "example.org",
    ),
    # scheme-less input, params already sorted, ref dropped
    (
        "www.site.net/x?a=1&ref=tw",
        "site.net/x?a=1",
        "site.net",
        "site.net",
    ),
    # path case preserved (RFC 3986), host case folded
    (
        "HTTPS://WWW.HOST.ORG/CaseSensitive",
        "host.org/CaseSensitive",
        "host.org",
        "host.org",
    ),
    # query only, all params tracking → no '?'
    (
        "https://h.io?utm_campaign=a&utm_medium=b",
        "h.io",
        "h.io",
        "h.io",
    ),
    # scheme-default ports elided regardless of scheme (spec step 4,
    # VERDICT r7): :443 and :80 collapse into the portless origin...
    (
        "https://example.com:443/x",
        "example.com/x",
        "example.com",
        "example.com",
    ),
    (
        "http://www.example.com:80/x?ref=a",
        "example.com/x",
        "example.com",
        "example.com",
    ),
    # ...but a NON-default port is a distinct origin and is kept.
    (
        "https://example.com:8080/x",
        "example.com:8080/x",
        "example.com:8080",
        "example.com:8080",
    ),
]


def test_url_canonicalize_spec_clauses(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _, _) in enumerate(CASES)],
        "i LONG, url STRING",
    )
    got = {
        r["i"]: (r["c"], r["h"], r["d"])
        for r in df.select(
            "i",
            url_canonicalize("url").alias("c"),
            url_host("url").alias("h"),
            url_registered_domain("url").alias("d"),
        ).collect()
    }
    for i, (_, canon, host, domain) in enumerate(CASES):
        assert got[i] == (canon, host, domain), (i, got[i])


def test_url_dedup_min_id_survivor(spark):
    rows = [
        (1, "https://www.a.com/x?utm_source=feed"),
        (2, "http://a.com/x/"),            # same canonical as 1
        (3, "https://a.com/x?page=2"),     # real param → distinct
        (4, "https://b.com/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING")
    surv = {r["doc_id"] for r in U.url_dedup(df).collect()}
    assert surv == {1, 3, 4}
    groups = {
        r["canonical_url"]: (r["n_docs"], r["survivor_id"])
        for r in U.url_dup_groups(df).collect()
    }
    assert groups["a.com/x"] == (2, 1)
    assert groups["a.com/x?page=2"] == (1, 3)


def test_domain_census_dup_frac(spark):
    rows = [
        (1, "https://www.a.com/x"),
        (2, "http://a.com/x"),
        (3, "https://a.com/y"),
        (4, "https://sub.b.org/only"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING")
    got = {
        r["domain"]: (r["n_docs"], r["n_canonical"], r["dup_frac"])
        for r in U.domain_census(df).collect()
    }
    assert got["a.com"] == (3, 2, (3 - 2) / 3)
    assert got["b.org"] == (1, 1, 0.0)


def test_blocklist_filter_suffix_semantics(spark):
    """Wildcard-subdomain matching: exact host, dot-suffix, NO
    partial-label match; multi-entry hits break ties to the
    alphabetically-first entry; www. is canonicalized off first."""
    rows = [
        (1, "https://bad.example.org/x"),        # exact entry match
        (2, "http://cdn.bad.example.org/y"),     # subdomain of entry
        (3, "https://notbad.example.org/z"),     # partial label: kept
        (4, "https://www.bad.example.org/w"),    # www-stripped exact
        (5, "https://clean.site.com/ok"),        # kept
        (6, "https://a.b.example.org/m"),        # two entries match
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING")
    bl = ["bad.example.org", "b.example.org", "a.b.example.org"]
    got = {
        r["doc_id"]: r["blocked_by"]
        for r in U.blocklist_filter(df, bl).collect()
    }
    assert got[1] == "bad.example.org"
    assert got[2] == "bad.example.org"
    assert got[3] is None          # 'notbad.example.org' != suffix
    assert got[4] == "bad.example.org"
    assert got[5] is None
    # host a.b.example.org matches both a.b.example.org and
    # b.example.org -> alphabetically first
    assert got[6] == "a.b.example.org"


def test_blocklist_filter_single_label_hosts_and_entries(spark):
    """Single-label hosts must not crash the suffix arithmetic
    (sequence(0, -1) counts DOWNWARD in Spark) and single-label
    entries must be matchable — including as a suffix of deeper
    hosts (bare-TLD semantics)."""
    rows = [
        (1, "http://localhost/page"),      # 1-label host, exact entry
        (2, "https://intranet/x"),         # 1-label host, kept
        (3, "https://a.bad/x"),            # 1-label entry as suffix
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, url STRING")
    got = {
        r["doc_id"]: r["blocked_by"]
        for r in U.blocklist_filter(df, ["localhost", "bad"]).collect()
    }
    assert got[1] == "localhost"
    assert got[2] is None
    assert got[3] == "bad"


def test_url_keep_newest_election(spark):
    rows = [
        # same canonical URL, three snapshots: newest (ts=30) wins
        (1, "https://a.com/x", 10),
        (2, "http://www.a.com/x/", 30),
        (3, "https://a.com/x?utm_source=z", 20),
        # ts tie → min id
        (4, "https://b.com/y", 7),
        (5, "https://b.com/y", 7),
        # singleton
        (6, "https://c.com/z", 1),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, url STRING, fetch_ts LONG"
    )
    got = {
        r["canonical_url"]: (r["n_crawls"], r["kept_id"], r["kept_ts"])
        for r in U.url_keep_newest(df).collect()
    }
    assert got["a.com/x"] == (3, 2, 30)
    assert got["b.com/y"] == (2, 4, 7)
    assert got["c.com/z"] == (1, 6, 1)


def test_robots_policy_filter_defaults_and_flags(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://blocked.com/a"),
            (2, "https://noai.org/b"),
            (3, "https://open.net/c"),
            (4, "https://unlisted.io/d"),  # absent host → allowed
        ],
        "doc_id LONG, url STRING",
    )
    policies = spark.createDataFrame(
        [
            ("blocked.com", True, False),
            ("noai.org", False, True),
            ("open.net", False, False),
        ],
        "host STRING, disallow_crawl BOOLEAN, noai BOOLEAN",
    )
    got = {
        r["doc_id"]: (
            r["host"],
            r["disallow_crawl"],
            r["noai"],
            r["kept"],
        )
        for r in U.robots_policy_filter(docs, policies).collect()
    }
    assert got[1] == ("blocked.com", True, False, False)
    assert got[2] == ("noai.org", False, True, False)
    assert got[3] == ("open.net", False, False, True)
    # the robots default: unlisted host is allowed, flags FALSE not NULL
    assert got[4] == ("unlisted.io", False, False, True)

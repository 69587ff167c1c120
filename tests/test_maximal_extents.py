"""operators/dedup.maximal_duplicated_extents vs a brute-force
pure-Python suffix reference: for random small corpora, every
reported extent must be a TRUE maximal duplicated substring (>= 2
occurrences corpus-wide counting within-doc repeats, not left- or
right-extendable, capped at k + w_cap tokens) — the Lee et al. 2022
suffix-array guarantee the k-gram-union islands can't give."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from convert_parquet_to_csv_spark.operators import dedup as D


def _ref_maximal(docs, k, w_cap):
    """Brute force: L(p) = longest common prefix of the (k+w_cap)-
    truncated suffix at p with ANY other suffix position; report
    (doc, p, p+L(p)) iff L(p) >= k and L(p-1) <= L(p)."""
    cap = k + w_cap
    sufs = []  # (doc, p, tuple of tokens)
    toks = {}
    for i, text in docs:
        if text is None:
            continue
        ts = text.split()
        toks[i] = ts
        for p in range(max(len(ts) - k + 1, 0)):
            sufs.append((i, p, tuple(ts[p : p + cap])))

    def lcp(a, b):
        n = 0
        for x, y in zip(a, b):
            if x != y:
                break
            n += 1
        return n

    L = {}
    for i, p, s in sufs:
        best = 0
        for j, q, t in sufs:
            if (i, p) != (j, q):
                best = max(best, lcp(s, t))
        L[(i, p)] = best
    out = set()
    for (i, p), l in L.items():
        if l >= k and L.get((i, p - 1), 0) <= l:
            out.add((i, p, p + l, l))
    return out


# "b\x01z" pins the array-vs-joined-string ordering divergence
# (review r9): \x01 is non-whitespace (survives \s+ tokenization)
# but sorts BELOW space, so a space-joined sort key would misorder
# suffixes and under-compute LCPs for neighbors like [b] vs [b\x01z].
_WORDS = ["a", "b", "c", "b\x01z"]
_docs_strategy = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14),
    ),
    min_size=1,
    max_size=4,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs_strategy, k=st.integers(2, 3))
def test_maximal_extents_match_bruteforce_suffix_reference(
    spark, docs, k
):
    rows = [
        (i, None if ts is None else " ".join(ts))
        for i, ts in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_toks"])
        for r in D.maximal_duplicated_extents(
            df, k=k, w_cap=4
        ).collect()
    }
    assert got == _ref_maximal(rows, k=k, w_cap=4)


def test_maximal_vs_islands_semantics(spark):
    """The refinement's point, pinned: two distinct duplicated
    6-grams overlapping in one doc make ONE island (union of covered
    positions) but TWO maximal extents — and neither reported extent
    over-claims text that isn't actually repeated."""
    df = spark.createDataFrame(
        [
            (1, "p1 p2 a b c d e f g h t1 t2"),
            (2, "a b c d e f x y"),          # left 6-gram source
            (3, "u v c d e f g h"),          # right 6-gram source
        ],
        "doc_id LONG, text STRING",
    )
    islands = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in D.duplicated_span_extents(df, k=6).collect()
        if r["doc_id"] == 1
    }
    spark.catalog.clearCache()  # islands persists its gram table
    maximal = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in D.maximal_duplicated_extents(df, k=6).collect()
        if r[0] == 1
    }
    assert islands == {(1, 2, 10)}  # one fused 8-token island
    assert maximal == {(1, 2, 8), (1, 4, 10)}  # two true 6-token runs


def test_lcp_identical_slices_full_cap(spark):
    """Two docs sharing MORE than k + w_cap tokens: every position in
    the long run must report the cap-clipped L = k + w_cap — the
    array_position-returns-0-on-absent trap (identical truncated
    suffixes have no `false` in the zipped equality array; without
    nullif the lcp came out -1 and every full-cap match vanished —
    caught by the sf0.01 gate, pinned here)."""
    run = " ".join(f"t{i}" for i in range(12))  # 12 shared tokens
    df = spark.createDataFrame(
        [(1, run + " endone"), (2, run + " endtwo")],
        "doc_id LONG, text STRING",
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_toks"])
        for r in D.maximal_duplicated_extents(
            df, k=3, w_cap=5  # cap = 8 < 12-token shared run
        ).collect()
    }
    ref = _ref_maximal(
        [(1, run + " endone"), (2, run + " endtwo")], k=3, w_cap=5
    )
    assert got == ref
    # positions 0..4 of both docs are cap-clipped 8-token extents
    assert (1, 0, 8, 8) in got and (2, 0, 8, 8) in got

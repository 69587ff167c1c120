"""Property-based cross-check of winnowing against an independent
pure-Python reference (md5 flavor — the only hash family both sides
can compute): for random corpora, Spark's selected (doc, pos, fp)
set must EQUAL the reference's robust-winnowing selection exactly,
and containment_pairs must equal the reference set arithmetic."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from convert_parquet_to_csv_spark.operators import dedup as D

_WORDS = [f"w{i}" for i in range(12)]  # tiny vocab → real collisions

_docs = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30),
    min_size=1,
    max_size=5,
)


def _md5_hash(gram_tokens: list[str]) -> int:
    s = " ".join(gram_tokens)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_winnow(toks: list[str], k: int, window: int) -> set:
    """Robust winnowing (Schleimer et al. §2.3): in each window of
    `window` gram hashes pick the minimum; ties pick the RIGHTMOST
    position. Docs with fewer grams than `window` use one window."""
    if len(toks) < k:
        return set()
    hashes = [
        _md5_hash(toks[p : p + k]) for p in range(len(toks) - k + 1)
    ]
    g = len(hashes)
    out = set()
    for start in range(max(g - window, 0) + 1):
        win = hashes[start : start + window]
        m = min(win)
        # rightmost occurrence of the min within the window
        rel = max(i for i, h in enumerate(win) if h == m)
        out.add((start + rel, m))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs, k=st.integers(2, 4), window=st.integers(1, 5))
def test_winnow_matches_python_reference(spark, docs, k, window):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in D.winnow_fingerprints(
            df, k=k, window=window, hash_fn="md5"
        ).collect()
    }
    want = {
        (i, pos, fp)
        for i, toks in enumerate(docs)
        for (pos, fp) in _ref_winnow(toks, k, window)
    }
    assert got == want


def _ref_shingle_set(toks: list[str], k: int) -> set:
    if not toks:
        return set()
    if len(toks) < k:
        return {" ".join(toks)}
    return {
        " ".join(toks[p : p + k]) for p in range(len(toks) - k + 1)
    }


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs, k=st.integers(2, 4))
def test_containment_matches_python_reference(spark, docs, k):
    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in D.containment_pairs(df, k=k, threshold=0.0).collect()
    }
    sets = {i: _ref_shingle_set(toks, k) for i, toks in enumerate(docs)}
    want = {}
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a == b or not sa:
                continue
            i = len(sa & sb)
            if i:  # inner-join semantics: zero-overlap pairs absent
                want[(a, b)] = i / len(sa)
    assert got == want

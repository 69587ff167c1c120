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


# --- r7: ExactSubstr extents vs a pure-Python reference -------------------

def _ref_extents(docs: list[list[str]], k: int, min_count: int) -> set:
    from collections import Counter

    cnt = Counter()
    for toks in docs:
        for p in range(len(toks) - k + 1):
            cnt[tuple(toks[p : p + k])] += 1
    out = set()
    for i, toks in enumerate(docs):
        cov = sorted({
            p + c
            for p in range(len(toks) - k + 1)
            if cnt[tuple(toks[p : p + k])] >= min_count
            for c in range(k)
        })
        start = prev = None
        for pos in cov + [None]:
            if start is None:
                start = prev = pos
            elif pos is not None and pos == prev + 1:
                prev = pos
            else:
                out.add((i, start, prev + 1, prev + 1 - start))
                start = prev = pos
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_docs, k=st.integers(2, 4), min_count=st.integers(2, 3))
def test_span_extents_match_python_reference(
    spark, docs, k, min_count
):
    """duplicated_span_extents == the reference for random corpora:
    total-count hotness (within-doc repeats), maximal island merge."""
    from convert_parquet_to_csv_spark.operators.dedup import (
        duplicated_span_extents,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_toks"])
        for r in duplicated_span_extents(
            df, k=k, min_count=min_count
        ).collect()
    }
    assert got == _ref_extents(docs, k, min_count)


# --- r7: BPE merge learning vs a pure-Python reference --------------------

def _ref_bpe(docs: list[list[str]], rounds: int) -> list:
    from collections import Counter

    vocab = Counter()
    for toks in docs:
        for w in toks:
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(rounds):
        pairs = Counter()
        for sy, f in vocab.items():
            for a, b in zip(sy, sy[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), wt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, wt))
        nv = Counter()
        for sy, f in vocab.items():
            out, i = [], 0
            while i < len(sy):
                if i + 1 < len(sy) and sy[i] == l and sy[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(sy[i])
                    i += 1
            nv[tuple(out)] += f
        vocab = nv
    return merges


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="ab", min_size=1, max_size=6),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    ),
    rounds=st.integers(1, 3),
)
def test_bpe_merges_match_python_reference(spark, docs, rounds):
    """bpe_learn_merges == tokenwise-greedy Sennrich BPE for random
    two-letter corpora — the alphabet maximizes l==r runs and merge
    chains, the case the string-replace device got wrong."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_learn_merges,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = [
        (r["l"], r["r"], r["pair_weight"])
        for r in bpe_learn_merges(df, rounds=rounds)
        .orderBy("rank")
        .collect()
    ]
    assert got == _ref_bpe(docs, rounds)

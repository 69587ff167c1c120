"""operators/chunking.wordpiece_encode vs an independent pure-Python
WordPiece reference: flavor-keyed vocab selection (mass-desc/key-asc
tiebreak, all singles kept), greedy longest-match-first segmentation,
and the per-doc rollup must agree row for row — including the word
clip, token-less docs, NULL text, and the lowercase fold."""

from __future__ import annotations

import functools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from convert_parquet_to_csv_spark.operators.chunking import (
    wordpiece_encode,
)


def _build_vocab(docs, V, P, W):
    occ = []
    for i, text in docs:
        if text is None:
            continue
        for w in text.strip().lower().split():
            occ.append((i, w[:W]))
    wf: dict[str, int] = {}
    for _, w in occ:
        wf[w] = wf.get(w, 0) + 1
    pc: dict[str, int] = {}
    for w, c in wf.items():
        for s in range(len(w)):
            for p in range(1, min(P, len(w) - s) + 1):
                key = ("^" if s == 0 else "#") + w[s : s + p]
                pc[key] = pc.get(key, 0) + c
    vocab = {k for k in pc if len(k) == 2}
    vocab |= {
        k
        for k, _ in sorted(
            ((k, m) for k, m in pc.items() if len(k) > 2),
            key=lambda x: (-x[1], x[0]),
        )[:V]
    }
    return vocab, occ


def _greedy(w, vocab, P):
    pos, n = 0, 0
    while pos < len(w):
        flavor = "^" if pos == 0 else "#"
        for p in range(min(P, len(w) - pos), 0, -1):
            if flavor + w[pos : pos + p] in vocab:
                break
        pos += p
        n += 1
    return n


def _ref_wordpiece(docs, V, P, W):
    vocab, occ = _build_vocab(docs, V, P, W)
    out = {i: [0, 0, None] for i, _ in docs}
    for i, w in occ:
        out[i][0] += 1
        out[i][1] += _greedy(w, vocab, P)
    for o in out.values():
        if o[0] > 0:
            o[2] = o[1] / o[0]
    return {i: tuple(o) for i, o in out.items()}


def _collect(spark, docs, V, P, W):
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    return {
        r["doc_id"]: (
            r["n_words"],
            r["n_pieces"],
            r["pieces_per_word"],
        )
        for r in wordpiece_encode(
            df, vocab_multi=V, max_piece_len=P, max_word_len=W
        ).collect()
    }


_DOCS = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet="ab x", min_size=0, max_size=40),
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_DOCS)
def test_wordpiece_matches_python_reference(spark, texts):
    docs = list(enumerate(texts))
    assert _collect(spark, docs, 4, 3, 8) == _ref_wordpiece(
        docs, V=4, P=3, W=8
    )


def test_wordpiece_flavor_split(spark):
    """Word-initial and continuation flavors are DISTINCT vocabulary
    entries: with V=1 exactly one multi-char pair survives the mass
    ranking, so a substring that is a piece in one flavor must fall
    back to singles in the other — pinned through the full rollup
    against the reference."""
    docs = [(1, "abab abab abba")]
    got = _collect(spark, docs, 1, 2, 8)
    ref = _ref_wordpiece(docs, V=1, P=2, W=8)
    assert got == ref


def test_wordpiece_clip_and_empty_contracts(spark):
    docs = [(1, "A" * 30), (2, "  "), (3, None)]
    got = _collect(spark, docs, 2, 4, 8)
    # lowercased 30-char word clips to 8 chars; the '#' flavor owns
    # the multi-piece mass ranking ('#aa' mass 6, '#aaa' mass 5 beat
    # every '^' multi at mass 1), so V=2 leaves NO word-initial
    # multi: greedy = ^a · #aaa · #aaa · #a = 4 pieces
    assert got[1][:2] == (1, 4)
    assert got[2][:2] == (0, 0)
    assert got[3][:2] == (0, 0)


def test_wordpiece_greedy_is_not_globally_optimal(spark):
    """Greedy longest-match-first emits MORE pieces than the optimal
    segmentation on this corpus — the semantic difference vs the
    unigram-LM Viterbi family, pinned so nobody 'optimizes' the fold
    into a DP. Vocabulary multis come out {'#ad','#bc','#bcd','^ab'};
    'abcde' greedy = ^ab·#c·#d·#e (4 pieces) vs optimal
    ^a·#bcd·#e (3) — verified by brute force over the same vocab."""
    docs = [(1, "abcde abdc ddda cad cd ed")]
    V, P, W = 4, 3, 8
    vocab, _ = _build_vocab(docs, V, P, W)

    def optimal(w):
        @functools.lru_cache(None)
        def f(pos):
            if pos == len(w):
                return 0
            flavor = "^" if pos == 0 else "#"
            best = 10**9
            for p in range(1, min(P, len(w) - pos) + 1):
                if flavor + w[pos : pos + p] in vocab:
                    best = min(best, 1 + f(pos + p))
            return best

        return f(0)

    assert _greedy("abcde", vocab, P) == 4
    assert optimal("abcde") == 3
    got = _collect(spark, docs, V, P, W)
    assert got == _ref_wordpiece(docs, V=V, P=P, W=W)


def test_three_families_agree_on_word_counts(spark):
    """The fertility-comparison invariant: all three subword
    families count the SAME whitespace words per doc (case folding
    never changes token boundaries), so their fertility numbers are
    directly comparable."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        unigram_lm_encode,
    )

    docs = [(1, "Alpha beta GAMMA beta"), (2, "x  y"), (3, "")]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    ulm = {
        r["doc_id"]: r["n_words"]
        for r in unigram_lm_encode(df, vocab_multi=4).collect()
    }
    wp = {
        r["doc_id"]: r["n_words"]
        for r in wordpiece_encode(df, vocab_multi=4).collect()
    }
    spark.catalog.clearCache()
    # WordPiece lowercases, unigram does not — word COUNTS are still
    # identical (case folding never changes token boundaries). BPE's
    # apply path reports only n_bpe_tokens; the comparison query
    # takes its n_words from token_count, the same whitespace rule.
    assert ulm == wp
    assert ulm == {1: 4, 2: 2, 3: 0}

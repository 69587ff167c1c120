"""operators/chunking.unigram_lm_encode vs an independent pure-Python
unigram-LM reference: seed-vocab selection (with the exact
mass-desc/piece-asc tiebreak), micro-nat quantization, and the
combined-integer Viterbi must agree row for row — including the
word-clip, token-less docs, NULL text, and tie-breaks toward fewer
pieces."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from convert_parquet_to_csv_spark.operators.chunking import (
    unigram_lm_encode,
)

_PEN = 100_000_000


def _ref_unigram(docs, V, P, W):
    occ = []
    for i, text in docs:
        if text is None:
            continue
        for w in text.strip().split():
            occ.append((i, w[:W]))
    wf: dict[str, int] = {}
    for _, w in occ:
        wf[w] = wf.get(w, 0) + 1
    pc: dict[str, int] = {}
    for w, c in wf.items():
        for s in range(len(w)):
            for p in range(1, min(P, len(w) - s) + 1):
                pc[w[s : s + p]] = pc.get(w[s : s + p], 0) + c
    singles = {s: m for s, m in pc.items() if len(s) == 1}
    multis = sorted(
        ((s, m) for s, m in pc.items() if len(s) > 1),
        key=lambda x: (-x[1], x[0]),
    )[:V]
    vocab = dict(singles)
    vocab.update(dict(multis))
    mt = sum(vocab.values())
    cost = {
        s: int(math.floor(1e6 * math.log(mt / m) + 0.5))
        for s, m in vocab.items()
    }

    def viterbi(w):
        best = [0] * (len(w) + 1)
        for i in range(1, len(w) + 1):
            best[i] = min(
                best[i - p]
                + cost.get(w[i - p : i], _PEN) * 1024
                + 1
                for p in range(1, min(P, i) + 1)
            )
        return best[len(w)]

    out = {}
    for i, text in docs:
        out[i] = [0, 0, 0, None]
    for i, w in occ:
        comb = viterbi(w)
        o = out[i]
        o[0] += 1
        o[1] += comb % 1024
        o[2] += comb // 1024
    for i, o in out.items():
        if o[0] > 0:
            o[3] = o[1] / o[0]
    return {i: tuple(o) for i, o in out.items()}


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
def test_unigram_lm_matches_python_reference(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (
            r["n_words"],
            r["n_pieces"],
            r["total_cost_micro"],
            r["pieces_per_word"],
        )
        for r in unigram_lm_encode(
            df, vocab_multi=4, max_piece_len=3, max_word_len=8
        ).collect()
    }
    assert got == _ref_unigram(docs, V=4, P=3, W=8)


def test_unigram_prefers_fewer_pieces_on_cost_ties(spark):
    """The combined cost·1024+pieces encoding: a hot whole word must
    encode as ONE piece, and the per-word DP must be optimal (the
    brute-force check below enumerates every segmentation)."""
    from itertools import product

    docs = [(1, "abab abab abab ab"), (2, "ababab")]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["n_pieces"], r["total_cost_micro"])
        for r in unigram_lm_encode(
            df, vocab_multi=3, max_piece_len=4, max_word_len=8
        ).collect()
    }
    ref = _ref_unigram(docs, V=3, P=4, W=8)
    assert got == {i: (r[1], r[2]) for i, r in ref.items()}
    # 'abab' is in the top-3 multi pieces -> encodes as one piece
    assert got[1][0] == 3 * 1 + 1  # three 1-piece 'abab' + one 'ab'


def test_unigram_clip_and_empty_contracts(spark):
    df = spark.createDataFrame(
        [(1, "a" * 30), (2, "  "), (3, None)],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_pieces"])
        for r in unigram_lm_encode(
            df, vocab_multi=2, max_piece_len=4, max_word_len=8
        ).collect()
    }
    # 30-char word clips to 8 chars; top-2 multis are 'aa' (mass 7)
    # and 'aaa' (mass 6), so optimal is 'aaa'+'aaa'+'aa' = 3 pieces
    # (2·ln(21/6)+ln(21/7) < 4·ln(21/7) micro-nats)
    assert got[1] == (1, 3)
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)

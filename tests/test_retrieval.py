"""operators/retrieval.bm25_topk vs a pure-Python BM25 reference:
collection statistics (N over ALL docs, avgdl, Lucene non-negative
idf), per-term micro rounding, BIGINT score sums, and the
(score DESC, id ASC) top-k tie-break must agree row for row."""

from __future__ import annotations

import math

from convert_parquet_to_csv_spark.operators.retrieval import bm25_topk

K1, B = 1.2, 0.75


def _ref_bm25(docs, queries, k, max_q=8, micro=1_000_000):
    toks = {
        i: [t for t in (tx or "").strip().lower().split() if t]
        for i, tx in docs
    }
    n = len(docs)
    dl = {i: len(ts) for i, ts in toks.items()}
    avgdl = sum(dl.values()) / n
    tf: dict[tuple[int, str], int] = {}
    for i, ts in toks.items():
        for t in ts:
            tf[(i, t)] = tf.get((i, t), 0) + 1
    df: dict[str, int] = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    idf = {
        t: int(
            math.floor(
                math.log((n - d + 0.5) / (d + 0.5) + 1.0) * micro + 0.5
            )
        )
        for t, d in df.items()
    }
    out = []
    for qid, qtx in queries:
        qts = []
        for t in (qtx or "").strip().lower().split()[:max_q]:
            if t not in qts:
                qts.append(t)
        scores: dict[int, int] = {}
        for (i, t), f in tf.items():
            if t not in qts:
                continue
            denom = f + K1 * ((1.0 - B) + B * dl[i] / avgdl)
            c = int(
                math.floor(idf[t] * (f * (K1 + 1.0)) / denom + 0.5)
            )
            scores[i] = scores.get(i, 0) + c
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        for r, (i, s) in enumerate(ranked, 1):
            out.append((qid, r, i, s, s / micro))
    return sorted(out)


def test_bm25_matches_python_reference(spark):
    docs = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat"),
        (3, "cat cat cat dog"),
        (4, "penguin colony antarctica"),
        (5, ""),            # token-less: holds an avgdl slot only
        (6, None),          # NULL text: same
        (7, "the the the the the the"),
    ]
    queries = [(100, "cat dog"), (200, "penguin"), (300, "zzz")]
    ddf = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    qdf = spark.createDataFrame(
        queries, "query_id LONG, qtext STRING"
    )
    got = sorted(
        (
            r["query_id"],
            r["rank"],
            r["doc_id"],
            r["score_micro"],
            r["score"],
        )
        for r in bm25_topk(ddf, qdf, k=3).collect()
    )
    assert got == _ref_bm25(docs, queries, k=3)
    # the no-match query must be absent entirely
    assert not any(q == 300 for q, *_ in got)


def test_bm25_rare_term_outranks_stopword(spark):
    """idf direction: the doc matching the rare term must outrank
    docs matching only the ubiquitous one."""
    docs = [
        (1, "common common rareword"),
        (2, "common common common"),
        (3, "common stuff here"),
    ]
    ddf = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    qdf = spark.createDataFrame(
        [(9, "rareword common")], "query_id LONG, qtext STRING"
    )
    rows = {
        r["doc_id"]: r["rank"] for r in bm25_topk(ddf, qdf, k=3).collect()
    }
    assert rows[1] == 1


def test_bm25_rerank_topk_semantics(spark):
    """Hybrid retrieval (r10): BM25 recalls lexical candidates, the
    cosine re-rank REORDERS them — a candidate that is lexically
    weaker but semantically closer must win; rows without embeddings
    drop from the re-rank (inner-join contract)."""
    from convert_parquet_to_csv_spark.operators.retrieval import (
        bm25_rerank_topk,
    )

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),            # the query doc
            (2, "apple banana cherry date"),       # strong lexical
            (3, "apple banana other words here"),  # weaker lexical
            (4, "apple something else entirely"),  # weakest
            (5, "no shared terms at all"),         # out of candidates
        ],
        "doc_id LONG, text STRING",
    )
    queries = spark.createDataFrame(
        [(1, "apple banana cherry")], "query_id LONG, qtext STRING"
    )
    # embeddings: doc 3 is semantically CLOSEST to the query; doc 4
    # has NO embedding and must drop from the re-rank output.
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.5, 0.8, 0.0]),
            (3, [0.99, 0.1, 0.0]),
            (5, [0.0, 0.0, 1.0]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = bm25_rerank_topk(
        docs, queries, vecs, m=4, k=4, max_query_terms=8
    ).collect()
    got = [(r["rank"], r["doc_id"]) for r in sorted(rows, key=lambda r: r["rank"])]
    # BM25 candidates: 1 (self), 2, 3, 4 — doc 4 drops (no vector);
    # cosine order: self (1.0) > 3 (0.99..) > 2
    assert got == [(1, 1), (2, 3), (3, 2)]
    by_doc = {r["doc_id"]: r for r in rows}
    # provenance rides along: doc 2 beat doc 3 lexically
    assert by_doc[2]["bm25_rank"] < by_doc[3]["bm25_rank"]
    assert all(r["bm25_score_micro"] > 0 for r in rows)

"""Lexical retrieval over the corpus: BM25 top-k scoring.

The retrieval complement of the curation stack (reference scope:
the engine's documents table is the corpus a training-data pipeline
both filters AND queries — dedup mining, contamination forensics,
and eval-set construction all issue "find the documents most like
this text" lookups). BM25 (Robertson & Spärck Jones probabilistic
relevance framework; the Okapi BM25 form) is the standard lexical
scorer: idf-weighted term frequency with saturation (k1) and
document-length normalization (b).

Determinism contract (the DSIR/ULM integer device): idf is rounded
ONCE per distinct term to integer micro-nats at model scale, each
(query, doc, term) contribution is rounded to an integer micro unit
(floor(x + 0.5) — the quantize_int8 cross-engine rounding device),
and the per-doc score is a BIGINT sum — order-independent across
engines and partitionings. The only floats are one division per
(doc, term) pair over exact-integer inputs plus the avgdl ratio,
IEEE-identical in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from convert_parquet_to_csv_spark.functions.text import tokens


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    max_query_terms: int = 8,
    micro: int = 1_000_000,
) -> DataFrame:
    """BM25 top-k documents per query: ``(query_id, rank, doc_id,
    score_micro, score)``, rank 1..k by (score DESC, doc_id ASC).

    Model: N = |docs| (ALL rows, token-less included — they hold a
    slot in the collection statistics but never appear in postings),
    dl = per-doc token count, avgdl = Σdl / N (one DOUBLE ratio),
    df = per-term document frequency, idf_micro = floor(1e6 ·
    ln((N − df + 0.5)/(df + 0.5) + 1) + 0.5) — the +1 inside the ln
    is the Lucene-standard non-negative idf. Per matching (query,
    doc, term): contribution = idf · tf·(k1+1) / (tf + k1·(1 − b +
    b·dl/avgdl)), rounded to an integer micro unit; per-doc score =
    the BIGINT sum. Query terms are the DISTINCT tokens among the
    first ``max_query_terms`` tokens of each query text (a bounded
    query vocabulary — retrieval queries are short by construction).

    Plan shape: ONE corpus exchange — the (doc, term) tf groupBy
    (dl rolls up from it doc-keyed); df/idf are model-scale; the
    query-term table is DISTINCT'd and BROADCAST into the postings
    (the corpus never reshuffles for the query side); the N/avgdl
    statistics close as a 1-row broadcast; top-k runs as a
    per-query-partition window over the matched (query, doc) table —
    WindowGroupLimit pushes the rank filter below the exchange. At
    100 TB the postings table is the classic inverted-index build
    (bucket it by term once, serve many query batches against the
    same layout); hot stop-terms are exactly the AQE skew-join case,
    and a df ceiling (drop terms with df > xN) is the standard
    guard — not needed at fixture vocabulary sizes.

    Measured scale curve (tools/scale_curve.py, mangled sf0.1
    replicas, FIXED 24-query side, min-of-2, local[32]): 8.2 /
    12.1 / 27.4 s at 500k/1M/2M docs — 0.84×-linear; the tail is
    the postings×query join growing with the corpus while the
    query side stays fixed, the intended production shape.
    """
    tf = (
        docs.select(
            F.col(id_col),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("_t"),
        )
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_tf"))
    )
    # doc-keyed rollup of the same exchange; token-less docs carry no
    # postings and contribute dl only through N (slot in avgdl).
    dl = tf.groupBy(id_col).agg(
        F.sum("_tf").cast("bigint").alias("_dl")
    )
    n_row = docs.agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    tot_row = dl.agg(
        F.coalesce(F.sum("_dl"), F.lit(0)).cast("bigint").alias("_tot")
    )
    stats = n_row.crossJoin(tot_row).select(
        "_n",
        (F.col("_tot").cast("double") / F.col("_n").cast("double")).alias(
            "_avgdl"
        ),
    )
    df_t = tf.groupBy("_t").agg(
        F.count(F.lit(1)).cast("bigint").alias("_df")
    )
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "_t",
        F.floor(
            F.log(
                (F.col("_n").cast("double") - F.col("_df") + F.lit(0.5))
                / (F.col("_df") + F.lit(0.5))
                + F.lit(1.0)
            )
            * F.lit(float(micro))
            + F.lit(0.5)
        )
        .cast("long")
        .alias("_idf"),
        "_avgdl",
    )
    qterms = (
        queries.select(
            F.col(query_id_col),
            F.explode(
                F.slice(
                    tokens(F.lower(F.col(query_text_col))),
                    1,
                    int(max_query_terms),
                )
            ).alias("_t"),
        )
        .distinct()
    )
    # idf is restricted to QUERY terms before the broadcast: the full
    # idf table is vocabulary-sized (billions of terms at corpus
    # scale) while the query vocabulary is bounded by the query
    # batch — only the restricted table is broadcast-safe.
    idf_q = idf.join(
        F.broadcast(qterms.select("_t").distinct()), "_t", "left_semi"
    )
    matched = (
        tf.join(F.broadcast(qterms), "_t")
        .join(dl, id_col)
        .join(F.broadcast(idf_q.select("_t", "_idf", "_avgdl")), "_t")
    )
    tf_d = F.col("_tf").cast("double")
    denom = tf_d + F.lit(float(k1)) * (
        F.lit(1.0 - b) + F.lit(float(b)) * F.col("_dl").cast("double") / F.col("_avgdl")
    )
    contrib = F.floor(
        F.col("_idf").cast("double")
        * (tf_d * F.lit(float(k1) + 1.0))
        / denom
        + F.lit(0.5)
    ).cast("long")
    scored = matched.groupBy(query_id_col, id_col).agg(
        F.sum(contrib).cast("bigint").alias("score_micro")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score_micro"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            query_id_col,
            F.col("rank").cast("bigint").alias("rank"),
            id_col,
            "score_micro",
            (F.col("score_micro").cast("double") / F.lit(float(micro))).alias(
                "score"
            ),
        )
    )


def bm25_rerank_topk(
    docs: DataFrame,
    queries: DataFrame,
    vectors: DataFrame,
    m: int = 20,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_query_terms: int = 8,
) -> DataFrame:
    """Two-stage hybrid retrieval (r10, VERDICT r9 item 6): BM25
    candidate generation (top-``m`` per query, :func:`bm25_topk`) →
    exact-cosine embedding re-rank of the CANDIDATE SET → top-``k``.
    The standard retrieval shape a training-data pipeline runs for
    contamination forensics and hard-negative mining: lexical recall
    first (cheap, inverted-index-shaped), semantic precision second
    (exact cosine, but only over ``|queries| · m`` candidate rows —
    never a corpus-wide cosine).

    Output: ``(query_id, rank, doc_id, cosine, bm25_rank,
    bm25_score_micro)`` — rank 1..k by (cosine DESC, doc_id ASC);
    the BM25 stage's rank/score ride along as provenance. Queries or
    candidates with no row in ``vectors`` drop from the re-rank
    (inner joins — you re-rank where vectors exist; at sf0.1 the
    embeddings table deliberately covers only part of the corpus and
    exercises this path).

    Plan shape on top of bm25_topk's ONE corpus exchange: the
    candidate table (|queries|·m rows) and the query-vector table
    (≤ |queries| rows) are BROADCAST against the vector table — two
    map-side passes over ``vectors``, no vector shuffle, then a
    candidate-scale window for the final top-k. Cosine reuses
    functions.vectors.cosine_similarity — float32→float64 casts with
    left-to-right accumulation, bitwise-equal to DuckDB's
    list_dot_product (the similarity-module determinism contract),
    so the oracle replays the full two-stage chain value-exactly.
    """
    from convert_parquet_to_csv_spark.functions.vectors import (
        cosine_similarity,
    )

    cands = bm25_topk(
        docs,
        queries,
        k=m,
        id_col=id_col,
        text_col=text_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        max_query_terms=max_query_terms,
    ).select(
        query_id_col,
        F.col("rank").alias("bm25_rank"),
        id_col,
        F.col("score_micro").alias("bm25_score_micro"),
    )
    qids = cands.select(query_id_col).distinct().withColumnRenamed(
        query_id_col, "_qid"
    )
    qvec = vectors.join(
        F.broadcast(qids), F.col(vec_id_col) == F.col("_qid")
    ).select(
        F.col("_qid").alias(query_id_col),
        F.col(vec_col).alias("_qvec"),
    )
    cvec = vectors.select(
        F.col(vec_id_col).alias(id_col), F.col(vec_col).alias("_cvec")
    ).join(F.broadcast(cands), id_col)
    scored = cvec.join(F.broadcast(qvec), query_id_col).withColumn(
        "cosine", cosine_similarity("_qvec", "_cvec")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select(
            query_id_col,
            F.col("rank").cast("bigint").alias("rank"),
            id_col,
            "cosine",
            F.col("bm25_rank").cast("bigint").alias("bm25_rank"),
            "bm25_score_micro",
        )
    )

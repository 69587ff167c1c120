"""Driver-checked queries: text analysis over the documents table.

Each oracle reproduces the Spark expression tree in DuckDB SQL —
length/replace/regexp arithmetic chosen because both engines evaluate
it identically (see functions/text.py module docstring).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.functions import text as T
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


# --- token/char statistics + ratios ---------------------------------------

_QUALITY_ORACLE = """
WITH tok AS (
  SELECT doc_id, text,
         length(text) AS n_chars,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t != '')) AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^.,;:!?''"]', '', 'g')) AS n_punct
  FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN n_tokens > 0
            THEN CAST(n_alpha AS DOUBLE) / CAST(n_tokens AS DOUBLE)
            ELSE 0.0 END AS avg_token_len,
       CASE WHEN n_chars > 0
            THEN CAST(n_alpha AS DOUBLE) / CAST(n_chars AS DOUBLE)
            ELSE 0.0 END AS alpha_ratio,
       CASE WHEN n_chars > 0
            THEN CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)
            ELSE 0.0 END AS punct_ratio
FROM tok
"""


@query("text_quality_stats", oracle=_QUALITY_ORACLE)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: char/token counts, alpha/punct
    ratios. All built-in expressions; one narrow projection over the
    scan (check ReadSchema: only doc_id, text)."""
    f = T.quality_features("text")
    return _docs(spark, sf_dir).select(
        "doc_id",
        f["n_chars"].alias("n_chars"),
        f["n_tokens"].alias("n_tokens"),
        f["avg_token_len"].alias("avg_token_len"),
        f["alpha_ratio"].alias("alpha_ratio"),
        f["punct_ratio"].alias("punct_ratio"),
    )


# --- language id ----------------------------------------------------------

def _duck_occurrences(needle: str) -> str:
    pad = "' ' || lower(text) || ' '"
    return (
        f"(length({pad}) - length(replace({pad}, '{needle}', '')))"
        f" / {len(needle)}"
    )


def _duck_lang_score(lang: str) -> str:
    return " + ".join(_duck_occurrences(m) for m in T.LANG_MARKERS[lang])


_LANG_ORACLE = f"""
WITH scores AS (
  SELECT doc_id,
         CAST({_duck_lang_score('en')} AS DOUBLE) AS s_en,
         CAST({_duck_lang_score('de')} AS DOUBLE) AS s_de,
         CAST({_duck_lang_score('fr')} AS DOUBLE) AS s_fr,
         CAST({_duck_lang_score('es')} AS DOUBLE) AS s_es
  FROM documents
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
            WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
            WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
            WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
            WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
       END AS lang_pred
FROM scores
"""


@query("lang_id_heuristic", oracle=_LANG_ORACLE)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword argmax language ID (functions/text.lang_id)."""
    return _docs(spark, sf_dir).select(
        "doc_id", T.lang_id("text").alias("lang_pred")
    )


# --- fingerprint ----------------------------------------------------------

_FP_ORACLE = """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


@query("doc_fingerprint", oracle=_FP_ORACLE)
def doc_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5-of-normalized-text content fingerprint — the exact-dedup key."""
    return _docs(spark, sf_dir).select(
        "doc_id", T.doc_fingerprint("text").alias("fingerprint")
    )


# --- BPE-ish token counting ----------------------------------------------

_BPE_ORACLE = rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{T.BPE_REGEX}')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
"""


@query("token_count_bpe", oracle=_BPE_ORACLE)
def token_count_bpe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select(
        "doc_id", T.token_count_bpe("text").cast("long").alias("n_bpe_tokens")
    )


# --- pandas UDF surface ---------------------------------------------------

_PUDF_ORACLE = """
SELECT doc_id,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT)
         AS n_tokens
FROM documents
WHERE len(trim(text)) > 0
"""


@query("pandas_udf_token_count", oracle=_PUDF_ORACLE)
def pandas_udf_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow pandas-UDF surface, demonstrated on purpose.

    Everything else in functions/ is a JVM Column expression because
    UDFs are the slow path — but when Python *is* unavoidable, this is
    the sanctioned shape: ``@pandas_udf`` over Arrow batches
    (vectorized, ~10-100× over row-at-a-time). Whitespace token count
    here is exactly computable both ways, so the UDF result is
    oracle-hash-checked like any built-in."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_tokens(s: pd.Series) -> pd.Series:
        return s.str.strip().str.split().str.len().astype("int64")

    docs = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    return docs.select("doc_id", n_tokens("text").alias("n_tokens"))


# --- end-to-end curation pipeline ----------------------------------------

_CURATION_ORACLE = f"""
WITH feat AS (
  SELECT doc_id, source, n_chars, text,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t != '')) AS n_tokens,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(text) AS len_chars,
         CAST({_duck_lang_score('en')} AS DOUBLE) AS s_en,
         CAST({_duck_lang_score('de')} AS DOUBLE) AS s_de,
         CAST({_duck_lang_score('fr')} AS DOUBLE) AS s_fr,
         CAST({_duck_lang_score('es')} AS DOUBLE) AS s_es
  FROM documents
), filtered AS (
  SELECT * FROM feat
  WHERE n_tokens >= 10
    AND len_chars > 0
    AND CAST(n_alpha AS DOUBLE) / CAST(len_chars AS DOUBLE) >= 0.5
    AND greatest(s_en, s_de, s_fr, s_es) > 0
    AND s_en = greatest(s_en, s_de, s_fr, s_es)
), kept AS (
  SELECT *, row_number() OVER (
      PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
      ORDER BY doc_id) AS _rn
  FROM filtered
)
SELECT source,
       COUNT(*) AS n_docs,
       SUM(n_chars) AS total_chars,
       SUM(n_tokens) AS total_tokens
FROM kept WHERE _rn = 1
GROUP BY source
"""


@query("curation_pipeline", oracle=_CURATION_ORACLE)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-data curation composite, end to end in one plan:
    quality gate (≥10 tokens, ≥50% alpha chars) → language gate
    (heuristic English) → exact dedup (min-id per content
    fingerprint) → per-source corpus stats.

    One pass over the scan computes every per-doc feature (no
    re-reads); the only shuffles are the dedup fingerprint hash and
    the final small groupBy. All counters are integers — exact across
    engines. This is the shape a 100 TB curation job takes: per-doc
    features map-side, one wide shuffle, tiny output."""
    from convert_parquet_to_csv_spark.operators import dedup as D

    docs = _docs(spark, sf_dir)
    f = T.quality_features("text")
    enriched = docs.select(
        "*",
        f["n_tokens"].alias("_nt"),
        f["alpha_ratio"].alias("_ar"),
        T.lang_id("text").alias("_lp"),
    )
    filtered = enriched.filter(
        (F.col("_nt") >= 10) & (F.col("_ar") >= 0.5) & (F.col("_lp") == "en")
    )
    kept = D.exact_dedup(filtered)
    return kept.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("_nt").alias("total_tokens"),
    )


# --- context-window chunking ----------------------------------------------

_CHUNK_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), n AS (
  SELECT doc_id, toks, len(toks) AS n_tok,
         least(1 + CAST(ceil(greatest(len(toks) - 50, 0) / 40.0) AS INT),
               CAST(ceil(len(toks) / 40.0) AS INT)) AS n_chunks
  FROM tok WHERE len(toks) > 0
), idx AS (
  SELECT doc_id, toks, n_tok,
         unnest(range(0, n_chunks)) AS chunk_idx
  FROM n
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(len(toks[chunk_idx * 40 + 1 : chunk_idx * 40 + 50]) AS INT)
         AS n_chunk_tokens,
       md5(array_to_string(
           toks[chunk_idx * 40 + 1 : chunk_idx * 40 + 50], ' '))
         AS chunk_md5
FROM idx
"""


@query("doc_chunking", oracle=_CHUNK_ORACLE)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (operators/chunking.py): 50-token
    chunks, stride 40 (10-token overlap) — curated text → training
    sequences. Chunk contents are value-checked via md5 of the joined
    tokens; explode fan-out is bounded by corpus tokens / stride and
    needs no shuffle."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        chunk_documents,
    )

    chunks = chunk_documents(_docs(spark, sf_dir), size=50, stride=40)
    return chunks.select(
        "doc_id",
        "chunk_idx",
        F.col("n_chunk_tokens").cast("int").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", F.col("chunk_tokens"))).alias("chunk_md5"),
    )


# --- grouped-agg pandas UDAF + python UDTF (completing the UDF surface) ---

_UDAF_ORACLE = """
SELECT lang, SUM(n_chars) AS total_chars, COUNT(*) AS n_docs
FROM documents GROUP BY lang
"""


@query("pandas_udaf_chars_by_lang", oracle=_UDAF_ORACLE)
def pandas_udaf_chars_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GROUPED_AGG pandas-UDF (UDAF) surface: per-language totals
    where the aggregate body runs in pandas over Arrow batches. The
    aggregated column is int64 (exact in pandas regardless of order),
    so the UDAF result hash-matches the SQL oracle like any built-in.
    Scale note: grouped-agg UDFs forbid partial aggregation — every
    row crosses the shuffle, which is why built-ins win when they
    exist; this query documents the escape hatch, not the default."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def total64(s: pd.Series) -> int:
        return int(s.sum())

    @pandas_udf("long")
    def count64(s: pd.Series) -> int:
        return int(len(s))

    # Spark forbids mixing grouped-agg pandas UDFs with built-in
    # aggregates in one agg() — both columns go through the UDAF path.
    docs = _docs(spark, sf_dir)
    return docs.groupBy("lang").agg(
        total64("n_chars").alias("total_chars"),
        count64("n_chars").alias("n_docs"),
    )


_UDTF_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents WHERE doc_id < 50
), bg AS (
  SELECT doc_id,
         unnest(list_transform(
             range(1, greatest(len(toks), 1)),
             i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM tok
)
SELECT doc_id, bigram, COUNT(*) AS n
FROM bg GROUP BY doc_id, bigram
"""


@query("udtf_bigrams", oracle=_UDTF_ORACLE)
def udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The python UDTF surface (Spark 4): a table function exploding
    each document into its token bigrams, invoked via LATERAL in SQL —
    one input row → many output rows with arbitrary python logic, the
    shape explode() can't reach when the expansion is imperative. The
    bigram expansion itself is deterministic, so DuckDB replays it
    with list ops and the output is value-hash-checked."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="bigram: string")
    class Bigrams:
        def eval(self, text: str):
            toks = [t for t in (text or "").strip().split() if t]
            for a, b in zip(toks, toks[1:]):
                yield (f"{a} {b}",)

    spark.udtf.register("cptc_bigrams", Bigrams)
    _docs(spark, sf_dir).filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "_docs_udtf"
    )
    return spark.sql(
        """
        SELECT d.doc_id, b.bigram, COUNT(*) AS n
        FROM _docs_udtf d, LATERAL cptc_bigrams(d.text) b
        GROUP BY d.doc_id, b.bigram
        """
    )


# --- sequence packing -----------------------------------------------------

_PACK_ORACLE = """
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), n AS (
  SELECT doc_id, toks, len(toks) AS n_tok,
         least(1 + CAST(ceil(greatest(len(toks) - 50, 0) / 40.0) AS INT),
               CAST(ceil(len(toks) / 40.0) AS INT)) AS n_chunks
  FROM tok WHERE len(toks) > 0
), chunks AS (
  SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_idx,
         toks, n_tok
  FROM n
), sized AS (
  SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         len(toks[chunk_idx * 40 + 1 : chunk_idx * 40 + 50]) AS n_tokens
  FROM chunks
), packed AS (
  SELECT doc_id, chunk_idx, n_tokens,
         CAST(floor((SUM(n_tokens) OVER (ORDER BY doc_id, chunk_idx
                       ROWS UNBOUNDED PRECEDING) - n_tokens)
                    / 512.0) AS BIGINT) AS bin_id
  FROM sized
)
SELECT bin_id,
       COUNT(*) AS n_chunks,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed GROUP BY bin_id
"""


@query("sequence_packing", oracle=_PACK_ORACLE)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk→pack, the last step before training batches: 512-token
    bins filled contiguously in (doc, chunk) order via one
    running-sum window (operators/chunking.pack_sequences) — bins
    never split a chunk and overflow by at most one chunk. Per-bin
    chunk counts and token totals are value-checked; the single
    global window here is the verification flavor (pass ``part_col``
    for the sharded production layout)."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        chunk_documents,
        pack_sequences,
    )

    chunks = chunk_documents(_docs(spark, sf_dir), size=50, stride=40)
    packed = pack_sequences(
        chunks.select("doc_id", "chunk_idx", "n_chunk_tokens"), budget=512
    )
    return packed.groupBy("bin_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_chunk_tokens").cast("bigint").alias("bin_tokens"),
    )

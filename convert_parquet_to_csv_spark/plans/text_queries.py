"""Driver-checked queries: text analysis over the documents table.

Each oracle reproduces the Spark expression tree in DuckDB SQL —
length/replace/regexp arithmetic chosen because both engines evaluate
it identically (see functions/text.py module docstring).
"""

from __future__ import annotations

import os

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
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

def _duck_occurrences(needle: str, expr: str = "text") -> str:
    pad = f"' ' || lower({expr}) || ' '"
    return (
        f"(length({pad}) - length(replace({pad}, '{needle}', '')))"
        f" / {len(needle)}"
    )


def _duck_lang_score(lang: str, expr: str = "text") -> str:
    return " + ".join(
        _duck_occurrences(m, expr) for m in T.LANG_MARKERS[lang]
    )


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
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
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
SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       COUNT(*) AS n_docs
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


# --- PII redaction --------------------------------------------------------

# The fixture corpus is synthetic word-soup with no natural PII, so
# the query plants deterministic PII derived from doc_id (email,
# phone, IP, SSN shapes) and then redacts it — the operator does real
# work and the oracle replants/redacts identically. Patterns live in
# functions/text.py PII_PATTERNS (java.util.regex ∩ RE2 dialect).
# Counts mirror redact_pii's SEQUENTIAL replacement: each kind counts
# on text with the prior kinds already masked (email→ip→ssn→phone) —
# the patterns overlap (the phone regex matches inside an IPv4), so
# counting independently on the raw text would report redactions that
# never happen.
_PII_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || doc_id ||
         '@example.com or 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
         ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 id 123-45-6789' AS t0
  FROM documents
), s1 AS (
  SELECT doc_id, t0,
         regexp_replace(t0,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
           '<EMAIL>', 'g') AS t1
  FROM aug
), s2 AS (
  SELECT *, regexp_replace(t1,
         '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS t2
  FROM s1
), s3 AS (
  SELECT *, regexp_replace(t2,
         '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS t3
  FROM s2
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t0,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
         AS n_email,
       CAST(len(regexp_extract_all(t3,
            '\b\d{3}[-.]\d{3,4}[-.]?\d{0,4}\b')) AS INT) AS n_phone,
       CAST(len(regexp_extract_all(t1,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ipv4,
       CAST(len(regexp_extract_all(t2,
            '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
       regexp_replace(t3,
         '\b\d{3}[-.]\d{3,4}[-.]?\d{0,4}\b', '<PHONE>', 'g') AS redacted
FROM s3
"""


@query("pii_redaction", oracle=_PII_ORACLE)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII audit + redaction over the corpus: per-kind match counts
    and the masked text. Chained ``regexp_replace`` — all JVM
    expressions inside one whole-stage-codegen projection, zero
    shuffles, embarrassingly parallel at any scale. The planted PII
    is deterministic in doc_id so both engines see identical input."""
    d = _docs(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-01"),
        F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        F.lit(" host 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 id 123-45-6789"),
    )
    d = d.select("doc_id", aug.alias("_aug"))
    counts = T.pii_counts("_aug")
    return d.select(
        "doc_id",
        counts["n_email"].cast("int").alias("n_email"),
        counts["n_phone"].cast("int").alias("n_phone"),
        counts["n_ipv4"].cast("int").alias("n_ipv4"),
        counts["n_ssn"].cast("int").alias("n_ssn"),
        T.redact_pii("_aug").alias("redacted"),
    )


# --- intra-document repetition (Gopher-style quality signals) -------------

_REP_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents
  WHERE len(trim(text)) > 0
), clean AS (
  SELECT doc_id, tok FROM toks WHERE tok <> ''
), word_counts AS (
  SELECT doc_id, tok, COUNT(*) AS c
  FROM clean GROUP BY doc_id, tok
), per_doc AS (
  SELECT doc_id,
         CAST(SUM(c) AS BIGINT) AS n_tokens,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(MAX(c) AS BIGINT) AS top_word_count
  FROM word_counts GROUP BY doc_id
)
SELECT doc_id, n_tokens, n_types,
       CAST(n_types AS DOUBLE) / n_tokens AS type_token_ratio,
       CAST(top_word_count AS DOUBLE) / n_tokens AS top_word_frac
FROM per_doc
"""


@query("doc_repetition_stats", oracle=_REP_ORACLE)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition signals: type/token
    ratio and most-frequent-word share — the standard cheap filters
    for looping/boilerplate text in training-data curation.

    Explode → ONE groupBy on (doc_id, token) with map-side partials →
    second groupBy on doc_id; both shuffles hash on doc_id-prefixed
    keys so the second reuses the first's clustering at scale. No
    per-row O(n²) array juggling — the exploded layout is the
    100 TB-safe way to compute per-doc modes."""
    d = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    toks = d.select(
        "doc_id", F.explode(T.tokens("text")).alias("tok")
    )
    wc = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    per_doc = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_types"),
        F.max("c").alias("top_word_count"),
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_types",
        (F.col("n_types").cast("double") / F.col("n_tokens")).alias(
            "type_token_ratio"
        ),
        (
            F.col("top_word_count").cast("double") / F.col("n_tokens")
        ).alias("top_word_frac"),
    )


# --- corpus vocabulary / Zipf profile -------------------------------------

_VOCAB_ORACLE = """
WITH toks AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS tok
  FROM documents WHERE len(trim(text)) > 0
), clean AS (
  SELECT tok FROM toks WHERE tok <> ''
), freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt FROM clean GROUP BY tok
), total AS (SELECT SUM(cnt) AS n FROM freq)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, tok ASC) AS INT) AS rank,
       tok, cnt,
       CAST(cnt AS DOUBLE) / (SELECT n FROM total) AS frac
FROM freq
ORDER BY cnt DESC, tok ASC
LIMIT 40
"""


@query("corpus_vocab_stats", oracle=_VOCAB_ORACLE)
def corpus_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level vocabulary profile: the top-40 tokens with rank
    and corpus share (the Zipf curve a tokenizer/vocab audit reads).

    One explode + one groupBy(token) with map-side combine is the
    whole heavy path; the rank window and total-sum scalar run over
    the tiny post-agg table. Ordering ties break on the token string,
    so the LIMIT boundary is deterministic in both engines."""
    d = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    freq = (
        d.select(F.explode(T.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    total = freq.agg(F.sum("cnt").alias("_n"))
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        freq.orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(40)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .join(F.broadcast(total))
        .select(
            "rank",
            "tok",
            "cnt",
            (F.col("cnt").cast("double") / F.col("_n")).alias("frac"),
        )
    )


# --- bigram collocation mining (lift) -------------------------------------

# Lift instead of PMI: PMI's log is not exactly rounded and drifts a
# ulp between libms; lift = N·c(ab)/(c(a)·c(b)) is one integer product
# and one IEEE division — bit-identical — and induces the same ranking.
_COLLOC_ORACLE = r"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t != '') AS w
  FROM documents
),
tok AS (
  SELECT doc_id, u.tk AS token, u.pos AS pos FROM (
    SELECT doc_id, unnest(list_transform(w, (t, i) ->
        struct_pack(tk := t, pos := i))) AS u
    FROM words)
),
uni AS (SELECT token, COUNT(*) AS c1 FROM tok GROUP BY token),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_tokens FROM uni),
big AS (
  SELECT a.token AS w1, b.token AS w2, COUNT(*) AS c2
  FROM tok a JOIN tok b
    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY w1, w2
),
scored AS (
  SELECT w1, w2, c2,
         CAST(c2 * n.n_tokens AS DOUBLE)
           / CAST(ua.c1 * ub.c1 AS DOUBLE) AS lift
  FROM big, n
  JOIN uni ua ON big.w1 = ua.token
  JOIN uni ub ON big.w2 = ub.token
  WHERE c2 >= 5
)
SELECT w1, w2, CAST(c2 AS BIGINT) AS n_pair, lift
FROM scored
"""


@query("bigram_collocations_lift", oracle=_COLLOC_ORACLE)
def bigram_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining — the tokenizer-vocabulary / merge-rule
    precursor: adjacent-token pairs scored by lift
    (N·c(ab)/(c(a)·c(b))), support ≥5.

    Spark-first shape: ONE posexplode produces the positional token
    stream; bigrams come from `F.lead(token)` over a
    (doc_id, pos)-ordered window — one shuffle on doc_id and ONE scan
    of the token stream (the r4 self-join on (doc, pos+1) scanned it
    twice and tripped Spark's "trivially true equals predicate"
    warning; rewritten per VERDICT r4 item 4). The unigram counts
    broadcast back onto the pair table. All counting is integer; the
    one float op is the final division (exactly rounded ⇒
    engine-identical)."""
    docs = _docs(spark, sf_dir)
    tok = docs.select(
        "doc_id",
        F.posexplode(T.tokens(F.lower(F.col("text")))).alias(
            "pos", "token"
        ),
    )
    uni = tok.groupBy("token").agg(F.count("*").alias("c1"))
    n = uni.agg(F.sum("c1").cast("bigint").alias("n_tokens"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    big = (
        tok.select(
            F.col("token").alias("w1"),
            F.lead("token").over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c2"))
        .filter(F.col("c2") >= 5)
    )
    ua = uni.select(F.col("token").alias("w1"), F.col("c1").alias("ca"))
    ub = uni.select(F.col("token").alias("w2"), F.col("c1").alias("cb"))
    return (
        big.join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .join(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c2").cast("bigint").alias("n_pair"),
            (
                (F.col("c2") * F.col("n_tokens")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double")
            ).alias("lift"),
        )
    )


# --- inverted index (posting lists) ---------------------------------------

_POSTINGS_ORACLE = r"""
WITH words AS (
  SELECT doc_id, unnest(
    list_filter(string_split_regex(lower(trim(text)), '\s+'),
                t -> t != '')) AS term
  FROM documents
),
tf AS (
  SELECT term, doc_id, COUNT(*) AS tf FROM words GROUP BY term, doc_id
)
SELECT term,
       CAST(COUNT(*) AS BIGINT) AS df,
       CAST(SUM(tf) AS BIGINT) AS cf,
       to_json(list(doc_id ORDER BY doc_id)) AS postings
FROM tf
WHERE term >= 'q'
GROUP BY term
"""


@query("inverted_index_postings", oracle=_POSTINGS_ORACLE)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-engine building block: term → sorted posting list of
    doc_ids, with document and collection frequencies. One
    (term, doc) partial-agg shuffle then a term-keyed list assembly;
    postings serialize to JSON (integer payload — the array-cell
    rule). The `term >= 'q'` shard stands in for the alphabetical
    term-range partitioning an index build would write (one output
    file per term range)."""
    docs = _docs(spark, sf_dir)
    words = docs.select(
        "doc_id",
        F.explode(T.tokens(F.lower(F.col("text")))).alias("term"),
    ).filter(F.col("term") >= "q")
    tf = words.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    return tf.groupBy("term").agg(
        F.count("*").cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("cf"),
        F.to_json(F.array_sort(F.collect_list("doc_id"))).alias(
            "postings"
        ),
    )


# --- prefix autocomplete top-k --------------------------------------------

_PREFIX_ORACLE = r"""
WITH toks AS (
  SELECT unnest(list_filter(
           string_split_regex(lower(trim(text)), '\s+'),
           t -> t != '')) AS tok
  FROM documents),
freq AS (
  SELECT substr(tok, 1, 3) AS prefix, tok, COUNT(*) AS cnt
  FROM toks WHERE length(tok) >= 3
  GROUP BY 1, 2),
ranked AS (
  SELECT prefix, tok, cnt,
         CAST(row_number() OVER (
           PARTITION BY prefix ORDER BY cnt DESC, tok ASC) AS INT)
           AS rk
  FROM freq)
SELECT prefix, tok, cnt, rk FROM ranked WHERE rk <= 3
"""


@query("prefix_autocomplete_topk", oracle=_PREFIX_ORACLE)
def prefix_autocomplete_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocomplete index: top-3 corpus tokens per 3-char prefix —
    the precomputed suggestion table a search box reads. One explode
    + one (prefix, token) count + a per-prefix WindowGroupLimit
    (partial top-k BEFORE the prefix exchange, so hot prefixes don't
    funnel their full tail through the shuffle). Ties break on the
    token string; lowercase fold matches the corpus tokenizer."""
    d = _docs(spark, sf_dir).filter(F.length(F.trim("text")) > 0)
    from pyspark.sql.window import Window

    toks = d.select(F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"))
    freq = (
        toks.filter(F.length("tok") >= 3)
        .groupBy(
            F.substring("tok", 1, 3).alias("prefix"), F.col("tok")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("prefix").orderBy(F.desc("cnt"), F.asc("tok"))
    return (
        freq.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select("prefix", "tok", "cnt", "rk")
    )


# --- polymorphic UDTF (analyze(): dynamic output schema) ------------------

_UDTF_ANALYZE_ORACLE = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t != '') AS w
  FROM documents)
SELECT doc_id,
       CASE WHEN len(w) >= 1 THEN w[1] END AS tok0,
       CASE WHEN len(w) >= 2 THEN w[2] END AS tok1,
       CASE WHEN len(w) >= 3 THEN w[3] END AS tok2
FROM toks
"""


@query("udtf_analyze_first_tokens", oracle=_UDTF_ANALYZE_ORACLE)
def udtf_analyze_first_tokens(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4): the static ``analyze``
    method computes the OUTPUT SCHEMA from the call's constant
    argument — first_tokens(text, 3) materializes three columns,
    first_tokens(text, 5) would materialize five, with no code
    change. udtf_bigrams covers the fixed-schema UDTF; this covers
    the schema-from-arguments seam (AnalyzeArgument.value is only
    set for foldable arguments — the width must be a literal).
    Tokenization matches the corpus tokenizer (lowercase, whitespace
    split, empty-token filter) so the SQL oracle can replay it."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstTokens:
        @staticmethod
        def analyze(
            s: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            st = StructType()
            for i in range(int(n.value)):
                st = st.add(f"tok{i}", StringType())
            return AnalyzeResult(schema=st)

        def eval(self, s, n):  # noqa: ANN001
            parts = [t for t in (s or "").split() if t]
            yield tuple(
                parts[i] if i < len(parts) else None for i in range(n)
            )

    spark.udtf.register("cptc_first_tokens", FirstTokens)
    _docs(spark, sf_dir).createOrReplaceTempView("cptc_udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok0, t.tok1, t.tok2
        FROM cptc_udtf_docs d,
             LATERAL cptc_first_tokens(lower(trim(d.text)), 3) t
        """
    )


# --- vocabulary coverage / OOV rate ---------------------------------------

_OOV_V = 500

_OOV_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(list_filter(
           string_split_regex(lower(trim(text)), '\\s+'),
           t -> t != '')) AS tok
  FROM documents
), vocab AS (
  SELECT tok FROM (
    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok
    ORDER BY cnt DESC, tok ASC LIMIT {_OOV_V}
  )
), flagged AS (
  SELECT t.doc_id, t.lang,
         CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END AS oov
  FROM toks t LEFT JOIN vocab v USING (tok)
)
SELECT lang,
       COUNT(DISTINCT doc_id) AS n_docs,
       COUNT(*) AS n_tokens,
       CAST(SUM(oov) AS BIGINT) AS n_oov,
       CAST(SUM(oov) AS DOUBLE) / COUNT(*) AS oov_rate
FROM flagged GROUP BY lang
"""


@query("oov_rate_vs_topk_vocab", oracle=_OOV_ORACLE)
def oov_rate_vs_topk_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage audit: build a top-V corpus vocabulary and
    report the out-of-vocabulary token rate per language — the number
    a tokenizer/vocab-size decision reads (how much of each slice a
    V-entry vocab fails to cover), and the cheap screen for corpus
    slices that don't match the vocab's training distribution.

    Two passes over ONE shared tokenize: pass 1 is a map-side-combined
    token count whose top-V (deterministic ties on the token string)
    is a V-row table; pass 2 re-walks the token stream with that
    vocab BROADCAST, so the heavy side never shuffles — at 100 TB
    the vocab stays a few MB however the corpus grows. Counts are
    integers; the rate is one closing divide."""
    toks = (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            F.explode(T.tokens(F.lower(F.col("text")))).alias("tok"),
        )
        # consumed by the vocab pass AND the scoring pass — persist
        # so "one shared tokenize" is true physically, not just in
        # the plan text.
        .persist()
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("tok"))
        .limit(_OOV_V)
        .select("tok")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("_inv", F.lit(1))), "tok", "left"
    ).select(
        "doc_id",
        "lang",
        F.when(F.col("_inv").isNull(), 1).otherwise(0).alias("oov"),
    )
    out = flagged.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").cast("bigint").alias("n_oov"),
        (F.sum("oov").cast("double") / F.count(F.lit(1))).alias(
            "oov_rate"
        ),
    ).localCheckpoint()  # eager: lets the token cache release below
    toks.unpersist()
    return out


# --- character-trigram corpus familiarity ---------------------------------

_TRIGRAM_ORACLE = """
WITH norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
), tri AS (
  SELECT doc_id, substring(t, i, 3) AS g
  FROM norm, LATERAL unnest(range(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 3
), freq AS (
  SELECT g, COUNT(*) AS cnt FROM tri GROUP BY g
), scored AS (
  SELECT t.doc_id,
         COUNT(*) AS n_trigrams,
         SUM(f.cnt) AS fam_sum
  FROM tri t JOIN freq f USING (g)
  GROUP BY t.doc_id
)
SELECT doc_id, n_trigrams,
       CAST(fam_sum AS DOUBLE) / n_trigrams AS familiarity
FROM scored
ORDER BY familiarity ASC, doc_id ASC
LIMIT 20
"""


@query("char_trigram_familiarity", oracle=_TRIGRAM_ORACLE)
def char_trigram_familiarity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gibberish screen via a character-trigram "language model": each
    doc is scored by the mean CORPUS frequency of its char trigrams,
    and the 20 least-familiar docs surface — random bytes, wrong-
    charset text, and encoding damage score far below natural prose
    without any external model (the integer-exact stand-in for LM
    perplexity filtering; a real KenLM pass slots into the same
    two-pass shape).

    Scale shape: ONE trigram explode feeds both the corpus frequency
    table and the per-doc score join (~|text| rows each); the
    frequency table is ≤ |alphabet|³ distinct keys — small enough to
    broadcast at any corpus size, so the scoring join never shuffles
    the trigram stream. Integer sums; the mean is one closing divide;
    the top-20 boundary ties on doc_id."""
    norm = _docs(spark, sf_dir).select(
        "doc_id", T.normalize_text("text").alias("t")
    )
    # Position-explode + substring projection, NOT a transform()
    # lambda building the per-doc trigram array: generate and
    # project fuse into one codegen stage (the de-stringing lesson
    # from the span/minhash rewrites; measured 8.0 s → 3.6 s cold,
    # 3.2 → 2.9 s warm at sf0.1 for the explode+freq+score core).
    tri = (
        norm.filter(F.length("t") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.length("t") - 2)
            ).alias("_p"),
            "t",
        )
        .select("doc_id", F.expr("substring(t, _p, 3)").alias("g"))
        # tri feeds both the corpus frequency table and the scoring
        # join — persist so the normalize+explode runs once.
        .persist()
    )
    freq = tri.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    scored = (
        tri.join(F.broadcast(freq), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("cnt").alias("fam_sum"),
        )
    )
    out = (
        scored.select(
            "doc_id",
            "n_trigrams",
            (F.col("fam_sum").cast("double") / F.col("n_trigrams")).alias(
                "familiarity"
            ),
        )
        .orderBy(F.asc("familiarity"), F.asc("doc_id"))
        .limit(20)
        .localCheckpoint()  # eager: lets the trigram cache release
    )
    tri.unpersist()
    return out


# --- Arrow-optimized Python UDF -------------------------------------------

_ARROW_UDF_ORACLE = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]'))
            AS BIGINT) AS n_bpe_tokens
FROM documents
WHERE doc_id % 10 = 0
"""


@query("arrow_python_udf_tokens", oracle=_ARROW_UDF_ORACLE)
def arrow_python_udf_tokens(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The Spark-4 Arrow-optimized scalar Python UDF
    (``F.udf(..., useArrow=True)``) — the third Python boundary shape
    next to pandas UDFs (Series-at-a-time) and classic pickled UDFs
    (row-at-a-time): scalar Python semantics with Arrow batch
    transfer, the right choice when per-row logic doesn't vectorize
    but serialization must not be the bottleneck. Same BPE-ish
    count as token_count_bpe, so the gate proves the Arrow UDF path
    agrees with both the JVM expression AND the oracle."""
    import re

    from pyspark.sql.functions import udf

    pat = re.compile(T.BPE_REGEX)

    @udf("long", useArrow=True)
    def n_bpe(s: str) -> int:
        # None -> None matches the oracle's regexp_extract_all(NULL)
        # = NULL (a 0 here would be a latent gate divergence).
        return len(pat.findall(s)) if s is not None else None

    return (
        _docs(spark, sf_dir)
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", n_bpe("text").alias("n_bpe_tokens"))
    )


# --- tokenizer fertility by language --------------------------------------

_FERTILITY_ORACLE = r"""
WITH t AS (
  SELECT lang,
         len(list_filter(string_split_regex(trim(text), '\s+'),
                         x -> x != '')) AS n_ws,
         len(regexp_extract_all(text,
             '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]')) AS n_bpe
  FROM documents
)
SELECT lang,
       CAST(SUM(n_ws) AS BIGINT) AS total_ws_tokens,
       CAST(SUM(n_bpe) AS BIGINT) AS total_bpe_tokens,
       CAST(SUM(n_bpe) AS DOUBLE) / SUM(n_ws) AS fertility
FROM t GROUP BY lang
"""


@query("tokenizer_fertility_by_lang", oracle=_FERTILITY_ORACLE)
def tokenizer_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Tokenizer fertility (subword tokens per word) per language —
    the standard multilingual-tokenizer equity metric: a language
    with fertility ≫ the corpus mean pays more sequence length for
    the same text, and the number drives vocab-allocation decisions.
    One map-side aggregate over two JVM token counters; integer
    sums, one closing divide per group. Each counter is projected
    ONCE before the aggregate (r8 review follow-up: repeating the
    tokenize/regex expression inside multiple agg children re-runs
    it per row per reference — CSE does not dedupe across them)."""
    d = _docs(spark, sf_dir).select(
        "lang",
        F.size(T.tokens("text")).alias("_ws"),
        T.token_count_bpe("text").cast("long").alias("_bpe"),
    )
    return d.groupBy("lang").agg(
        F.sum("_ws").cast("bigint").alias("total_ws_tokens"),
        F.sum("_bpe").cast("bigint").alias("total_bpe_tokens"),
        (
            F.sum("_bpe").cast("double") / F.sum("_ws")
        ).alias("fertility"),
    )


# --- lang-id evaluation: confusion matrix + per-class metrics -------------

_LANGID_EVAL_ORACLE = f"""
WITH scores AS (
  SELECT doc_id, lang,
         CAST({_duck_lang_score('en')} AS DOUBLE) AS s_en,
         CAST({_duck_lang_score('de')} AS DOUBLE) AS s_de,
         CAST({_duck_lang_score('fr')} AS DOUBLE) AS s_fr,
         CAST({_duck_lang_score('es')} AS DOUBLE) AS s_es
  FROM documents
), pred AS (
  SELECT lang AS actual,
         CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
              WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
         END AS predicted
  FROM scores
), cells AS (
  SELECT actual, predicted, COUNT(*) AS n FROM pred
  GROUP BY actual, predicted
)
SELECT c.actual, c.predicted, CAST(c.n AS BIGINT) AS n,
       CAST(c.n AS DOUBLE) /
         (SELECT SUM(n) FROM cells x WHERE x.predicted = c.predicted)
         AS precision_contrib,
       CAST(c.n AS DOUBLE) /
         (SELECT SUM(n) FROM cells x WHERE x.actual = c.actual)
         AS recall_contrib
FROM cells c
"""


@query("langid_confusion_matrix", oracle=_LANGID_EVAL_ORACLE)
def langid_confusion_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The engine evaluating its own operator: confusion matrix of
    the lang_id heuristic against the fixture's ground-truth ``lang``
    column, each cell carrying its precision contribution (share of
    that predicted column) and recall contribution (share of that
    actual row) — the diagonal's values ARE per-class precision and
    recall. This is the model-eval readout every classifier-shaped
    curation filter needs before it's trusted to delete data.

    One scan scores and predicts map-side; the matrix is ≤
    |langs+1|² cells, margins via two windows over that tiny table;
    integer counts, one divide per metric."""
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    pred = docs.select(
        F.col("lang").alias("actual"),
        T.lang_id("text").alias("predicted"),
    )
    cells = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).alias("n")
    )
    col_tot = F.sum("n").over(Window.partitionBy("predicted"))
    row_tot = F.sum("n").over(Window.partitionBy("actual"))
    return cells.select(
        "actual",
        "predicted",
        F.col("n").cast("bigint").alias("n"),
        (F.col("n").cast("double") / col_tot).alias(
            "precision_contrib"
        ),
        (F.col("n").cast("double") / row_tot).alias("recall_contrib"),
    )


# --------------------------------------------------------------------------
# r7: tokenizer-aware concat-and-chunk packing (the other packing
# flavor next to sequence_packing's whole-chunk first-fit)
# --------------------------------------------------------------------------

_CCP_CTX = 256

_CONCAT_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{T.BPE_REGEX}')) + 1 AS nt
  FROM documents
), p AS (
  SELECT doc_id, nt,
         coalesce(sum(nt) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS s
  FROM t
), e AS (
  SELECT doc_id, nt, s,
         unnest(range(CAST(s // {_CCP_CTX} AS BIGINT),
                      CAST((s + nt - 1) // {_CCP_CTX} + 1 AS BIGINT)))
           AS chunk_id
  FROM p
)
SELECT chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s // {_CCP_CTX} = chunk_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_start,
       CAST(sum(least((chunk_id + 1) * {_CCP_CTX}, s + nt)
                - greatest(chunk_id * {_CCP_CTX}, s)) AS BIGINT)
         AS n_tokens
FROM e GROUP BY 1
"""


@query("pack_concat_chunks", oracle=_CONCAT_PACK_ORACLE)
def pack_concat_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing over BPE-ish token counts
    (+1 EOS per doc), ctx=256: per-chunk doc counts, doc starts, and
    token fill. n_docs − n_docs_start is the boundary-fragmentation
    cost concat packing pays for zero padding — the number you weigh
    against sequence_packing's padding waste. The Spark plan computes
    the global packing offset with the two-level binned prefix sum
    (no data-scale single-partition window; see
    operators/chunking.concat_chunk_pack); the oracle replays the
    naive global cumsum, which the binned plan must equal exactly."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        concat_chunk_pack,
    )

    return concat_chunk_pack(_docs(spark, sf_dir), ctx=_CCP_CTX)


# --------------------------------------------------------------------------
# r7 addition: corpus-scale BPE merge learning (Sennrich et al. 2016)
# Day-one gated (FIRST_TIER slot reserved in the r7 rotation).
# --------------------------------------------------------------------------

# One round of the oracle = pair counts over symbol lists, argmax
# (weight DESC, l, r), then the EXACT tokenwise greedy merge replayed
# with windows: match flags per position, maximal runs of consecutive
# matches (j − row_number islands), greedy = even offsets within each
# run (two matches in a row share a token, so greedy takes every
# other; disjoint matches are all taken), skip the position after a
# chosen one, rebuild the list in order. This replays Spark's
# aggregate-fold bit-exactly INCLUDING l == r runs, where a
# padded-string replace() device was measured to pair differently
# ('aaaaa' → [aa, a, aa] instead of greedy [aa, aa, a]) and rejected.
_BPE_ROUNDS = 3


def _bpe_chain(rounds: int) -> str:
    """The w0..w{rounds} CTE chain: vocabulary decomposition plus one
    learned-merge round per CTE block. Shared by the learner oracle
    (_bpe_oracle), the r8 encoder oracle (_BPE_ENCODE_ORACLE), the
    BPE-count packing oracle (_PACK_BPE_ORACLE), and the compression
    curve — train and apply replay the SAME merge device."""
    sql = r"""
WITH w0 AS (
  SELECT w, string_split(w, '') AS sy, f FROM (
    SELECT tok AS w, COUNT(*) AS f FROM (
      SELECT unnest(list_filter(
          string_split_regex(trim(text), '\s+'), t -> t != '')) AS tok
      FROM documents) GROUP BY tok)
)"""
    for i in range(1, rounds + 1):
        sql += f""",
p{i} AS (
  SELECT l, r, SUM(f) AS wt FROM (
    SELECT f, sy[j + 1] AS l, sy[j + 2] AS r
    FROM w{i - 1}, unnest(range(0, len(sy) - 1)) AS t(j))
  GROUP BY l, r
),
b{i} AS (
  SELECT l, r, CAST(wt AS BIGINT) AS pair_weight
  FROM p{i} ORDER BY wt DESC, l ASC, r ASC LIMIT 1
),
tok{i} AS (
  SELECT w, f, j, sy[j + 1] AS tok, b.l AS bl, b.r AS br,
         (j + 1 < len(sy) AND sy[j + 1] = b.l AND sy[j + 2] = b.r)
           AS mtch
  FROM w{i - 1}, b{i} b, unnest(range(0, len(sy))) AS t(j)
),
isl{i} AS (
  SELECT *, CASE WHEN mtch THEN j - row_number()
      OVER (PARTITION BY w, mtch ORDER BY j) END AS island
  FROM tok{i}
),
ch{i} AS (
  SELECT *, CASE WHEN mtch THEN
      (j - MIN(j) OVER (PARTITION BY w, island)) % 2 = 0
    ELSE FALSE END AS chosen
  FROM isl{i}
),
chp{i} AS (
  SELECT *, coalesce(LAG(chosen) OVER (PARTITION BY w ORDER BY j),
                     FALSE) AS prev
  FROM ch{i}
),
w{i} AS (
  SELECT w, MAX(f) AS f,
         list(CASE WHEN chosen THEN bl || br ELSE tok END ORDER BY j)
           FILTER (WHERE NOT prev) AS sy
  FROM chp{i} GROUP BY w
)"""
    return sql


def _bpe_oracle(rounds: int) -> str:
    selects = [
        f"SELECT {i} AS rank, l, r, pair_weight FROM b{i}"
        for i in range(1, rounds + 1)
    ]
    return _bpe_chain(rounds) + "\n" + "\nUNION ALL ".join(selects)


_BPE_ORACLE = _bpe_oracle(_BPE_ROUNDS)


@query("bpe_merge_learning", oracle=_BPE_ORACLE)
def bpe_merge_learning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 3 BPE merges learned over the corpus (operators/
    chunking.bpe_learn_merges; Sennrich et al. 2016 §3.2) — the
    train-your-own-tokenizer primitive: heaviest adjacent symbol
    pair per round (frequency-weighted, lexicographic tie-break),
    merged greedily LTR in every vocabulary word (exact tokenwise
    greedy, l == r runs included). The corpus contributes exactly
    ONE exchange (word-frequency groupBy); every round after is
    vocabulary-scale — the property that makes BPE training
    feasible at 100 TB. The oracle unrolls the three rounds as CTEs
    replaying the greedy merge with run-parity windows (an
    implementation INDEPENDENT of Spark's aggregate fold — see the
    comment above _bpe_oracle) and matches ranks, pairs, and
    weights bit-exactly."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_learn_merges,
    )

    return bpe_learn_merges(
        _docs(spark, sf_dir).select("doc_id", "text"),
        rounds=_BPE_ROUNDS,
    )


# --------------------------------------------------------------------------
# r8: BPE ENCODING with the learned merge table (VERDICT r7 item 5 —
# the learner existed since r7; these close the train→apply→consume
# loop). Day-one gated.
# --------------------------------------------------------------------------

# the per-occurrence word stream, shared by the encode/pack oracles
_BPE_OCC_CTE = r""",
occ AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\s+'),
                            t -> t != '')) AS w
  FROM documents
)"""

_BPE_ENCODE_ORACLE = _bpe_chain(_BPE_ROUNDS) + _BPE_OCC_CTE + f"""
SELECT d.doc_id,
       CAST(coalesce(sum(len(e.sy)), 0) AS BIGINT) AS n_bpe_tokens
FROM documents d
LEFT JOIN occ ON occ.doc_id = d.doc_id
LEFT JOIN w{_BPE_ROUNDS} e ON e.w = occ.w
GROUP BY d.doc_id
"""


@query("bpe_encode_corpus", oracle=_BPE_ENCODE_ORACLE)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token count under the LEARNED 3-merge BPE table
    (operators/chunking.bpe_apply_merges): learn merges over the
    corpus (bpe_merge_learning's exact plan), then encode every
    document with them — the apply half of training your own
    tokenizer, sharing the learner's greedy-LTR fold so train and
    apply cannot drift. Encoding is word-local, so the corpus never
    folds directly: distinct-word vocabulary encodes once
    (vocab-scale rounds), one join maps lengths back. The oracle
    replays the merge chain (_bpe_chain — the run-parity window
    device, implementation-independent of Spark's fold) and sums
    encoded lengths per document."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_apply_merges,
        bpe_learn_merges,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    merges = bpe_learn_merges(docs, rounds=_BPE_ROUNDS)
    return bpe_apply_merges(docs, merges, rounds=_BPE_ROUNDS)


_PACK_BPE_ORACLE = (
    _bpe_chain(_BPE_ROUNDS)
    + _BPE_OCC_CTE
    + f""",
cnt AS (
  SELECT d.doc_id,
         CAST(coalesce(sum(len(e.sy)), 0) + 1 AS BIGINT) AS nt
  FROM documents d
  LEFT JOIN occ ON occ.doc_id = d.doc_id
  LEFT JOIN w{_BPE_ROUNDS} e ON e.w = occ.w
  GROUP BY d.doc_id
), p AS (
  SELECT doc_id, nt,
         coalesce(sum(nt) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS s
  FROM cnt
), ex AS (
  SELECT doc_id, nt, s,
         unnest(range(CAST(s // {_CCP_CTX} AS BIGINT),
                      CAST((s + nt - 1) // {_CCP_CTX} + 1 AS BIGINT)))
           AS chunk_id
  FROM p
)
SELECT chunk_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN s // {_CCP_CTX} = chunk_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_start,
       CAST(sum(least((chunk_id + 1) * {_CCP_CTX}, s + nt)
                - greatest(chunk_id * {_CCP_CTX}, s)) AS BIGINT)
         AS n_tokens
FROM ex GROUP BY 1
"""
)


@query("pack_chunks_bpe", oracle=_PACK_BPE_ORACLE)
def pack_chunks_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pack_concat_chunks REBASED on the learned-BPE token counts
    (concat_chunk_pack's ``counts_df`` flag — VERDICT r7 item 5's
    "make the packing consistent with the tokenizer that was
    actually trained"; the default-path query pack_concat_chunks is
    byte-identical to r7 by construction). Same ctx, same two-level
    binned prefix sum; only the per-doc counts change — so diffing
    this result against pack_concat_chunks' is exactly the
    proxy-vs-learned tokenizer layout drift."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_apply_merges,
        bpe_learn_merges,
        concat_chunk_pack,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    merges = bpe_learn_merges(docs, rounds=_BPE_ROUNDS)
    counts = bpe_apply_merges(docs, merges, rounds=_BPE_ROUNDS)
    return concat_chunk_pack(docs, ctx=_CCP_CTX, counts_df=counts)


_BPE_CURVE_ORACLE = _bpe_chain(_BPE_ROUNDS) + "\n" + "\nUNION ALL ".join(
    f"SELECT CAST({i} AS BIGINT) AS rank, "
    f"CAST(coalesce(sum(f * len(sy)), 0) AS BIGINT) AS corpus_tokens "
    f"FROM w{i}"
    for i in range(0, _BPE_ROUNDS + 1)
)


@query("bpe_compression_curve", oracle=_BPE_CURVE_ORACLE)
def bpe_compression_curve_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Corpus symbol count after 0..3 learned merges (operators/
    chunking.bpe_compression_curve) — the tokenizer-training
    progress readout. Rank i − rank i+1 is the CHOSEN-occurrence
    count of merge i+1 — ≤ its pair_weight, strictly less on
    overlapping l == r runs (the unit test pins both the bound and
    a strict case); the oracle recomputes every snapshot from the
    independent run-parity merge replay."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_compression_curve,
    )

    return bpe_compression_curve(
        _docs(spark, sf_dir).select("doc_id", "text"),
        rounds=_BPE_ROUNDS,
    )


# --------------------------------------------------------------------------
# r8: lexical-diversity quality signals
# --------------------------------------------------------------------------

_LEXDIV_ORACLE = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(trim(text), '\s+'),
                            t -> t != '')) AS t
  FROM documents
), cnt AS (
  SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t
), per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(max(c) AS BIGINT) AS top,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS hapax
  FROM cnt GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(p.n_types, 0) AS BIGINT) AS n_types,
       CASE WHEN coalesce(p.n_tokens, 0) > 0
            THEN CAST(p.n_types AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)
            ELSE 0.0 END AS type_token_ratio,
       CASE WHEN coalesce(p.n_tokens, 0) > 0
            THEN CAST(p.top AS DOUBLE) / CAST(p.n_tokens AS DOUBLE)
            ELSE 0.0 END AS top_token_frac,
       CASE WHEN coalesce(p.n_types, 0) > 0
            THEN CAST(p.hapax AS DOUBLE) / CAST(p.n_types AS DOUBLE)
            ELSE 0.0 END AS hapax_frac
FROM documents d LEFT JOIN per p USING (doc_id)
"""


@query("lexical_diversity_quality", oracle=_LEXDIV_ORACLE)
def lexical_diversity_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Type/token quality deck per document (operators/curation.
    lexical_diversity): token and type counts, type-token ratio,
    top-token mass (the unigram cousin of Gopher's top-2gram), and
    hapax fraction — low hapax flags template/boilerplate text. One
    (doc, token) exchange, exact integers, one closing divide per
    ratio; empty docs pinned to 0/0.0."""
    from convert_parquet_to_csv_spark.operators.curation import (
        lexical_diversity,
    )

    return lexical_diversity(
        _docs(spark, sf_dir).select("doc_id", "text")
    )


# --------------------------------------------------------------------------
# r8 wave 2: tokenizer fertility under the LEARNED BPE (completing the
# loop: tokenizer_fertility_by_lang measures the regex proxy; this
# measures the tokenizer the engine actually trained). Day-one gated.
# --------------------------------------------------------------------------

_BPE_FERTILITY_ORACLE = (
    _bpe_chain(_BPE_ROUNDS)
    + _BPE_OCC_CTE
    + f""",
enc AS (
  SELECT d.doc_id,
         CAST(coalesce(sum(len(e.sy)), 0) AS BIGINT) AS nb
  FROM documents d
  LEFT JOIN occ ON occ.doc_id = d.doc_id
  LEFT JOIN w{_BPE_ROUNDS} e ON e.w = occ.w
  GROUP BY d.doc_id
),
nw AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              t -> t != '')) AS BIGINT) AS nwords,
         lang
  FROM documents
)
SELECT lang,
       CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
       CAST(sum(nwords) AS BIGINT) AS n_words,
       CAST(sum(nb) AS DOUBLE) / CAST(sum(nwords) AS DOUBLE)
         AS fertility
FROM enc JOIN nw USING (doc_id)
GROUP BY lang
"""
)


@query("bpe_fertility_by_lang", oracle=_BPE_FERTILITY_ORACLE)
def bpe_fertility_by_lang(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language fertility of the LEARNED 3-merge BPE tokenizer:
    Σ encoded symbols / Σ whitespace words — the
    tokens-per-word number tokenizer evaluations report, here for
    the tokenizer the engine itself trained (bpe_learn_merges →
    bpe_apply_merges), next to tokenizer_fertility_by_lang's regex
    proxy. Exact integer sums, one closing divide. The oracle
    replays the full merge chain, the per-doc encoded lengths, and
    the per-lang rollup."""
    from convert_parquet_to_csv_spark.functions.text import (
        token_count,
    )
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_apply_merges,
        bpe_learn_merges,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    merges = bpe_learn_merges(docs, rounds=_BPE_ROUNDS)
    counts = bpe_apply_merges(docs, merges, rounds=_BPE_ROUNDS)
    joined = counts.join(
        docs.select(
            "doc_id",
            "lang",
            token_count("text").cast("bigint").alias("_nw"),
        ),
        "doc_id",
    )
    return joined.groupBy("lang").agg(
        F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.sum("_nw").cast("bigint").alias("n_words"),
        (
            F.sum("n_bpe_tokens").cast("double")
            / F.sum("_nw").cast("double")
        ).alias("fertility"),
    )


# --------------------------------------------------------------------------
# r9: unigram-LM tokenizer (the second subword family beside BPE —
# VERDICT r8 item 6). Day-one gated.
# --------------------------------------------------------------------------

_ULM_V = 64       # top multi-char pieces kept
_ULM_P = 4        # max piece length (chars)
_ULM_W = 16       # word clip (chars)
_ULM_PEN = 100_000_000


def _ulm_oracle() -> str:
    """DuckDB replay of operators/chunking.unigram_lm_encode: the
    Viterbi fold unrolls to ``_ULM_W`` lateral column aliases (b1..
    b16), each the least() over ≤ ``_ULM_P`` predecessor steps. Step
    costs come from ONE hash join of the enumerated (word, start,
    len) substrings against the cost table, pivoted to st_{s}_{p}
    columns per word (a MAP-typed lookup was measured 30× slower
    here — DuckDB 1.0 map_extract scans the map linearly, 64 probes
    × vocab-size compares per word). Out-of-range (s, p) cells are
    NULL and only ever feed b_i with i > len(w), which bs[len(w)]
    discards; `//`/`%` on the non-negative combined encoding match
    Spark's div/%."""
    bs = []
    for i in range(1, _ULM_W + 1):
        cands = [
            f"b{i - p} + st_{i - p + 1}_{p}"
            for p in range(1, min(_ULM_P, i) + 1)
        ]
        body = cands[0] if len(cands) == 1 else (
            "least(" + ", ".join(cands) + ")"
        )
        bs.append(f"{body} AS b{i}")
    b_aliases = ",\n           ".join(bs)
    blist = ", ".join(f"b{i}" for i in range(1, _ULM_W + 1))
    st_cols = ",\n         ".join(
        f"MAX(CASE WHEN s = {s} AND p = {p} THEN st END) AS st_{s}_{p}"
        for s in range(1, _ULM_W + 1)
        for p in range(1, min(_ULM_P, _ULM_W - s + 1) + 1)
    )
    return f"""
WITH occ AS (
  SELECT doc_id, substr(t, 1, {_ULM_W}) AS w
  FROM (SELECT doc_id,
               unnest(list_filter(string_split_regex(trim(text),
                                                     '\\s+'),
                                  x -> x != '')) AS t
        FROM documents)
),
wf AS (SELECT w, count(*) AS wc FROM occ GROUP BY w),
ep AS (
  SELECT w, wc, CAST(i AS INT) AS s, CAST(p AS INT) AS p,
         substr(w, CAST(i AS INT), CAST(p AS INT)) AS piece
  FROM wf,
       unnest(range(1, len(w) + 1)) ti(i),
       unnest(range(1, least({_ULM_P}, len(w) - i + 1) + 1)) tp(p)
),
pc AS (
  SELECT piece, CAST(sum(wc) AS BIGINT) AS mass FROM ep GROUP BY 1
),
vocab AS (
  SELECT piece, mass FROM pc WHERE len(piece) = 1
  UNION ALL
  SELECT piece, mass FROM (
    SELECT piece, mass FROM pc WHERE len(piece) > 1
    ORDER BY mass DESC, piece ASC LIMIT {_ULM_V})
),
mm AS (SELECT CAST(sum(mass) AS BIGINT) AS mt FROM vocab),
costed AS (
  SELECT piece,
         CAST(round(ln(CAST((SELECT mt FROM mm) AS DOUBLE)
                       / CAST(mass AS DOUBLE)) * 1e6) AS BIGINT)
           AS cost
  FROM vocab
),
sp AS (
  SELECT ep.w, ep.s, ep.p,
         COALESCE(c.cost, {_ULM_PEN}) * 1024 + 1 AS st
  FROM ep LEFT JOIN costed c USING (piece)
),
wp AS (
  SELECT w,
         {st_cols}
  FROM sp GROUP BY w
),
dp0 AS (
  SELECT w, CAST(0 AS BIGINT) AS b0,
           {b_aliases}
  FROM wp
),
dp AS (SELECT w, [{blist}][len(w)] AS comb FROM dp0),
enc AS (
  SELECT occ.doc_id,
         CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(dp.comb % 1024) AS BIGINT) AS np,
         CAST(sum(dp.comb // 1024) AS BIGINT) AS tc
  FROM occ JOIN dp USING (w)
  GROUP BY occ.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(nw, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(np, 0) AS BIGINT) AS n_pieces,
       CAST(COALESCE(tc, 0) AS BIGINT) AS total_cost_micro,
       CASE WHEN COALESCE(nw, 0) > 0
            THEN CAST(np AS DOUBLE) / CAST(nw AS DOUBLE)
       END AS pieces_per_word
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN enc ON d.doc_id IS NOT DISTINCT FROM enc.doc_id
"""


@query("unigram_lm_encode", oracle=_ulm_oracle())
def unigram_lm_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) corpus encoding
    (operators/chunking.unigram_lm_encode; Kudo 2018): seed-vocab
    substring masses → integer micro-nat piece costs (the DSIR
    quantization device — one ln per piece at vocab scale, exact
    integers everywhere the corpus is touched) → per-word Viterbi
    via an aggregate fold minimizing cost·1024+pieces (lexicographic
    min: cheapest, then fewest pieces) → per-doc rollup with an
    id-spine for token-less docs. ONE corpus exchange (word
    frequencies); everything else is vocab-scale or a map-side
    projection over distinct words. The oracle unrolls the identical
    fold to 16 lateral column aliases."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        unigram_lm_encode,
    )

    return unigram_lm_encode(
        _docs(spark, sf_dir),
        vocab_multi=_ULM_V,
        max_piece_len=_ULM_P,
        max_word_len=_ULM_W,
    )


# --- WordPiece greedy encoding (r9) ----------------------------------------

_WP_V = 64   # top multi-char (piece, flavor) pairs kept
_WP_P = 4    # max piece length (chars)
_WP_W = 16   # word clip (chars)


def _wp_oracle() -> str:
    """DuckDB replay of operators/chunking.wordpiece_encode. Best
    (longest) matching piece length per start position comes from a
    MAX-CASE pivot of the (start, len) candidate enumeration against
    the flavor-keyed vocabulary ('^'+piece word-initial, '#'+piece
    continuation — the flavor folded into one string key exactly as
    the Spark map). The greedy jump fold runs as a RECURSIVE CTE
    (pos → pos + bps[pos]) rather than _ulm_oracle's lateral-alias
    unroll: each jump step references the previous state THREE times
    (guard, jump base, list index), so textual alias substitution
    grows 3^16 ≈ 43M nodes and DuckDB's binder never returns —
    measured as a hang at sf0.001; the recursive form is linear
    (0.3 s). The list-subscript device and the bp pivot are shared
    with _ulm_oracle."""
    bp_cols = ",\n         ".join(
        f"MAX(CASE WHEN s = {s} AND matched THEN p END) AS bp_{s}"
        for s in range(1, _WP_W + 1)
    )
    bp_list = ", ".join(f"bp_{s}" for s in range(1, _WP_W + 1))
    return rf"""
WITH RECURSIVE occ AS (
  SELECT doc_id, substr(t, 1, {_WP_W}) AS w
  FROM (SELECT doc_id,
               unnest(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x != '')) AS t
        FROM documents)
),
wf AS (SELECT w, count(*) AS wc FROM occ GROUP BY w),
ep AS (
  SELECT w, wc, CAST(i AS INT) AS s, CAST(p AS INT) AS p,
         (CASE WHEN CAST(i AS INT) = 1 THEN '^' ELSE '#' END
          || substr(w, CAST(i AS INT), CAST(p AS INT))) AS vkey
  FROM wf,
       unnest(range(1, len(w) + 1)) ti(i),
       unnest(range(1, least({_WP_P}, len(w) - i + 1) + 1)) tp(p)
),
pc AS (
  SELECT vkey, CAST(sum(wc) AS BIGINT) AS mass FROM ep GROUP BY 1
),
vocab AS (
  SELECT vkey FROM pc WHERE len(vkey) = 2
  UNION ALL
  SELECT vkey FROM (
    SELECT vkey FROM pc WHERE len(vkey) > 2
    ORDER BY mass DESC, vkey ASC LIMIT {_WP_V})
),
mt AS (
  SELECT ep.w, ep.s, ep.p, (v.vkey IS NOT NULL) AS matched
  FROM ep LEFT JOIN vocab v USING (vkey)
),
wp AS (
  SELECT w,
         {bp_cols}
  FROM mt GROUP BY w
),
steps AS (
  SELECT w, len(w) AS lw, [{bp_list}] AS bps,
         1 AS pos, 0 AS n
  FROM wp
  UNION ALL
  SELECT w, lw, bps, pos + bps[pos], n + 1
  FROM steps WHERE pos <= lw
),
wn AS (SELECT w, CAST(max(n) AS BIGINT) AS np FROM steps GROUP BY w),
enc AS (
  SELECT occ.doc_id,
         CAST(count(*) AS BIGINT) AS nw,
         CAST(sum(wn.np) AS BIGINT) AS np
  FROM occ JOIN wn USING (w)
  GROUP BY occ.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(nw, 0) AS BIGINT) AS n_words,
       CAST(COALESCE(np, 0) AS BIGINT) AS n_pieces,
       CASE WHEN COALESCE(nw, 0) > 0
            THEN CAST(np AS DOUBLE) / CAST(nw AS DOUBLE)
       END AS pieces_per_word
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN enc ON d.doc_id IS NOT DISTINCT FROM enc.doc_id
"""


@query("wordpiece_encode", oracle=_wp_oracle())
def wordpiece_encode_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece (BERT-style) greedy longest-match-first corpus
    encoding (operators/chunking.wordpiece_encode; Wu et al. 2016,
    Devlin et al. 2019): flavor-keyed vocabulary ('^' word-initial /
    '#' continuation pieces ranked by corpus mass, all single chars
    kept for coverage) → greedy jump fold over each distinct word →
    per-doc piece counts with an id-spine. The third subword family
    beside BPE (merge-rank greedy) and unigram-LM (Viterbi) — same
    clip knobs, directly comparable fertility. ONE corpus exchange
    (word frequencies); vocabulary ranking, the 1-row broadcast
    piece map, and the greedy fold are all vocab-scale or map-side."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        wordpiece_encode,
    )

    return wordpiece_encode(
        _docs(spark, sf_dir),
        vocab_multi=_WP_V,
        max_piece_len=_WP_P,
        max_word_len=_WP_W,
    )


# --- BM25 lexical retrieval (r9) -------------------------------------------

_BM25_QMOD = 211   # query docs = doc_id % 211 == 5
_BM25_K = 5
_BM25_QTERMS = 8

# Constant-expression discipline: the SQL spells (1.2 + 1.0) and
# (1.0 - 0.75) instead of 2.2 / 0.25 so both engines derive the
# double from the SAME parsed expressions. Verified (ADVICE r9):
# Python's 1.2 + 1.0 rounds to EXACTLY the double 2.2
# (0x1.199999999999ap+1), and DuckDB's DECIMAL (1.2 + 1.0) casts to
# the same double — the spelled-out form is defensive (it stays
# correct if someone swaps k1), not load-bearing for the hash match.
def _bm25_oracle(k: int) -> str:
    """The BM25 replay chain, parameterized on k so the hybrid
    re-rank gate (r10) can nest the same chain at candidate depth m
    without duplicating the SQL."""
    return rf"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     t -> t != '') AS tk
  FROM documents
),
tf AS (
  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(tk) AS t FROM tok) GROUP BY ALL
),
dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
nrow AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
stats AS (
  SELECT n,
         CAST((SELECT COALESCE(sum(dl), 0) FROM dl) AS DOUBLE)
           / CAST(n AS DOUBLE) AS avgdl
  FROM nrow
),
dft AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
idf AS (
  SELECT t,
         CAST(floor(ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)
                       + 1.0) * 1e6 + 0.5) AS BIGINT) AS idf,
         avgdl
  FROM dft, stats
),
q AS (
  SELECT DISTINCT doc_id AS query_id, t
  FROM (SELECT doc_id, unnest(tk[1:{_BM25_QTERMS}]) AS t
        FROM tok WHERE doc_id % {_BM25_QMOD} = 5)
),
m AS (
  SELECT q.query_id, tf.doc_id,
         CAST(floor(
           CAST(idf AS DOUBLE)
             * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
             / (CAST(tf AS DOUBLE)
                + 1.2 * ((1.0 - 0.75)
                         + 0.75 * CAST(dl AS DOUBLE) / avgdl))
           + 0.5) AS BIGINT) AS c
  FROM tf
  JOIN q USING (t)
  JOIN dl USING (doc_id)
  JOIN idf USING (t)
),
s AS (
  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
  FROM m GROUP BY ALL
),
r AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM s
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, score_micro,
       CAST(score_micro AS DOUBLE) / 1e6 AS score
FROM r WHERE rank <= {k}
"""


_BM25_ORACLE = _bm25_oracle(_BM25_K)


@query("bm25_topk_docs", oracle=_BM25_ORACLE)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (operators/retrieval.bm25_topk; Okapi
    BM25, Lucene non-negative idf flavor): query docs = doc_id %
    211 == 5 issuing their first 8 distinct tokens as the query —
    the dedup-mining/contamination-forensics lookup shape. ONE
    corpus exchange (the (doc, term) tf groupBy; dl rolls up
    doc-keyed from it); df/idf model-scale with the N/avgdl 1-row
    broadcast close; query terms broadcast into the postings; per
    (query, doc, term) contributions round to integer micro units
    before the BIGINT per-doc sum (order-independent); top-k as a
    per-query WindowGroupLimit."""
    from convert_parquet_to_csv_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = _docs(spark, sf_dir)
    queries = docs.filter(
        F.col("doc_id") % _BM25_QMOD == F.lit(5)
    ).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("qtext"),
    )
    return bm25_topk(
        docs,
        queries,
        k=_BM25_K,
        max_query_terms=_BM25_QTERMS,
    )


# --- two-stage hybrid retrieval: BM25 -> cosine re-rank (r10) --------------

_RERANK_M = 20  # BM25 candidate depth
_RERANK_K = 5   # final top-k after the cosine re-rank

# The BM25 chain nests at depth m as a parenthesized subquery; the
# re-rank joins candidates and queries to the embeddings table
# (INNER — rows without vectors drop, the operator contract; sf0.1's
# partial embedding coverage exercises the path) and replays
# functions.vectors.cosine_similarity via list_dot_product on
# DOUBLE-cast lists (bitwise-equal accumulation — the
# similarity-module determinism contract).
_BM25_RERANK_ORACLE = f"""
WITH cand AS (
  SELECT query_id, rank AS bm25_rank, doc_id,
         score_micro AS bm25_score_micro
  FROM ({_bm25_oracle(_RERANK_M)}) b
), vd AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), qv AS (
  SELECT q.query_id, vd.v AS qvec
  FROM (SELECT DISTINCT query_id FROM cand) q
  JOIN vd ON vd.vec_id = q.query_id
), j AS (
  SELECT cand.query_id, cand.doc_id, cand.bm25_rank,
         cand.bm25_score_micro,
         list_dot_product(qv.qvec, vd.v)
           / (sqrt(list_dot_product(qv.qvec, qv.qvec))
              * sqrt(list_dot_product(vd.v, vd.v))) AS cosine
  FROM cand
  JOIN qv USING (query_id)
  JOIN vd ON vd.vec_id = cand.doc_id
), rr AS (
  SELECT *, row_number() OVER (
      PARTITION BY query_id
      ORDER BY cosine DESC, doc_id ASC) AS rank
  FROM j
)
SELECT query_id, CAST(rank AS BIGINT) AS rank, doc_id, cosine,
       CAST(bm25_rank AS BIGINT) AS bm25_rank, bm25_score_micro
FROM rr WHERE rank <= {_RERANK_K}
"""


@query("bm25_rerank_topk", oracle=_BM25_RERANK_ORACLE)
def bm25_rerank_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid retrieval (operators/retrieval.
    bm25_rerank_topk, r10): BM25 top-20 lexical candidates per query
    (same query construction as bm25_topk_docs) → exact-cosine
    embedding re-rank of the candidate set → top-5 by (cosine DESC,
    doc_id ASC), BM25 rank/score as provenance. Candidate-bounded by
    construction: the candidate and query-vector tables broadcast
    against the embeddings table — two map-side vector passes, no
    corpus-wide cosine, no vector shuffle (plan-audited)."""
    from convert_parquet_to_csv_spark.operators.retrieval import (
        bm25_rerank_topk,
    )

    docs = _docs(spark, sf_dir)
    queries = docs.filter(
        F.col("doc_id") % _BM25_QMOD == F.lit(5)
    ).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("qtext"),
    )
    vectors = read_parquet(
        spark, os.path.join(sf_dir, "embeddings.parquet")
    )
    return bm25_rerank_topk(
        docs,
        queries,
        vectors,
        m=_RERANK_M,
        k=_RERANK_K,
        max_query_terms=_BM25_QTERMS,
    )


# --- three-family subword fertility comparison (r9) ------------------------

# Each family's full oracle nests as a parenthesized WITH-subquery
# (DuckDB scopes CTE names per subquery, so the ULM and WordPiece
# chains' identically-named CTEs cannot collide); the BPE block is
# already per-lang, the per-doc ULM/WP blocks join documents for
# lang and roll up. n_words is each family's own whitespace count —
# identical by construction (case folding never changes token
# boundaries), which the unit test pins.
_FERT_COMPARE_ORACLE = f"""
SELECT 'bpe' AS family, lang,
       n_bpe_tokens AS n_pieces, n_words,
       fertility AS pieces_per_word
FROM ({_BPE_FERTILITY_ORACLE})
UNION ALL
SELECT 'unigram' AS family, d.lang,
       CAST(sum(u.n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(u.n_words) AS BIGINT) AS n_words,
       CAST(sum(u.n_pieces) AS DOUBLE) / CAST(sum(u.n_words) AS DOUBLE)
         AS pieces_per_word
FROM ({_ulm_oracle()}) u
JOIN documents d USING (doc_id)
GROUP BY d.lang
UNION ALL
SELECT 'wordpiece' AS family, d.lang,
       CAST(sum(w.n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(w.n_words) AS BIGINT) AS n_words,
       CAST(sum(w.n_pieces) AS DOUBLE) / CAST(sum(w.n_words) AS DOUBLE)
         AS pieces_per_word
FROM ({_wp_oracle()}) w
JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


@query("subword_fertility_compare", oracle=_FERT_COMPARE_ORACLE)
def subword_fertility_compare(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language fertility of ALL THREE in-engine subword
    families side by side — (family, lang, n_pieces, n_words,
    pieces_per_word) for the learned BPE (merge-rank greedy), the
    unigram-LM (global-cost Viterbi), and WordPiece (greedy
    longest-match) — the tokenizer-selection table a multilingual
    pipeline reads before committing a vocabulary. Each family runs
    its standard one-corpus-exchange plan; the comparison adds only
    three lang-keyed rollups and a union. The oracle nests the
    three full replay chains as WITH-subqueries."""
    from convert_parquet_to_csv_spark.functions.text import (
        token_count,
    )
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_apply_merges,
        bpe_learn_merges,
        unigram_lm_encode,
        wordpiece_encode,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    lang_nw = docs.select(
        "doc_id",
        "lang",
        token_count("text").cast("bigint").alias("_nw"),
    )

    def _rollup(per_doc: DataFrame, pieces_col: str, family: str):
        j = per_doc.join(lang_nw, "doc_id")
        return j.groupBy("lang").agg(
            F.sum(pieces_col).cast("bigint").alias("n_pieces"),
            F.sum("_nw").cast("bigint").alias("n_words"),
            (
                F.sum(pieces_col).cast("double")
                / F.sum("_nw").cast("double")
            ).alias("pieces_per_word"),
        ).select(
            F.lit(family).alias("family"),
            "lang",
            "n_pieces",
            "n_words",
            "pieces_per_word",
        )

    merges = bpe_learn_merges(docs, rounds=_BPE_ROUNDS)
    bpe = _rollup(
        bpe_apply_merges(docs, merges, rounds=_BPE_ROUNDS).select(
            "doc_id", F.col("n_bpe_tokens").alias("_np")
        ),
        "_np",
        "bpe",
    )
    ulm = _rollup(
        unigram_lm_encode(
            docs,
            vocab_multi=_ULM_V,
            max_piece_len=_ULM_P,
            max_word_len=_ULM_W,
        ).select("doc_id", F.col("n_pieces").alias("_np")),
        "_np",
        "unigram",
    )
    wp = _rollup(
        wordpiece_encode(
            docs,
            vocab_multi=_WP_V,
            max_piece_len=_WP_P,
            max_word_len=_WP_W,
        ).select("doc_id", F.col("n_pieces").alias("_np")),
        "_np",
        "wordpiece",
    )
    return bpe.unionByName(ulm).unionByName(wp)


# --- per-line language segmentation (r10) ----------------------------------

_SEG_W = 12  # tokens per synthesized line

# Mixed-language fixture: pair each doc with its successor
# (doc_id + 1, inner — NULL ids and the last doc drop in both
# engines), wrap each text into 12-token lines, and concatenate the
# two line blocks — giving multi-line documents whose lines really
# do carry different langid outcomes. The oracle replays the line
# synthesis (the line-dedup device), the per-line marker scores, the
# fixed argmax tie-break, and the min-struct majority election
# (row_number ORDER BY c DESC, lang ASC == Spark's
# min(struct(-c, lang))).
_SEG_LINE_SYNTH = f"""
  SELECT doc_id,
         CASE
           WHEN a IS NULL THEN NULL
           WHEN len(a) = 0 THEN ''
           ELSE array_to_string(
             list_transform(
               range(1, CAST(ceil(len(a) / {_SEG_W}.0) AS BIGINT) + 1),
               p -> array_to_string(
                 a[CAST((p-1)*{_SEG_W} AS INT)+1
                   :CAST((p-1)*{_SEG_W} AS INT)+{_SEG_W}], ' ')),
             chr(10))
         END AS text2
  FROM (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '\\s+'),
                           t -> t != '') AS a
        FROM documents)
"""

_SEG_ORACLE = f"""
WITH lined AS ({_SEG_LINE_SYNTH}),
pairs AS (
  SELECT l1.doc_id,
         l1.text2 || chr(10) || l2.text2 AS mixed
  FROM lined l1 JOIN lined l2 ON l2.doc_id = l1.doc_id + 1
  WHERE l1.text2 IS NOT NULL AND l2.text2 IS NOT NULL
),
ln AS (
  SELECT doc_id, unnest(string_split(mixed, chr(10))) AS line
  FROM pairs
),
sc AS (
  SELECT doc_id,
         CAST({_duck_lang_score('en', 'line')} AS DOUBLE) AS s_en,
         CAST({_duck_lang_score('de', 'line')} AS DOUBLE) AS s_de,
         CAST({_duck_lang_score('fr', 'line')} AS DOUBLE) AS s_fr,
         CAST({_duck_lang_score('es', 'line')} AS DOUBLE) AS s_es
  FROM ln
),
pred AS (
  SELECT doc_id,
         CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
              WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
              WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
              WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
              WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
         END AS lang
  FROM sc
),
cnt AS (
  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS c
  FROM pred GROUP BY 1, 2
),
rw AS (
  SELECT doc_id, lang, c, row_number() OVER (
      PARTITION BY doc_id ORDER BY c DESC, lang ASC) AS rn
  FROM cnt
),
gs AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_lines,
         CAST(count(*) AS BIGINT) AS n_langs
  FROM cnt GROUP BY 1
)
SELECT gs.doc_id, gs.n_lines, rw.lang AS majority_lang,
       CAST(rw.c AS DOUBLE) / CAST(gs.n_lines AS DOUBLE)
         AS majority_frac,
       gs.n_langs
FROM gs JOIN rw ON rw.doc_id = gs.doc_id AND rw.rn = 1
"""


@query("langid_line_segments", oracle=_SEG_ORACLE)
def langid_line_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-line language segmentation
    (operators/curation.langid_segments, r10): the mC4/CCNet
    routing-vs-segmenting readout — line-granular langid over
    multi-line docs, per-doc majority language, majority fraction,
    and distinct-language count (n_langs > 1 = the mixed-page flag).
    Fixture synthesizes genuinely mixed documents by pairing each
    doc with its successor and wrapping both texts into 12-token
    lines. One line explode + map-side marker scoring (no UDF, no
    model table), one (id, lang) partial-agg shuffle, one doc-keyed
    close."""
    from convert_parquet_to_csv_spark.operators.curation import (
        langid_segments,
    )

    d = _docs(spark, sf_dir).select(
        "doc_id", T.synth_token_lines("text", w=_SEG_W).alias("_t")
    )
    d2 = d.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("_t").alias("_t2")
    )
    mixed = (
        d.join(d2, "doc_id")
        .filter(F.col("_t").isNotNull() & F.col("_t2").isNotNull())
        .select(
            "doc_id",
            F.concat(F.col("_t"), F.lit("\n"), F.col("_t2")).alias(
                "text"
            ),
        )
    )
    return langid_segments(mixed)

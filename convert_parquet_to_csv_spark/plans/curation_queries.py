"""Driver-checked queries: corpus curation (decontamination,
distinctive terms, temperature mixing) over the documents table.

Cross-engine determinism notes (why these exact formulas):

- Tokenization is the repo-standard ``split(lower(trim(text)), '\\s+')``
  + drop-empties, mirrored as DuckDB ``string_split_regex`` +
  ``list_filter`` (same pairing as text_queries.py — both regex
  engines agree on ``\\s+`` over this corpus).
- Every float step is IEEE-exactly-rounded (sqrt, one multiply, one
  divide) → bit-identical across JVM and DuckDB; no ln/exp/pow
  anywhere (see operators/curation.py docstrings).
- The gated gram width is 3 (the fixture docs are 10–99 tokens;
  13-grams would make an empty result). Production decontamination
  uses the operator default n=13.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators import curation as C
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


# --- test-set decontamination ---------------------------------------------

# Benchmark set = doc_id % 97 == 0: a deterministic pseudo-"eval set"
# carved from the corpus itself so the fixture needs no extra table.
_DECON_ORACLE = r"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t != '') AS w
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM words
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
SELECT grams.doc_id,
       CAST(COUNT(DISTINCT grams.gram) AS BIGINT) AS n_overlap
FROM grams JOIN bench USING (gram)
WHERE grams.doc_id % 97 <> 0
GROUP BY grams.doc_id
"""


@query("decontaminate_ngram_overlap", oracle=_DECON_ORACLE)
def decontaminate_ngram_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Training docs that share ≥1 word 3-gram with the benchmark
    subset (doc_id % 97 == 0) — the eval-leakage guard every LLM
    training pipeline runs before chunking.

    Plan: benchmark grams distinct'd and broadcast; the training-side
    exploded gram stream is filtered map-side, so the only shuffle is
    the final per-doc distinct-count. At 100 TB the benchmark side is
    the (small) eval suite and this stays a broadcast semi-join.

    Since r5 the exact flavor is hash-accelerated: the corpus side
    joins on xxhash64 of the token slice (no gram strings built) and
    verifies token-array equality on hash matches, so the result is
    still exactly the string-join result (operators/curation.py
    flag_contaminated; measured 3.90 → 1.56 s at sf0.1).
    """
    docs = _docs(spark, sf_dir)
    is_bench = F.col("doc_id") % 97 == 0
    return C.flag_contaminated(
        docs.filter(~is_bench), docs.filter(is_bench), n=3
    )


# --- distinctive terms (tf·N/df) ------------------------------------------

_TERMS_ORACLE = r"""
WITH words AS (
  SELECT doc_id, unnest(
    list_filter(string_split_regex(lower(trim(text)), '\s+'),
                t -> t != '')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM words
       GROUP BY doc_id, term),
df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM words
       GROUP BY term),
n AS (SELECT COUNT(*) AS n_corpus FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(tf.tf * n.n_corpus AS DOUBLE) / CAST(df.df AS DOUBLE)
           AS score
  FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
  SELECT doc_id, term, score,
         CAST(row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT)
           AS rk
  FROM scored
)
SELECT doc_id, term, score, rk FROM ranked WHERE rk <= 3
"""


@query("distinctive_terms_tfidf", oracle=_TERMS_ORACLE)
def distinctive_terms_tfidf(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-3 corpus-distinctive terms per document, score = tf·N/df.

    ln-free idf variant so the score is bit-identical across engines
    (ln drifts a ulp between libms; products and divisions don't —
    operators/curation.py:distinctive_terms). Two partial-agg shuffles
    (doc,term)/(term) + one broadcast of the 1-row corpus count; the
    per-doc window is a WindowGroupLimit (top-k, no full sort).
    """
    return C.distinctive_terms(_docs(spark, sf_dir), top_k=3)


# --- temperature-based source mixing --------------------------------------

_MIX_ORACLE = r"""
WITH vol AS (
  SELECT source, SUM(n_chars) AS w_raw FROM documents GROUP BY source
),
w AS (
  SELECT source, sqrt(CAST(w_raw AS DOUBLE)) AS wt FROM vol
),
tot AS (
  SELECT CAST(SUM(CAST(wt AS DECIMAL(24,6))) AS DOUBLE) AS wsum FROM w
),
tgt AS (
  SELECT source, CAST(floor(100.0 * wt / wsum) AS BIGINT) AS target_n
  FROM w CROSS JOIN tot
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
)
SELECT r.doc_id, r.source
FROM ranked r JOIN tgt USING (source)
WHERE r.rk <= tgt.target_n
"""


@query("source_mix_temperature", oracle=_MIX_ORACLE)
def source_mix_temperature(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """~100-doc sample rebalanced across sources by char-volume^0.5 —
    temperature mixing (alpha=0.5), the standard way to up-weight
    small high-quality sources in a training mixture.

    sqrt is exactly rounded and the weight sum routes through
    DECIMAL(24,6), so per-source targets are bit-identical across
    engines; within-source selection is the md5-of-id deterministic
    permutation. One tiny per-source agg + broadcast target join +
    one window per source partition — no global funnel.
    """
    return C.mix_sources_temperature(
        _docs(spark, sf_dir), total=100, alpha=0.5
    )


_SPAN_DEDUP_ORACLE = """
WITH arr AS (
  SELECT doc_id, string_split(text, ' ') AS a FROM documents
),
grams AS (
  SELECT doc_id, CAST(p AS INT) AS pos,
         array_to_string(a[CAST(p AS INT)+1:CAST(p AS INT)+4], ' ')
           AS gram
  FROM arr, UNNEST(range(0, greatest(len(a) - 3, 0))) AS t(p)
),
hot AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING COUNT(DISTINCT doc_id) > 2
),
covered AS (
  SELECT DISTINCT g.doc_id, g.pos + CAST(c AS INT) AS cpos
  FROM grams g JOIN hot USING (gram), UNNEST(range(0, 4)) AS u(c)
),
words AS (
  SELECT doc_id, CAST(p AS INT) AS pos, a[CAST(p AS INT)+1] AS word
  FROM arr, UNNEST(range(0, len(a))) AS t(p)
)
SELECT w.doc_id,
       COALESCE(array_to_string(
         list(w.word ORDER BY w.pos) FILTER (c.cpos IS NULL), ' '),
         '') AS clean_text,
       CAST(COUNT(*) FILTER (c.cpos IS NULL) AS BIGINT) AS n_kept,
       CAST(COUNT(c.cpos) AS BIGINT) AS n_removed
FROM words w LEFT JOIN covered c
  ON w.doc_id = c.doc_id AND w.pos = c.cpos
GROUP BY w.doc_id
"""


@query("span_dedup_c4", oracle=_SPAN_DEDUP_ORACLE)
def span_dedup_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span removal (operators/curation.
    remove_duplicated_spans): every word covered by a 4-gram occurring
    in >2 distinct documents is deleted, the rest of each document
    survives in order — the C4 "repeated span" rule at word-shingle
    granularity, complementing doc-level dedup (which drops whole
    documents and would keep shared boilerplate inside survivors).

    Gated settings n=4 / max_docs=2 are fixture-calibrated: 100 of
    24k distinct 4-grams are corpus-hot at sf0.01, so the pass removes
    real spans without degenerating (at n≥5 only the seeded
    near-duplicate docs overlap; at n≤3 the small synthetic vocabulary
    makes most text "hot"). Production web corpora use the operator
    defaults over sentence-ish n. The oracle replays tokenize →
    shingle → heavy-hitter → coverage → reassembly verbatim, so
    clean_text hashes check word-exact reconstruction."""
    return C.remove_duplicated_spans(
        _docs(spark, sf_dir).select("doc_id", "text"), n=4, max_docs=2
    )


@query("decontaminate_ngram_overlap_hashed", oracle=_DECON_ORACLE)
def decontaminate_ngram_overlap_hashed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 100 TB form of decontamination: identical semantics to
    decontaminate_ngram_overlap but joining on xxhash64(gram) longs
    (~10× smaller broadcast keys).

    Oracle upgrade (VERDICT r4 item 8 class): xxhash64 has no DuckDB
    twin, but the OUTPUT (doc_id, n_overlap) equals the string-key
    flavor's exactly unless two distinct grams collide in 64 bits
    (~n_grams²/2⁶⁵ — never observed on the fixtures), so the hashed
    path now carries the string flavor's value-hash oracle instead
    of a rows-only check. A red row here would mean an actual
    collision on the fixture — worth knowing, not worth masking.
    tests/test_curation.py additionally pins the two paths equal."""
    docs = _docs(spark, sf_dir)
    is_bench = F.col("doc_id") % 97 == 0
    return C.flag_contaminated(
        docs.filter(~is_bench),
        docs.filter(is_bench),
        n=3,
        hash_grams=True,
    )


# --- epoch resampling with replacement ------------------------------------

_EPOCH_ORACLE = r"""
WITH vol AS (
  SELECT source, SUM(n_chars) AS w_raw, COUNT(*) AS n_docs
  FROM documents GROUP BY source
),
w AS (
  SELECT source, n_docs, sqrt(CAST(w_raw AS DOUBLE)) AS wt FROM vol
),
tot AS (
  SELECT CAST(SUM(CAST(wt AS DECIMAL(24,6))) AS DOUBLE) AS wsum,
         SUM(n_docs) AS n_corpus
  FROM w
),
tgt AS (
  SELECT source, n_docs,
         CAST(floor(3.0 * CAST(n_corpus AS DOUBLE) * wt / wsum)
              AS BIGINT) AS target_n
  FROM w CROSS JOIN tot
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents
),
sel AS (
  SELECT r.doc_id, r.source,
         tgt.target_n // tgt.n_docs
           + CASE WHEN r.rk <= tgt.target_n % tgt.n_docs
                  THEN 1 ELSE 0 END AS copies
  FROM ranked r JOIN tgt USING (source)
)
SELECT doc_id, source,
       CAST(unnest(range(1, copies + 1)) AS INT) AS copy_idx
FROM sel WHERE copies > 0
"""


@query("epoch_resample_replacement", oracle=_EPOCH_ORACLE)
def epoch_resample_replacement(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """3-epoch temperature resample WITH replacement: every source
    replicated to its sqrt-char-volume share of 3× the corpus, docs
    repeating ``T div n`` (+1 for the md5-first remainder) times —
    the repeat-upsampling mixture builder (see operators.curation.
    epoch_resample for the exactness and scale notes)."""
    return C.epoch_resample(_docs(spark, sf_dir), epochs=3.0)


# --- source-level language pruning ----------------------------------------

_SOURCE_PRUNE_ORACLE = r"""
WITH stats AS (
  SELECT source,
         COUNT(*) AS n_docs,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en
  FROM documents GROUP BY source
), kept AS (
  SELECT source, n_docs, n_en FROM stats
  WHERE CAST(n_en AS DOUBLE) / n_docs >= 0.4
)
SELECT d.source,
       CAST(MAX(k.n_docs) AS BIGINT) AS n_docs,
       CAST(MAX(k.n_en) AS DOUBLE) / MAX(k.n_docs) AS en_frac,
       CAST(SUM(len(regexp_extract_all(d.text,
            '[A-Za-z0-9_]+|[^A-Za-z0-9_ \t\n]'))) AS BIGINT)
         AS total_bpe_tokens
FROM documents d JOIN kept k ON d.source = k.source
GROUP BY d.source
"""


@query("source_language_prune", oracle=_SOURCE_PRUNE_ORACLE)
def source_language_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level curation: compute each source's English fraction
    (pass 1 — a per-source aggregate a few rows wide), keep only
    sources meeting the ≥40% bar, then semi-join the verdict BACK
    onto the document stream (pass 2) and re-aggregate the survivors
    with a DIFFERENT tokenizer (BPE-ish) to prove the join-back ran.
    This is the "drop bad domains wholesale" stage every pretraining
    pipeline runs before doc-level filtering — decided on aggregate
    evidence, not per-doc scores.

    Scale shape: the verdict table is |sources| rows → BROADCAST;
    the document stream is filtered map-side and never shuffles
    until the final per-source aggregate. Counts are integers; each
    fraction is one closing divide."""
    docs = _docs(spark, sf_dir)
    stats = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.when(F.col("lang") == "en", 1).otherwise(0)
        ).alias("n_en"),
    )
    kept = stats.filter(
        F.col("n_en").cast("double") / F.col("n_docs") >= 0.4
    )
    from convert_parquet_to_csv_spark.functions.text import (
        token_count_bpe,
    )

    survivors = docs.join(F.broadcast(kept), "source")
    return survivors.groupBy("source").agg(
        F.max("n_docs").cast("bigint").alias("n_docs"),
        (
            F.max("n_en").cast("double") / F.max("n_docs")
        ).alias("en_frac"),
        F.sum(token_count_bpe("text").cast("long"))
        .cast("bigint")
        .alias("total_bpe_tokens"),
    )


# --------------------------------------------------------------------------
# Gopher repetition signals + quality-rule deck (r6; past the gate
# prefix — r7 rotation backlog)
# --------------------------------------------------------------------------

# DuckDB replays the metric definition verbatim over gram STRINGS;
# Spark counts by xxhash64(token-slice) — counts are equal modulo the
# documented ~2^-64 base-hash collision acceptance (same contract as
# minhash). Every ratio is one integer mass divided once by the
# tokenizer-consistent char total, so values are IEEE-identical.
_GOPHER_GRAMS_CTE = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     t -> t != '') AS toks
  FROM documents
), base AS (
  SELECT doc_id, toks,
         coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
           + greatest(len(toks) - 1, 0) AS chars
  FROM tok
), grams AS (
  SELECT doc_id, n,
         array_to_string(toks[i + 1 : i + n], ' ') AS gr
  FROM base,
       unnest([2,3,4,5,6,7,8,9,10]) AS tn(n),
       unnest(range(0, len(toks))) AS tp(i)
  WHERE i + n <= len(toks)
), gc AS (
  SELECT doc_id, n, gr, count(*) AS c, length(gr) AS gl
  FROM grams GROUP BY doc_id, n, gr
), per_n AS (
  -- paper-literal top-gram: mass of the MOST FREQUENT gram (argmax
  -- by count, longer gram breaks ties), via the same
  -- (count << 32 | len) integer-max encode/decode as the Spark side
  SELECT doc_id, n,
         (max(c * 4294967296 + gl) // 4294967296)
           * (max(c * 4294967296 + gl) % 4294967296) AS top_mass,
         sum(CASE WHEN c >= 2 THEN c * gl ELSE 0 END) AS dup_mass
  FROM gc GROUP BY doc_id, n
), sig AS (
  SELECT b.doc_id,
         b.chars,
"""

_GOPHER_SIG_COLS = ",\n".join(
    [
        "         CASE WHEN b.chars > 0 THEN CAST(coalesce(max(CASE "
        f"WHEN n = {n} THEN top_mass END), 0) AS DOUBLE) / "
        f"CAST(b.chars AS DOUBLE) ELSE 0.0 END AS top_{n}gram_char_frac"
        for n in (2, 3, 4)
    ]
    + [
        "         CASE WHEN b.chars > 0 THEN CAST(coalesce(max(CASE "
        f"WHEN n = {n} THEN dup_mass END), 0) AS DOUBLE) / "
        f"CAST(b.chars AS DOUBLE) ELSE 0.0 END AS dup_{n}gram_char_frac"
        for n in (5, 6, 7, 8, 9, 10)
    ]
)

_GOPHER_SIG_ORACLE = (
    _GOPHER_GRAMS_CTE
    + _GOPHER_SIG_COLS
    + """
  FROM base b LEFT JOIN per_n p ON p.doc_id = b.doc_id
  GROUP BY b.doc_id, b.chars
)
SELECT doc_id,
       top_2gram_char_frac, top_3gram_char_frac, top_4gram_char_frac,
       dup_5gram_char_frac, dup_6gram_char_frac, dup_7gram_char_frac,
       dup_8gram_char_frac, dup_9gram_char_frac, dup_10gram_char_frac
FROM sig
"""
)


@query("gopher_repetition_signals", oracle=_GOPHER_SIG_ORACLE)
def gopher_repetition_signals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gopher repetition metrics per doc: char-mass share of the top
    2/3/4-gram and of duplicated 5..10-grams — the standard
    looping-text filters (Rae et al. 2021, Table A1) missing from
    doc_repetition_stats' unigram-only signals."""
    return C.gopher_repetition_signals(_docs(spark, sf_dir))


_GOPHER_FILTER_ORACLE = (
    _GOPHER_GRAMS_CTE
    + _GOPHER_SIG_COLS
    + """
  FROM base b LEFT JOIN per_n p ON p.doc_id = b.doc_id
  GROUP BY b.doc_id, b.chars
), scal AS (
  SELECT doc_id,
         len(toks) AS nt,
         coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS tc,
         len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS aw,
         len(list_intersect(
             list_distinct(list_transform(toks, t -> lower(t))),
             ['the','be','to','of','and','that','have','with'])) AS sh
  FROM tok
)
SELECT s.doc_id,
       s.nt BETWEEN 50 AND 100000 AS word_count_ok,
       CASE WHEN s.nt > 0 THEN
         CAST(s.tc AS DOUBLE) / CAST(s.nt AS DOUBLE) >= 3.0
         AND CAST(s.tc AS DOUBLE) / CAST(s.nt AS DOUBLE) <= 10.0
       ELSE FALSE END AS mean_word_len_ok,
       CASE WHEN s.nt > 0 THEN
         CAST(s.aw AS DOUBLE) / CAST(s.nt AS DOUBLE) >= 0.80
       ELSE FALSE END AS alpha_word_frac_ok,
       s.sh >= 1 AS stopword_ok,
       g.top_2gram_char_frac <= 0.20 AS top_2gram_ok,
       g.top_3gram_char_frac <= 0.18 AS top_3gram_ok,
       g.top_4gram_char_frac <= 0.16 AS top_4gram_ok,
       g.dup_5gram_char_frac <= 0.15 AS dup_5gram_ok,
       g.dup_6gram_char_frac <= 0.14 AS dup_6gram_ok,
       g.dup_7gram_char_frac <= 0.13 AS dup_7gram_ok,
       g.dup_8gram_char_frac <= 0.12 AS dup_8gram_ok,
       g.dup_9gram_char_frac <= 0.11 AS dup_9gram_ok,
       g.dup_10gram_char_frac <= 0.10 AS dup_10gram_ok,
       (s.nt BETWEEN 50 AND 100000)
       AND CASE WHEN s.nt > 0 THEN
             CAST(s.tc AS DOUBLE) / CAST(s.nt AS DOUBLE) >= 3.0
             AND CAST(s.tc AS DOUBLE) / CAST(s.nt AS DOUBLE) <= 10.0
           ELSE FALSE END
       AND CASE WHEN s.nt > 0 THEN
             CAST(s.aw AS DOUBLE) / CAST(s.nt AS DOUBLE) >= 0.80
           ELSE FALSE END
       AND s.sh >= 1
       AND g.top_2gram_char_frac <= 0.20
       AND g.top_3gram_char_frac <= 0.18
       AND g.top_4gram_char_frac <= 0.16
       AND g.dup_5gram_char_frac <= 0.15
       AND g.dup_6gram_char_frac <= 0.14
       AND g.dup_7gram_char_frac <= 0.13
       AND g.dup_8gram_char_frac <= 0.12
       AND g.dup_9gram_char_frac <= 0.11
       AND g.dup_10gram_char_frac <= 0.10 AS passes_all
FROM scal s JOIN sig g ON g.doc_id = s.doc_id
"""
)


@query("gopher_quality_filter", oracle=_GOPHER_FILTER_ORACLE)
def gopher_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Gopher rule deck as per-doc flags + conjunction.
    ``min_stopword_hits=1`` (paper uses 2): the synthetic fixture
    vocabulary contains exactly one canonical stopword ('the'), so the
    paper threshold would zero out ``passes_all`` and gate nothing —
    the flag columns carry every rule at paper thresholds either way."""
    return C.gopher_quality_filter(
        _docs(spark, sf_dir), min_stopword_hits=1
    )


# --------------------------------------------------------------------------
# DSIR importance weights (r6; past the gate prefix — r7 backlog)
# --------------------------------------------------------------------------

# md5-bucket flavor so DuckDB replays the featurization bit-exactly;
# the per-bucket log-ratio is quantized to integer micro-nats in BOTH
# engines, so the only float step is one ln whose 1e-6 rounding grid
# is ~10 orders of magnitude coarser than cross-engine libm ulp drift
# — the per-doc score is then an exact integer dot product.
_DSIR_ORACLE = r"""
WITH rtok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     t -> t != '') AS toks
  FROM documents WHERE source <> 'src0'
), ttok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     t -> t != '') AS toks
  FROM documents WHERE source = 'src0'
), rg AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % 4096 AS b
  FROM (
    SELECT doc_id, unnest(toks) AS g FROM rtok
    UNION ALL
    SELECT doc_id, array_to_string(toks[i + 1 : i + 2], ' ') AS g
    FROM rtok, unnest(range(0, len(toks) - 1)) AS t(i)
    WHERE len(toks) >= 2
  )
), tg AS (
  SELECT ('0x' || substr(md5(g), 1, 15))::BIGINT % 4096 AS b
  FROM (
    SELECT unnest(toks) AS g FROM ttok
    UNION ALL
    SELECT array_to_string(toks[i + 1 : i + 2], ' ') AS g
    FROM ttok, unnest(range(0, len(toks) - 1)) AS t(i)
    WHERE len(toks) >= 2
  )
), dc AS (
  SELECT doc_id, b, count(*) AS c FROM rg GROUP BY 1, 2
), qc AS (
  SELECT b, sum(c) AS qcnt FROM dc GROUP BY 1
), pc AS (
  SELECT b, count(*) AS pcnt FROM tg GROUP BY 1
), tot AS (
  SELECT (SELECT coalesce(sum(pcnt), 0) FROM pc) AS pt,
         (SELECT coalesce(sum(qcnt), 0) FROM qc) AS qt
), ratio AS (
  SELECT q.b,
         CAST(round((
             ln(CAST(coalesce(p.pcnt, 0) + 1 AS DOUBLE)
                / CAST(t.pt + 4096 AS DOUBLE))
           - ln(CAST(q.qcnt + 1 AS DOUBLE)
                / CAST(t.qt + 4096 AS DOUBLE))
         ) * 1e6) AS BIGINT) AS l
  FROM qc q LEFT JOIN pc p ON p.b = q.b, tot t
)
SELECT dc.doc_id,
       CAST(sum(dc.c * r.l) AS BIGINT) AS score_micro
FROM dc JOIN ratio r ON r.b = dc.b
GROUP BY dc.doc_id
"""


@query("dsir_importance_weights", oracle=_DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance scores for every non-src0 doc against the src0
    'target domain' (hashed unigram+bigram bag models, integer
    micro-nat scores). md5-bucket flavor for bit-replay; xxhash64 is
    the production default."""
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    return C.dsir_importance_weights(
        raw, target, num_buckets=4096, hash_fn="md5"
    )


# --------------------------------------------------------------------------
# Bloom-filter decontamination (r6; past the gate prefix — r7 backlog)
# --------------------------------------------------------------------------

# DuckDB replays the ENTIRE Bloom computation, false positives
# included: positions come from the md5-hex device (value-equal in
# both engines), and "all num_hashes positions present in the
# benchmark position set" is pure set logic — DuckDB does it with a
# left join + bool_and where Spark probes a broadcast bitset-word
# table. Any (num_bits, num_hashes) pair hash-matches by
# construction.
_BLOOM_BITS, _BLOOM_K = 1 << 20, 4
_BLOOM_ORACLE = rf"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t != '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, unnest(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM words
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0
), bpos AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || gram), 1, 15))
           ::BIGINT % {_BLOOM_BITS} AS p
  FROM bench, unnest([0, 1, 2, 3]) AS tj(j)
), tgrams AS (
  SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 97 <> 0
), probe AS (
  SELECT t.doc_id, t.gram, bool_and(b.p IS NOT NULL) AS might
  FROM (
    SELECT doc_id, gram,
           ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || gram), 1, 15))
             ::BIGINT % {_BLOOM_BITS} AS p
    FROM tgrams, unnest([0, 1, 2, 3]) AS tj(j)
  ) t
  LEFT JOIN bpos b ON b.p = t.p
  GROUP BY t.doc_id, t.gram
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM probe WHERE might
GROUP BY doc_id
"""


@query("decontaminate_bloom", oracle=_BLOOM_ORACLE)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination screen: same benchmark split and
    3-gram window as decontaminate_ngram_overlap, but membership is a
    2²⁰-bit / 4-hash Bloom bitset broadcast as a (word, bits) table —
    fixed 128 KiB regardless of benchmark size, no false negatives
    ever (the property decontamination needs; a false positive merely
    over-drops). md5-position flavor so DuckDB replays the Bloom
    computation bit-exactly; xxhash64 is the production flavor."""
    docs = _docs(spark, sf_dir)
    is_bench = F.col("doc_id") % 97 == 0
    return C.flag_contaminated_bloom(
        docs.filter(~is_bench),
        docs.filter(is_bench),
        n=3,
        num_bits=_BLOOM_BITS,
        num_hashes=_BLOOM_K,
        hash_fn="md5",
    )


# --------------------------------------------------------------------------
# DSIR-ranked greedy selection to a token budget (r6; r7 backlog)
# --------------------------------------------------------------------------

_BUDGET_TOKENS = 5000

# The oracle replays the SEMANTICS (naive global cumulative sum in
# (score desc, id) order — keep while the running total fits); the
# Spark plan computes the identical kept set two-level (bin carry +
# within-bin prefix) so no data-scale single-partition window exists.
_DSIR_BUDGET_ORACLE = (
    _DSIR_ORACLE.replace(
        """SELECT dc.doc_id,
       CAST(sum(dc.c * r.l) AS BIGINT) AS score_micro
FROM dc JOIN ratio r ON r.b = dc.b
GROUP BY dc.doc_id
""",
        """, scores AS (
  SELECT dc.doc_id,
         CAST(sum(dc.c * r.l) AS BIGINT) AS score_micro
  FROM dc JOIN ratio r ON r.b = dc.b
  GROUP BY dc.doc_id
), toks AS (
  SELECT s.doc_id, s.score_micro,
         CAST(len(rt.toks) AS BIGINT) AS n_tokens
  FROM scores s JOIN rtok rt ON rt.doc_id = s.doc_id
), run AS (
  SELECT doc_id, score_micro, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY score_micro DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM toks
)
SELECT doc_id, score_micro, n_tokens
FROM run WHERE cum <= """
        + str(_BUDGET_TOKENS)
        + "\n",
    ).replace("WITH rtok AS", "WITH rtok AS", 1)
)


@query("dsir_token_budget_selection", oracle=_DSIR_BUDGET_ORACLE)
def dsir_token_budget_selection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The post-scoring step of a DSIR pipeline: greedily keep the
    highest-importance docs until a 5000-token budget fills (maximal
    prefix in (score desc, doc_id) order). Spark computes it
    two-level (score bins → ≤4096-row carry window → within-bin
    prefix windows); the oracle replays the equivalent naive global
    cumsum."""
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    scored = C.dsir_importance_weights(
        raw, target, num_buckets=4096, hash_fn="md5"
    )
    with_text = raw.select("doc_id", "text").join(scored, "doc_id")
    return C.select_to_token_budget(
        with_text, budget_tokens=_BUDGET_TOKENS
    )


# --------------------------------------------------------------------------
# Modern curation pipeline: Gopher gate -> exact dedup -> Bloom
# decontamination -> per-source report (r6; r7 backlog)
# --------------------------------------------------------------------------

# The end-to-end composition of this round's operators, with the
# oracle assembled from the same verified pieces: the Gopher CTEs
# (restricted to the non-benchmark split), the exact-dedup fingerprint
# rank, and the Bloom position-set probe. Every stage is individually
# value-hash gated; this query gates the COMPOSITION.
_MODERN_PIPE_ORACLE = (
    _GOPHER_GRAMS_CTE.replace(
        "FROM documents\n", "FROM documents WHERE doc_id % 97 <> 0\n", 1
    )
    + _GOPHER_SIG_COLS
    + rf"""
  FROM base b LEFT JOIN per_n p ON p.doc_id = b.doc_id
  GROUP BY b.doc_id, b.chars
), scal AS (
  SELECT doc_id,
         len(toks) AS nt,
         coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS tc,
         len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) AS aw,
         len(list_intersect(
             list_distinct(list_transform(toks, t -> lower(t))),
             ['the','be','to','of','and','that','have','with'])) AS sh
  FROM tok
), passing AS (
  SELECT s.doc_id FROM scal s JOIN sig g ON g.doc_id = s.doc_id
  WHERE (s.nt BETWEEN 50 AND 100000)
    AND CASE WHEN s.nt > 0 THEN
          CAST(s.tc AS DOUBLE) / CAST(s.nt AS DOUBLE) >= 3.0
          AND CAST(s.tc AS DOUBLE) / CAST(s.nt AS DOUBLE) <= 10.0
        ELSE FALSE END
    AND CASE WHEN s.nt > 0 THEN
          CAST(s.aw AS DOUBLE) / CAST(s.nt AS DOUBLE) >= 0.80
        ELSE FALSE END
    AND s.sh >= 1
    AND g.top_2gram_char_frac <= 0.20
    AND g.top_3gram_char_frac <= 0.18
    AND g.top_4gram_char_frac <= 0.16
    AND g.dup_5gram_char_frac <= 0.15
    AND g.dup_6gram_char_frac <= 0.14
    AND g.dup_7gram_char_frac <= 0.13
    AND g.dup_8gram_char_frac <= 0.12
    AND g.dup_9gram_char_frac <= 0.11
    AND g.dup_10gram_char_frac <= 0.10
), fp AS (
  SELECT d.doc_id, d.source, d.text,
         md5(trim(regexp_replace(lower(d.text), '\s+', ' ', 'g'))) AS _fp
  FROM documents d JOIN passing p ON p.doc_id = d.doc_id
), dedup AS (
  SELECT doc_id, source, text FROM (
    SELECT *, row_number() OVER (PARTITION BY _fp ORDER BY doc_id) AS rn
    FROM fp
  ) WHERE rn = 1
), dwords AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t != '') AS w
  FROM dedup
), dgrams AS (
  SELECT DISTINCT doc_id, unnest(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM dwords
), bwords AS (
  SELECT list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t != '') AS w
  FROM documents WHERE doc_id % 97 = 0
), bgrams AS (
  SELECT DISTINCT unnest(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM bwords
), bpos AS (
  SELECT DISTINCT
         ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || gram), 1, 15))
           ::BIGINT % {_BLOOM_BITS} AS p
  FROM bgrams, unnest([0, 1, 2, 3]) AS tj(j)
), probe AS (
  SELECT t.doc_id, t.gram, bool_and(b.p IS NOT NULL) AS might
  FROM (
    SELECT doc_id, gram,
           ('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || gram), 1, 15))
             ::BIGINT % {_BLOOM_BITS} AS p
    FROM dgrams, unnest([0, 1, 2, 3]) AS tj(j)
  ) t
  LEFT JOIN bpos b ON b.p = t.p
  GROUP BY t.doc_id, t.gram
), flagged AS (
  SELECT DISTINCT doc_id FROM probe WHERE might
), final AS (
  SELECT d.doc_id, d.source FROM dedup d
  WHERE d.doc_id NOT IN (SELECT doc_id FROM flagged)
)
SELECT f.source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(t.toks)) AS BIGINT) AS total_tokens
FROM final f JOIN tok t ON t.doc_id = f.doc_id
GROUP BY f.source
"""
)


@query("modern_curation_pipeline", oracle=_MODERN_PIPE_ORACLE)
def modern_curation_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The modern LLM curation chain end to end in one plan: Gopher
    quality deck (paper thresholds, stopword≥1 — the fixture-vocab
    note on gopher_quality_filter) → exact dedup (min-id per content
    fingerprint) → Bloom decontamination vs the %97 benchmark split →
    per-source (n_docs, total_tokens). Every stage is individually
    value-hash gated (gopher_quality_filter / dedup_exact /
    decontaminate_bloom); this query gates the COMPOSITION — stage
    order, survivor plumbing, and the final report."""
    from convert_parquet_to_csv_spark.functions.text import token_count
    from convert_parquet_to_csv_spark.operators import dedup as D

    docs = _docs(spark, sf_dir)
    is_bench = F.col("doc_id") % 97 == 0
    train = docs.filter(~is_bench)
    flags = C.gopher_quality_filter(train, min_stopword_hits=1)
    passing = train.join(
        flags.filter(F.col("passes_all")).select("doc_id"), "doc_id"
    )
    kept = D.exact_dedup(passing)
    flagged = C.flag_contaminated_bloom(
        kept,
        docs.filter(is_bench),
        n=3,
        num_bits=_BLOOM_BITS,
        num_hashes=_BLOOM_K,
        hash_fn="md5",
    )
    final = kept.join(flagged.select("doc_id"), "doc_id", "left_anti")
    return final.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count("text")).cast("bigint").alias("total_tokens"),
    )


# --------------------------------------------------------------------------
# Per-source stratified token budgets (r6; r7 backlog)
# --------------------------------------------------------------------------

_SRC_BUDGET_TOKENS = 1000

_DSIR_SRC_BUDGET_ORACLE = _DSIR_ORACLE.replace(
    """SELECT dc.doc_id,
       CAST(sum(dc.c * r.l) AS BIGINT) AS score_micro
FROM dc JOIN ratio r ON r.b = dc.b
GROUP BY dc.doc_id
""",
    """, scores AS (
  SELECT dc.doc_id,
         CAST(sum(dc.c * r.l) AS BIGINT) AS score_micro
  FROM dc JOIN ratio r ON r.b = dc.b
  GROUP BY dc.doc_id
), run AS (
  SELECT s.doc_id, d.source, s.score_micro,
         CAST(len(rt.toks) AS BIGINT) AS n_tokens,
         sum(len(rt.toks)) OVER (
           PARTITION BY d.source
           ORDER BY s.score_micro DESC, s.doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM scores s
  JOIN rtok rt ON rt.doc_id = s.doc_id
  JOIN documents d ON d.doc_id = s.doc_id
)
SELECT doc_id, source, score_micro, n_tokens
FROM run WHERE cum <= """
    + str(_SRC_BUDGET_TOKENS)
    + "\n",
)


@query("dsir_stratified_source_budget", oracle=_DSIR_SRC_BUDGET_ORACLE)
def dsir_stratified_source_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source budget caps over DSIR-ranked docs: within each
    source keep the highest-importance prefix whose token total fits
    1000 tokens — how a training mixture bounds any one domain. The
    prefix window is naturally partitioned by source (contrast the
    global flavor's two-level bin trick)."""
    docs = _docs(spark, sf_dir)
    target = docs.filter(F.col("source") == "src0")
    raw = docs.filter(F.col("source") != "src0")
    scored = C.dsir_importance_weights(
        raw, target, num_buckets=4096, hash_fn="md5"
    )
    with_meta = raw.select("doc_id", "source", "text").join(
        scored, "doc_id"
    )
    return C.select_to_token_budget_per_group(
        with_meta, budget_tokens=_SRC_BUDGET_TOKENS
    )


# --------------------------------------------------------------------------
# r7: mixture law — per-source token targets, epochs, and
# diminishing-returns effective value (operators/curation.py
# source_mixture_plan; Muennighoff-style repetition discounting in
# exact rational arithmetic)
# --------------------------------------------------------------------------

_MIX_BUDGET = 200_000
_MIX_EMAX = 20

_MIXTURE_PLAN_ORACLE = f"""
WITH per AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_extract_all(text,
             '[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n]'))) AS BIGINT) AS nt
  FROM documents GROUP BY source
), sq AS (
  SELECT *, CAST(floor(sqrt(CAST(nt AS DOUBLE)) * 1000000) AS BIGINT)
              AS sqm
  FROM per
), tot AS (
  SELECT CAST(sum(sqm) AS BIGINT) AS tot FROM sq
), pl AS (
  SELECT source, n_docs, nt, sqm, tot,
         CAST(({_MIX_BUDGET} * sqm) // tot AS BIGINT) AS target
  FROM sq, tot
), kf AS (
  SELECT *,
         least(CASE WHEN nt > 0 THEN target // nt ELSE 0 END,
               {_MIX_EMAX}) AS k,
         CASE WHEN nt > 0 AND target // nt <= {_MIX_EMAX}
              THEN target % nt ELSE 0 END AS r
  FROM pl
), pw AS (
  SELECT *, CAST(power(5, k) AS BIGINT) AS p5,
            CAST(power(4, k) AS BIGINT) AS p4
  FROM kf
)
SELECT source, n_docs, nt AS natural_tokens,
       CAST(sqm AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
       target AS target_tokens,
       CAST(k AS BIGINT) AS epochs_full,
       -- all-DOUBLE closing tree, associated EXACTLY like the Spark
       -- plan's _mix_effective_numerator: ((nt*5)*(p5-p4)) + (r*p4).
       -- The r7 BIGINT tree raised here (and wrapped in Spark) once
       -- nt*5^(k+1) crossed 2^63 — review r8: the first overflow fix
       -- had only moved the retention DENOMINATOR to double.
       (CAST(nt AS DOUBLE) * CAST(5 AS DOUBLE)
          * (CAST(p5 AS DOUBLE) - CAST(p4 AS DOUBLE))
        + CAST(r AS DOUBLE) * CAST(p4 AS DOUBLE))
         / CAST(p5 AS DOUBLE) AS effective_tokens,
       CASE WHEN target > 0
            THEN (CAST(nt AS DOUBLE) * CAST(5 AS DOUBLE)
                    * (CAST(p5 AS DOUBLE) - CAST(p4 AS DOUBLE))
                  + CAST(r AS DOUBLE) * CAST(p4 AS DOUBLE))
                 / (CAST(p5 AS DOUBLE) * CAST(target AS DOUBLE))
            ELSE 0.0 END AS value_retention
FROM pw
"""


@query("source_mixture_epochs", oracle=_MIXTURE_PLAN_ORACLE)
def source_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixture plan under a 200k-token budget: sqrt-
    temperature share, token target, implied repetition epochs, and
    effective tokens after the 4/5-geometric diminishing-returns
    discount — all exact integer arithmetic with one closing divide
    per double column (see operators/curation.source_mixture_plan).
    The tri-SF sweep exercises all three regimes: heavy repetition
    (epoch cap) at sf0.001, mixed at sf0.01, sub-epoch at sf0.1."""
    return C.source_mixture_plan(
        _docs(spark, sf_dir),
        budget_tokens=_MIX_BUDGET,
        max_epochs=_MIX_EMAX,
    )


# --------------------------------------------------------------------------
# r7: cross-source n-gram overlap matrix (inter-source contamination
# diagnostic; operators/curation.source_ngram_overlap_matrix)
# --------------------------------------------------------------------------

_SRC_OVERLAP_ORACLE = r"""
WITH words AS (
  SELECT source,
         list_filter(string_split_regex(lower(trim(text)), '\s+'),
                     t -> t != '') AS w
  FROM documents
), grams AS (
  SELECT DISTINCT source, unnest(
    CASE WHEN len(w) >= 3
         THEN list_transform(range(1, len(w) - 1),
                             i -> array_to_string(w[i:i+2], ' '))
         ELSE CAST([] AS VARCHAR[]) END) AS gram
  FROM words
), sizes AS (
  SELECT source, count(*) AS sz FROM grams GROUP BY source
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS i
  FROM grams a JOIN grams b
    ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b,
       CAST(i AS BIGINT) AS n_shared,
       CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE)
         AS jaccard
FROM inter
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""


@query("source_ngram_overlap", oracle=_SRC_OVERLAP_ORACLE)
def source_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-level 3-gram overlap matrix (distinct shared
    grams + set Jaccard, source_a < source_b) — the inter-source
    contamination diagnostic run before spending per-document dedup
    compute. One (source, gram-hash) distinct shuffle collapses the
    corpus to source vocabularies; everything after is
    vocabulary-scale. Exact flavor (no hot-gram cap) — right for the
    20-source fixture; operators expose ``max_gram_sources`` for
    hundreds-of-sources deployments."""
    return C.source_ngram_overlap_matrix(_docs(spark, sf_dir), n=3)


# --------------------------------------------------------------------------
# r7 addition: CCNet LM-score head/middle/tail buckets
# Day-one gated (FIRST_TIER slot reserved in the r7 rotation).
# --------------------------------------------------------------------------

_CCNET_ORACLE = """
WITH norm AS (
  SELECT doc_id, lang,
         trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
  FROM documents
), tri AS (
  SELECT doc_id, substring(t, i, 3) AS g
  FROM norm, LATERAL unnest(range(1, length(t) - 1)) AS u(i)
  WHERE length(t) >= 3
), freq AS (
  SELECT g, COUNT(*) AS cnt FROM tri GROUP BY g
), fam AS (
  SELECT t.doc_id, COUNT(*) AS n_tri, SUM(f.cnt) AS fam
  FROM tri t JOIN freq f USING (g) GROUP BY 1
), scored AS (
  SELECT n.doc_id, n.lang, fam.fam // fam.n_tri AS q,
         len(list_filter(string_split_regex(n.t, '\\s+'),
                         x -> x != '')) AS ntok
  FROM norm n JOIN fam USING (doc_id)
), samp AS (
  SELECT lang, q,
         ntile(3) OVER (PARTITION BY lang ORDER BY q, doc_id) AS tile
  FROM scored
  WHERE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 2 = 0
), cuts AS (
  SELECT lang,
         max(q) FILTER (tile = 1) AS c1,
         max(q) FILTER (tile = 2) AS c2
  FROM samp GROUP BY lang
), assigned AS (
  SELECT s.lang,
         CASE WHEN c.c2 IS NULL THEN 'unsampled'
              WHEN s.q > c.c2 THEN 'head'
              WHEN s.q > c.c1 THEN 'middle'
              ELSE 'tail' END AS bucket,
         s.ntok, s.q
  FROM scored s LEFT JOIN cuts c USING (lang)
)
SELECT lang, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean_score
FROM assigned GROUP BY lang, bucket
"""


@query("ccnet_perplexity_buckets", oracle=_CCNET_ORACLE)
def ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet head/middle/tail LM-score buckets (operators/curation.
    ccnet_lm_buckets; Wenzek et al. 2020 §4.4): per-language tercile
    cutoffs learned on a deterministic md5-bit document sample, every
    document assigned by comparing its char-trigram familiarity (the
    repo's integer KenLM stand-in, cf. char_trigram_familiarity;
    higher = more natural = head) to the broadcast cutoffs. Exactly
    CCNet's regime — their cutoffs too come from a sample, so the
    per-lang sort never touches the corpus (sample rate is the knob;
    production ~1e-4, fixture 1/2 so each language's sample holds ≥3
    docs). Reports per (lang, bucket) doc count, token mass, and mean
    score. The oracle replays trigram LM → integer score → sample
    ntile cutoffs → assignment clause for clause."""
    return C.ccnet_lm_buckets(
        _docs(spark, sf_dir).select("doc_id", "lang", "text")
    )


# --------------------------------------------------------------------------
# r7 addition: ExactSubstr span REMOVAL (the Lee et al. 2022 action,
# completing dedup_span_extents' audit view). Day-one gated.
# --------------------------------------------------------------------------

_XSR_K, _XSR_MIN = 6, 2

_XS_REMOVAL_ORACLE = f"""
WITH arr AS (
  -- \\s+-split with empty tokens dropped (ADVICE r7: the plain
  -- string_split(text, ' ') form kept empty tokens on doubled
  -- spaces and skipped trim, diverging from the Spark operator's
  -- filtered \\s+ tokenizer on any multi-space/tab text — same
  -- device as the sibling _SPAN_EXTENTS_ORACLE).
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS a
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(p AS INT) AS pos,
         array_to_string(a[CAST(p AS INT)+1:CAST(p AS INT)+{_XSR_K}],
                         ' ') AS gram
  FROM arr, UNNEST(range(0, greatest(len(a) - {_XSR_K} + 1, 0)))
    AS t(p)
),
hot AS (
  SELECT gram FROM grams GROUP BY gram
  HAVING COUNT(*) >= {_XSR_MIN}
),
covered AS (
  SELECT DISTINCT g.doc_id, g.pos + CAST(c AS INT) AS cpos
  FROM grams g JOIN hot USING (gram),
       UNNEST(range(0, {_XSR_K})) AS u(c)
),
words AS (
  SELECT doc_id, CAST(p AS INT) AS pos, a[CAST(p AS INT)+1] AS word
  FROM arr, UNNEST(range(0, len(a))) AS t(p)
)
SELECT w.doc_id,
       COALESCE(array_to_string(
         list(w.word ORDER BY w.pos) FILTER (c.cpos IS NULL), ' '),
         '') AS clean_text,
       CAST(COUNT(*) FILTER (c.cpos IS NULL) AS BIGINT) AS n_kept,
       CAST(COUNT(c.cpos) AS BIGINT) AS n_removed
FROM words w LEFT JOIN covered c
  ON w.doc_id = c.doc_id AND w.pos = c.cpos
GROUP BY w.doc_id
"""


@query("dedup_exact_substring_removal", oracle=_XS_REMOVAL_ORACLE)
def dedup_exact_substring_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ExactSubstr span removal (Lee et al. 2022, the paper's actual
    action over dedup_span_extents' audit view): delete every word
    covered by a 6-gram with ≥2 TOTAL corpus occurrences (within-doc
    repeats count — remove_duplicated_spans' ``min_total`` rule,
    which also drops the distinct-doc stage so the total-count
    groupBy is the single full-volume exchange), keep the rest of
    each document in order. Same fixture calibration as
    dedup_span_extents (k=6/min=2); the oracle replays tokenize →
    gram → total-count → coverage → word-exact reassembly."""
    return C.remove_duplicated_spans(
        _docs(spark, sf_dir).select("doc_id", "text"),
        n=_XSR_K,
        min_total=_XSR_MIN,
    )


# --------------------------------------------------------------------------
# r8: Gopher signals under the max_tokens_per_doc cap (VERDICT r7
# item 7 — the practical mitigation for the measured single-JVM
# 2M-doc agg tail; the paper's own >100k-token drop makes truncation
# semantically aligned). Day-one gated, and the capped pre-projection
# runs the SAME fixed _gopher_chars / gram kernel as the uncapped
# query, so this row also freshly gates the ADVICE r7 collapse-first
# fix.
# --------------------------------------------------------------------------

_GOPHER_CAP = 24

_GOPHER_CAPPED_CTE = _GOPHER_GRAMS_CTE.replace(
    "t -> t != '') AS toks",
    f"t -> t != '')[1:{_GOPHER_CAP}] AS toks",
)
# the replace target must keep matching the shared CTE — a silent
# no-op here would gate the UNCAPPED kernel under the capped name
assert f"[1:{_GOPHER_CAP}] AS toks" in _GOPHER_CAPPED_CTE

_GOPHER_CAPPED_ORACLE = (
    _GOPHER_CAPPED_CTE
    + _GOPHER_SIG_COLS
    + """
  FROM base b LEFT JOIN per_n p ON p.doc_id = b.doc_id
  GROUP BY b.doc_id, b.chars
)
SELECT doc_id,
       top_2gram_char_frac, top_3gram_char_frac, top_4gram_char_frac,
       dup_5gram_char_frac, dup_6gram_char_frac, dup_7gram_char_frac,
       dup_8gram_char_frac, dup_9gram_char_frac, dup_10gram_char_frac
FROM sig
"""
)


@query("gopher_signals_capped", oracle=_GOPHER_CAPPED_ORACLE)
def gopher_signals_capped(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """gopher_repetition_signals with ``max_tokens_per_doc=24``: every
    document scored on its first 24 tokens only (truncation hits most
    fixture docs, so the gate exercises the cap, not a no-op). The
    Spark cap is one pre-projection rebuilding text from the sliced
    token array; the oracle slices the token list in its tok CTE —
    both sides truncate BEFORE the chars denominator, keeping the
    chars == Σ len + n−1 identity on the truncated doc."""
    return C.gopher_repetition_signals(
        _docs(spark, sf_dir), max_tokens_per_doc=_GOPHER_CAP
    )


# --------------------------------------------------------------------------
# r8: license/copyright filtering deck (VERDICT r7 item 8's
# robots/license candidate — the compliance pass). The fixture
# vocabulary carries no license strings, so the gated query ATTACHES
# deterministic license markers by md5-bit class (the dedup_url
# synthetic-column device) and both engines replay the augmentation
# clause for clause.
# --------------------------------------------------------------------------

_LICENSE_ORACLE = r"""
WITH aug AS (
  SELECT doc_id,
         text || CASE (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))
                       % 2) * 2
                    + (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1))
                       % 2)
           WHEN 0 THEN ' Licensed under the MIT License.'
                       || ' All Rights Reserved.'
           WHEN 1 THEN ' Licensed under the Apache License 2.0'
           WHEN 2 THEN ' Copyright 2024 Example Corp'
           ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
       regexp_matches(text,
         '(?i)creative commons|cc[- ]by(?:[- ][a-z]{2})?\b')
         AS cc_license,
       regexp_matches(text,
         '(?i)apache license|mit license|bsd license|gpl|mpl[- ]2|public domain|licensed under')
         AS open_license,
       regexp_matches(text, '(?i)all rights reserved')
         AS rights_reserved,
       regexp_matches(text, '(?i)copyright \d{4}|\(c\) \d{4}|©')
         AS copyright_mark,
       CASE
         WHEN regexp_matches(text, '(?i)all rights reserved')
           THEN 'restricted'
         WHEN regexp_matches(text,
                '(?i)creative commons|cc[- ]by(?:[- ][a-z]{2})?\b')
           OR regexp_matches(text,
                '(?i)apache license|mit license|bsd license|gpl|mpl[- ]2|public domain|licensed under')
           THEN 'permissive'
         WHEN regexp_matches(text,
                '(?i)copyright \d{4}|\(c\) \d{4}|©')
           THEN 'copyright_only'
         ELSE 'unmarked'
       END AS license_class
FROM aug
"""


@query("license_filter_deck", oracle=_LICENSE_ORACLE)
def license_filter_deck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document license/copyright signal flags + policy class
    (operators/curation.license_signals): four (?i) regex classes in
    one map-side projection, classified by documented precedence
    (restricted > permissive > copyright_only > unmarked — class 0's
    combined MIT+all-rights-reserved marker exercises exactly that
    precedence edge). Deterministic md5-bit license markers appended
    to the fixture text; the oracle replays the augmentation and
    every regex verbatim (Java regex vs RE2 on their shared subset)."""
    h = F.md5(F.col("doc_id").cast("string"))
    cls = (F.ascii(F.substring(h, 1, 1)) % 2) * 2 + (
        F.ascii(F.substring(h, 2, 1)) % 2
    )
    aug = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                cls == 0,
                F.lit(
                    " Licensed under the MIT License."
                    " All Rights Reserved."
                ),
            )
            .when(cls == 1, F.lit(" Licensed under the Apache License 2.0"))
            .when(cls == 2, F.lit(" Copyright 2024 Example Corp"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    return C.license_signals(aug)


# --------------------------------------------------------------------------
# r8 wave 2: the corpus data card (per-source release report).
# Day-one gated.
# --------------------------------------------------------------------------

_DATACARD_ORACLE = r"""
WITH base AS (
  SELECT source, doc_id, lang,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              t -> t != '')) AS BIGINT) AS nt,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents
),
fpc AS (SELECT fp, count(*) AS c FROM base GROUP BY fp),
per AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nt) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS ndup
  FROM base JOIN fpc ON base.fp IS NOT DISTINCT FROM fpc.fp
  GROUP BY source
),
lc AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS lcnt
  FROM base GROUP BY source, lang
),
tp AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
         max(lcnt) AS topc
  FROM lc GROUP BY source
),
tl AS (
  SELECT lc.source, min(lang) AS top_lang
  FROM lc JOIN tp ON tp.source = lc.source AND lc.lcnt = tp.topc
  GROUP BY lc.source
)
SELECT per.source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
         AS mean_doc_tokens,
       CAST(ndup AS DOUBLE) / CAST(n_docs AS DOUBLE)
         AS exact_dup_frac,
       n_langs, top_lang,
       CAST(topc AS DOUBLE) / CAST(n_docs AS DOUBLE)
         AS top_lang_frac
FROM per
JOIN tp ON tp.source = per.source
JOIN tl ON tl.source = per.source
"""


@query("corpus_datacard", oracle=_DATACARD_ORACLE)
def corpus_datacard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data-card row (operators/curation.corpus_datacard):
    doc/token volumes, GLOBAL exact-duplicate exposure (a doc counts
    when its normalized fingerprint recurs anywhere in the corpus —
    cross-source recrawls being the interesting case), language
    makeup with an order-independent top-lang election (max count,
    ties → alphabetically-first). Three map-side-combinable
    exchanges; integer counts, one closing divide per ratio."""
    return C.corpus_datacard(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# r8 wave 3: the Gopher filter FUNNEL (per-stage survival counts —
# the pipeline-observability artifact every filter deployment reads
# before committing thresholds). Day-one gated.
# --------------------------------------------------------------------------

_FUNNEL_STAGES = [
    "word_count_ok",
    "mean_word_len_ok",
    "alpha_word_frac_ok",
    "stopword_ok",
    "top_2gram_ok",
    "top_3gram_ok",
    "top_4gram_ok",
    "dup_5gram_ok",
    "dup_6gram_ok",
    "dup_7gram_ok",
    "dup_8gram_ok",
    "dup_9gram_ok",
    "dup_10gram_ok",
]

# survival after each cumulative prefix of the deck, replayed over
# the full filter oracle as a subquery
_GOPHER_FUNNEL_ORACLE = (
    "WITH f AS (" + _GOPHER_FILTER_ORACLE + ")\n" + """SELECT CAST(0 AS BIGINT) AS stage, 'all' AS rule, CAST(count(*) AS BIGINT) AS n_surviving FROM f
UNION ALL
SELECT CAST(1 AS BIGINT), 'word_count_ok', CAST(count(*) FILTER (word_count_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(2 AS BIGINT), 'mean_word_len_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(3 AS BIGINT), 'alpha_word_frac_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(4 AS BIGINT), 'stopword_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(5 AS BIGINT), 'top_2gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(6 AS BIGINT), 'top_3gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok AND top_3gram_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(7 AS BIGINT), 'top_4gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok AND top_3gram_ok AND top_4gram_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(8 AS BIGINT), 'dup_5gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok AND top_3gram_ok AND top_4gram_ok AND dup_5gram_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(9 AS BIGINT), 'dup_6gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok AND top_3gram_ok AND top_4gram_ok AND dup_5gram_ok AND dup_6gram_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(10 AS BIGINT), 'dup_7gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok AND top_3gram_ok AND top_4gram_ok AND dup_5gram_ok AND dup_6gram_ok AND dup_7gram_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(11 AS BIGINT), 'dup_8gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok AND top_3gram_ok AND top_4gram_ok AND dup_5gram_ok AND dup_6gram_ok AND dup_7gram_ok AND dup_8gram_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(12 AS BIGINT), 'dup_9gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok AND top_3gram_ok AND top_4gram_ok AND dup_5gram_ok AND dup_6gram_ok AND dup_7gram_ok AND dup_8gram_ok AND dup_9gram_ok) AS BIGINT) FROM f
UNION ALL
SELECT CAST(13 AS BIGINT), 'dup_10gram_ok', CAST(count(*) FILTER (word_count_ok AND mean_word_len_ok AND alpha_word_frac_ok AND stopword_ok AND top_2gram_ok AND top_3gram_ok AND top_4gram_ok AND dup_5gram_ok AND dup_6gram_ok AND dup_7gram_ok AND dup_8gram_ok AND dup_9gram_ok AND dup_10gram_ok) AS BIGINT) FROM f"""
)


@query("gopher_funnel", oracle=_GOPHER_FUNNEL_ORACLE)
def gopher_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survival funnel through the Gopher deck in documented order:
    row i = docs passing ALL of the first i rules (stage 0 = corpus
    size), i.e. the marginal kill-rate of each rule GIVEN the rules
    before it — the number threshold-tuning actually reads (a rule
    with zero marginal kills is dead weight; one that kills half the
    corpus needs a second look). One scan through
    gopher_quality_filter's flags, one aggregate row, exploded to
    (stage, rule, n_surviving) — the funnel itself is free at any
    corpus size."""
    flags = C.gopher_quality_filter(
        _docs(spark, sf_dir), min_stopword_hits=1
    )
    return C.quality_funnel(flags, _FUNNEL_STAGES)


# --------------------------------------------------------------------------
# r8 wave 4 (cont.), r9 training closure, r10 label closure: the
# model-based quality classifier — TRAINED in-engine (VERDICT r8
# item 3, the BPE train→apply precedent) on in-engine WEAK LABELS
# (VERDICT r9 item 3: the Gopher rule deck's passes_all conjunction,
# the DCLM/FineWeb-Edu rule-deck→classifier distillation shape) and
# applied at corpus scale. Nothing in the loop is a stub any more:
# labeler, featurization, the GD optimizer, the exported (bucket,
# weight_micro) table, and the calibration readout are all in-engine
# and bit-replayed by the oracle (the deck oracle nests as the lab
# CTE). A human/LLM-rated sample swaps in at the labels seam.
# --------------------------------------------------------------------------

_QTRAIN_B = 512
_QTRAIN_EPOCHS = 2
_QTRAIN_LRN = 1
# lr_den 20 → 400 with the r10 weak labels: squared-loss batch GD
# needs lr < 2/λ_max(XᵀX/N) ≈ 2/mean‖x‖² (~108 ngram counts/doc →
# lr ≲ 0.018); with the old 0.05 the correlated Gopher labels made
# the iterates DIVERGE (logits −6..−42 label units, calibration
# anti-monotone — random md5-parity labels had hidden it by
# cancelling gradients). At 1/400 the table is monotone and
# correctly signed at every SF (pinned by test).
_QTRAIN_LRD = 400
_QTRAIN_THRESHOLD = 500_000


def _qtrain_cte_chain(
    lab_where: str = "", y_expr: str = "y"
) -> tuple[str, str]:
    """The WITH-body CTE chain replaying train_linear_classifier in
    DuckDB SQL — features, Gopher-deck weak labels (r10), and one
    unrolled CTE quartet (logits → residuals → gradient → weight
    update) per epoch; integer arithmetic throughout, `//` = Spark
    `div` (trunc-toward-zero both engines, pinned by unit test).
    ``lab_where``: extra predicate ANDed into the training-label CTE
    (the holdout gate trains on the md5-parity-0 half); the deck
    renders ONCE as ``laball`` so a holdout tail can join the
    complementary half. ``y_expr``: the training-target select item
    over laball's ``y``, INCLUDING its ``AS y`` alias when not the
    bare column (r11 — the slated r12 noise gate flips a
    deterministic 5%); the default ``"y"`` renders the pre-r11 text
    byte-identically, so existing gated oracles are untouched
    (test-pinned). Returns (chain, final_weight_cte_name)."""
    chain = rf"""tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     t -> t != '') AS toks
  FROM documents
), g AS (
  SELECT doc_id,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % {_QTRAIN_B} AS b
  FROM (
    SELECT doc_id, unnest(toks) AS g FROM tok
    UNION ALL
    SELECT doc_id, array_to_string(toks[i + 1 : i + 2], ' ') AS g
    FROM tok, unnest(range(0, len(toks) - 1)) AS t(i)
    WHERE len(toks) >= 2
  )
), dc AS (
  SELECT doc_id, b, count(*) AS c FROM g GROUP BY 1, 2
), laball AS (
  -- r10 (VERDICT r9 item 3): Gopher-deck weak labels replace the
  -- md5-parity pseudo-labels. The full deck oracle nests as a
  -- parenthesized subquery (DuckDB scopes CTE names per subquery —
  -- its un-lowered `tok` cannot collide with the feature chain's
  -- lowered one; the subword_fertility_compare device).
  SELECT doc_id,
         CASE WHEN passes_all THEN 1000000 ELSE 0 END AS y
  FROM ({_GOPHER_FILTER_ORACLE}) gph
  WHERE doc_id IS NOT NULL
), lab AS (
  SELECT doc_id, {y_expr} FROM laball {lab_where}
), nn AS (SELECT count(*) AS n FROM lab),
w0 AS (
  SELECT CAST(i AS BIGINT) AS b, CAST(0 AS BIGINT) AS w
  FROM range(0, {_QTRAIN_B}) t(i)
)"""
    for e in range(1, _QTRAIN_EPOCHS + 1):
        chain += f""", lg{e} AS (
  SELECT dc.doc_id, sum(dc.c * w{e - 1}.w) AS lg
  FROM dc JOIN w{e - 1} ON w{e - 1}.b = dc.b
  GROUP BY dc.doc_id
), rs{e} AS (
  SELECT l.doc_id, l.lg - lab.y AS r
  FROM lg{e} l JOIN lab USING (doc_id)
), gr{e} AS (
  SELECT dc.b, sum(dc.c * rs{e}.r) AS gs
  FROM dc JOIN rs{e} USING (doc_id)
  GROUP BY dc.b
), w{e} AS (
  SELECT w.b,
         w.w - (COALESCE(g.gs, 0) * {_QTRAIN_LRN})
               // (greatest((SELECT n FROM nn), 1) * {_QTRAIN_LRD})
           AS w
  FROM w{e - 1} w LEFT JOIN gr{e} g ON g.b = w.b
)"""
    return chain, f"w{_QTRAIN_EPOCHS}"


_QTRAIN_CHAIN, _QTRAIN_WF = _qtrain_cte_chain()

_QTRAIN_ORACLE = (
    "WITH "
    + _QTRAIN_CHAIN
    + f"""
SELECT b AS _b, CAST(w AS BIGINT) AS weight_micro FROM {_QTRAIN_WF}
"""
)

_QCLS_ORACLE = (
    "WITH "
    + _QTRAIN_CHAIN
    + f""", s AS (
  SELECT dc.doc_id,
         CAST(sum(dc.c) AS BIGINT) AS n_grams,
         CAST(sum(dc.c * w.w) AS BIGINT) AS logit_micro
  FROM dc JOIN {_QTRAIN_WF} w ON w.b = dc.b
  GROUP BY dc.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(s.logit_micro, 0) AS BIGINT) AS logit_micro,
       COALESCE(s.logit_micro, 0) >= {_QTRAIN_THRESHOLD} AS passes
FROM (SELECT DISTINCT doc_id FROM tok) d
LEFT JOIN s ON d.doc_id IS NOT DISTINCT FROM s.doc_id
"""
)


def _trained_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by the train / apply / calibration gates: Gopher-deck
    weak labels (operators/curation.gopher_weak_labels — the
    DCLM/FineWeb-Edu rule-deck→classifier distillation shape, r10;
    min_stopword_hits=1 per the deck gate's fixture note) → two
    epochs of exact-integer batch GD. Real deployments swap in a
    rated sample at the same seam — the labels argument."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    # the deck is corpus-scale (two text scans + the gram shuffles)
    # and training references the label table 1 + epochs times (the
    # N count plus each epoch's residual join) — pin it once.
    # Caller-released: bench/oracle_check clearCache() between
    # queries, the registry-wide persist convention.
    labels = C.gopher_weak_labels(docs, min_stopword_hits=1).persist()
    return C.train_linear_classifier(
        docs,
        labels,
        num_buckets=_QTRAIN_B,
        epochs=_QTRAIN_EPOCHS,
        lr_num=_QTRAIN_LRN,
        lr_den=_QTRAIN_LRD,
        hash_fn="md5",
    )


_WEAK_LABELS_ORACLE = (
    "SELECT doc_id, CAST(CASE WHEN passes_all THEN 1000000 ELSE 0 "
    "END AS BIGINT) AS y_micro "
    f"FROM ({_GOPHER_FILTER_ORACLE}) gph WHERE doc_id IS NOT NULL"
)


@query("classifier_weak_labels", oracle=_WEAK_LABELS_ORACLE)
def classifier_weak_labels(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The weak-supervision label table itself
    (operators/curation.gopher_weak_labels, r10): y_micro = 1M iff
    the doc passes the full Gopher deck (min_stopword_hits=1 per the
    deck gate's fixture note), the table the r10 classifier chain
    trains on — gated on its own so a labeler drift can never hide
    inside the train oracle's nested CTE. ~50/50 at every SF
    (251/249 at sf0.01). Plan = the deck's own two text scans + one
    doc-keyed flag join, then a pure projection."""
    return C.gopher_weak_labels(
        _docs(spark, sf_dir).select("doc_id", "text"),
        min_stopword_hits=1,
    )


@query("quality_classifier_train", oracle=_QTRAIN_ORACLE)
def quality_classifier_train(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """In-engine training of the linear quality classifier
    (operators/curation.train_linear_classifier; VERDICT r8 item 3):
    two epochs of deterministic exact-integer batch gradient descent
    on squared loss over md5-hashed unigram+bigram bucket counts
    against Gopher-deck weak labels (r10, VERDICT r9 item 3 — the
    whole train→apply→calibrate loop is now in-engine, no stub
    anywhere), exporting the (bucket, weight_micro) table the apply
    path consumes. Every epoch is one broadcast weight join + two
    doc-keyed exchanges + one bucket-sized aggregate; the oracle
    unrolls the identical epochs as CTE quartets (integer `//` =
    Spark `div`, trunc-toward-zero both engines) with the full deck
    oracle nested as the label CTE. Output: the learned 512-row
    weight table — dimension-scale, bit-replayable."""
    return _trained_weights(spark, sf_dir)


@query("quality_classifier_linear", oracle=_QCLS_ORACLE)
def quality_classifier_linear(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Model-based quality filtering, apply side
    (operators/curation.linear_text_classifier) — re-gated r9 to
    consume the IN-ENGINE-TRAINED weight table (VERDICT r8 item 3)
    instead of the r8 md5 stub: train_linear_classifier's two GD
    epochs run first (same session, the BPE train→apply precedent),
    then every doc scores ``logit = Σ_b c_b · w_b`` against the
    learned 512-row broadcast table with the 500k-micro decision
    threshold (the midpoint of the {0, 1M} label range). md5 bucket
    flavor; integer micro-units; one corpus exchange + broadcast +
    eqNullSafe id-spine join in the apply plan — corpus rows move
    once at any model size. (The gate re-featurizes in the apply
    stage rather than reusing the training counts cache — at
    production scale apply consumes the EXPORTED table, usually in a
    different job.)"""
    return C.linear_text_classifier(
        _docs(spark, sf_dir).select("doc_id", "text"),
        _trained_weights(spark, sf_dir),
        num_buckets=_QTRAIN_B,
        hash_fn="md5",
        threshold_micro=_QTRAIN_THRESHOLD,
    )


# --- in-engine bigram-LM perplexity scoring (r9) ---------------------------

# Mirrors operators/curation.bigram_lm_scores step for step. The one
# float step is the per-DISTINCT-BIGRAM round(ln(...)·1e6) — the
# ULM/DSIR micro-nat quantization device (an exception to the
# "no ln anywhere" note in the module docstring: rounded to integer
# at MODEL scale, so every corpus-scale number stays exact).
_BIGRAM_LM_ORACLE = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     t -> t != '') AS tk
  FROM documents
),
tr AS (
  SELECT doc_id, tk[CAST(i AS INT)] AS a,
         tk[CAST(i AS INT) + 1] AS b
  FROM tok, unnest(range(1, len(tk))) t(i)
),
dbc AS (
  SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS c
  FROM tr GROUP BY ALL
),
bc AS (
  SELECT a, b, CAST(sum(c) AS BIGINT) AS cab FROM dbc GROUP BY ALL
),
ctx AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM bc GROUP BY 1),
v AS (
  SELECT CAST(count(*) AS BIGINT) AS v
  FROM (SELECT a AS t FROM bc UNION SELECT b FROM bc)
),
cost AS (
  SELECT a, b,
         CAST(round(ln(CAST(ca + v AS DOUBLE)
                       / CAST(cab + 1 AS DOUBLE)) * 1e6) AS BIGINT)
           AS cost
  FROM bc JOIN ctx USING (a), v
),
sc AS (
  SELECT dbc.doc_id,
         CAST(sum(c) AS BIGINT) AS nt,
         CAST(sum(c * cost) AS BIGINT) AS tc
  FROM dbc JOIN cost USING (a, b)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(nt, 0) AS BIGINT) AS n_transitions,
       CAST(COALESCE(tc, 0) AS BIGINT) AS total_cost_micro,
       CASE WHEN COALESCE(nt, 0) > 0
            THEN CAST(tc // nt AS BIGINT) END AS avg_cost_micro
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN sc ON d.doc_id IS NOT DISTINCT FROM sc.doc_id
"""


@query("ngram_lm_perplexity", oracle=_BIGRAM_LM_ORACLE)
def ngram_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine bigram-LM perplexity scoring
    (operators/curation.bigram_lm_scores): train an add-one-smoothed
    token bigram LM on the corpus and score every document in
    integer micro-nats — the in-engine closure of ccnet_lm_buckets'
    "a real KenLM scorer slots in" seam (the classifier-train
    precedent applied to the LM). ONE corpus exchange (per-doc
    bigram counts built map-side via zip_with of two slices);
    bigram/context/V model tables roll up from it; one model-keyed
    scoring join back; id-spine for sub-2-token docs."""
    return C.bigram_lm_scores(
        _docs(spark, sf_dir).select("doc_id", "text")
    )


# --- source-distribution JS divergence (r9) --------------------------------

_JSD_ORACLE = rf"""
WITH stc AS (
  SELECT source AS s, t, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT source,
               unnest(list_filter(
                 string_split_regex(trim(lower(text)), '\s+'),
                 x -> x != '')) AS t
        FROM documents)
  GROUP BY ALL
),
totals AS (SELECT s, CAST(sum(c) AS BIGINT) AS n FROM stc GROUP BY 1),
sides AS (
  SELECT stc.s, stc.t, stc.c, totals.n
  FROM stc JOIN totals USING (s)
),
terms AS (
  SELECT a.s AS source_a, b.s AS source_b,
         CAST(floor((
             (CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE))
             * ln((CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE))
                  / (CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE)
                     + CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE)))
           + (CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE))
             * ln((CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE))
                  / (CAST(a.c AS DOUBLE) / CAST(a.n AS DOUBLE)
                     + CAST(b.c AS DOUBLE) / CAST(b.n AS DOUBLE)))
         ) * 5e8 + 0.5) AS BIGINT) AS term
  FROM sides a JOIN sides b ON a.t = b.t AND a.s < b.s
),
sums AS (
  SELECT source_a, source_b,
         CAST(count(*) AS BIGINT) AS n_common_tokens,
         CAST(sum(term) AS BIGINT) AS tsum
  FROM terms GROUP BY ALL
),
pairs AS (
  SELECT a.s AS source_a, b.s AS source_b
  FROM (SELECT DISTINCT source AS s FROM documents) a,
       (SELECT DISTINCT source AS s FROM documents) b
  WHERE a.s < b.s
)
SELECT p.source_a, p.source_b,
       CAST(COALESCE(n_common_tokens, 0) AS BIGINT)
         AS n_common_tokens,
       CAST({C.LN2_NANO} + COALESCE(tsum, 0) AS BIGINT) AS js_nano,
       CAST({C.LN2_NANO} + COALESCE(tsum, 0) AS DOUBLE) / 1e9 AS js
FROM pairs p LEFT JOIN sums USING (source_a, source_b)
"""


@query("source_js_divergence", oracle=_JSD_ORACLE)
def source_js_divergence_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (operators/curation.source_js_divergence) — the
    mixture-design diagnostic beside source_ngram_overlap. ONE
    corpus exchange (source, token counts); the pair table is an
    inner self-join on the token key (tokens in only one source
    contribute exactly 0 — JS = ln2 + Σ_common identity, per-term
    nano-nat rounding makes the sum order-independent); a K²-row
    dimension-scale pair spine restores disjoint pairs at ln 2."""
    return C.source_js_divergence(
        _docs(spark, sf_dir).select("source", "text")
    )


# --- classifier calibration readout (r9) -----------------------------------

_CALIB_BINS = 8

_CALIB_ORACLE = (
    "WITH "
    + _QTRAIN_CHAIN
    + f""", s AS (
  SELECT dc.doc_id,
         CAST(sum(dc.c * w.w) AS BIGINT) AS logit_micro
  FROM dc JOIN {_QTRAIN_WF} w ON w.b = dc.b
  GROUP BY dc.doc_id
), sp AS (
  SELECT d.doc_id, COALESCE(s.logit_micro, 0) AS lg
  FROM (SELECT DISTINCT doc_id FROM documents
        WHERE doc_id IS NOT NULL) d
  LEFT JOIN s ON d.doc_id = s.doc_id
), jl AS (
  SELECT sp.doc_id, sp.lg, lab.y FROM sp JOIN lab USING (doc_id)
), st AS (SELECT min(lg) AS mn, max(lg) AS mx FROM jl),
bn AS (
  SELECT ((lg - mn) * {_CALIB_BINS}) // (mx - mn + 1) AS bin, lg, y
  FROM jl, st
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(lg) // count(*) AS BIGINT) AS mean_logit_micro,
       CAST(sum(CASE WHEN y = 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pos,
       CAST(sum(CASE WHEN y = 1000000 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS frac_pos
FROM bn GROUP BY 1
"""
)


@query("classifier_calibration_bins", oracle=_CALIB_ORACLE)
def classifier_calibration_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability table of the in-engine-trained quality classifier
    (operators/curation.calibration_bins over train_linear_classifier
    scores vs the Gopher-deck weak labels it was trained on, r10): 8
    equal-width integer logit bins, per-bin doc count / mean logit /
    observed positive fraction — the calibration readout a deployed
    scorer's threshold gets checked against (training-set
    calibration here; production swaps the labels side for a
    held-out rated sample, same plan). With real learned structure
    the table is non-degenerate and rises with the bin (pinned by
    test at sf0.01). One doc-keyed score↔label join, a 1-row
    min/max broadcast close, one 8-row aggregate; the corpus moves
    only inside the scoring chain."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    scores = C.linear_text_classifier(
        docs,
        _trained_weights(spark, sf_dir),
        num_buckets=_QTRAIN_B,
        hash_fn="md5",
    ).select("doc_id", "logit_micro")
    labels = C.gopher_weak_labels(docs, min_stopword_hits=1)
    return C.calibration_bins(scores, labels, num_bins=_CALIB_BINS)


# --- held-out classifier calibration (r10) ---------------------------------

# Train on the md5-parity-0 half of the weak labels, calibrate on the
# parity-1 half — the true generalization readout the training-set
# calibration gate only approximates ("production swaps the labels
# side for a held-out rated sample, same plan" — now gated). The
# deck renders ONCE (laball) and both halves select from it.
_HOLDOUT_SPLIT = (
    "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
    "::BIGINT % 2)"
)
_HOLDOUT_CHAIN, _HOLDOUT_WF = _qtrain_cte_chain(
    f"WHERE {_HOLDOUT_SPLIT} = 0"
)

_HOLDOUT_ORACLE = (
    "WITH "
    + _HOLDOUT_CHAIN
    + f""", s AS (
  SELECT dc.doc_id,
         CAST(sum(dc.c * w.w) AS BIGINT) AS logit_micro
  FROM dc JOIN {_HOLDOUT_WF} w ON w.b = dc.b
  GROUP BY dc.doc_id
), sp AS (
  SELECT d.doc_id, COALESCE(s.logit_micro, 0) AS lg
  FROM (SELECT DISTINCT doc_id FROM documents
        WHERE doc_id IS NOT NULL) d
  LEFT JOIN s ON d.doc_id = s.doc_id
), labh AS (
  SELECT doc_id, y FROM laball WHERE {_HOLDOUT_SPLIT} = 1
), jl AS (
  SELECT sp.doc_id, sp.lg, labh.y FROM sp JOIN labh USING (doc_id)
), st AS (SELECT min(lg) AS mn, max(lg) AS mx FROM jl),
bn AS (
  SELECT ((lg - mn) * {_CALIB_BINS}) // (mx - mn + 1) AS bin, lg, y
  FROM jl, st
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(lg) // count(*) AS BIGINT) AS mean_logit_micro,
       CAST(sum(CASE WHEN y = 1000000 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pos,
       CAST(sum(CASE WHEN y = 1000000 THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS frac_pos
FROM bn GROUP BY 1
"""
)


@query("quality_classifier_holdout", oracle=_HOLDOUT_ORACLE)
def quality_classifier_holdout(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Held-out reliability table (r10): train the linear classifier
    on the md5-parity-0 HALF of the Gopher weak labels, score every
    doc, calibrate against the parity-1 half the optimizer never saw
    — the generalization readout that separates real signal from
    label memorization (held-out top-half bins stay 0.83-1.0
    positive vs 0-0.27 bottom-half at the fixtures). Same plan
    shapes as the train/apply/calibration gates; the split is one
    map-side parity predicate on the SHARED label table (pinned
    once, both halves filter it)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    labels = C.gopher_weak_labels(
        docs, min_stopword_hits=1
    ).persist()  # shared by both halves; caller-released
    parity = C.md5_parity_micro("doc_id", micro=1)
    weights = C.train_linear_classifier(
        docs,
        labels.filter(parity == 0),
        num_buckets=_QTRAIN_B,
        epochs=_QTRAIN_EPOCHS,
        lr_num=_QTRAIN_LRN,
        lr_den=_QTRAIN_LRD,
        hash_fn="md5",
    )
    scores = C.linear_text_classifier(
        docs, weights, num_buckets=_QTRAIN_B, hash_fn="md5"
    ).select("doc_id", "logit_micro")
    return C.calibration_bins(
        scores, labels.filter(parity == 1), num_bins=_CALIB_BINS
    )


# --- label-noise-robust training (r12) -------------------------------------

# The DCLM robustness device gated (r12 day-one, slated by the r11
# ledger): a deterministic md5-selected ~5% of the Gopher weak labels
# flip (y → 1M − y), and the oracle replays the full two-epoch GD on
# the NOISY labels bit-exactly — _qtrain_cte_chain's y_expr hook
# renders the flip inside the label CTE, everything downstream is the
# byte-identical epoch quartet machinery the train gate pins. The
# companion pytest (test_classifier_noise_robust_calibration) asserts
# the DCLM property itself: the noisy-trained table stays correctly
# signed against CLEAN labels with bounded per-bin drift.
_NOISE_FLIP_SQL = (
    "('0x' || substr(md5('noise' || CAST(doc_id AS VARCHAR)), 1, "
    "15))::BIGINT % 20 = 0"
)

_NOISE_CHAIN, _NOISE_WF = _qtrain_cte_chain(
    y_expr=(
        f"CASE WHEN {_NOISE_FLIP_SQL} THEN 1000000 - y ELSE y END AS y"
    )
)

_QNOISE_ORACLE = (
    "WITH "
    + _NOISE_CHAIN
    + f"""
SELECT b AS _b, CAST(w AS BIGINT) AS weight_micro FROM {_NOISE_WF}
"""
)


@query("quality_classifier_noise", oracle=_QNOISE_ORACLE)
def quality_classifier_noise(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Noisy-label training run (r12 day-one; VERDICT r10 item 7's
    step 2 promoted to a driver gate): flip a deterministic
    md5-selected ~5% of the Gopher-deck weak labels (the house-RNG
    flip predicate, identical in both engines) and train the same
    two-epoch exact-integer GD — the learned 512-row weight table is
    the output, bit-replayable through _qtrain_cte_chain's y_expr
    hook. Pins the full label→flip→train path the DCLM-style noise
    robustness test exercises, so a drift in either the flip
    selection or the trainer's arithmetic lands as a driver
    hash-mismatch. Same plan shapes as quality_classifier_train; the
    flip is one map-side projection on the shared label table."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    clean = C.gopher_weak_labels(docs, min_stopword_hits=1)
    flip = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("noise"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 20
        == 0
    )
    noisy = clean.select(
        "doc_id",
        F.when(flip, F.lit(1_000_000) - F.col("y_micro"))
        .otherwise(F.col("y_micro"))
        .alias("y_micro"),
    ).persist()  # referenced 1 + epochs times; caller-released
    return C.train_linear_classifier(
        docs,
        noisy,
        num_buckets=_QTRAIN_B,
        epochs=_QTRAIN_EPOCHS,
        lr_num=_QTRAIN_LRN,
        lr_den=_QTRAIN_LRD,
        hash_fn="md5",
    )


# --- bigram-LM head/middle/tail buckets (r9) -------------------------------

# The _BIGRAM_LM_ORACLE chain (tok..sc) re-used verbatim, then the
# ccnet tercile clauses over avg cost — LOWER cost = more natural =
# head, so the CASE orientation flips vs _CCNET_ORACLE. Docs with no
# transitions (< 2 tokens) carry no LM score and are EXCLUDED from
# the census (the inner sc join), exactly like ccnet's < 3-char rule.
_BIGRAM_BUCKETS_ORACLE = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'),
                     t -> t != '') AS tk
  FROM documents
),
tr AS (
  SELECT doc_id, tk[CAST(i AS INT)] AS a,
         tk[CAST(i AS INT) + 1] AS b
  FROM tok, unnest(range(1, len(tk))) t(i)
),
dbc AS (
  SELECT doc_id, a, b, CAST(count(*) AS BIGINT) AS c
  FROM tr GROUP BY ALL
),
bc AS (
  SELECT a, b, CAST(sum(c) AS BIGINT) AS cab FROM dbc GROUP BY ALL
),
ctx AS (SELECT a, CAST(sum(cab) AS BIGINT) AS ca FROM bc GROUP BY 1),
v AS (
  SELECT CAST(count(*) AS BIGINT) AS v
  FROM (SELECT a AS t FROM bc UNION SELECT b FROM bc)
),
cost AS (
  SELECT a, b,
         CAST(round(ln(CAST(ca + v AS DOUBLE)
                       / CAST(cab + 1 AS DOUBLE)) * 1e6) AS BIGINT)
           AS cost
  FROM bc JOIN ctx USING (a), v
),
sc AS (
  SELECT dbc.doc_id,
         CAST(sum(c) AS BIGINT) AS nt,
         CAST(sum(c * cost) AS BIGINT) AS tc
  FROM dbc JOIN cost USING (a, b)
  GROUP BY 1
),
scored AS (
  SELECT d.doc_id, d.lang, CAST(sc.tc // sc.nt AS BIGINT) AS q,
         len(list_filter(string_split_regex(trim(lower(d.text)),
                                            '\s+'),
                         x -> x != '')) AS ntok
  FROM documents d JOIN sc ON d.doc_id = sc.doc_id
),
samp AS (
  SELECT lang, q,
         ntile(3) OVER (PARTITION BY lang ORDER BY q, doc_id)
           AS tile
  FROM scored
  WHERE ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 2 = 0
),
cuts AS (
  SELECT lang,
         max(q) FILTER (tile = 1) AS c1,
         max(q) FILTER (tile = 2) AS c2
  FROM samp GROUP BY lang
),
assigned AS (
  SELECT s.lang,
         CASE WHEN c.c2 IS NULL THEN 'unsampled'
              WHEN s.q > c.c2 THEN 'tail'
              WHEN s.q > c.c1 THEN 'middle'
              ELSE 'head' END AS bucket,
         s.ntok, s.q
  FROM scored s LEFT JOIN cuts c USING (lang)
)
SELECT lang, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ntok) AS BIGINT) AS n_tokens,
       CAST(SUM(q) AS DOUBLE) / COUNT(*) AS mean_score
FROM assigned GROUP BY lang, bucket
"""


@query("bigram_lm_buckets", oracle=_BIGRAM_BUCKETS_ORACLE)
def bigram_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail buckets over the REAL in-engine bigram
    LM (operators/curation.lm_score_buckets ∘ bigram_lm_scores):
    score = per-doc average transition cost in micro-nats (LOWER =
    more natural = head — the orientation flip vs the trigram
    familiarity ccnet_perplexity_buckets uses), per-lang tercile
    cutoffs learned on the md5-bit sample, assignment broadcast.
    This completes the round's LM loop: train (bigram_lm_scores) →
    score (ngram_lm_perplexity) → bucket/act (here) — all
    in-engine, no offline model artifact anywhere in the chain.
    Docs with < 2 tokens carry no LM score and are excluded, like
    ccnet's < 3-char rule."""
    from convert_parquet_to_csv_spark.functions.text import (
        token_count,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "lang", "text")
    scores = C.bigram_lm_scores(docs.select("doc_id", "text"))
    scored = (
        scores.filter(F.col("n_transitions") > 0)
        .select("doc_id", F.col("avg_cost_micro").alias("score"))
        .join(
            docs.select(
                "doc_id",
                "lang",
                token_count(F.lower(F.col("text")))
                .cast("bigint")
                .alias("n_tokens"),
            ),
            "doc_id",
        )
        # lm_score_buckets references its input twice (sample +
        # assign); without this pin the corpus-scale per-doc bigram
        # exchange and the model-keyed scoring join would execute
        # twice — only the model-scale bc table inside
        # bigram_lm_scores is localCheckpointed (ADVICE r9 #3).
        # Caller-released: bench/oracle_check clearCache() between
        # queries, per the registry-wide persist convention.
        .persist()
    )
    return C.lm_score_buckets(scored, lower_is_better=True)

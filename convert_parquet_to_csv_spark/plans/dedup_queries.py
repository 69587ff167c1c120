"""Driver-checked queries: dedup suite over the documents table.

``dedup_exact``, ``dedup_ngram_jaccard``, and (since r5)
``dedup_minhash`` have full DuckDB oracles (hash-matched) — minhash's
exact-Jaccard verification makes its survivor set SQL-expressible
whenever band recall holds (see ``_MINHASH_SURVIVOR_ORACLE``).
SimHash's survivor ids are a pure function of the Spark-side xxhash64
signature (not SQL-replayable), so ``dedup_simhash`` is gated as a
single-row property check against the in-query brute-force hamming
truth (``_SIMHASH_SURVIVOR_GATE_ORACLE``), with
``dedup_simhash_complete`` separately pinning the chunk-LSH
candidate set's exactness.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from convert_parquet_to_csv_spark.functions import text as T
from convert_parquet_to_csv_spark.operators import dedup as D
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.sources import read_parquet


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


_EXACT_ORACLE = """
WITH fp AS (
  SELECT *, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS _fp
  FROM documents
), r AS (
  SELECT *, row_number() OVER (PARTITION BY _fp ORDER BY doc_id) AS _rn
  FROM fp
)
SELECT doc_id, text, lang, source, n_chars FROM r WHERE _rn = 1
"""


@query("dedup_exact", oracle=_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: min-id survivor per content fingerprint."""
    return D.exact_dedup(_docs(spark, sf_dir))


# Exact pairwise n-gram Jaccard — the one near-dup flavor a SQL engine
# can replay verbatim (shingle explode + self-join + count arithmetic).
_K, _THRESH = 3, 0.1

_NGRAM_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(0, greatest(len(toks) - {_K}, 0) + 1),
             i -> array_to_string(toks[i + 1 : i + {_K}], ' ')))) AS s
  FROM tok WHERE len(toks) > 0
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) AS jaccard
FROM inter
JOIN cnt na ON na.doc_id = id_a
JOIN cnt nb ON nb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= {_THRESH}
"""


@query("dedup_ngram_jaccard", oracle=_NGRAM_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All document pairs with 3-gram shingle Jaccard ≥ 0.1."""
    return D.ngram_jaccard_pairs(
        _docs(spark, sf_dir), k=_K, threshold=_THRESH
    )


# Survivor-set oracle for the full MinHash-LSH pipeline (VERDICT r4
# item 8): the LSH candidate generation is hash-family-dependent, but
# the pipeline VERIFIES candidates with exact Jaccard ≥ 0.5 before
# dropping anything — so as long as the band buckets achieve full
# recall on the fixture (gated separately by dedup_minhash_recall),
# the verified pair set IS the exact-Jaccard≥0.5 pair set, and the
# survivor set is SQL-expressible: docs that never appear as the
# higher id of such a pair. A red row here means LSH recall actually
# broke on the fixture — the exact failure the old rows-only check
# couldn't see.
_MINHASH_SURVIVOR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(0, greatest(len(toks) - {_K}, 0) + 1),
             i -> array_to_string(toks[i + 1 : i + {_K}], ' ')))) AS s
  FROM tok WHERE len(toks) > 0
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), losers AS (
  SELECT DISTINCT id_b FROM inter
  JOIN cnt na ON na.doc_id = id_a
  JOIN cnt nb ON nb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.5
)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT id_b FROM losers)
"""


@query("dedup_minhash", oracle=_MINHASH_SURVIVOR_ORACLE)
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup survivors (signatures → bands → verify).

    Upgraded from rows-only to a full value-hash oracle: see
    ``_MINHASH_SURVIVOR_ORACLE`` — exact verification makes the
    survivor set hash-checkable whenever band recall holds, which
    ``dedup_minhash_recall`` gates pairwise."""
    kept = D.minhash_dedup(_docs(spark, sf_dir), threshold=0.5)
    return kept.select("doc_id").orderBy("doc_id")


# Survivor-set property gate (VERDICT r5 item 4): the simhash
# SIGNATURE is a pure function of Spark's xxhash64, so DuckDB cannot
# replay the survivor ids — but the survivor set's defining properties
# can be verified in-query against an INDEPENDENT brute-force
# hamming join over the same signature table (the dedup_simhash_
# complete scaffold): survivors = exactly the docs never appearing as
# the greater id of a hamming≤3 pair. ``n_input`` anchors on data;
# the booleans assert the three clauses of that characterization.
# A red row means the chunk-LSH pipeline dropped the wrong docs —
# invisible to the old rows-only check.
_SIMHASH_SURVIVOR_GATE_ORACLE = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_input,
       TRUE AS partition_ok,
       TRUE AS kept_closed,
       TRUE AS drops_minimal
FROM documents
"""


@query("dedup_simhash", oracle=_SIMHASH_SURVIVOR_GATE_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup survivors (64-bit signature, hamming ≤ 3),
    gated as a single-row property check (see
    ``_SIMHASH_SURVIVOR_GATE_ORACLE``): ``partition_ok`` = survivor
    count equals n_input minus brute-force loser count; ``kept_closed``
    = no survivor is the greater id of any brute-force hamming≤3 pair;
    ``drops_minimal`` = every dropped doc IS such a greater id.
    Together the three pin the survivor set exactly, verified against
    the O(n²) brute-force join (fixture-scale scaffold only — the
    production path stays chunk-LSH candidate-bounded)."""
    docs = _docs(spark, sf_dir)
    kept = D.simhash_dedup(docs).select("doc_id")
    sigs = D.simhash_signatures(docs).persist()
    a = sigs.select(
        F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sa")
    )
    b = sigs.select(
        F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sb")
    )
    losers_brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))) <= 3)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .persist()
    )
    n_input = docs.count()
    n_kept = kept.count()
    n_losers = losers_brute.count()
    kept_in_losers = kept.join(losers_brute, "doc_id", "left_semi").count()
    dropped_not_loser = (
        docs.select("doc_id")
        .join(kept, "doc_id", "left_anti")
        .join(losers_brute, "doc_id", "left_anti")
        .count()
    )
    sigs.unpersist()
    losers_brute.unpersist()
    return spark.createDataFrame(
        [(
            n_input,
            n_kept == n_input - n_losers,
            kept_in_losers == 0,
            dropped_not_loser == 0,
        )],
        "n_input bigint, partition_ok boolean, kept_closed boolean, "
        "drops_minimal boolean",
    )


# --- quality gates for the approximate methods ----------------------------
#
# Same oracle trick as the ANN recall gates (plans/similarity_queries.py):
# the *ground truth* is SQL-expressible even when the hash family is not,
# so return ground-truth rows plus booleans the oracle asserts as TRUE
# literals — a value-hash check on what the approximation must achieve.

_MINHASH_GT_THRESH = 0.5

_MINHASH_RECALL_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(0, greatest(len(toks) - {_K}, 0) + 1),
             i -> array_to_string(toks[i + 1 : i + {_K}], ' ')))) AS s
  FROM tok WHERE len(toks) > 0
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, TRUE AS found_by_lsh
FROM inter
JOIN cnt na ON na.doc_id = id_a
JOIN cnt nb ON nb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE)
      >= {_MINHASH_GT_THRESH}
"""


@query("dedup_minhash_recall", oracle=_MINHASH_RECALL_ORACLE)
def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair LSH recall gate: every exact-Jaccard≥0.5 duplicate
    pair must surface as a MinHash band-bucket candidate.

    Deterministic: xxhash64 has no run-to-run randomness and the
    fixtures are fixed, so the candidate set is a pure function of the
    data. Measured 28/28, 25/25, 256/256 pairs found at
    sf0.001/0.01/0.1 (all ground-truth pairs have j ≥ 0.8, where the
    8-band × 4-row collision probability is ≥ 0.98 per pair)."""
    docs = _docs(spark, sf_dir)
    truth = D.ngram_jaccard_pairs(docs, k=_K, threshold=_MINHASH_GT_THRESH)
    sigs = D.minhash_signatures(docs, k=_K, num_perm=32)
    cand = D.lsh_candidate_pairs(sigs, num_perm=32, bands=8).withColumn(
        "_hit", F.lit(True)
    )
    return truth.join(cand, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        F.coalesce("_hit", F.lit(False)).alias("found_by_lsh"),
    )


_SIMHASH_COMPLETE_ORACLE = """
SELECT TRUE AS pigeonhole_complete, TRUE AS verified_subset
"""


@query("dedup_simhash_complete", oracle=_SIMHASH_COMPLETE_ORACLE)
def dedup_simhash_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash chunk-LSH exactness gate (single-row property check).

    The pigeonhole argument says chunk-equality candidates MISS
    nothing: hamming ≤ 3 across 4 × 16-bit chunks forces at least one
    identical chunk. This query proves it on the fixture by comparing
    against the O(n²) brute-force hamming join (verification scaffold
    only — the production path stays O(candidates)):
    ``pigeonhole_complete`` = no brute-force pair absent from the
    chunk-LSH output; ``verified_subset`` = every chunk-LSH pair also
    passes the brute-force hamming ≤ 3 test (exact verification, no
    false positives)."""
    docs = _docs(spark, sf_dir)
    sigs = D.simhash_signatures(docs).persist()
    a = sigs.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("_sa"))
    b = sigs.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("_sb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("_sa").bitwiseXOR(F.col("_sb"))) <= 3
        )
        .select("id_a", "id_b")
    )
    lsh = D.simhash_pairs(sigs).select("id_a", "id_b")
    missed = brute.join(lsh, ["id_a", "id_b"], "left_anti").count()
    extra = lsh.join(brute, ["id_a", "id_b"], "left_anti").count()
    sigs.unpersist()
    return spark.createDataFrame(
        [(missed == 0, extra == 0)],
        "pigeonhole_complete boolean, verified_subset boolean",
    )


# --- transitive dedup clusters (operators/graph.py) -----------------------
#
# Pairwise near-dup output under-merges transitive chains (A~B, B~C,
# A≁C). The cluster view labels every doc with the min doc_id in its
# connected component over the exact-Jaccard≥0.1 pair graph. The oracle
# replays the component computation with a recursive CTE (min reachable
# id == min id in component) over the same SQL-expressible edge set.

_CC_ORACLE = f"""
WITH RECURSIVE tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(0, greatest(len(toks) - {_K}, 0) + 1),
             i -> array_to_string(toks[i + 1 : i + {_K}], ' ')))) AS s
  FROM tok WHERE len(toks) > 0
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN cnt na ON na.doc_id = id_a
  JOIN cnt nb ON nb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= {_THRESH}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, MIN(label) AS component
FROM reach GROUP BY node
"""


@query("dedup_clusters_cc", oracle=_CC_ORACLE)
def dedup_clusters_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the exact near-dup pair graph
    (hash-min label propagation, operators/graph.py): every document
    labeled with the min doc_id of its duplicate cluster — the
    transitive-closure view pairwise dedup can't give."""
    from convert_parquet_to_csv_spark.operators.graph import (
        connected_components,
    )

    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, k=_K, threshold=_THRESH)
    return connected_components(
        docs.select("doc_id"),
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
        id_col="doc_id",
    )


# --- edit-distance fuzzy pairs --------------------------------------------

_FUZZY_ORACLE = """
WITH base AS (
  SELECT doc_id,
         substring(lower(trim(text)), 1, 40) AS title,
         substring(lower(trim(text)), 1, 4) AS blk
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.title, b.title) AS INT) AS distance
FROM base a JOIN base b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.title, b.title) <= 5
"""


@query("dedup_fuzzy_levenshtein", oracle=_FUZZY_ORACLE)
def dedup_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs over normalized 40-char title
    prefixes, blocked on the first 4 chars (operators/dedup.py
    fuzzy_title_pairs) — byte-noise dups that token-level Jaccard
    misses. Identical levenshtein metric in both engines."""
    return D.fuzzy_title_pairs(_docs(spark, sf_dir))


# --- PageRank over the near-dup graph (operators/graph.py) ----------------
#
# Iterative float algorithms normally can't be value-hash checked: each
# engine's summation order drifts and five iterations compound it. The
# fixed-point formulation makes every step integer-exact, so the oracle
# can replay the recurrence with five unrolled SQL iterations and match
# bitwise.

_PAGERANK_ORACLE = """WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(0, greatest(len(toks) - {k}, 0) + 1),
             i -> array_to_string(toks[i + 1 : i + {k}], ' ')))) AS s
  FROM tok WHERE len(toks) > 0
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN cnt na ON na.doc_id = id_a
  JOIN cnt nb ON nb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= {thresh}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), outdeg AS (
  SELECT src, COUNT(*) AS deg FROM edges GROUP BY src
), consts AS (
  SELECT (15000000000000 // (100 * COUNT(*))) AS base,
         (1000000000000 // COUNT(*)) AS init
  FROM documents
), pr0 AS (
  SELECT doc_id AS node, CAST((SELECT init FROM consts) AS BIGINT) AS r
  FROM documents
), pr1 AS (
  SELECT d.doc_id AS node,
         CAST((SELECT base FROM consts)
              + (COALESCE(s.c, 0) * 85) // 100 AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // o.deg) AS c
    FROM edges e
    JOIN pr0 p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = d.doc_id
), pr2 AS (
  SELECT d.doc_id AS node,
         CAST((SELECT base FROM consts)
              + (COALESCE(s.c, 0) * 85) // 100 AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // o.deg) AS c
    FROM edges e
    JOIN pr1 p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = d.doc_id
), pr3 AS (
  SELECT d.doc_id AS node,
         CAST((SELECT base FROM consts)
              + (COALESCE(s.c, 0) * 85) // 100 AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // o.deg) AS c
    FROM edges e
    JOIN pr2 p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = d.doc_id
), pr4 AS (
  SELECT d.doc_id AS node,
         CAST((SELECT base FROM consts)
              + (COALESCE(s.c, 0) * 85) // 100 AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // o.deg) AS c
    FROM edges e
    JOIN pr3 p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = d.doc_id
), pr5 AS (
  SELECT d.doc_id AS node,
         CAST((SELECT base FROM consts)
              + (COALESCE(s.c, 0) * 85) // 100 AS BIGINT) AS r
  FROM documents d LEFT JOIN (
    SELECT e.dst AS node, SUM(p.r // o.deg) AS c
    FROM edges e
    JOIN pr4 p ON p.node = e.src
    JOIN outdeg o ON o.src = e.src
    GROUP BY e.dst) s ON s.node = d.doc_id
)
SELECT node AS doc_id,
       CAST(r AS DOUBLE) / 1000000000000.0 AS rank
FROM pr5""".format(k=_K, thresh=_THRESH)


@query("pagerank_dup_graph", oracle=_PAGERANK_ORACLE)
def pagerank_dup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five PageRank iterations (damping 0.85) over the symmetrized
    exact-Jaccard near-dup graph — centrality inside dedup clusters
    picks the canonical representative. All integer arithmetic
    (operators/graph.pagerank_fixed_point): bitwise identical to the
    oracle's five unrolled SQL iterations."""
    from convert_parquet_to_csv_spark.operators.graph import (
        pagerank_fixed_point,
    )

    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, k=_K, threshold=_THRESH)
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    return pagerank_fixed_point(
        docs.select("doc_id"), sym, n_iters=5, id_col="doc_id"
    )


# --- incremental dedup: new batch vs historical store ---------------------

_INCR_DEDUP_ORACLE = r"""
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
           AS fingerprint,
         doc_id % 7 = 3 AS is_new
  FROM documents
),
history AS (SELECT DISTINCT fingerprint FROM fp WHERE NOT is_new),
batch AS (
  SELECT doc_id, fingerprint,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY doc_id) AS _rn
  FROM fp WHERE is_new
)
SELECT b.doc_id, b.fingerprint
FROM batch b
WHERE b._rn = 1
  AND NOT EXISTS (SELECT 1 FROM history h
                  WHERE h.fingerprint = b.fingerprint)
"""


@query("dedup_incremental_batch", oracle=_INCR_DEDUP_ORACLE)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup — the steady-state production shape:
    today's batch (doc_id % 7 == 3 stands in for the new partition)
    dedups within itself (keep min doc_id per fingerprint), then
    anti-joins the historical fingerprint store so previously-ingested
    content never re-enters the corpus.

    At 100 TB the history side is a compact fingerprint table (one
    md5 per unique doc ever seen — operators/upsert.py appends
    today's survivors to it), so the anti join shuffles only
    (fingerprint) pairs, never text; within-batch dedup is the same
    WindowGroupLimit as dedup_exact."""
    docs = _docs(spark, sf_dir)
    fp = docs.select(
        "doc_id", T.doc_fingerprint("text").alias("fingerprint")
    )
    is_new = F.col("doc_id") % 7 == 3
    history = fp.filter(~is_new).select("fingerprint").distinct()
    batch = fp.filter(is_new)
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return kept.join(history, "fingerprint", "left_anti").select(
        "doc_id", "fingerprint"
    )


# --- triangle count over the co-purchase graph ----------------------------

# The oracle uses the NAIVE id-ordered wedge join (fine at fixture
# scale); the Spark side uses degree-ordered orientation (operators/
# graph.triangle_count) — the counts are provably identical, which is
# exactly what makes the scalable algorithm oracle-checkable.
_TRIANGLE_ORACLE = """
WITH edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT (SELECT COUNT(DISTINCT n) FROM (
          SELECT u AS n FROM edges UNION ALL SELECT v FROM edges))
         AS n_nodes,
       (SELECT COUNT(*) FROM edges) AS n_edges,
       (SELECT COUNT(*) FROM edges e1
        JOIN edges e2 ON e1.v = e2.u
        JOIN edges e3 ON e1.u = e3.u AND e2.v = e3.v) AS n_triangles
"""


@query("graph_triangle_copurchase", oracle=_TRIANGLE_ORACLE)
def graph_triangle_copurchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Exact triangle count over the part co-purchase graph (parts
    sharing an order are connected): the graph-density companion to
    connected components and PageRank in the dup-graph toolkit.

    The edge derivation is one self-join of lineitem on orderkey
    (shuffled once on the key) + distinct; counting uses
    operators/graph.triangle_count's degree-ordered orientation, so
    the wedge join is built at each triangle's lowest-degree vertex —
    O(E^1.5) instead of Σ deg², which is what survives the hub parts
    a real co-occurrence graph always has."""
    li = read_parquet(
        spark, os.path.join(sf_dir, "lineitem.parquet")
    ).select("l_orderkey", "l_partkey")
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb")
    )
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .distinct()
    )
    from convert_parquet_to_csv_spark.operators.graph import (
        triangle_count,
    )

    return triangle_count(edges)


# --- k-core of the repeated co-purchase graph -----------------------------

# The oracle unrolls the peel as _KCORE_UNROLL fixed SQL stages
# (recursive CTEs can't host per-round aggregation in either
# engine's dialect; each stage is AS MATERIALIZED or DuckDB's CTE
# inlining re-expands every reference exponentially). A converged
# peel round is a no-op, so "exactly
# R rounds" equals "run to fixpoint" whenever the true peeling depth
# is <= R; observed depth is 9 at sf0.01 / 3 at sf0.1, and
# test_kcore_peel_depth_within_oracle_unroll pins depth <= R against
# fixture drift. The Spark side genuinely runs to fixpoint
# (operators/graph.k_core raises rather than return a partial peel).
_KCORE_UNROLL = 20

def _kcore_oracle() -> str:
    stages = ["""
WITH e0 AS MATERIALIZED (
  SELECT least(a.l_partkey, b.l_partkey) AS u,
         greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)"""]
    for i in range(1, _KCORE_UNROLL + 1):
        stages.append(f""",
d{i} AS MATERIALIZED (SELECT node, COUNT(*) AS deg FROM
        (SELECT u AS node FROM e{i-1}
         UNION ALL SELECT v FROM e{i-1}) GROUP BY node),
a{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE deg >= 3),
e{i} AS MATERIALIZED (SELECT u, v FROM e{i-1}
        WHERE u IN (SELECT node FROM a{i})
          AND v IN (SELECT node FROM a{i}))""")
    last = f"e{_KCORE_UNROLL}"
    stages.append(f"""
SELECT node, CAST(COUNT(*) AS BIGINT) AS core_deg
FROM (SELECT u AS node FROM {last} UNION ALL SELECT v FROM {last})
GROUP BY node""")
    return "".join(stages)


@query("kcore_copurchase", oracle=_kcore_oracle())
def kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the REPEATED co-purchase graph (parts co-occurring
    in >= 2 distinct orders): the dense nucleus that survives when
    every marginal node is iteratively peeled — the graph-native
    "dense region" extractor (spam/template hubs in dup graphs).
    The weight filter keeps the graph heavy-tailed so the core is
    non-trivial: at sf0.01 roughly half the nodes survive 9 peel
    rounds; at sf0.1 the sparser relative co-occurrence collapses to
    an empty core — both exact outcomes, oracle-confirmed. See
    operators/graph.k_core for the per-round scale shape."""
    li = read_parquet(
        spark, os.path.join(sf_dir, "lineitem.parquet")
    ).select("l_orderkey", "l_partkey")
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb")
    )
    edges = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("src"), F.col("pb").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("src", "dst")
    )
    from convert_parquet_to_csv_spark.operators.graph import k_core

    return k_core(edges, 3, max_rounds=40)


# --- 2-hop neighborhood size ----------------------------------------------

_TWOHOP_ORACLE = """
WITH e AS (
  SELECT least(a.l_partkey, b.l_partkey) AS u,
         greatest(a.l_partkey, b.l_partkey) AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
sym AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
reach AS (
  SELECT u AS node, v AS nbr FROM sym
  UNION
  SELECT e1.u AS node, e2.v AS nbr
  FROM sym e1 JOIN sym e2 ON e1.v = e2.u
  WHERE e2.v <> e1.u)
SELECT node, CAST(COUNT(DISTINCT nbr) AS BIGINT) AS n_within_2_hops
FROM reach GROUP BY node
"""


@query("twohop_neighborhood_size", oracle=_TWOHOP_ORACLE)
def twohop_neighborhood_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """|N≤2(v)| per node on the repeated co-purchase graph — the
    local-reach metric behind friend-of-friend recommendations and
    influence scoring. One wedge join (sym ⋈ sym on the middle node)
    + a distinct-union with the 1-hop set, counted per node.

    Scale note, stated honestly: EXACT 2-hop distinct counts
    materialize Σ deg² wedge rows before the distinct — hub nodes
    make that the dominant cost, and the guards are a degree cap on
    the join's build side or switching the distinct-count to the
    mergeable HLL sketch (operators/sketches.py) for ±2% at 1/1000th
    the shuffle. The fixture graph's weight-≥2 pruning keeps Σ deg²
    modest here (same stop-term reasoning as sparse cosine's df
    cap)."""
    li = read_parquet(
        spark, os.path.join(sf_dir, "lineitem.parquet")
    ).select("l_orderkey", "l_partkey")
    a = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa")
    )
    b = li.select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pb")
    )
    e = (
        a.join(b, "k")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("u"), F.col("pb").alias("v"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("u", "v")
        .persist()  # feeds both sym directions and the wedge join
    )
    sym = e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    e1 = sym.select(F.col("u").alias("node"), F.col("v").alias("mid"))
    e2 = sym.select(F.col("u").alias("mid"), F.col("v").alias("nbr"))
    two = (
        e1.join(e2, "mid")
        .filter(F.col("nbr") != F.col("node"))
        .select("node", "nbr")
    )
    one = sym.select(F.col("u").alias("node"), F.col("v").alias("nbr"))
    return (
        one.unionAll(two)
        .distinct()
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_within_2_hops"))
    )


# --- dedup audit: cluster-size histogram ----------------------------------

_CLUSTER_HIST_ORACLE = """
WITH fp AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS _fp
  FROM documents
), clusters AS (
  SELECT _fp, COUNT(*) AS cluster_size FROM fp GROUP BY _fp
)
SELECT cluster_size,
       COUNT(*) AS n_clusters,
       CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
FROM clusters GROUP BY cluster_size
"""


@query("dedup_cluster_size_histogram", oracle=_CLUSTER_HIST_ORACLE)
def dedup_cluster_size_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The dedup AUDIT readout: how many duplicate clusters of each
    size exist (size 1 = unique docs; Σ n_docs = corpus size, Σ
    n_clusters = post-dedup size — the numbers a curation run reports
    before committing a destructive dedup). Two cheap aggregations:
    fingerprint→size (the same single shuffle exact_dedup pays, so at
    100 TB this rides the dedup job for free), then size→count over
    at most |distinct sizes| rows. Shares dedup_exact's normalization
    so the histogram describes exactly what that operator would
    delete."""
    from convert_parquet_to_csv_spark.functions.text import (
        doc_fingerprint,
    )

    docs = _docs(spark, sf_dir)
    clusters = docs.select(
        doc_fingerprint("text").alias("_fp")
    ).groupBy("_fp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return clusters.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_docs"),
    )


# --- survivorship: golden record by source priority -----------------------

_GOLDEN_ORACLE = """
WITH fp AS (
  SELECT doc_id, source, n_chars,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS _fp
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY _fp
      ORDER BY CASE WHEN source IN ('src0','src1','src2') THEN 0
                    ELSE 1 END,
               n_chars DESC, doc_id ASC) AS rn
  FROM fp
)
SELECT source,
       COUNT(*) AS n_golden,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM ranked WHERE rn = 1
GROUP BY source
"""


@query("survivorship_golden_record", oracle=_GOLDEN_ORACLE)
def survivorship_golden_record(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MDM survivorship: within each duplicate cluster pick ONE
    golden record by an explicit rule stack — trusted sources first
    (src0-2 here stand in for the curated tier), then the richest
    record (n_chars desc), then the stable doc_id tiebreak. This is
    exact_dedup's business-rule sibling: same single fingerprint
    shuffle + WindowGroupLimit, but the winner is POLICY, not min-id
    — the difference between "dedup" and "master data". The
    per-source census of winners is the gate (it shifts if any rule
    tier is dropped or reordered)."""
    from convert_parquet_to_csv_spark.functions.text import (
        doc_fingerprint,
    )
    from pyspark.sql.window import Window

    docs = _docs(spark, sf_dir)
    ranked = docs.withColumn(
        "_fp", doc_fingerprint("text")
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("_fp").orderBy(
                F.when(
                    F.col("source").isin("src0", "src1", "src2"), 0
                ).otherwise(1),
                F.desc("n_chars"),
                F.asc("doc_id"),
            )
        ),
    )
    return (
        ranked.filter(F.col("rn") == 1)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_golden"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# --------------------------------------------------------------------------
# r6 additions: containment (asymmetric near-dup) + winnowing (MOSS)
# Registered AFTER the r6 gate rotation froze — they sit past the
# FIRST_TIER prefix, i.e. they are the r7 rotation's backlog.
# --------------------------------------------------------------------------

_CT_K, _CT_THRESH, _CT_MAXB = 3, 0.5, 1000

_CONTAINMENT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(0, greatest(len(toks) - {_CT_K}, 0) + 1),
             i -> array_to_string(toks[i + 1 : i + {_CT_K}], ' ')))) AS s
  FROM tok WHERE len(toks) > 0
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), hot AS (
  -- stop-shingle guard replay: sh is distinct (doc, s), so count(*)
  -- = number of docs carrying the shingle; shingles above the cap
  -- leave CANDIDATE GENERATION only (the intersection numerator) —
  -- the per-doc denominator stays unguarded, exactly like the Spark
  -- plan's left_anti on the exploded table
  SELECT s FROM sh GROUP BY s HAVING count(*) > {_CT_MAXB}
), cold AS (
  SELECT doc_id, s FROM sh WHERE s NOT IN (SELECT s FROM hot)
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM cold a JOIN cold b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), ordered AS (
  SELECT id_a AS contained_id, id_b AS container_id, i FROM inter
  UNION ALL
  SELECT id_b AS contained_id, id_a AS container_id, i FROM inter
)
SELECT contained_id, container_id,
       CAST(i AS DOUBLE) / CAST(c.n AS DOUBLE) AS containment
FROM ordered JOIN cnt c ON c.doc_id = contained_id
WHERE CAST(i AS DOUBLE) / CAST(c.n AS DOUBLE) >= {_CT_THRESH}
"""


@query("dedup_containment", oracle=_CONTAINMENT_ORACLE)
def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle-set containment pairs ≥ 0.5 — the
    excerpt/quote detector (fifth near-dup family). Same shingle
    explode + single unordered self-join as dedup_ngram_jaccard;
    both ordered directions expand from that one join output. The
    hot-shingle guard runs LIVE here (max_bucket=1000, the
    lsh_candidate_pairs default; oracle replays it) — at sf0.01 no
    shingle exceeds the cap so the output is guard-invariant, but
    the gate pins the guarded PLAN against the guarded oracle; the
    output-changing behavior is pinned by
    tests/test_dedup.py::test_hot_shingle_guard_containment."""
    return D.containment_pairs(
        _docs(spark, sf_dir),
        k=_CT_K,
        threshold=_CT_THRESH,
        max_bucket=_CT_MAXB,
    )


# Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD'03). The md5 flavor is
# bit-replayable in DuckDB: Spark conv(substring(md5(gram),1,15),16,10)
# == DuckDB ('0x'||substr(md5(gram),1,15))::BIGINT (verified value-
# equal), so the SELECTION — rightmost-minimal hash per sliding window
# of gram positions — can be replayed exactly. DuckDB has no
# struct-min window aggregate, so the oracle expands each valid window
# start against its member grams (bounded: window=4 rows per start)
# and picks the winner with row_number ordered by (h ASC, pos DESC) —
# the same robust-winnowing tie-break the Spark plan encodes as
# min(struct(h, -pos)).
_WN_K, _WN_WINDOW = 5, 4

_WINNOW_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         len(toks) - {_WN_K} + 1 AS g,
         ('0x' || substr(md5(array_to_string(
             toks[i + 1 : i + {_WN_K}], ' ')), 1, 15))::BIGINT AS h
  FROM tok, unnest(range(0, len(toks) - {_WN_K} + 1)) AS t(i)
  WHERE len(toks) >= {_WN_K}
), starts AS (
  SELECT doc_id, pos FROM grams
  WHERE pos <= greatest(g - {_WN_WINDOW}, 0)
), win AS (
  SELECT s.doc_id, g2.pos AS gpos, g2.h,
         row_number() OVER (
             PARTITION BY s.doc_id, s.pos
             ORDER BY g2.h ASC, g2.pos DESC) AS rn
  FROM starts s
  JOIN grams g2 ON g2.doc_id = s.doc_id
              AND g2.pos BETWEEN s.pos AND s.pos + {_WN_WINDOW} - 1
)
SELECT DISTINCT doc_id, gpos AS pos, h AS fp
FROM win WHERE rn = 1
"""


@query("dedup_winnow_fingerprints", oracle=_WINNOW_ORACLE)
def dedup_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (md5 flavor, k=5, window=4): the
    deterministic local-similarity index — any shared run of
    window+k-1 = 8 words between two docs is guaranteed a shared
    fingerprint, at ~2/(window+1) selection density."""
    fps = D.winnow_fingerprints(
        _docs(spark, sf_dir),
        k=_WN_K,
        window=_WN_WINDOW,
        hash_fn="md5",
    )
    return fps.select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "fp"
    )


_WN_MIN_SHARED = 2

_WINNOW_PAIRS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         len(toks) - {_WN_K} + 1 AS g,
         ('0x' || substr(md5(array_to_string(
             toks[i + 1 : i + {_WN_K}], ' ')), 1, 15))::BIGINT AS h
  FROM tok, unnest(range(0, len(toks) - {_WN_K} + 1)) AS t(i)
  WHERE len(toks) >= {_WN_K}
), starts AS (
  SELECT doc_id, pos FROM grams
  WHERE pos <= greatest(g - {_WN_WINDOW}, 0)
), win AS (
  SELECT s.doc_id, g2.pos AS gpos, g2.h,
         row_number() OVER (
             PARTITION BY s.doc_id, s.pos
             ORDER BY g2.h ASC, g2.pos DESC) AS rn
  FROM starts s
  JOIN grams g2 ON g2.doc_id = s.doc_id
              AND g2.pos BETWEEN s.pos AND s.pos + {_WN_WINDOW} - 1
), fp AS (
  SELECT DISTINCT doc_id, h AS fp FROM win WHERE rn = 1
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       count(*) AS n_shared
FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {_WN_MIN_SHARED}
"""


@query("dedup_winnow_candidates", oracle=_WINNOW_PAIRS_ORACLE)
def dedup_winnow_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style candidate pairs: docs sharing ≥ 2 winnowing
    fingerprint values (fp self-join over the ~2/(window+1)-density
    index, never over raw grams)."""
    fps = D.winnow_fingerprints(
        _docs(spark, sf_dir),
        k=_WN_K,
        window=_WN_WINDOW,
        hash_fn="md5",
    )
    return D.winnow_candidate_pairs(fps, min_shared=_WN_MIN_SHARED)


# --------------------------------------------------------------------------
# r7 additions: URL- and domain-level dedup (the pre-content pass)
# Day-one gated (FIRST_TIER slots reserved in the r7 rotation).
# --------------------------------------------------------------------------

# The documents fixture carries no URL column, so the gated queries
# attach a DETERMINISTIC synthetic one — built from md5(doc_id) bits
# and the source column with the exact same string algebra in Spark
# and DuckDB (md5 is the repo's cross-engine RNG, registry.py rule 3).
# The construction deliberately covers every canonicalization clause:
# mixed schemes, optional www./cdn. prefixes, shared paths
# (doc_id div 100 → ~5 docs per source×bucket at sf0.01), optional
# trailing slash, tracking params that vary per doc (utm_source=,
# fbclid=) and REAL params (page=, a=) inserted in non-sorted order.
# Docs agreeing on (cdn-bit, source, path bucket, real params)
# canonicalize identically however their scheme/www/slash/tracking
# noise differs — those are the dup groups the operator must find.

def _synth_url() -> "F.Column":
    h = F.md5(F.col("doc_id").cast("string"))

    def bit(i: int) -> "F.Column":
        return F.ascii(F.substring(h, i, 1)) % 2 == 1

    scheme = F.when(bit(1), F.lit("https://")).otherwise(F.lit("http://"))
    www = F.when(bit(2), F.lit("www.")).otherwise(F.lit(""))
    sub = F.when(bit(3), F.lit("cdn.")).otherwise(F.lit(""))
    path = F.concat(
        F.lit("/Article/"),
        F.expr("cast(doc_id div 100 as string)"),
    )
    slash = F.when(bit(4), F.lit("/")).otherwise(F.lit(""))
    params = F.filter(
        F.array(
            F.when(
                bit(5),
                F.concat(
                    F.lit("utm_source=feed"),
                    (F.col("doc_id") % 100).cast("string"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                bit(6),
                F.concat(
                    F.lit("page="), (F.col("doc_id") % 3).cast("string")
                ),
            ).otherwise(F.lit("")),
            F.when(
                bit(7), F.concat(F.lit("fbclid="), F.substring(h, 1, 6))
            ).otherwise(F.lit("")),
            F.when(
                bit(8),
                F.concat(F.lit("a="), (F.col("doc_id") % 2).cast("string")),
            ).otherwise(F.lit("")),
        ),
        lambda p: p != "",
    )
    q = F.array_join(params, "&")
    return F.concat(
        scheme,
        www,
        sub,
        F.col("source"),
        # registered-domain diversity for the census: 3 TLD groups
        # keyed off the source name (stable per source, so canonical
        # dup groups are unaffected)
        F.lit(".example"),
        (F.ascii(F.substring(F.col("source"), 4, 1)) % 3).cast("string"),
        F.lit(".org"),
        path,
        slash,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


# SQL twin of _synth_url + functions/web.py canonicalization — the
# whole pipeline replayed clause for clause.
_URL_BUILD_CTE = r"""
WITH u AS (
  SELECT doc_id,
         (CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) % 2 = 1
               THEN 'https://' ELSE 'http://' END)
      || (CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) % 2 = 1
               THEN 'www.' ELSE '' END)
      || (CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) % 2 = 1
               THEN 'cdn.' ELSE '' END)
      || source || '.example'
      || CAST(ascii(substr(source, 4, 1)) % 3 AS VARCHAR) || '.org'
      || '/Article/' || CAST(doc_id // 100 AS VARCHAR)
      || (CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) % 2 = 1
               THEN '/' ELSE '' END)
      || (CASE WHEN coalesce(array_to_string(list_filter(
              [CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) % 2 = 1
                    THEN 'utm_source=feed' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END,
               CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) % 2 = 1
                    THEN 'page=' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END,
               CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) % 2 = 1
                    THEN 'fbclid=' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) ELSE '' END,
               CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) % 2 = 1
                    THEN 'a=' || CAST(doc_id % 2 AS VARCHAR) ELSE '' END],
              p -> p != ''), '&'), '') = '' THEN ''
          ELSE '?' || array_to_string(list_filter(
              [CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 5, 1)) % 2 = 1
                    THEN 'utm_source=feed' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END,
               CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 6, 1)) % 2 = 1
                    THEN 'page=' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END,
               CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 7, 1)) % 2 = 1
                    THEN 'fbclid=' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) ELSE '' END,
               CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 8, 1)) % 2 = 1
                    THEN 'a=' || CAST(doc_id % 2 AS VARCHAR) ELSE '' END],
              p -> p != ''), '&') END) AS url
  FROM documents
), canon AS (
  SELECT doc_id,
         -- outermost regexp: scheme-default port elision (web.py
         -- url_host step 4 — ':80'/':443' dropped, other ports kept)
         regexp_replace(regexp_replace(lower(regexp_replace(
             regexp_replace(regexp_replace(trim(url), '#.*$', ''),
                            '^[a-zA-Z][a-zA-Z0-9+.\-]*://', ''),
             '[/?].*$', '')), '^www\.', ''), ':(80|443)$', '') AS host,
         regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(trim(url), '#.*$', ''),
                            '^[a-zA-Z][a-zA-Z0-9+.\-]*://', ''),
             '^[^/?]*', ''), '\?.*$', '') AS rawpath,
         CASE WHEN contains(regexp_replace(
                  regexp_replace(regexp_replace(trim(url), '#.*$', ''),
                                 '^[a-zA-Z][a-zA-Z0-9+.\-]*://', ''),
                  '^[^/?]*', ''), '?')
              THEN regexp_replace(regexp_replace(
                  regexp_replace(regexp_replace(trim(url), '#.*$', ''),
                                 '^[a-zA-Z][a-zA-Z0-9+.\-]*://', ''),
                  '^[^/?]*', ''), '^[^?]*\?', '')
              ELSE '' END AS rawq
  FROM u
), c2 AS (
  SELECT doc_id, host,
         host
      || regexp_replace(rawpath, '/+$', '')
      || (CASE WHEN coalesce(array_to_string(list_sort(list_filter(
              string_split(rawq, '&'),
              p -> p != '' AND NOT regexp_matches(p,
                  '^(utm_[a-z]+|fbclid|gclid|mc_cid|mc_eid|ref)='))),
              '&'), '') = '' THEN ''
          ELSE '?' || array_to_string(list_sort(list_filter(
              string_split(rawq, '&'),
              p -> p != '' AND NOT regexp_matches(p,
                  '^(utm_[a-z]+|fbclid|gclid|mc_cid|mc_eid|ref)='))),
              '&') END) AS canonical_url,
         regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain
  FROM canon
)
"""

_URL_DEDUP_ORACLE = (
    _URL_BUILD_CTE
    + """
SELECT canonical_url, domain,
       count(*) AS n_docs, min(doc_id) AS survivor_id
FROM c2 GROUP BY 1, 2
"""
)


@query("dedup_url_canonical", oracle=_URL_DEDUP_ORACLE)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup report (RefinedWeb/CCNet's pre-content pass):
    canonicalize crawl URLs — scheme/www./trailing-slash/fragment
    noise and tracking params (utm_*, fbclid, …) stripped, remaining
    params sorted — then one partial-agg shuffle per canonical key:
    (canonical_url, domain, n_docs, survivor_id). Groups with
    n_docs ≥ 2 are recrawl/tracking-link duplicates detectable
    before any text pass runs."""
    docs = _docs(spark, sf_dir).withColumn("url", _synth_url())
    from convert_parquet_to_csv_spark.operators.urls import (
        url_dup_groups,
    )

    return url_dup_groups(docs)


_DOMAIN_CENSUS_ORACLE = (
    _URL_BUILD_CTE
    + """
, per_url AS (
  SELECT domain, canonical_url, count(*) AS n
  FROM c2 GROUP BY 1, 2
)
SELECT domain,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_canonical,
       CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
         AS dup_frac
FROM per_url GROUP BY 1
"""
)


@query("url_domain_census", oracle=_DOMAIN_CENSUS_ORACLE)
def url_domain_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain crawl profile: raw docs, canonical
    pages, duplicate fraction — the table that decides per-domain
    mixture caps and flags crawler traps (high dup_frac). Two
    partial-agg shuffles; domain = simplified last-two-labels (the
    public-suffix-table seam is documented in operators/urls.py)."""
    docs = _docs(spark, sf_dir).withColumn("url", _synth_url())
    from convert_parquet_to_csv_spark.operators.urls import (
        domain_census,
    )

    return domain_census(docs)


# --------------------------------------------------------------------------
# r7 addition: exact-substring duplicated-span extents (Lee et al. 2022)
# Day-one gated (FIRST_TIER slot reserved in the r7 rotation).
# --------------------------------------------------------------------------

_XS_K, _XS_MIN = 6, 2

_SPAN_EXTENTS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(toks[CAST(i AS INT) + 1 :
                              CAST(i AS INT) + {_XS_K}], ' ') AS g
  FROM tok, unnest(range(0, len(toks) - {_XS_K} + 1)) AS t(i)
  WHERE len(toks) >= {_XS_K}
), hot AS (
  -- TOTAL occurrence count >= min_count: within-doc repeats count,
  -- the ExactSubstr "appears elsewhere" rule (vs span_dedup_c4's
  -- distinct-document threshold)
  SELECT g FROM grams GROUP BY g HAVING count(*) >= {_XS_MIN}
), covered AS (
  SELECT DISTINCT gr.doc_id, gr.pos + CAST(c AS INT) AS pos
  FROM grams gr JOIN hot USING (g), unnest(range(0, {_XS_K})) AS u(c)
), isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS grp
  FROM covered
)
SELECT doc_id,
       CAST(min(pos) AS BIGINT) AS span_start,
       CAST(max(pos) + 1 AS BIGINT) AS span_end,
       CAST(count(*) AS BIGINT) AS span_toks
FROM isl GROUP BY doc_id, grp
"""


@query("dedup_span_extents", oracle=_SPAN_EXTENTS_ORACLE)
def dedup_span_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal duplicated-span extents (operators/dedup.
    duplicated_span_extents) — the ExactSubstr report from Lee et al.
    2022: every maximal run of token positions covered by a 6-gram
    occurring ≥2 times corpus-wide (within-doc repeats count),
    emitted as [span_start, span_end) extents. Complements
    span_dedup_c4 (frequency-thresholded boilerplate REMOVAL at
    distinct-doc granularity) with the suffix-array-style
    duplicated-extent AUDIT; the gaps-and-islands merge is the new
    kernel (pos − row_number over a doc-partitioned window).

    Fixture calibration: k=6 / min_count=2 marks 47 extents across
    47 docs at sf0.01 (529 at sf0.1) — the seeded near-duplicate
    docs light up without degenerating into whole-corpus coverage
    (the synthetic vocabulary makes k≤5 grams corpus-hot). The
    oracle replays tokenize → gram → total-count → coverage →
    islands on gram STRINGS vs Spark's array-slice xxhash64 —
    value-equal up to the standard 2⁻⁶⁴ hash-collision acceptance."""
    return D.duplicated_span_extents(
        _docs(spark, sf_dir), k=_XS_K, min_count=_XS_MIN
    )


# --------------------------------------------------------------------------
# r7 addition: domain-blocklist filtering (the other pre-content pass)
# Day-one gated (FIRST_TIER slot reserved in the r7 rotation).
# --------------------------------------------------------------------------

# Entries are fixture-calibrated against _synth_url's host space
# ([cdn.]srcN.exampleX.org): one full-site block (src3.example0.org —
# also catches its cdn. subdomain), one registered-domain block
# (example2.org — every source whose digit ≡ 2 mod 3), and one
# negative control that matches nothing.
_BLOCKLIST = [
    "src3.example0.org",
    "example2.org",
    "blocked.example9.org",
]

_BLOCKLIST_ORACLE = (
    _URL_BUILD_CTE
    + """
, bl AS (
  SELECT * FROM (VALUES ('src3.example0.org'), ('example2.org'),
                        ('blocked.example9.org')) AS t(entry)
), sfx AS (
  SELECT doc_id,
         unnest(list_transform(
             range(0, len(string_split(host, '.'))),
             i -> array_to_string(string_split(host, '.')[i + 1 :],
                                  '.'))) AS suffix
  FROM c2
), m AS (
  SELECT doc_id, min(entry) AS blocked_by
  FROM sfx JOIN bl ON suffix = entry GROUP BY 1
)
SELECT c2.doc_id, c2.host, m.blocked_by
FROM c2 LEFT JOIN m USING (doc_id)
"""
)


@query("domain_blocklist_filter", oracle=_BLOCKLIST_ORACLE)
def domain_blocklist_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """URL blocklist verdicts (operators/urls.blocklist_filter;
    RefinedWeb §3.1's first stage, UT1-style lists): host equals an
    entry or falls under one as a dot-suffix (wildcard-subdomain
    semantics). The suffix-explode + broadcast equi-join shape is the
    one that survives a multi-million-entry list — no per-entry LIKE
    scan ever runs. Same synthetic URL column as dedup_url_canonical;
    the oracle replays the suffix expansion and the min-entry
    tie-break clause for clause."""
    docs = _docs(spark, sf_dir).withColumn("url", _synth_url())
    from convert_parquet_to_csv_spark.operators.urls import (
        blocklist_filter,
    )

    return blocklist_filter(docs, _BLOCKLIST)


# --------------------------------------------------------------------------
# r7 addition: quality-aware survivor election per duplicate cluster
# Day-one gated (FIRST_TIER slot reserved in the r7 rotation).
# --------------------------------------------------------------------------

_BEST_ORACLE = f"""
WITH RECURSIVE tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(0, greatest(len(toks) - {_K}, 0) + 1),
             i -> array_to_string(toks[i + 1 : i + {_K}], ' ')))) AS s
  FROM tok WHERE len(toks) > 0
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN cnt na ON na.doc_id = id_a
  JOIN cnt nb ON nb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= {_THRESH}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION SELECT id_b, id_a FROM pairs
), reach AS (
  SELECT doc_id AS node, doc_id AS label FROM documents
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
), comp AS (
  SELECT node AS doc_id, MIN(label) AS component
  FROM reach GROUP BY node
), ranked AS (
  SELECT c.component, d.doc_id, CAST(d.n_chars AS BIGINT) AS q,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY d.n_chars DESC, d.doc_id ASC)
           AS rn,
         count(*) OVER (PARTITION BY c.component) AS n_members
  FROM comp c JOIN documents d USING (doc_id)
)
SELECT component,
       CAST(doc_id AS BIGINT) AS survivor_id,
       q AS quality,
       CAST(n_members AS BIGINT) AS n_members
FROM ranked WHERE rn = 1
"""


@query("dedup_keep_best_quality", oracle=_BEST_ORACLE)
def dedup_keep_best_quality(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-aware survivor election (operators/dedup.
    keep_best_per_cluster) over the exact-Jaccard≥0.1 duplicate
    clusters of dedup_clusters_cc: each cluster keeps its LONGEST
    member (n_chars as the quality proxy — the model-score seam is
    the quality_col parameter), ties → min doc_id. Complements the
    min-id keep policy: near-dup clusters mix clean originals with
    truncated recrawls, and id order is crawl-order luck, not
    quality. The argmax is one struct-max groupBy (order-independent,
    map-side combinable — no window sort); the oracle replays the
    recursive-CTE components and elects with a row_number window."""
    from convert_parquet_to_csv_spark.operators.graph import (
        connected_components,
    )

    docs = _docs(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(docs, k=_K, threshold=_THRESH)
    comps = connected_components(
        docs.select("doc_id"),
        pairs.select(
            F.col("id_a").alias("src"), F.col("id_b").alias("dst")
        ),
        id_col="doc_id",
    )
    return D.keep_best_per_cluster(
        # the operator preserves the quality column's own type (a
        # float model score must not truncate) — the bigint the
        # oracle compares against is cast HERE, at the call site
        docs.select(
            "doc_id", F.col("n_chars").cast("bigint").alias("n_chars")
        ),
        comps,
        "n_chars",
    )


# --------------------------------------------------------------------------
# r7 addition: Fellegi–Sunter probabilistic record linkage
# Day-one gated (FIRST_TIER slot reserved in the r7 rotation).
# --------------------------------------------------------------------------

# A–B linkage setting: B is a deterministic "dirty mirror" of the
# customer table (md5-hex-char perturbations — segment corrupted for
# 2/16 of rows (hex chars '0'/'8'), balance jittered by a
# NON-UNIFORM hex-derived step in {−0.4 … +0.8} that is exactly zero
# for the 1/16 of rows whose second hash char is '4'), blocked on
# nationkey. Field weights are FIXED model parameters in integer
# milli-log2 (m = P(agree|match), u = P(agree|non-match) from value
# cardinalities): segment m=7/8, u=1/5 → (+2129, −2678); balance
# bucket (floor/100) m≈0.99, u≈1/110 → (+6767, −6631); exact balance
# +8896 (the log2(m/u) of m=1/21, u≈1e-4 — a slight understatement
# of the true m=1/16, whose exact weight is +9288; FS weights are
# MODEL INPUTS and the gate pins the outputs either way). Threshold
# 5000 milli-log2 ≈ 5 bits of evidence: un-corrupted true pairs
# score ~8826+, segment-flipped true pairs (12.5%) score 4019 and
# are MISSED, same-bucket random pairs occasionally pass — the FS
# precision/recall trade, faithfully.
def _mirror_jitter() -> "F.Column":
    """Deterministic dirty-mirror balance jitter SHARED by
    fs_record_linkage and sn_blocking_linkage (single definition so
    the perturbation model can never drift between the two Spark
    plans; see the model comment above _FS_ORACLE): hex-char-derived
    step in {-0.4 ... +0.8}, exactly zero for the 1/16 of rows whose
    second md5 hex char is '4'."""
    h = F.md5(F.col("c_custkey").cast("string"))
    return (F.ascii(F.substring(h, 2, 1)) % 21 - 10) / F.lit(10.0)


_FS_ORACLE = """
WITH a AS (
  SELECT c_custkey AS a_key, c_nationkey AS nation,
         c_mktsegment AS a_seg, c_acctbal AS a_bal
  FROM customer
), b AS (
  SELECT c_custkey AS b_key, c_nationkey AS nation,
         CASE WHEN ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1))
                   % 8 = 0
              THEN c_mktsegment || '_X' ELSE c_mktsegment END AS b_seg,
         c_acctbal
           + (ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 2, 1))
              % 21 - 10) / 10.0 AS b_bal
  FROM customer
), scored AS (
  SELECT a_key, b_key,
         (CASE WHEN a_seg = b_seg THEN 2129 ELSE -2678 END)
       + (CASE WHEN floor(a_bal / 100) = floor(b_bal / 100)
               THEN 6767 ELSE -6631 END)
       + (CASE WHEN a_bal = b_bal THEN 8896 ELSE -70 END)
           AS score_milli
  FROM a JOIN b USING (nation)
)
SELECT a_key, b_key, CAST(score_milli AS BIGINT) AS score_milli
FROM scored WHERE score_milli >= 5000
"""


@query("fs_record_linkage", oracle=_FS_ORACLE)
def fs_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter A–B record linkage (operators/dq.
    fs_link_scores; Fellegi & Sunter 1969, the Splink model):
    candidates from a nationkey blocking join, match score = sum of
    per-field agreement log-likelihood weights in exact integer
    milli-log2, pairs ≥ 5 bits survive. B is the md5-perturbed dirty
    mirror of the customer table (see the oracle comment for the
    field model and the deliberate miss/false-positive structure).
    All arithmetic — the jitter, the bucket floors, the weight sums —
    is replayed clause-for-clause by the oracle, so the gate pins the
    full score distribution above threshold."""
    from convert_parquet_to_csv_spark.operators.dq import (
        fs_link_scores,
    )

    cust = read_parquet(
        spark, os.path.join(sf_dir, "customer.parquet")
    )
    h = F.md5(F.col("c_custkey").cast("string"))
    a = cust.select(
        F.col("c_custkey").alias("a_key"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("a_seg"),
        F.col("c_acctbal").alias("a_bal"),
    )
    b = cust.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_nationkey").alias("nation"),
        F.when(
            F.ascii(F.substring(h, 1, 1)) % 8 == 0,
            F.concat(F.col("c_mktsegment"), F.lit("_X")),
        )
        .otherwise(F.col("c_mktsegment"))
        .alias("b_seg"),
        (F.col("c_acctbal") + _mirror_jitter()).alias("b_bal"),
    )
    fields = [
        (F.col("a_seg") == F.col("b_seg"), 2129, -2678),
        (
            F.floor(F.col("a_bal") / 100)
            == F.floor(F.col("b_bal") / 100),
            6767,
            -6631,
        ),
        (F.col("a_bal") == F.col("b_bal"), 8896, -70),
    ]
    return fs_link_scores(
        a, b, "nation", fields, threshold_milli=5000
    ).select("a_key", "b_key", "score_milli")


# --------------------------------------------------------------------------
# r7 addition: sorted-neighborhood blocking (Hernández–Stolfo 1995)
# Day-one gated (FIRST_TIER slot reserved in the r7 rotation).
# --------------------------------------------------------------------------

# The merge/purge candidate generator over the SAME A ∪ dirty-mirror-B
# setting as fs_record_linkage: both tables union (B keys 2k+1 vs A keys 2k —
# side-disjoint at every scale factor), sort by account balance within the reliable nation partition,
# and each record pairs with its 2 successors — typo'd/jittered values
# stay NEIGHBORS in sort order even when exact blocking keys break.
_SN_ORACLE = """
WITH a AS (
  SELECT c_custkey * 2 AS rec_key, c_nationkey AS nation,
         c_acctbal AS bal
  FROM customer
), b AS (
  SELECT c_custkey * 2 + 1 AS rec_key, c_nationkey AS nation,
         c_acctbal
           + (ascii(substr(md5(CAST(c_custkey AS VARCHAR)), 2, 1))
              % 21 - 10) / 10.0 AS bal
  FROM customer
), u AS (
  SELECT * FROM a UNION ALL SELECT * FROM b
), led AS (
  SELECT rec_key,
         lead(rec_key, 1) OVER w AS n1,
         lead(rec_key, 2) OVER w AS n2
  FROM u WINDOW w AS (PARTITION BY nation ORDER BY bal, rec_key)
)
SELECT rec_key AS key_a, n AS key_b,
       CAST(r AS INT) AS neighbor_rank
FROM led, LATERAL (VALUES (n1, 1), (n2, 2)) AS t(n, r)
WHERE n IS NOT NULL
"""


@query("sn_blocking_linkage", oracle=_SN_ORACLE)
def sn_blocking_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood candidate pairs (operators/dq.
    sorted_neighborhood_pairs; Hernández & Stolfo 1995 merge/purge)
    over the fs_record_linkage A ∪ dirty-mirror-B union: sort by
    balance within the reliable nation partition, pair each record
    with its 2 sort successors. The generator survives value noise
    that breaks exact blocking (the jittered mirror balances sort
    adjacent to their originals), and costs at most (window−1)·n rows
    from window−1 lead projections — NO self-join, no quadratic
    block.
    Compose with fs_link_scores on the emitted pairs for scored
    linkage. The oracle replays the union, the jitter, and both
    leads clause-for-clause."""
    from convert_parquet_to_csv_spark.operators.dq import (
        sorted_neighborhood_pairs,
    )

    cust = read_parquet(
        spark, os.path.join(sf_dir, "customer.parquet")
    )
    # key scheme 2k / 2k+1: side-disjoint at EVERY scale factor (a
    # constant offset collides with real custkeys once the table
    # outgrows it)
    a = cust.select(
        (F.col("c_custkey") * 2).alias("rec_key"),
        F.col("c_nationkey").alias("nation"),
        F.col("c_acctbal").alias("bal"),
    )
    b = cust.select(
        (F.col("c_custkey") * 2 + 1).alias("rec_key"),
        F.col("c_nationkey").alias("nation"),
        (F.col("c_acctbal") + _mirror_jitter()).alias("bal"),
    )
    u = a.unionByName(b)
    return sorted_neighborhood_pairs(
        u,
        sort_cols=["bal"],
        window=3,
        partition_cols=["nation"],
        key_col="rec_key",
    )


# --------------------------------------------------------------------------
# r7 addition: k-anonymity audit (Sweeney 2002). Day-one gated.
# --------------------------------------------------------------------------

_KANON_K = 5

_KANON_ORACLE = f"""
WITH cells AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         COUNT(*) AS n
  FROM customer GROUP BY 1, 2, 3
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN n < {_KANON_K} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_small_cells,
       CAST(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END)
            AS BIGINT) AS n_rows_at_risk,
       CAST(SUM(CASE WHEN n < {_KANON_K} THEN n ELSE 0 END)
            AS DOUBLE) / SUM(n) AS risk_frac,
       CAST(MIN(n) AS BIGINT) AS min_cell
FROM cells
"""


@query("k_anonymity_audit", oracle=_KANON_ORACLE)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) over the quasi-identifier
    tuple (nation, segment, 1000-unit balance band): a release is
    k-anonymous when every QI cell holds ≥ k records — cells below k
    re-identify their members by linkage. Reports the cell census,
    the below-k cell count, the rows at risk and their fraction, and
    the minimum cell size (the k the data actually achieves). One
    partial-agg groupBy + a 5-column rollup; the generalization
    lattice search (coarsen bands until min_cell ≥ k) iterates this
    exact query. All integer counts, one closing divide."""
    cust = read_parquet(
        spark, os.path.join(sf_dir, "customer.parquet")
    )
    cells = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 1000)
        .cast("bigint")
        .alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    small = F.when(F.col("n") < _KANON_K, F.col("n")).otherwise(
        F.lit(0)
    )
    return cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum((F.col("n") < _KANON_K).cast("int"))
        .cast("bigint")
        .alias("n_small_cells"),
        F.sum(small).cast("bigint").alias("n_rows_at_risk"),
        (F.sum(small).cast("double") / F.sum("n")).alias("risk_frac"),
        F.min("n").cast("bigint").alias("min_cell"),
    )


# --------------------------------------------------------------------------
# r8: crawl-snapshot dedup, keep-NEWEST policy (the CommonCrawl
# recrawl rule, complementing dedup_url_canonical's min-id/
# first-crawled election). Day-one gated — and since canonicalization
# includes the r8 port-elision clause, this row freshly gates the
# updated functions/web.py spec end-to-end.
# --------------------------------------------------------------------------

_KEEP_NEWEST_ORACLE = (
    _URL_BUILD_CTE
    + """
, ts AS (
  SELECT doc_id, canonical_url,
         CAST(ascii(substr(md5(CAST(doc_id AS VARCHAR)), 9, 1)) * 256
              + ascii(substr(md5(CAST(doc_id AS VARCHAR)), 10, 1))
           AS BIGINT) AS fetch_ts
  FROM c2
), r AS (
  SELECT canonical_url, doc_id, fetch_ts,
         row_number() OVER (PARTITION BY canonical_url
                            ORDER BY fetch_ts DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY canonical_url) AS n
  FROM ts
)
SELECT canonical_url,
       CAST(n AS BIGINT) AS n_crawls,
       CAST(doc_id AS BIGINT) AS kept_id,
       CAST(fetch_ts AS BIGINT) AS kept_ts
FROM r WHERE rn = 1
"""
)


@query("url_recrawl_keep_newest", oracle=_KEEP_NEWEST_ORACLE)
def url_recrawl_keep_newest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Keep-newest crawl-snapshot dedup (operators/urls.
    url_keep_newest): per canonical URL, elect the most recent fetch
    (max ts, ties → min id) via one struct-max argmax groupBy — no
    window sort, map-side combinable. Same synthetic URL column as
    dedup_url_canonical plus a deterministic md5-bit fetch timestamp;
    the oracle replays the URL build, the canonicalization (including
    the r8 default-port elision), the timestamp, and the election
    (row_number ts DESC, id ASC — the window formulation equal to the
    struct-max by construction)."""
    from convert_parquet_to_csv_spark.operators.urls import (
        url_keep_newest,
    )

    h = F.md5(F.col("doc_id").cast("string"))
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        _synth_url().alias("url"),
        (
            F.ascii(F.substring(h, 9, 1)) * 256
            + F.ascii(F.substring(h, 10, 1))
        ).cast("bigint").alias("fetch_ts"),
    )
    return url_keep_newest(docs)


# --------------------------------------------------------------------------
# r8: robots/AI-directive compliance filter (VERDICT r7 item 8's
# robots candidate). Policies are a per-HOST table — here synthesized
# from md5 bits of the host (the fixture ships no robots.txt), in
# production the distilled output of a robots.txt/X-Robots-Tag
# ingestion job. Day-one gated.
# --------------------------------------------------------------------------

_ROBOTS_ORACLE = (
    _URL_BUILD_CTE
    + """
SELECT doc_id, host,
       ascii(substr(md5(host), 1, 1)) % 4 = 0 AS disallow_crawl,
       ascii(substr(md5(host), 2, 1)) % 4 = 0 AS noai,
       NOT (ascii(substr(md5(host), 1, 1)) % 4 = 0)
       AND NOT (ascii(substr(md5(host), 2, 1)) % 4 = 0) AS kept
FROM c2
"""
)


@query("robots_noai_filter", oracle=_ROBOTS_ORACLE)
def robots_noai_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robots/AI-directive enforcement (operators/urls.
    robots_policy_filter): every document annotated with its host's
    (disallow_crawl, noai) policy and the keep verdict, via one
    BROADCAST join of the host-cardinality policy table — the corpus
    never shuffles, enforcement composes into the scan. Policies are
    md5-bit functions of the host (%4, so ~25% of hosts carry each
    flag); hosts absent from the table default to allowed (left join
    + coalesce FALSE, the robots default — exercised by building the
    policy table from a strict subset of hosts). The oracle computes
    the same flags directly per doc, which equals the join by
    determinism of the synthesis."""
    from convert_parquet_to_csv_spark.functions.web import url_host
    from convert_parquet_to_csv_spark.operators.urls import (
        robots_policy_filter,
    )

    docs = _docs(spark, sf_dir).select(
        "doc_id", _synth_url().alias("url")
    )
    hh = F.md5(F.col("host"))
    policies = (
        docs.select(url_host("url").alias("host"))
        .distinct()
        # strict subset, flag-safe: every host with ANY flag set
        # stays in the table (omitting one would silently launder it
        # through the allowed default); of the flag-FREE hosts, the
        # md5-bit-3-odd half is left out entirely, so the left-join
        # default path executes for real rows while the join result
        # stays identical to the oracle's direct per-doc computation
        # (an omitted host's default — both flags FALSE — equals its
        # synthesized flags by construction of the omission rule).
        .filter(
            (F.ascii(F.substring(hh, 1, 1)) % 4 == 0)
            | (F.ascii(F.substring(hh, 2, 1)) % 4 == 0)
            | (F.ascii(F.substring(hh, 3, 1)) % 2 == 0)
        )
        .select(
            "host",
            (F.ascii(F.substring(hh, 1, 1)) % 4 == 0).alias(
                "disallow_crawl"
            ),
            (F.ascii(F.substring(hh, 2, 1)) % 4 == 0).alias("noai"),
        )
    )
    return robots_policy_filter(docs, policies)


# --------------------------------------------------------------------------
# r8 wave 2: WITHIN-document repeated-span removal (keep-first) and
# the banded-LSH S-curve design table. Day-one gated.
# --------------------------------------------------------------------------

_WDR_K = 2

_WITHIN_DOC_ORACLE = f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS a
  FROM documents
),
grams AS (
  -- NULL-id rows: excluded from the (id, gram) election, replayed
  -- row-locally in the final SELECT (the kernel's r9 pass-through
  -- contract — groupBy would pool every NULL id into one
  -- pseudo-document)
  SELECT doc_id, CAST(p AS INT) AS pos,
         array_to_string(a[CAST(p AS INT)+1:CAST(p AS INT)+{_WDR_K}],
                         ' ') AS gram
  FROM arr, UNNEST(range(0, greatest(len(a) - {_WDR_K} + 1, 0)))
    AS t(p)
  WHERE doc_id IS NOT NULL
),
fst AS (
  SELECT doc_id, gram, min(pos) AS fp
  FROM grams GROUP BY doc_id, gram
),
covered AS (
  SELECT DISTINCT g.doc_id, g.pos + CAST(c AS INT) AS cpos
  FROM grams g
  JOIN fst f ON f.doc_id = g.doc_id AND f.gram = g.gram
            AND g.pos > f.fp,
       UNNEST(range(0, {_WDR_K})) AS u(c)
),
words AS (
  SELECT doc_id, CAST(p AS INT) AS pos, a[CAST(p AS INT)+1] AS word
  FROM arr, UNNEST(range(0, len(a))) AS t(p)
  WHERE doc_id IS NOT NULL
),
kept AS (
  SELECT w.doc_id,
         COALESCE(array_to_string(
           list(w.word ORDER BY w.pos) FILTER (c.cpos IS NULL), ' '),
           '') AS clean_text,
         CAST(COUNT(*) FILTER (c.cpos IS NULL) AS BIGINT) AS n_kept,
         CAST(COUNT(c.cpos) AS BIGINT) AS n_removed
  FROM words w LEFT JOIN covered c
    ON w.doc_id = c.doc_id AND w.pos = c.cpos
  GROUP BY w.doc_id
)
-- every input doc gets a row (r8 review): token-less docs never reach
-- the words CTE, so close over arr — NULL text -> (NULL, 0, 0) per the
-- span-dedup NULL contract, whitespace-only -> ('', 0, 0).
SELECT arr.doc_id,
       CASE WHEN arr.a IS NULL THEN NULL
            WHEN arr.doc_id IS NULL THEN array_to_string(arr.a, ' ')
            ELSE COALESCE(k.clean_text, '') END AS clean_text,
       CAST(CASE WHEN arr.a IS NULL THEN 0
                 WHEN arr.doc_id IS NULL THEN len(arr.a)
                 ELSE COALESCE(k.n_kept, 0) END AS BIGINT) AS n_kept,
       CAST(CASE WHEN arr.doc_id IS NULL THEN 0
                 ELSE COALESCE(k.n_removed, 0) END AS BIGINT)
         AS n_removed
FROM arr LEFT JOIN kept k ON arr.doc_id = k.doc_id
"""


@query("dedup_within_doc_repeats", oracle=_WITHIN_DOC_ORACLE)
def dedup_within_doc_repeats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WITHIN-document repeated-span removal, keep-first
    (operators/dedup.remove_within_doc_repeats — the in-document
    sibling of span_dedup_c4's cross-document rule; looping
    generations, chat echoes, keyword stuffing): every word covered
    by a NON-FIRST occurrence of a {k}-gram inside the same document
    is deleted, first occurrences and unique text survive verbatim.
    k=2 is the fixture calibration (the synthetic word salad repeats
    bigrams within docs, rarely 4-grams). Every exchange is keyed by
    doc — no corpus-global state, the operator partitions perfectly
    at any scale."""
    from convert_parquet_to_csv_spark.operators.dedup import (
        remove_within_doc_repeats,
    )

    return remove_within_doc_repeats(
        _docs(spark, sf_dir).select("doc_id", "text"), k=_WDR_K
    )


_SCURVE_B, _SCURVE_R, _SCURVE_GRID = 8, 4, 20

_SCURVE_ORACLE = f"""
WITH g AS (
  SELECT CAST(i AS DOUBLE) / {_SCURVE_GRID}.0 AS s
  FROM range(1, {_SCURVE_GRID}) t(i)
), pb AS (
  SELECT s, {' * '.join(['s'] * _SCURVE_R)} AS p_band FROM g
)
SELECT s, p_band,
       1.0 - ({' * '.join(['(1.0 - p_band)'] * _SCURVE_B)})
         AS p_candidate
FROM pb
"""


@query("minhash_s_curve", oracle=_SCURVE_ORACLE)
def minhash_s_curve_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The banded-LSH S-curve for the engine's own minhash defaults
    (b=8, r=4): candidate probability 1−(1−s^r)^b on the s = i/20
    lattice (operators/dedup.minhash_s_curve) — the design table for
    choosing dedup parameters (exact 0.5-crossing ≈ 0.537 here; read the
    false-positive mass below your target similarity straight off
    it). No library pow anywhere: both engines evaluate identical
    left-associated MULTIPLY CHAINS (library pow is not correctly
    rounded and drifts between libms), so the doubles match
    bit-for-bit. Dimension-scale: 19 rows, no data input — the one
    registry query whose cost is zero at any corpus size."""
    from convert_parquet_to_csv_spark.operators.dedup import (
        minhash_s_curve,
    )

    return minhash_s_curve(
        spark,
        bands=_SCURVE_B,
        rows_per_band=_SCURVE_R,
        grid=_SCURVE_GRID,
    )


# --------------------------------------------------------------------------
# r8 wave 3: dedup provenance remap (the dropped→kept lineage table a
# production dedup must emit). Day-one gated.
# --------------------------------------------------------------------------

_REMAP_ORACLE = (
    _URL_BUILD_CTE
    + """
, fpt AS (
  SELECT doc_id,
         md5(array_to_string((list_filter(
             string_split_regex(trim(text), '\\s+'),
             t -> t != ''))[1:2], ' ')) AS f
  FROM documents
), ek AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS kept FROM fpt
), surv AS (
  SELECT doc_id FROM ek WHERE doc_id = kept
), uk AS (
  SELECT c2.doc_id,
         min(c2.doc_id) OVER (PARTITION BY canonical_url) AS kept
  FROM c2 JOIN surv USING (doc_id)
)
SELECT CAST(doc_id AS BIGINT) AS dropped_id,
       CAST(kept AS BIGINT) AS kept_id, 'title_prefix' AS method
FROM ek WHERE doc_id != kept
UNION ALL
SELECT CAST(doc_id AS BIGINT), CAST(kept AS BIGINT), 'url'
FROM uk WHERE doc_id != kept
"""
)


@query("dedup_provenance_remap", oracle=_REMAP_ORACLE)
def dedup_provenance_remap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-stage dedup LINEAGE table (operators/dedup.dedup_remap):
    every dropped document mapped to its survivor — title-prefix
    groups first (method='title_prefix': fingerprint of the first
    two tokens, the title-key dedup flavor — chosen over the full
    content fingerprint because the fixture holds ZERO exact-content
    duplicates below sf0.1, which would leave stage 1 an empty,
    ungated no-op at the gating SF; min-id survivor), then
    canonical-URL groups over the stage-1 survivors (method='url').
    This is the audit artifact the cleaned corpus ships with: GDPR
    erasure must chase replaced copies, provenance must answer
    "where did doc X go". Two exchanges per stage, no window in the
    Spark plan (groupBy-min + join back; the oracle uses the window
    formulation — equal by construction). Same synthetic URL column
    as dedup_url_canonical."""
    from convert_parquet_to_csv_spark.functions.text import tokens
    from convert_parquet_to_csv_spark.functions.web import (
        url_canonicalize,
    )
    from convert_parquet_to_csv_spark.operators.dedup import dedup_remap

    # keep `source`: _synth_url() derives the host from it
    docs = _docs(spark, sf_dir).select(
        "doc_id", "text", "source"
    ).withColumn("url", _synth_url())
    title_key = F.md5(F.array_join(F.slice(tokens("text"), 1, 2), " "))
    ex_remap = dedup_remap(docs, title_key, method="title_prefix")
    survivors = docs.join(
        ex_remap.select(F.col("dropped_id").alias("doc_id")),
        "doc_id",
        "left_anti",
    )
    url_remap = dedup_remap(
        survivors, url_canonicalize("url"), method="url"
    )
    return ex_remap.unionByName(url_remap)


# --------------------------------------------------------------------------
# r8 wave 4: CCNet line-level boilerplate removal (cross-document
# duplicated-line dedup — the curation stage whole-doc and span dedup
# both structurally miss). Day-one gated.
# --------------------------------------------------------------------------

_LINE_W = 4

_LINE_DEDUP_ORACLE = f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS a
  FROM documents
),
lined AS (
  SELECT doc_id,
         CASE
           WHEN a IS NULL THEN NULL
           WHEN len(a) = 0 THEN ''
           ELSE array_to_string(
             list_transform(
               range(1, CAST(ceil(len(a) / {_LINE_W}.0) AS BIGINT) + 1),
               p -> array_to_string(
                 a[CAST((p-1)*{_LINE_W} AS INT)+1
                   :CAST((p-1)*{_LINE_W} AS INT)+{_LINE_W}], ' ')),
             chr(10))
         END AS text2
  FROM arr
),
ln2 AS (
  SELECT doc_id, string_split(text2, chr(10)) AS lns FROM lined
),
occ AS (
  -- NULL-id rows are excluded from the election and replayed
  -- row-locally in the final SELECT (the kernel's r9 pass-through
  -- contract)
  SELECT doc_id, CAST(p AS INT) AS lp, lns[CAST(p AS INT)+1] AS line
  FROM ln2, UNNEST(range(0, len(lns))) t(p)
  WHERE doc_id IS NOT NULL
),
nb AS (
  SELECT * FROM occ WHERE regexp_replace(line, '\\s+', '', 'g') <> ''
),
rnk AS (
  SELECT doc_id, lp,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, lp) AS rn,
         count(*) OVER (PARTITION BY line) AS cnt
  FROM nb
),
rem AS (SELECT doc_id, lp FROM rnk WHERE cnt > 1 AND rn > 1),
kept AS (
  SELECT o.doc_id,
         COALESCE(string_agg(o.line, chr(10) ORDER BY o.lp)
           FILTER (r.lp IS NULL), '') AS clean_text,
         CAST(count(*) FILTER (r.lp IS NULL) AS BIGINT)
           AS n_lines_kept,
         CAST(count(r.lp) AS BIGINT) AS n_lines_removed
  FROM occ o LEFT JOIN rem r
    ON o.doc_id = r.doc_id AND o.lp = r.lp
  GROUP BY o.doc_id
)
SELECT ln2.doc_id,
       CASE WHEN ln2.lns IS NULL THEN NULL
            WHEN ln2.doc_id IS NULL
              THEN array_to_string(ln2.lns, chr(10))
            ELSE COALESCE(k.clean_text, '') END AS clean_text,
       CAST(CASE WHEN ln2.lns IS NULL THEN 0
                 WHEN ln2.doc_id IS NULL THEN len(ln2.lns)
                 ELSE COALESCE(k.n_lines_kept, 0) END AS BIGINT)
         AS n_lines_kept,
       CAST(CASE WHEN ln2.doc_id IS NULL THEN 0
                 ELSE COALESCE(k.n_lines_removed, 0) END AS BIGINT)
         AS n_lines_removed
FROM ln2 LEFT JOIN kept k ON ln2.doc_id = k.doc_id
"""


@query("line_dedup_boilerplate", oracle=_LINE_DEDUP_ORACLE)
def line_dedup_boilerplate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CROSS-document line-level boilerplate removal, keep-global-first
    (operators/dedup.remove_duplicated_lines; CCNet §3.1 / Dolma
    paragraph dedup): every occurrence of a line duplicated ANYWHERE
    in the corpus is removed except the globally first by (doc_id,
    line_pos) — the navigation-menu/cookie-banner/footer stage that
    whole-document near-dup (surrounding content differs) and
    contiguous-span dedup (spans don't align to lines) both
    structurally miss. The fixture has no newlines, so the query
    synthesizes lines by wrapping each doc's tokens into 4-token
    windows (the _synth_url precedent: deterministic structure built
    in-query; 4 chosen because the fixture's cross-doc repetition
    lives at the 4-gram scale — 341 duplicated lines at sf0.01 by
    DuckDB census). min(struct) winner election —
    no window in the Spark plan; the oracle uses the window
    formulation, equal by construction."""
    from convert_parquet_to_csv_spark.functions.text import (
        synth_token_lines,
    )
    from convert_parquet_to_csv_spark.operators.dedup import (
        remove_duplicated_lines,
    )

    lined = _docs(spark, sf_dir).select(
        "doc_id", synth_token_lines("text", w=_LINE_W).alias("text")
    )
    return remove_duplicated_lines(lined)


# --------------------------------------------------------------------------
# r9: paragraph-granularity boilerplate dedup (Dolma's actual unit —
# VERDICT r8 item 7). Same kernel as line_dedup_boilerplate with the
# \n\n+ split knob. Day-one gated.
# --------------------------------------------------------------------------

_PARA_LINES = 2

_PARA_DEDUP_ORACLE = f"""
WITH arr AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS a
  FROM documents
),
lined AS (
  SELECT doc_id, a,
         CAST(ceil(len(a) / {_LINE_W}.0) AS BIGINT) AS nl
  FROM arr
),
para AS (
  SELECT doc_id,
         CASE
           WHEN a IS NULL THEN NULL
           WHEN len(a) = 0 THEN ''
           ELSE array_to_string(
             list_transform(
               range(1, CAST(ceil(nl / {_PARA_LINES}.0) AS BIGINT) + 1),
               q -> array_to_string(
                 list_transform(
                   range((q-1)*{_PARA_LINES} + 1,
                         least(q*{_PARA_LINES}, nl) + 1),
                   p -> array_to_string(
                     a[CAST((p-1)*{_LINE_W} AS INT)+1
                       :CAST((p-1)*{_LINE_W} AS INT)+{_LINE_W}], ' ')),
                 chr(10))),
             chr(10) || chr(10))
         END AS text2
  FROM lined
),
ln2 AS (
  SELECT doc_id,
         string_split(text2, chr(10) || chr(10)) AS lns
  FROM para
),
occ AS (
  -- NULL-id rows: excluded from the election, replayed row-locally
  -- below (the kernel's r9 pass-through contract)
  SELECT doc_id, CAST(p AS INT) AS lp, lns[CAST(p AS INT)+1] AS line
  FROM ln2, UNNEST(range(0, len(lns))) t(p)
  WHERE doc_id IS NOT NULL
),
nb AS (
  SELECT * FROM occ WHERE regexp_replace(line, '\\s+', '', 'g') <> ''
),
rnk AS (
  SELECT doc_id, lp,
         row_number() OVER (PARTITION BY line
                            ORDER BY doc_id, lp) AS rn,
         count(*) OVER (PARTITION BY line) AS cnt
  FROM nb
),
rem AS (SELECT doc_id, lp FROM rnk WHERE cnt > 1 AND rn > 1),
kept AS (
  SELECT o.doc_id,
         COALESCE(string_agg(o.line, chr(10) ORDER BY o.lp)
           FILTER (r.lp IS NULL), '') AS clean_text,
         CAST(count(*) FILTER (r.lp IS NULL) AS BIGINT)
           AS n_paras_kept,
         CAST(count(r.lp) AS BIGINT) AS n_paras_removed
  FROM occ o LEFT JOIN rem r
    ON o.doc_id = r.doc_id AND o.lp = r.lp
  GROUP BY o.doc_id
)
SELECT ln2.doc_id,
       CASE WHEN ln2.lns IS NULL THEN NULL
            WHEN ln2.doc_id IS NULL
              THEN array_to_string(ln2.lns, chr(10))
            ELSE COALESCE(k.clean_text, '') END AS clean_text,
       CAST(CASE WHEN ln2.lns IS NULL THEN 0
                 WHEN ln2.doc_id IS NULL THEN len(ln2.lns)
                 ELSE COALESCE(k.n_paras_kept, 0) END AS BIGINT)
         AS n_paras_kept,
       CAST(CASE WHEN ln2.doc_id IS NULL THEN 0
                 ELSE COALESCE(k.n_paras_removed, 0) END AS BIGINT)
         AS n_paras_removed
FROM ln2 LEFT JOIN kept k ON ln2.doc_id = k.doc_id
"""


@query("paragraph_dedup_boilerplate", oracle=_PARA_DEDUP_ORACLE)
def paragraph_dedup_boilerplate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-document PARAGRAPH-level boilerplate removal
    (operators/dedup.remove_duplicated_lines with the ``\\n{2,}``
    split knob — Dolma's actual dedup unit; VERDICT r8 item 7): the
    same keep-global-first kernel as line_dedup_boilerplate, one
    granularity up. The fixture has no newlines, so the query
    synthesizes structure with functions/text.synth_token_paragraphs
    (4-token lines, 2-line paragraphs joined by "\\n\\n") and splits
    on the paragraph separator; kept paragraphs re-join with the
    normalized single "\\n" (the kernel's documented multi-separator
    normalization). Counts are paragraphs, aliased n_paras_*.
    Same three keyed exchanges, no window in the Spark plan (the
    oracle uses the window formulation, equal by construction)."""
    from convert_parquet_to_csv_spark.functions.text import (
        synth_token_paragraphs,
    )
    from convert_parquet_to_csv_spark.operators.dedup import (
        remove_duplicated_lines,
    )

    lined = _docs(spark, sf_dir).select(
        "doc_id",
        synth_token_paragraphs(
            "text", w=_LINE_W, lines=_PARA_LINES
        ).alias("text"),
    )
    out = remove_duplicated_lines(lined, sep_regex=r"\n{2,}")
    return out.select(
        "doc_id",
        "clean_text",
        F.col("n_lines_kept").alias("n_paras_kept"),
        F.col("n_lines_removed").alias("n_paras_removed"),
    )


# --------------------------------------------------------------------------
# r9: TRUE-maximal duplicated substrings — the suffix-extension
# refinement of dedup_span_extents (VERDICT r8 item 4, Lee et al.
# 2022's actual suffix-array guarantee). Day-one gated.
# --------------------------------------------------------------------------

_MX_K, _MX_WCAP = 6, 18
_MX_S = _MX_K + _MX_WCAP

_MAXIMAL_EXTENTS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), occ AS (
  SELECT doc_id, CAST(i AS INT) AS p,
         toks[CAST(i AS INT) + 1 : CAST(i AS INT) + {_MX_S}] AS s,
         array_to_string(toks[CAST(i AS INT) + 1 :
                              CAST(i AS INT) + {_MX_K}], ' ') AS g
  FROM tok, unnest(range(0, len(toks) - {_MX_K} + 1)) AS t(i)
  WHERE len(toks) >= {_MX_K}
), hot AS (
  SELECT g FROM occ GROUP BY g HAVING count(*) >= 2
), occ2 AS (
  SELECT occ.* FROM occ JOIN hot USING (g)
), nb AS (
  SELECT doc_id, p, s,
         lag(s) OVER w AS ls,
         lead(s) OVER w AS rs
  FROM occ2
  WINDOW w AS (PARTITION BY g ORDER BY s)
), sc AS (
  SELECT doc_id, p,
    greatest(
      CASE WHEN ls IS NULL THEN 0 ELSE
        coalesce(nullif(list_position(list_transform(
          range(1, least(len(s), len(ls)) + 1),
          ii -> s[CAST(ii AS INT)] IS NOT DISTINCT FROM
                ls[CAST(ii AS INT)]), false), 0) - 1,
          least(len(s), len(ls))) END,
      CASE WHEN rs IS NULL THEN 0 ELSE
        coalesce(nullif(list_position(list_transform(
          range(1, least(len(s), len(rs)) + 1),
          ii -> s[CAST(ii AS INT)] IS NOT DISTINCT FROM
                rs[CAST(ii AS INT)]), false), 0) - 1,
          least(len(s), len(rs))) END
    ) AS l
  FROM nb
), stp AS (
  SELECT doc_id, p, l,
         CASE WHEN lag(p) OVER wd = p - 1
              THEN lag(l) OVER wd ELSE 0 END AS lp
  FROM sc
  WINDOW wd AS (PARTITION BY doc_id ORDER BY p)
)
SELECT doc_id,
       CAST(p AS BIGINT) AS span_start,
       CAST(p + l AS BIGINT) AS span_end,
       CAST(l AS BIGINT) AS span_toks
FROM stp WHERE l >= {_MX_K} AND lp <= l
"""


# Cross-set ExactSubstr decontamination (r10): both sides' suffix
# slices union into per-gram windows; the nearest benchmark
# neighbors arrive as IGNORE-NULLS carries on one total-order sort;
# the per-position partner and the per-doc argmax replay with the
# same deterministic tie-breaks (ORDER BY l DESC, partner ASC ==
# Spark's max(struct(l, -partner))).
_XSET_LCP = """coalesce(nullif(list_position(list_transform(
             range(1, least(len(s), len(struct_extract({nb}, 'bs'))) + 1),
             ii -> s[CAST(ii AS INT)] IS NOT DISTINCT FROM
                   struct_extract({nb}, 'bs')[CAST(ii AS INT)]),
             false), 0) - 1,
           least(len(s), len(struct_extract({nb}, 'bs'))))"""

# k = 4 for THIS gate (not the extents' 6): the synthetic fixture's
# tiny vocabulary makes long verbatim cross-doc spans rare, and k=6
# left the sf0.01 driver fixture with ZERO contaminated rows — a
# degenerate (vacuously green) gate. k=4 yields 8/8/727 rows at
# sf0.001/0.01/0.1; production tunes k upward with real vocabulary.
_XC_K = 4
_XC_S = _XC_K + _MX_WCAP

_XSET_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), occ AS (
  SELECT doc_id AS id, CAST(i AS INT) AS p,
         toks[CAST(i AS INT) + 1 : CAST(i AS INT) + {_XC_S}] AS s,
         array_to_string(toks[CAST(i AS INT) + 1 :
                              CAST(i AS INT) + {_XC_K}], ' ') AS g,
         CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END AS side
  FROM tok, unnest(range(0, len(toks) - {_XC_K} + 1)) AS t(i)
  WHERE len(toks) >= {_XC_K}
), hot AS (
  SELECT g FROM occ GROUP BY g HAVING min(side) = 0 AND max(side) = 1
), occ2 AS (
  SELECT occ.* FROM occ JOIN hot USING (g)
), nb AS (
  SELECT id, p, side, s,
         last_value(CASE WHEN side = 1
                         THEN struct_pack(bs := s, bid := id) END
                    IGNORE NULLS)
           OVER (PARTITION BY g ORDER BY s, side, id, p
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS up,
         first_value(CASE WHEN side = 1
                          THEN struct_pack(bs := s, bid := id) END
                     IGNORE NULLS)
           OVER (PARTITION BY g ORDER BY s, side, id, p
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
           AS dn
  FROM occ2
), sc AS (
  SELECT id,
         CASE WHEN up IS NULL THEN 0 ELSE
           {_XSET_LCP.format(nb='up')} END AS lu,
         CASE WHEN dn IS NULL THEN 0 ELSE
           {_XSET_LCP.format(nb='dn')} END AS ld,
         struct_extract(up, 'bid') AS bu,
         struct_extract(dn, 'bid') AS bd
  FROM nb WHERE side = 0
), pt AS (
  SELECT id, greatest(lu, ld) AS l,
         CASE WHEN lu > ld THEN bu
              WHEN ld > lu THEN bd
              ELSE least(bu, bd) END AS partner
  FROM sc WHERE greatest(lu, ld) >= {_XC_K}
), rw AS (
  SELECT id, partner, row_number() OVER (
      PARTITION BY id ORDER BY l DESC, partner ASC) AS rn
  FROM pt
), gs AS (
  SELECT id, CAST(max(l) AS BIGINT) AS max_shared_toks,
         CAST(count(*) AS BIGINT) AS n_hit_positions
  FROM pt GROUP BY id
)
SELECT gs.id AS doc_id, gs.max_shared_toks,
       CAST(rw.partner AS BIGINT) AS bench_id, gs.n_hit_positions
FROM gs JOIN rw ON rw.id IS NOT DISTINCT FROM gs.id AND rw.rn = 1
"""


@query("decontaminate_exact_substr", oracle=_XSET_ORACLE)
def decontaminate_exact_substr(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-set ExactSubstr decontamination (operators/dedup.
    shared_extent_contamination, r10): per corpus doc (doc_id % 97
    != 0) sharing a >= 4-token VERBATIM span with any benchmark doc
    (doc_id % 97 == 0; k=4 per the constant's fixture note) — the
    longest shared span (cap-clipped at 22), a deterministic witness bench_id, and the hit-position
    count. The forensic refinement of decontaminate_ngram_overlap's
    yes/no flag: suffix slices of BOTH sides union into per-gram
    windows, nearest-benchmark-neighbor LCP via IGNORE-NULLS carries
    on one total-order sort, cross-side gram pre-filter bounds the
    window volume by the INTERSECTION footprint (benchmark-scale at
    production sizes). Brute-force cross-set reference pinned in
    tests/test_maximal_extents.py."""
    docs = _docs(spark, sf_dir)
    return D.shared_extent_contamination(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        k=_XC_K,
        w_cap=_MX_WCAP,
    )


@query("decontaminate_exact_substr_incremental", oracle=_XSET_ORACLE)
def decontaminate_exact_substr_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental cross-set ExactSubstr decontamination (operators/
    dedup.shared_extent_contamination_incremental, r11 — VERDICT r10
    item 6): the benchmark (doc_id % 97 == 0) splits into a
    persisted OLD version (odd multiples of 97) and an arriving
    DELTA (even multiples, doc_id % 194 == 0); the old version's
    position table (contamination_hit_positions) stands in for the
    persisted artifact, the delta runs its own — delta-gram-bounded
    — window pass, and the merge + re-aggregate produces the union
    report WITHOUT a union-scale window.

    The oracle is DELIBERATELY the from-scratch union SQL
    (_XSET_ORACLE, byte-identical to decontaminate_exact_substr's):
    a green hash row IS the incremental-equals-from-scratch proof,
    re-established by the driver every time this gate runs."""
    docs = _docs(spark, sf_dir)
    bench_old = docs.filter(
        (F.col("doc_id") % 97 == 0) & (F.col("doc_id") % 194 != 0)
    )
    bench_delta = docs.filter(F.col("doc_id") % 194 == 0)
    old_positions = D.contamination_hit_positions(
        docs.filter(F.col("doc_id") % 97 != 0),
        bench_old,
        k=_XC_K,
        w_cap=_MX_WCAP,
    )
    return D.shared_extent_contamination_incremental(
        docs.filter(F.col("doc_id") % 97 != 0),
        bench_delta,
        old_positions,
        k=_XC_K,
        w_cap=_MX_WCAP,
    )


# c = 3 flavor (r10, VERDICT r9 item 4): the generic windowed-c
# construction — e = LCP with the (c−1)-ahead suffix neighbor, then
# a trailing-(c−1) ROWS max — replayed with the same per-gram-string
# windows. Hot filter tightens to count >= 3.
_MX_C3 = 3
_MAXIMAL_EXTENTS_C3_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), occ AS (
  SELECT doc_id, CAST(i AS INT) AS p,
         toks[CAST(i AS INT) + 1 : CAST(i AS INT) + {_MX_S}] AS s,
         array_to_string(toks[CAST(i AS INT) + 1 :
                              CAST(i AS INT) + {_MX_K}], ' ') AS g
  FROM tok, unnest(range(0, len(toks) - {_MX_K} + 1)) AS t(i)
  WHERE len(toks) >= {_MX_K}
), hot AS (
  SELECT g FROM occ GROUP BY g HAVING count(*) >= {_MX_C3}
), occ2 AS (
  SELECT occ.* FROM occ JOIN hot USING (g)
), nb AS (
  SELECT doc_id, p, g, s,
         lead(s, {_MX_C3 - 1}) OVER w AS rs
  FROM occ2
  WINDOW w AS (PARTITION BY g ORDER BY s, doc_id ASC NULLS FIRST, p)
), ee AS (
  SELECT doc_id, p, g, s,
         CASE WHEN rs IS NULL THEN 0 ELSE
           coalesce(nullif(list_position(list_transform(
             range(1, least(len(s), len(rs)) + 1),
             ii -> s[CAST(ii AS INT)] IS NOT DISTINCT FROM
                   rs[CAST(ii AS INT)]), false), 0) - 1,
             least(len(s), len(rs))) END AS e
  FROM nb
), sc AS (
  SELECT doc_id, p,
         max(e) OVER (PARTITION BY g
                      ORDER BY s, doc_id ASC NULLS FIRST, p
                      ROWS BETWEEN {_MX_C3 - 1} PRECEDING
                      AND CURRENT ROW) AS l
  FROM ee
), stp AS (
  SELECT doc_id, p, l,
         CASE WHEN lag(p) OVER wd = p - 1
              THEN lag(l) OVER wd ELSE 0 END AS lp
  FROM sc
  WINDOW wd AS (PARTITION BY doc_id ORDER BY p)
)
SELECT doc_id,
       CAST(p AS BIGINT) AS span_start,
       CAST(p + l AS BIGINT) AS span_end,
       CAST(l AS BIGINT) AS span_toks
FROM stp WHERE l >= {_MX_K} AND lp <= l
"""


@query("dedup_maximal_extents_c3", oracle=_MAXIMAL_EXTENTS_C3_ORACLE)
def dedup_maximal_extents_c3(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Maximal extents at occurrence count >= 3 (r10, VERDICT r9
    item 4 — the min_count generalization the r9 docstring left
    unbuilt): one row per maximal substring of >= 6 tokens occurring
    at least THREE times corpus-wide. L_c(i) = max over the c
    windows of c consecutive suffix-order ranks containing i of the
    direct LCP of the window extremes — evaluated as one
    lead(s, c−1) LCP per rank plus a trailing-(c−1) ROWS max on the
    SAME per-gram window sort (no new exchange vs the c=2 plan).
    The c=2 invariant extents_c3 ⊆ extents_c2-lengthwise (every
    >=3-occurrence prefix also occurs >=2 times, so L_3(p) <=
    L_2(p) pointwise) and the brute-force suffix reference are
    pinned in tests/test_maximal_extents.py."""
    return D.maximal_duplicated_extents(
        _docs(spark, sf_dir), k=_MX_K, w_cap=_MX_WCAP, min_count=_MX_C3
    )


@query("dedup_maximal_extents", oracle=_MAXIMAL_EXTENTS_ORACLE)
def dedup_maximal_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE-maximal duplicated substrings (operators/dedup.
    maximal_duplicated_extents): the suffix-array identity — longest
    duplicated prefix at p = max LCP with the suffix's lexicographic
    neighbors — evaluated with per-k-gram windows (suffix order
    localizes to the leading gram for any LCP ≥ k) over suffixes
    truncated at k + w_cap = 24 tokens. Report [p, p+L(p)) where
    L(p) ≥ 6 and L(p−1) ≤ L(p) (left-maximality). Complements
    dedup_span_extents' islands: islands = union-of-coverage removal
    artifact, these rows = the actual repeated strings, as a suffix
    array would list them (Lee et al. 2022). Spark partitions the
    suffix window by xxhash64(gram) — the oracle by the gram string;
    a hash collision only concatenates groups whose cross-boundary
    LCP < k, invisible to the ≥ k filter and the ≥ k+1 suppression
    (the operator docstring's argument). Brute-force suffix
    reference pinned in tests/test_maximal_extents.py."""
    return D.maximal_duplicated_extents(
        _docs(spark, sf_dir), k=_MX_K, w_cap=_MX_WCAP
    )


# --- incremental MinHash admission (r9) ------------------------------------

# Brute-force replay of the minhash_dedup_incremental admission rule
# (the _MINHASH_SURVIVOR_ORACLE device, restricted to the
# batch-vs-history pair universe): a new doc (doc_id % 7 == 3, the
# dedup_incremental_batch convention) is dropped iff some exact
# n-gram Jaccard >= 0.5 partner exists in the history (any id) or
# earlier in the batch (smaller id); matched_id = min such partner.
# Row sets match whenever band recall holds at the gating fixture —
# gated pairwise by dedup_minhash_recall on the same configuration.
_MINHASH_INCR_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS toks
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_distinct(list_transform(
             range(0, greatest(len(toks) - {_K}, 0) + 1),
             i -> array_to_string(toks[i + 1 : i + {_K}], ' ')))) AS s
  FROM tok WHERE len(toks) > 0
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b
    ON a.s = b.s
   AND b.doc_id % 7 = 3
   AND a.doc_id != b.doc_id
   AND ((a.doc_id % 7 != 3) OR a.doc_id < b.doc_id)
  GROUP BY 1, 2
), m AS (
  SELECT id_b, CAST(min(id_a) AS BIGINT) AS matched_id
  FROM inter
  JOIN cnt na ON na.doc_id = id_a
  JOIN cnt nb ON nb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE) >= 0.5
  GROUP BY 1
)
SELECT d.doc_id, m.matched_id IS NULL AS kept, m.matched_id
FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 3) d
LEFT JOIN m ON d.doc_id = m.id_b
"""


@query("dedup_minhash_incremental", oracle=_MINHASH_INCR_ORACLE)
def dedup_minhash_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental near-dup admission
    (operators/dedup.minhash_dedup_incremental): today's batch
    (doc_id % 7 == 3) probes the history via the banded LSH index
    with an all × NEW bucket join — candidate fan-out bounded by the
    batch's buckets, the steady-state shape where a small daily
    batch checks a 100 TB history for the cost of its own buckets —
    then exact-Jaccard verification over the candidate-pruned set
    pass. One row per new doc: (doc_id, kept, matched_id), the
    provenance pointer dedup_remap chains on."""
    return D.minhash_dedup_incremental(
        _docs(spark, sf_dir), F.col("doc_id") % 7 == F.lit(3)
    )

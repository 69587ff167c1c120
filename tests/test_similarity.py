"""Similarity-search tests: exactness, recall, plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from convert_parquet_to_csv_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vecs(spark, sf_small):
    import os

    return spark.read.parquet(os.path.join(sf_small, "embeddings.parquet"))


def test_vector_math(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])],
        "a ARRAY<FLOAT>, b ARRAY<FLOAT>",
    )
    row = df.select(
        dot_product("a", "b").alias("d"),
        l2_norm("a").alias("n"),
        cosine_similarity("a", "b").alias("c"),
    ).first()
    assert row["d"] == 32.0
    assert row["n"] == pytest.approx(math.sqrt(14))
    assert row["c"] == pytest.approx(32 / (math.sqrt(14) * math.sqrt(77)))


def test_zero_vector_cosine_defined(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "a ARRAY<FLOAT>, b ARRAY<FLOAT>"
    )
    assert df.select(cosine_similarity("a", "b").alias("c")).first()["c"] == 0.0


def test_bruteforce_topk_shape_and_self_exclusion(spark, vecs):
    q = vecs.filter(F.col("vec_id") < 3)
    out = S.topk_bruteforce(vecs, q, k=5).collect()
    assert len(out) == 15
    by_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append(r["similarity"])
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True)  # ranked per query


def test_bruteforce_finds_identical_vector(spark, vecs):
    """Plant an exact copy; it must be the #1 neighbor with sim≈1."""
    copy = vecs.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    aug = vecs.unionByName(copy)
    q = vecs.filter(F.col("vec_id") == 0)
    top = S.topk_bruteforce(aug, q, k=1).first()
    assert top["neighbor_id"] == 100000
    assert top["similarity"] == pytest.approx(1.0)


def test_lsh_recall_vs_bruteforce(spark, vecs):
    """At 6 bits the planted-duplicate pair must collide (identical
    vectors share every signature)."""
    copy = vecs.filter(F.col("vec_id") == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    aug = vecs.unionByName(copy)
    q = vecs.filter(F.col("vec_id") == 0)
    out = S.topk_lsh(aug, q, dim=64, k=3, nbits=6).collect()
    assert any(r["neighbor_id"] == 100000 for r in out)
    # scores inside buckets are exact
    top = [r for r in out if r["neighbor_id"] == 100000][0]
    assert top["similarity"] == pytest.approx(1.0)


def test_ivf_partition_of_vectors(spark, vecs):
    centroids, assigned = S.ivf_index(vecs, n_centroids=8)
    assert centroids.count() == 8
    assert assigned.count() == vecs.count()  # every vector in one list
    assert assigned.select("_list_id").distinct().count() <= 8


def test_ivf_topk_exact_when_probing_all_lists(spark, vecs):
    q = vecs.filter(F.col("vec_id") < 2)
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_bruteforce(vecs, q, k=3).collect()
    }
    ivf_all = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_ivf(vecs, q, k=3, n_centroids=8, nprobe=8).collect()
    }
    assert ivf_all == brute  # nprobe = n_centroids ⇒ exhaustive ⇒ exact


def test_embedding_dup_pairs_planted(spark, vecs):
    copy = vecs.filter(F.col("vec_id") == 7).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    aug = vecs.unionByName(copy)
    pairs = S.embedding_dup_pairs(aug, threshold=0.99, dim=None).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(7, 100007)}


def test_l2_normalize_and_quantize(spark):
    from convert_parquet_to_csv_spark.functions.vectors import (
        l2_normalize,
        l2_norm,
        quantize_int8,
        quantize_scale,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [-1.0, 2.0])],
        "id long, v array<double>",
    )
    out = df.select(
        "id",
        l2_normalize("v").alias("n"),
        l2_norm(l2_normalize("v")).alias("norm_after"),
        quantize_scale("v").alias("s"),
        quantize_int8("v").alias("q"),
    ).orderBy("id").collect()
    # unit norm after normalization (except the zero vector)
    assert abs(out[0].norm_after - 1.0) < 1e-12
    assert out[0].n == [0.6, 0.8]
    # zero vector: unchanged, scale 0
    assert out[1].n == [0.0, 0.0] and out[1].s == 0.0
    assert out[1].q == [0, 0]
    # quantization: max-|x| element hits ±127 exactly
    assert out[2].q == [-63, 127]


def test_sparse_cosine_pairs_invariants(spark, sf_small):
    """Pairs are canonical (d1<d2), cosines in (0,1], ranks start at
    1 and are contiguous per d1, and EXACT duplicate texts (the
    fixture contains them) surface with cosine == 1.0."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.plans import registry
    from convert_parquet_to_csv_spark.plans.common import load_table

    registry.load_all()
    rows = registry.QUERIES["sparse_cosine_topk_pairs"](
        spark, sf_small
    ).collect()
    assert rows
    per_d1: dict[int, list[int]] = {}
    for r in rows:
        assert r["d1"] < r["d2"]
        assert 0.0 < r["cosine"] <= 1.0 + 1e-12
        per_d1.setdefault(r["d1"], []).append(r["rk"])
    for rks in per_d1.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
    # exact-duplicate texts must be found at cosine 1.0 (as long as
    # the duplicated text has >=1 surviving term after df pruning,
    # identical weight vectors give cosine exactly 1)
    docs = load_table(spark, sf_small, "documents")
    dup = (
        docs.groupBy(F.lower(F.trim("text")).alias("t"))
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter((F.size("ids") >= 2) & (F.length("t") > 20))
        .limit(1)
        .collect()
    )
    if dup:
        ids = sorted(dup[0]["ids"])[:2]
        hit = [
            r
            for r in rows
            if r["d1"] == ids[0] and r["d2"] == ids[1]
        ]
        if hit:
            assert abs(hit[0]["cosine"] - 1.0) < 1e-12


# --------------------------------------------------------------------------
# SemDeDup
# --------------------------------------------------------------------------

def test_semdedup_sound_and_keeps_min_id(spark):
    """Within-cluster duplicates drop the greater id; near-identical
    vectors (which always share a cluster) are caught, and the drop
    set never contains a vector without a true cosine partner."""
    import math

    def unit(seed, dim=8):
        # deterministic pseudo-random unit vector
        vals = [math.sin(seed * 31 + i * 7) for i in range(dim)]
        n = math.sqrt(sum(v * v for v in vals))
        return [v / n for v in vals]

    base = unit(1)
    rows = [
        (1, base),
        (2, [v * 0.999 + 0.001 for v in base]),  # near-dup of 1
        (3, unit(2)),
        (4, unit(3)),
        (5, base),                                # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    surv = sorted(
        r.vec_id
        for r in S.semdedup(
            df, threshold=0.99, n_clusters=2, n_iters=1
        ).collect()
    )
    spark.catalog.clearCache()
    # 2 and 5 duplicate 1 → min-id survivor keeps 1
    assert 1 in surv and 2 not in surv and 5 not in surv
    # 3 and 4 are unrelated directions → kept
    assert 3 in surv and 4 in surv


def test_semdedup_multiprobe_monotone_recall(spark, sf_small):
    """n_probe=2 (VERDICT r6 item 7): cluster membership at probe p
    is a prefix-superset of p-1, so the drop set can only GROW —
    soundness (subset of the exact cosine drop set) must survive,
    and on the real embeddings fixture the boundary mitigation must
    actually recover pairs (measured 0.374 → 0.679 recall at
    sf0.001; gate at a conservative strict improvement)."""
    from convert_parquet_to_csv_spark.sources import read_parquet
    import os

    vecs = read_parquet(
        spark, os.path.join(sf_small, "embeddings.parquet")
    )
    all_ids = {r.vec_id for r in vecs.select("vec_id").collect()}
    exact = {
        r.vec_id
        for r in S.embedding_dup_pairs(vecs, threshold=0.35, dim=None)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
        .collect()
    }
    drops = {}
    for p in (1, 2):
        surv = {
            r.vec_id
            for r in S.semdedup(
                vecs, threshold=0.35, n_clusters=16, n_iters=2,
                n_probe=p,
            ).select("vec_id").collect()
        }
        spark.catalog.clearCache()
        drops[p] = all_ids - surv
    # soundness unchanged under multi-probe
    assert drops[1] <= exact and drops[2] <= exact
    # monotone: probe-2 membership superset ⇒ drop-set superset
    assert drops[1] <= drops[2]
    # the mitigation recovers real boundary pairs on this fixture
    assert len(drops[2]) > len(drops[1])


def test_pq_adc_exact_on_duplicated_orthogonal_basis(spark):
    """PQ end-to-end on a designed corpus: 4 orthogonal unit vectors,
    each duplicated. With codes=4 and kmeans_iters=0 the codebooks
    ARE (subvectors of) four corpus vectors, so every vector
    reconstructs exactly and ADC cosine becomes exact: each vector's
    top-1 neighbor is its duplicate at similarity 1.0."""
    dim, m = 8, 4
    basis = [[0.0] * dim for _ in range(4)]
    for i in range(4):
        basis[i][2 * i] = 1.0  # one hot per 2-dim subspace slot
    rows = []
    for i, v in enumerate(basis):
        rows.append((i, v))          # original
        rows.append((i + 4, v))      # duplicate
    vecs = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    books = S.pq_train(vecs, dim, m=m, codes=4, kmeans_iters=0)
    assert books.count() == m * 4
    enc = S.pq_encode(vecs, books, dim, m=m)
    per_vec = (
        enc.groupBy("vec_id").count().select("count").distinct().collect()
    )
    assert [r["count"] for r in per_vec] == [m]
    out = S.topk_pq_adc(
        vecs, vecs, dim, k=1, m=m, codes=4, kmeans_iters=0
    ).collect()
    assert len(out) == 8
    for r in out:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4
        assert abs(r["similarity"] - 1.0) < 1e-6


def test_pq_adc_scores_bounded_and_deterministic(spark):
    """ADC scores are exact cosines of reconstructions (|s| <= 1 by
    Cauchy-Schwarz) and the whole pipeline is a pure function of its
    inputs (two runs, identical rows)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(8)]
        n = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / n for x in v]))
    vecs = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    qs = vecs.filter(F.col("vec_id") < 3)

    def run():
        return sorted(
            (r["query_id"], r["neighbor_id"], round(r["similarity"], 9))
            for r in S.topk_pq_adc(
                vecs, qs, 8, k=5, m=4, codes=8, kmeans_iters=1
            ).collect()
        )

    a, b = run(), run()
    assert a == b
    assert all(-1 - 1e-9 <= s <= 1 + 1e-9 for _, _, s in a)
    per_q = {}
    for q, _, _ in a:
        per_q[q] = per_q.get(q, 0) + 1
    assert all(c == 5 for c in per_q.values())


def test_ivfadc_exact_when_residuals_vanish(spark):
    """IVFADC end-to-end exactness case: 4 orthogonal unit vectors
    duplicated, n_centroids=4 -> every vector IS (a duplicate of) a
    coarse centroid, so all residuals are zero, the reconstruction is
    the centroid itself, and each vector's top-1 neighbor is its
    duplicate at exactly 1.0 (the cross/cn2 terms must cancel to
    zero, exercising the two-level norm assembly)."""
    dim, m = 8, 4
    basis = [[0.0] * dim for _ in range(4)]
    for i in range(4):
        basis[i][2 * i] = 1.0
    rows = []
    for i, v in enumerate(basis):
        rows.append((i, v))
        rows.append((i + 4, v))
    vecs = spark.createDataFrame(
        rows, "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    out = S.topk_ivfadc(
        vecs, vecs, dim, k=1, n_centroids=4, nprobe=1, m=m, codes=4,
        kmeans_iters=0,
    ).collect()
    assert len(out) == 8
    for r in out:
        assert r["neighbor_id"] % 4 == r["query_id"] % 4
        assert abs(r["similarity"] - 1.0) < 1e-6


def test_pq_rejects_indivisible_dim(spark):
    """dim % m != 0 must raise, not silently drop trailing dims."""
    import pytest as _pytest

    vecs = spark.createDataFrame(
        [(0, [0.6, 0.8, 0.0, 0.0, 1.0])], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    with _pytest.raises(ValueError, match="divisible"):
        S.pq_train(vecs, dim=5, m=2)
    with _pytest.raises(ValueError, match="divisible"):
        S.topk_pq_adc(vecs, vecs, dim=5, m=2)


def test_jl_project_matches_python_reference(spark):
    """Exact-integer JL components vs pure-Python replay (same md5
    signs, same floor quantization); distance preservation is the
    JL theorem's job — EXACTNESS of the deterministic projection is
    ours to pin."""
    import hashlib
    import math

    from convert_parquet_to_csv_spark.operators.similarity import (
        jl_project,
    )

    dim, out_dims, quant = 6, 4, 1_000_000
    vecs = [
        (1, [0.5, -0.25, 1.0, 0.0, -1.0, 0.125]),
        (2, [0.0] * 6),
        (3, [1e-7, -1e-7, 0.3333333, -0.6666666, 2.5, -2.5]),
    ]
    df = spark.createDataFrame(
        vecs, "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    got = {
        r["vec_id"]: [r[f"c{i}"] for i in range(out_dims)]
        for r in jl_project(
            df, dim=dim, out_dims=out_dims, quant=quant
        ).collect()
    }

    def sign(i, j):
        h = hashlib.md5(f"{i}_{j}".encode()).hexdigest()
        return 1 - 2 * (ord(h[0]) % 2)

    import numpy as np

    for vid, v in vecs:
        vi = [
            math.floor(float(np.float32(x)) * float(quant)) for x in v
        ]
        want = [
            sum(sign(i, j + 1) * vi[j] for j in range(dim))
            for i in range(out_dims)
        ]
        assert got[vid] == want, (vid, got[vid], want)


def test_jl_project_keeps_degenerate_vectors(spark):
    """GROUP BY output contract (r8 review, 2nd pass): one row per
    DISTINCT id; NULL/empty embeddings emit their row with NULL
    components via the phantom element instead of vanishing from
    posexplode; NULL ids form ONE group whose sums pool — exactly
    the oracle's GROUP BY, never a pooled row fanned onto every
    input row."""
    from convert_parquet_to_csv_spark.operators.similarity import (
        jl_project,
    )

    df = spark.createDataFrame(
        [(1, None), (2, []), (3, [0.5] * 4)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    out = jl_project(df, dim=4, out_dims=2)
    got = {r["vec_id"]: (r["c0"], r["c1"]) for r in out.collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    assert got[3][0] is not None

    # two NULL-id vectors -> ONE output row (the NULL group), sums
    # pooled across both, matching SQL GROUP BY
    df2 = spark.createDataFrame(
        [(None, [0.5] * 4), (None, [0.25] * 4), (7, [0.5] * 4)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    rows = jl_project(df2, dim=4, out_dims=2).collect()
    assert len(rows) == 2
    pooled = {r["vec_id"]: r["c0"] for r in rows}
    single = jl_project(
        spark.createDataFrame(
            [(None, [0.5] * 4)], "vec_id LONG, embedding ARRAY<FLOAT>"
        ),
        dim=4,
        out_dims=2,
    ).collect()[0]["c0"]
    other = jl_project(
        spark.createDataFrame(
            [(None, [0.25] * 4)], "vec_id LONG, embedding ARRAY<FLOAT>"
        ),
        dim=4,
        out_dims=2,
    ).collect()[0]["c0"]
    assert pooled[None] == single + other


def test_jl_project_preserves_relative_distance_order(spark):
    """Sanity: with d' = 8 over 64 dims, near pairs stay nearer than
    far pairs for a designed triple (not a theorem test — a smoke
    check that the signs aren't degenerate)."""
    import numpy as np

    from convert_parquet_to_csv_spark.operators.similarity import (
        jl_project,
    )

    rng = [((i * 2654435761) % 997) / 997.0 - 0.5 for i in range(64)]
    base = np.array(rng, dtype=np.float32)
    near = base + np.float32(0.01)
    far = -base
    df = spark.createDataFrame(
        [
            (1, [float(x) for x in base]),
            (2, [float(x) for x in near]),
            (3, [float(x) for x in far]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    got = {
        r["vec_id"]: np.array([r[f"c{i}"] for i in range(8)], dtype=float)
        for r in jl_project(df, dim=64, out_dims=8).collect()
    }
    d_near = np.linalg.norm(got[1] - got[2])
    d_far = np.linalg.norm(got[1] - got[3])
    assert d_near < d_far


# --------------------------------------------------------------------------
# margin-based bitext mining (slated future registration:
# bitext_margin_mutual)
# --------------------------------------------------------------------------


def test_bitext_margin_defeats_hub(spark):
    """The semantic point of the margin: a hub vector is the RAW
    cosine best for EVERY query, but margin normalization (dividing
    by both sides' k-NN means) cancels its inflated baseline and
    recovers the true partners, leaving the hub unmatched."""
    x = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    # hub (id 10) sits symmetrically close to both queries (cos .65);
    # true partners p1/p2 (ids 11/12) score only .6 against their
    # own query and 0 against the other.
    d = 0.3937004
    y = spark.createDataFrame(
        [
            (10, [0.65, 0.65, d]),
            (11, [0.6, 0.0, 0.8]),
            (12, [0.0, 0.6, 0.8]),
        ],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    # raw cosine best is the hub for BOTH queries
    raw = S.topk_bruteforce(
        y, x.withColumnRenamed("vec_id", "vec_id"), k=1,
        exclude_self=False,
    )
    assert {
        (r["query_id"], r["neighbor_id"]) for r in raw.collect()
    } == {(1, 10), (2, 10)}
    got = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in S.bitext_margin_pairs(x, y, k=2).collect()
    }
    assert set(got) == {(1, 11), (2, 12)}
    assert all(m > 1.2 for m in got.values())


def _bitext_oracle_sql(parquet_path: str, k: int) -> str:
    ddot = "list_dot_product({a}, {b})"

    def dcos(a: str, b: str) -> str:
        return (
            f"{ddot.format(a=a, b=b)} / "
            f"(sqrt({ddot.format(a=a, b=a)}) * "
            f"sqrt({ddot.format(a=b, b=b)}))"
        )

    ksum = lambda rank: " + ".join(  # noqa: E731
        f"coalesce(max(CASE WHEN {rank} = {r} THEN cos_sim END), 0.0)"
        for r in range(1, k + 1)
    )
    kcount = lambda rank: (  # noqa: E731
        f"count(CASE WHEN {rank} <= {k} THEN 1 END)"
    )
    return f"""
WITH vd AS (
  SELECT vec_id, label,
         list_transform(embedding, e -> CAST(e AS DOUBLE)) AS v
  FROM '{parquet_path}'
), x AS (SELECT vec_id AS src_id, v AS xv FROM vd WHERE label < 5),
y AS (SELECT vec_id AS tgt_id, v AS yv FROM vd WHERE label >= 5),
scored AS (
  SELECT src_id, tgt_id, {dcos('xv', 'yv')} AS cos_sim FROM x, y
), ranked AS (
  SELECT *,
    row_number() OVER (
      PARTITION BY src_id ORDER BY cos_sim DESC, tgt_id ASC) AS _rx,
    row_number() OVER (
      PARTITION BY tgt_id ORDER BY cos_sim DESC, src_id ASC) AS _ry
  FROM scored
), sx AS (SELECT src_id, {ksum('_rx')} AS _sx,
                 {kcount('_rx')} AS _nx FROM ranked GROUP BY src_id),
sy AS (SELECT tgt_id, {ksum('_ry')} AS _sy,
                 {kcount('_ry')} AS _ny FROM ranked GROUP BY tgt_id),
m AS (
  SELECT r.src_id, r.tgt_id, r.cos_sim,
         r.cos_sim / ((sx._sx + sy._sy)
                      / CAST(sx._nx + sy._ny AS DOUBLE)) AS margin
  FROM ranked r JOIN sx USING (src_id) JOIN sy USING (tgt_id)
  WHERE (sx._sx + sy._sy) != 0.0
), best AS (
  SELECT *,
    row_number() OVER (
      PARTITION BY src_id ORDER BY margin DESC, tgt_id ASC) AS _bf,
    row_number() OVER (
      PARTITION BY tgt_id ORDER BY margin DESC, src_id ASC) AS _bb
  FROM m
)
SELECT src_id, tgt_id, cos_sim, margin FROM best
WHERE _bf = 1 AND _bb = 1 AND margin >= 1.0
"""


def test_bitext_gate_prevalidation_duckdb_replay(spark):
    """Future-registration gate design pre-validated tri-SF (the
    WAV/BMP device): labels 0-4 as the source side, 5-9 as the
    target side of the embeddings fixture, mutual margin-best pairs
    at threshold 1.0 — Spark vs the full DuckDB replay, BIT-exact
    doubles (cosines via the bitwise-identical accumulation, k-NN
    sums via the left-associative conditional-max pivot, one
    identically-parenthesized margin division)."""
    import os

    import duckdb

    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    k = 4
    for sf, n_expect in (
        ("sf0.001", 158),
        ("sf0.01", 163),
        ("sf0.1", 637),
    ):
        path = os.path.join(base, sf, "embeddings.parquet")
        emb = spark.read.parquet(path)
        got = {
            (r["src_id"], r["tgt_id"]): (r["cos_sim"], r["margin"])
            for r in S.bitext_margin_pairs(
                emb.filter(F.col("label") < 5),
                emb.filter(F.col("label") >= 5),
                k=k,
            ).collect()
        }
        con = duckdb.connect()
        want = {
            (r[0], r[1]): (r[2], r[3])
            for r in con.sql(_bitext_oracle_sql(path, k)).fetchall()
        }
        assert got == want, sf
        assert len(got) == n_expect, sf
        # mutual-best is injective on both sides
        assert len({s for s, _ in got}) == len(got)
        assert len({t for _, t in got}) == len(got)


def test_bitext_candidates_api_reproduces_exact(spark, sf_small):
    """The scale path: bitext_margin_from_candidates over a BOUNDED
    candidate table (top-20 per side, both directions — the shape an
    IVF/LSH generator emits) reproduces the exact kernel's mutual
    pair set BIT-identically at sf0.001 — candidate top-k sums equal
    true k-NN sums whenever candidates cover the top-k, which
    top-20 ⊇ top-4 guarantees here."""
    import os

    emb = spark.read.parquet(
        os.path.join(sf_small, "embeddings.parquet")
    )
    x = emb.filter(F.col("label") < 5)
    y = emb.filter(F.col("label") >= 5)
    exact = {
        (r[0], r[1]): (r[2], r[3])
        for r in S.bitext_margin_pairs(x, y, k=4).collect()
    }
    fwd = S.topk_bruteforce(y, x, k=20, exclude_self=False).select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        F.col("similarity").alias("cos_sim"),
    )
    bwd = S.topk_bruteforce(x, y, k=20, exclude_self=False).select(
        F.col("neighbor_id").alias("src_id"),
        F.col("query_id").alias("tgt_id"),
        F.col("similarity").alias("cos_sim"),
    )
    cand = fwd.unionByName(bwd).dropDuplicates(["src_id", "tgt_id"])
    approx = {
        (r[0], r[1]): (r[2], r[3])
        for r in S.bitext_margin_from_candidates(cand, k=4).collect()
    }
    assert approx == exact
    assert len(exact) == 158


def test_bitext_ivf_candidates_recall(spark, sf_small):
    """The full 100 TB composition, end-to-end: IVF candidate
    generation (both directions, the similarity_topk_ivf layout)
    feeding bitext_margin_from_candidates. On the near-orthogonal
    synthetic embeddings — the HARD case for coarse quantization —
    nprobe=12/16 lists recovers >= 95% of the exact kernel's mutual
    pairs (measured 0.981; the whole pipeline is deterministic).
    The nprobe knob is the recall/cost dial: 4 -> 0.56, 8 -> 0.92,
    12 -> 0.98 measured on this fixture."""
    import os

    emb = spark.read.parquet(
        os.path.join(sf_small, "embeddings.parquet")
    )
    x = emb.filter(F.col("label") < 5)
    y = emb.filter(F.col("label") >= 5)
    exact = {
        (r[0], r[1])
        for r in S.bitext_margin_pairs(x, y, k=4).collect()
    }
    fwd = S.topk_ivf(
        y, x, k=20, n_centroids=16, nprobe=12, exclude_self=False
    ).select(
        F.col("query_id").alias("src_id"),
        F.col("neighbor_id").alias("tgt_id"),
        F.col("similarity").alias("cos_sim"),
    )
    bwd = S.topk_ivf(
        x, y, k=20, n_centroids=16, nprobe=12, exclude_self=False
    ).select(
        F.col("neighbor_id").alias("src_id"),
        F.col("query_id").alias("tgt_id"),
        F.col("similarity").alias("cos_sim"),
    )
    cand = fwd.unionByName(bwd).dropDuplicates(["src_id", "tgt_id"])
    approx = {
        (r[0], r[1])
        for r in S.bitext_margin_from_candidates(cand, k=4).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.95


def test_bitext_sparse_candidates_unbiased_denominator(spark):
    """ADVICE r11 fix pinned: with FEWER than k candidates on a
    side, the neighborhood mean divides by the actual contributing
    counts (n_x + n_y), not the fixed 2k that deflated the
    denominator and inflated sparse-coverage margins; an
    all-zero-cosine pair is dropped by the explicit zero-denominator
    guard instead of surfacing a NULL margin."""
    rows = [
        (1, 10, 0.9),
        (1, 11, 0.5),
        (2, 10, 0.8),
        # degenerate zero-cosine island -> zero denominator -> drop
        (3, 12, 0.0),
    ]
    cand = spark.createDataFrame(
        rows, "src_id LONG, tgt_id LONG, cos_sim DOUBLE"
    )
    got = {
        (r["src_id"], r["tgt_id"]): r["margin"]
        for r in S.bitext_margin_from_candidates(
            cand, k=4, threshold=0.0
        ).collect()
    }
    # Python reference with the SAME left-associative arithmetic
    sx = {1: (0.9 + 0.5, 2), 2: (0.8, 1), 3: (0.0, 1)}
    sy = {10: (0.9 + 0.8, 2), 11: (0.5, 1), 12: (0.0, 1)}

    def margin(s, t, cos):
        return cos / ((sx[s][0] + sy[t][0]) / float(sx[s][1] + sy[t][1]))

    # mutual best at threshold 0: (1,10) wins both directions;
    # (2,10) loses tgt 10 to src 1; (1,11) loses src 1 to tgt 10;
    # (3,12) is dropped by the zero-denominator guard
    assert set(got) == {(1, 10)}
    assert got[(1, 10)] == margin(1, 10, 0.9)
    # and the value differs from the old fixed-2k form — the bias
    # this fix removes (2k = 8 vs true counts 4)
    assert got[(1, 10)] != 0.9 / ((sx[1][0] + sy[10][0]) / 8.0)

"""Dedup operator tests on a corpus with *known* duplicate structure."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")  # one-token edit → high jaccard
OTHER = (
    "completely different text about spark dataframes shuffles and "
    "catalyst optimizer plans running on large clusters every day"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),               # exact dup of 0
        (2, "  " + BASE + "  "),  # whitespace-variant dup of 0
        (3, NEAR),               # near dup of 0
        (4, OTHER),
        (5, ""),                 # empty doc
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_exact_dedup_min_id_survivor(spark, corpus):
    kept = sorted(r["doc_id"] for r in D.exact_dedup(corpus).collect())
    # 1 and 2 collapse into 0 (normalization); near-dup 3 survives
    assert kept == [0, 3, 4, 5]


def test_ngram_jaccard_pairs(spark, corpus):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0 and pairs[(0, 2)] == 1.0 and pairs[(1, 2)] == 1.0
    assert 0.3 < pairs[(0, 3)] < 1.0   # near dup: high but not 1
    assert (0, 4) not in pairs and (4, 5) not in pairs


def test_containment_pairs_finds_excerpt_jaccard_misses(spark):
    """A short excerpt quoted inside a long page has near-1.0
    containment but tiny Jaccard — the asymmetric detector must flag
    it (contained side first) while the symmetric one stays silent,
    and unrelated docs must not pair."""
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(120))
    excerpt = "alpha beta gamma delta epsilon zeta eta theta"
    page = f"{filler} {excerpt}"
    df = spark.createDataFrame(
        [(0, page), (1, excerpt), (2, "totally unrelated words here")],
        "doc_id LONG, text STRING",
    )
    out = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in D.containment_pairs(df, k=3, threshold=0.8).collect()
    }
    assert (1, 0) in out and out[(1, 0)] == 1.0
    assert (0, 1) not in out  # page is NOT contained in the excerpt
    assert not any(2 in pair for pair in out)
    # symmetric Jaccard misses the same pair at any useful threshold
    jac = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(df, k=3, threshold=0.3).collect()
    }
    assert (0, 1) not in jac and (1, 0) not in jac


def test_containment_threshold_and_direction(spark):
    """Half-contained doc sits below a 0.8 threshold but above 0.4;
    both ordered directions carry their own denominators."""
    a = "p1 p2 p3 p4 p5 p6"            # 4 3-shingles
    b = "p1 p2 p3 p4 q5 q6 q7 q8"     # shares shingles of 'p1 p2 p3 p4'
    df = spark.createDataFrame(
        [(0, a), (1, b)], "doc_id LONG, text STRING"
    )
    out = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in D.containment_pairs(df, k=3, threshold=0.4).collect()
    }
    # S(a)={p123,p234,p345,p456}, S(b)={p123,p234,p34q5,...}: i=2
    assert out[(0, 1)] == 0.5          # 2/4 ≥ 0.4: contained dir in
    assert (1, 0) not in out           # 2/6 ≈ 0.33 < 0.4: other dir out
    out_hi = {
        (r["contained_id"], r["container_id"])
        for r in D.containment_pairs(df, k=3, threshold=0.8).collect()
    }
    assert out_hi == set()


def test_winnow_guarantee_shared_run_shares_fingerprint(spark):
    """The winnowing guarantee: two docs sharing a token run of
    length >= window + k - 1 MUST share at least one fingerprint
    value, regardless of surrounding text."""
    k, w = 5, 4
    run = " ".join(f"r{i}" for i in range(k + w - 1))  # exactly w+k-1
    df = spark.createDataFrame(
        [
            (0, f"aa bb cc {run} dd ee"),
            (1, f"zz yy {run} xx ww vv uu"),
            (2, "nothing in common with the others at all even once"),
        ],
        "doc_id LONG, text STRING",
    )
    fps = D.winnow_fingerprints(df, k=k, window=w)
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in D.winnow_candidate_pairs(fps, min_shared=1).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert not any(2 in p for p in pairs)


def test_winnow_selection_validity_and_density(spark):
    """Every fingerprint is a real gram hash at a real position; the
    selected count is far below the gram count (the ~2/(w+1) density
    claim, loosely bounded); a sub-(k+w-1)-token doc still yields its
    single overall-min gram; sub-k docs yield nothing."""
    k, w = 5, 4
    words = " ".join(f"t{i * 17 % 101}" for i in range(300))
    df = spark.createDataFrame(
        [(0, words), (1, "only six little words right here"),
         (2, "too short")],
        "doc_id LONG, text STRING",
    )
    fps = D.winnow_fingerprints(df, k=k, window=w)
    rows = fps.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    n_grams_0 = 300 - k + 1
    assert 0 < len(by_doc[0]) < n_grams_0 / 2  # well under half
    assert all(0 <= p < n_grams_0 for p, _ in by_doc[0])
    # doc 1 has 7 tokens → 3 grams < window → exactly one fingerprint
    assert len(by_doc.get(1, [])) == 1
    assert 2 not in by_doc


def test_winnow_md5_flavor_same_guarantee(spark):
    """The md5 (oracle-replayable) flavor keeps the guarantee and
    yields positive longs parseable by both engines."""
    k, w = 3, 3
    run = " ".join(f"m{i}" for i in range(k + w - 1))
    df = spark.createDataFrame(
        [(0, f"pre {run} post"), (1, f"{run} tail words")],
        "doc_id LONG, text STRING",
    )
    fps = D.winnow_fingerprints(df, k=k, window=w, hash_fn="md5")
    assert fps.filter(F.col("fp") < 0).count() == 0
    pairs = D.winnow_candidate_pairs(fps, min_shared=1)
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(0, 1)}


def test_minhash_signatures_shape_and_determinism(spark, corpus):
    s1 = D.minhash_signatures(corpus, num_perm=16)
    assert len(s1.columns) == 17
    assert s1.count() == 5  # empty doc has no signature
    sig0 = s1.filter(F.col("doc_id") == 0).first()
    sig1 = s1.filter(F.col("doc_id") == 1).first()
    assert [sig0[f"h{i}"] for i in range(16)] == [sig1[f"h{i}"] for i in range(16)]


def test_minhash_dedup_finds_near_dup(spark, corpus):
    kept = sorted(
        r["doc_id"] for r in D.minhash_dedup(corpus, threshold=0.5).collect()
    )
    # 1,2 exact dups of 0; 3 near-dup (jaccard ~0.77) also dropped
    assert kept == [0, 4, 5]


def test_lsh_candidates_subset_verified(spark, corpus):
    sigs = D.minhash_signatures(corpus)
    cand = D.lsh_candidate_pairs(sigs)
    cand_set = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    assert (0, 1) in cand_set and (0, 2) in cand_set
    # verification prunes candidates to true near-dups
    verified = D.ngram_jaccard_pairs(
        corpus, threshold=0.5, candidates=cand
    )
    vset = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert vset <= cand_set and (0, 3) in vset


def test_simhash_near_dup_small_hamming(spark, corpus):
    sigs = D.simhash_signatures(corpus)
    assert sigs.count() == 5
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_pairs(sigs, max_hamming=10).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 2)] == 0
    assert 0 < pairs[(0, 3)] <= 10  # near dup: few bits differ
    kept = sorted(r["doc_id"] for r in D.simhash_dedup(corpus).collect())
    assert 0 in kept and 4 in kept and 1 not in kept and 2 not in kept


def test_max_bucket_guard(spark, corpus):
    sigs = D.minhash_signatures(corpus)
    # bucket cap of 1 drops every shared band bucket → no candidates
    cand = D.lsh_candidate_pairs(sigs, max_bucket=1)
    assert cand.count() == 0


def test_hot_bucket_stress(spark):
    """Pathological skew (VERDICT r1 item 6): 30% of the corpus is one
    identical document, so every band funnels 30% of all docs into a
    single bucket. Unguarded, that one bucket alone contributes
    C(150,2) = 11 175 candidate pairs; ``max_bucket`` must bound the
    candidate set so the quadratic hot-bucket blowup never reaches the
    verify stage."""
    n_hot, n_cold = 150, 350
    rows = [(i, "the exact same viral chain letter forwarded everywhere "
                "again and again with identical words") for i in range(n_hot)]
    rows += [
        (n_hot + i,
         f"distinct article number {i} covering topic {i * 7} with "
         f"unique tokens {i * 13} and {i * 31} nothing shared")
        for i in range(n_cold)
    ]
    corpus = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    sigs = D.minhash_signatures(corpus, num_perm=16).persist()
    try:
        hot_pairs = n_hot * (n_hot - 1) // 2
        unguarded = D.lsh_candidate_pairs(
            sigs, num_perm=16, bands=4, max_bucket=None
        ).count()
        assert unguarded >= hot_pairs  # the blowup is real
        guarded = D.lsh_candidate_pairs(
            sigs, num_perm=16, bands=4, max_bucket=50
        ).count()
        # every hot-bucket pair is gone; only cold-corpus collisions
        # (rare) survive
        assert guarded <= unguarded - hot_pairs
        assert guarded < n_cold  # candidate work is linear-ish, not n²
    finally:
        sigs.unpersist()


def test_hot_shingle_guard_jaccard(spark):
    """ngram_jaccard_pairs(max_bucket=...) drops stop-shingles from
    candidate generation: docs sharing ONLY a ubiquitous phrase stop
    pairing, while genuinely similar docs still pair."""
    common = "as seen on every page header today"
    rows = [(i, f"{common} article {i} about topic {i * 11}")
            for i in range(40)]
    rows.append((100, "two documents that are truly almost identical twins"))
    rows.append((101, "two documents that are truly almost identical tins"))
    corpus = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    guarded = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(
            corpus, threshold=0.3, max_bucket=10, persist=False
        ).collect()
    }
    assert (100, 101) in guarded
    # no pair among the header-only docs
    assert all(a >= 100 for a, _ in guarded)


def test_hot_shingle_guard_containment(spark):
    """containment_pairs(max_bucket=...): guard-on == guard-off minus
    every pair whose overlap is carried ONLY by hot (stop-)shingles
    (VERDICT r6 item 4 — the minhash hot-bucket device applied to the
    containment family, where stop-shingle skew is WORSE than
    Jaccard's: a short doc's denominator lets common shingles alone
    clear the threshold)."""
    # 30 boilerplate docs sharing one ubiquitous header phrase, plus a
    # genuine excerpt/container pair that shares nothing with it. The
    # short header-only docs hit containment 1.0 against each other
    # unguarded (their whole shingle set IS the hot phrase).
    header = "all rights reserved terms of service apply"
    rows = [(i, header) for i in range(30)]
    rows.append((100, "the quick brown fox jumps over the lazy dog tonight"))
    rows.append((101, "opening words then the quick brown fox jumps over "
                      "the lazy dog tonight and much more trailing text "
                      "follows here"))
    corpus = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    def pairs(max_bucket):
        return {
            (r["contained_id"], r["container_id"])
            for r in D.containment_pairs(
                corpus, threshold=0.8, max_bucket=max_bucket,
                persist=False,
            ).collect()
        }

    unguarded = pairs(None)
    guarded = pairs(10)
    # the blowup is real: 30 identical boilerplate docs pair both ways
    hot_pairs = {
        (a, b) for a in range(30) for b in range(30) if a != b
    }
    assert hot_pairs <= unguarded
    # guard-on == guard-off minus exactly the hot-shingle-only pairs:
    # the excerpt pair (100 ⊂ 101) survives, boilerplate pairs vanish
    assert guarded == unguarded - hot_pairs
    assert (100, 101) in guarded
    # denominator is NOT guarded: with every shingle of the
    # boilerplate docs hot, their intersection is 0, not undefined
    assert all(a >= 100 for a, _ in guarded)


def test_duplicated_span_extents_islands(spark):
    """ExactSubstr extents vs a pure-Python reference: total-count
    hotness (within-doc repeats count, Lee et al.'s rule) and
    gaps-and-islands merging into maximal [start, end) extents."""
    # doc 0 repeats its own 3-gram "a b c" twice (within-doc dup);
    # docs 1 and 2 share "x y z" once each (cross-doc dup); doc 3 is
    # clean. k=3, min_count=2.
    rows = [
        (0, "a b c q r s t a b c"),
        (1, "p p p x y z q q q"),
        (2, "m m m m x y z"),
        (3, "u v w unique only here"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["span_toks"])
        for r in D.duplicated_span_extents(
            corpus, k=3, min_count=2
        ).collect()
    }

    def ref(rows, k, min_count):
        toks = {i: t.split() for i, t in rows}
        from collections import Counter
        cnt = Counter()
        for i, tk in toks.items():
            for p in range(len(tk) - k + 1):
                cnt[tuple(tk[p:p + k])] += 1
        out = set()
        for i, tk in toks.items():
            cov = sorted({
                p + c
                for p in range(len(tk) - k + 1)
                if cnt[tuple(tk[p:p + k])] >= min_count
                for c in range(k)
            })
            start = None
            prev = None
            for pos in cov + [None]:
                if start is None:
                    start, prev = pos, pos
                elif pos is not None and pos == prev + 1:
                    prev = pos
                else:
                    out.add((i, start, prev + 1, prev + 1 - start))
                    start, prev = pos, pos
        return out

    expect = ref(rows, 3, 2)
    assert got == expect
    # doc 0: both "a b c" occurrences covered (within-doc rule) as
    # two separate extents; doc 3 clean; "p p p" in doc 1 and
    # "m m m" runs in doc 2 ARE hot (total-count >= 2 via overlap
    # counting within the run) — the reference encodes the truth.
    assert (0, 0, 3, 3) in got and (0, 7, 10, 3) in got
    assert not any(d == 3 for d, *_ in got)


def test_keep_best_per_cluster_argmax(spark):
    """Survivor = max quality, ties -> min id; singletons survive."""
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (4, 7)],
        "doc_id LONG, n_chars INT",
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)],
        "doc_id LONG, component LONG",
    )
    got = {
        (r["component"], r["survivor_id"], r["quality"], r["n_members"])
        for r in D.keep_best_per_cluster(
            docs, comps, "n_chars"
        ).collect()
    }
    # cluster 1: quality tie 30/30 between ids 2 and 3 -> min id 2
    assert got == {(1, 2, 30, 3), (4, 4, 7, 1)}


def test_keep_best_per_cluster_float_quality(spark):
    """Fractional model scores must elect correctly (no silent
    integer truncation — 0.97 beats 0.13)."""
    docs = spark.createDataFrame(
        [(1, 0.13), (2, 0.97), (3, 0.5)],
        "doc_id LONG, score DOUBLE",
    )
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "doc_id LONG, component LONG"
    )
    got = D.keep_best_per_cluster(docs, comps, "score").collect()
    assert len(got) == 1
    assert got[0]["survivor_id"] == 2
    assert abs(got[0]["quality"] - 0.97) < 1e-12


# --------------------------------------------------------------------------
# r8 wave 2: within-doc repeated-span removal + the LSH S-curve table
# --------------------------------------------------------------------------


def test_remove_within_doc_repeats_keep_first(spark):
    """Keep-first semantics: the first occurrence of every k-gram
    survives, later occurrences' covered positions are removed;
    unique docs pass through byte-identical; sub-k and empty docs
    emit (whole text, n, 0)."""
    from convert_parquet_to_csv_spark.operators.dedup import (
        remove_within_doc_repeats,
    )

    rows = [
        # 'a b' repeats at positions 0, 2 and 5 → positions 2,3,5,6
        # are covered by non-first occurrences
        (1, "a b a b x a b"),
        (2, "all words unique in here"),
        (3, "x"),            # sub-k
        (4, ""),             # empty
        # overlapping repeat of 'a a': positions 0..3; first occ at
        # 0 keeps (0,1); occs at 1,2 are non-first → covered 1,2,3
        (5, "a a a a"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_within_doc_repeats(df, k=2).collect()
    }

    def ref(text, k=2):
        toks = text.split()
        first: dict[tuple, int] = {}
        covered = set()
        for p in range(max(len(toks) - k + 1, 0)):
            g = tuple(toks[p : p + k])
            if g in first:
                covered.update(range(p, p + k))
            else:
                first[g] = p
        kept = [w for i, w in enumerate(toks) if i not in covered]
        return (" ".join(kept), len(kept), len(toks) - len(kept))

    for i, text in rows:
        assert got[i] == ref(text), (i, got[i], ref(text))
    # the unique doc is untouched, the loop doc is gutted
    assert got[2][2] == 0
    assert got[5] == ("a", 1, 3)


def test_minhash_s_curve_values(spark):
    """1−(1−s^r)^b on the lattice, bit-equal to python float math
    with the same association; monotone; 0.5-crossing near the
    (1/b)^(1/r) rule of thumb for the repo defaults."""
    from convert_parquet_to_csv_spark.operators.dedup import (
        minhash_s_curve,
    )

    b, r, grid = 8, 4, 20
    got = {
        row["s"]: (row["p_band"], row["p_candidate"])
        for row in minhash_s_curve(
            spark, bands=b, rows_per_band=r, grid=grid
        ).collect()
    }
    assert len(got) == grid - 1
    prev = -1.0
    for i in range(1, grid):
        s = i / float(grid)
        p_band = s
        for _ in range(r - 1):
            p_band = p_band * s
        miss = 1.0 - p_band
        p_all = miss
        for _ in range(b - 1):
            p_all = p_all * miss
        want = (p_band, 1.0 - p_all)
        assert got[s] == want, (s, got[s], want)
        assert want[1] >= prev
        prev = want[1]
    # exact 0.5-crossing: s^4 = 1 − 0.5^(1/8) → s ≈ 0.537 (the
    # (1/b)^(1/r) ≈ 0.595 rule of thumb overshoots — it solves
    # b·s^r = 1, not the exact curve)
    assert got[0.50][1] < 0.5 < got[0.55][1]


def test_dedup_remap_stage_and_chain(spark):
    """Remap rows = (dropped -> min-id survivor) per key group;
    chaining a second stage over the survivors never remaps a doc
    twice and unions cleanly."""
    from convert_parquet_to_csv_spark.operators.dedup import dedup_remap

    rows = [
        (1, "k1", "u1"),
        (2, "k1", "u2"),   # exact-dropped -> 1
        (3, "k2", "u3"),
        (4, "k3", "u3"),   # url-dup of 3 (survives stage 1)
        (5, "k4", "u4"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, k STRING, u STRING")
    s1 = dedup_remap(df, F.col("k"), method="m1")
    got1 = {(r["dropped_id"], r["kept_id"], r["method"])
            for r in s1.collect()}
    assert got1 == {(2, 1, "m1")}
    survivors = df.join(
        s1.select(F.col("dropped_id").alias("doc_id")), "doc_id",
        "left_anti",
    )
    s2 = dedup_remap(survivors, F.col("u"), method="m2")
    got2 = {(r["dropped_id"], r["kept_id"], r["method"])
            for r in s2.collect()}
    assert got2 == {(4, 3, "m2")}
    both = s1.unionByName(s2)
    dropped = [r["dropped_id"] for r in both.collect()]
    assert sorted(dropped) == [2, 4]  # no doc remapped twice


def test_remove_within_doc_repeats_null_and_blank(spark):
    """NULL contract (r8 review): every input doc gets a row — NULL
    text -> (NULL, 0, 0) per the span-dedup contract, whitespace-only
    -> ('', 0, 0), never a missing row or NULL counts."""
    from convert_parquet_to_csv_spark.operators.dedup import (
        remove_within_doc_repeats,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "a b a b")],
        "doc_id LONG, text STRING",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in remove_within_doc_repeats(df, k=2).collect()
    }
    assert got == {
        1: (None, 0, 0),
        2: ("", 0, 0),
        3: ("a b", 2, 2),
    }


def test_remove_duplicated_lines_keep_global_first(spark):
    """Line-level boilerplate removal: every occurrence of a
    duplicated line is removed except the globally first by
    (doc_id, line_pos); unique and blank lines survive; NULL text
    follows the (NULL, 0, 0) contract. Pinned against a pure-Python
    replay of the same rule."""
    from convert_parquet_to_csv_spark.operators.dedup import (
        remove_duplicated_lines,
    )

    rows = [
        (1, "footer text\nunique alpha\nfooter text"),  # in-doc dup too
        (2, "unique beta\nfooter text\ncookie banner"),
        (3, "cookie banner\n\nunique gamma"),            # blank kept
        (4, "   \nunique delta"),                        # ws-only kept
        (5, None),
        (6, ""),                                         # one blank line
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (
            r["clean_text"], r["n_lines_kept"], r["n_lines_removed"]
        )
        for r in remove_duplicated_lines(df).collect()
    }

    # pure-Python replay
    occ = []
    for i, text in rows:
        if text is None:
            continue
        for p, line in enumerate(text.split("\n")):
            occ.append((i, p, line))
    first: dict[str, tuple] = {}
    for i, p, line in occ:  # rows already in (doc, pos) order
        if line.strip() and line not in first:
            first[line] = (i, p)
    counts: dict[str, int] = {}
    for _, _, line in occ:
        if line.strip():
            counts[line] = counts.get(line, 0) + 1
    want = {}
    for i, text in rows:
        if text is None:
            want[i] = (None, 0, 0)
            continue
        lines = text.split("\n")
        kept = [
            ln
            for p, ln in enumerate(lines)
            if not ln.strip()
            or counts[ln] == 1
            or first[ln] == (i, p)
        ]
        want[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    assert got == want, (got, want)
    # spot-pin the semantics: doc1 keeps the first global 'footer
    # text' only; doc2 loses it but keeps the first global 'cookie
    # banner' (doc2 pos 2 < doc3 pos 0 by doc order); doc3's blank
    # line survives
    assert got[1] == ("footer text\nunique alpha", 2, 1)
    assert got[2] == ("unique beta\ncookie banner", 2, 1)
    assert got[3] == ("\nunique gamma", 2, 1)
    assert got[6] == ("", 1, 0)


def test_dedup_remap_null_keys_group_together(spark):
    """NULL dedup keys form ONE group (r8 review): the join-back is
    null-safe, so NULL-key duplicates keep their lineage rows instead
    of silently posing as survivors — parity with the oracle's
    PARTITION BY, which groups NULLs."""
    from convert_parquet_to_csv_spark.operators.dedup import dedup_remap

    df = spark.createDataFrame(
        [(10, None), (11, None), (12, "t"), (13, "t")],
        "doc_id LONG, text STRING",
    )
    got = {
        (r["dropped_id"], r["kept_id"])
        for r in dedup_remap(df, F.md5("text"), method="x").collect()
    }
    assert got == {(11, 10), (13, 12)}


# --- incremental MinHash admission (r9) --------------------------------------

def test_minhash_incremental_admission_rule(spark):
    """New docs (id % 7 == 3): an exact copy of a HISTORY doc drops
    with matched_id = that doc even when the history id is LARGER;
    a copy of an EARLIER new doc drops against it; a unique new doc
    keeps. History rows are never re-adjudicated (absent from the
    output)."""
    from convert_parquet_to_csv_spark.operators.dedup import (
        minhash_dedup_incremental,
    )
    from pyspark.sql import functions as F

    base = "alpha beta gamma delta epsilon zeta eta theta"
    uniq = "one two three four five six seven eight nine"
    rows = [
        (3, base),            # new: dup of history 20 -> dropped
        (11, uniq + " x"),    # history (11 % 7 == 4)
        (17, base + " tail"), # new: near-dup of 3? shares most grams
        (20, base),           # history twin of 3 (larger id)
        (24, "solo unique words nothing shared here at all ok"),
        (31, base),           # new: dup of 3 (earlier new) and 20
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["kept"], r["matched_id"])
        for r in minhash_dedup_incremental(
            df, F.col("doc_id") % 7 == F.lit(3)
        ).collect()
    }
    spark.catalog.clearCache()
    # output covers exactly the new ids
    assert set(got) == {3, 17, 24, 31}
    # 3 matches history 20 (larger id than 3 — history always counts)
    assert got[3] == (False, 20)
    # 31 matches 3 (earlier new) before 20: min partner = 3
    assert got[31] == (False, 3)
    # 24 is unique
    assert got[24] == (True, None)
    # 17 shares an 8-gram prefix with base docs; with k=3 shingles
    # jaccard("base", "base tail") = 6/7 >= 0.5 -> dropped, min
    # partner is history 20?? partners: history 20 (J>=0.5) and new 3
    # (3 < 17, J>=0.5) -> min = 3
    assert got[17] == (False, 3)


def test_minhash_incremental_rejects_indivisible_bands(spark):
    """Contract parity with lsh_candidate_pairs (dedup.py:484):
    num_perm % bands != 0 raises instead of silently dropping the
    trailing permutations from banding (ADVICE r9 #2)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.operators.dedup import (
        minhash_dedup_incremental,
    )

    df = spark.createDataFrame(
        [(3, "a b c"), (4, "a b c")], "doc_id LONG, text STRING"
    )
    with _pytest.raises(ValueError, match="divisible"):
        minhash_dedup_incremental(
            df, F.col("doc_id") % 7 == F.lit(3), num_perm=30, bands=8
        )

"""Tests for functions/text.py — tokenization, lang-id, fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.functions import text as T


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text STRING").select(
        col.alias("v")
    ).first()["v"]


def test_tokens_empty_and_whitespace(spark):
    assert _one(spark, "", F.size(T.tokens("text"))) == 0
    assert _one(spark, "   ", F.size(T.tokens("text"))) == 0
    assert _one(spark, " a  b\tc ", T.tokens("text")) == ["a", "b", "c"]


def test_token_count_bpe(spark):
    # word runs + individual punctuation marks
    assert _one(spark, "hello, world!", T.token_count_bpe("text")) == 4
    assert _one(spark, "", T.token_count_bpe("text")) == 0
    assert _one(spark, "a.b.c", T.token_count_bpe("text")) == 5


def test_normalize_and_fingerprint_stability(spark):
    a = _one(spark, "Hello   World", T.doc_fingerprint("text"))
    b = _one(spark, " hello world ", T.doc_fingerprint("text"))
    c = _one(spark, "hello worlds", T.doc_fingerprint("text"))
    assert a == b != c


def test_lang_id_markers(spark):
    assert _one(spark, "the cat and the dog is here", T.lang_id("text")) == "en"
    assert _one(spark, "der Hund und die Katze ist", T.lang_id("text")) == "de"
    assert _one(spark, "le chat et les chiens est", T.lang_id("text")) == "fr"
    assert _one(spark, "el gato y los perros es", T.lang_id("text")) == "es"
    assert _one(spark, "xyzzy plugh", T.lang_id("text")) == "und"


def test_quality_features_blank_doc_no_nan(spark):
    f = T.quality_features("text")
    row = (
        spark.createDataFrame([("",), ("Hi there, friend!",)], "text STRING")
        .select(*[v.alias(k) for k, v in f.items()])
        .collect()
    )
    blank = row[0]
    assert blank["n_tokens"] == 0 and blank["avg_token_len"] == 0.0
    real = row[1]
    assert real["n_tokens"] == 3
    assert 0 < real["alpha_ratio"] < 1
    assert real["punct_ratio"] > 0


def test_shingles(spark):
    sh = _one(spark, "a b c d", T.shingles("text", 3))
    assert sorted(sh) == ["a b c", "b c d"]
    # short doc: whole text as single shingle
    assert _one(spark, "a b", T.shingles("text", 3)) == ["a b"]
    assert _one(spark, "", T.shingles("text", 3)) == []


def test_chunk_documents_overlap_and_bounds(spark):
    from convert_parquet_to_csv_spark.operators.chunking import chunk_documents
    from pyspark.sql import functions as F

    text = " ".join(f"t{i}" for i in range(95))
    df = spark.createDataFrame(
        [(1, text), (2, "one two"), (3, "   ")],
        "doc_id long, text string",
    )
    out = chunk_documents(df, size=50, stride=40).orderBy(
        "doc_id", "chunk_idx"
    )
    rows = out.collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 95 tokens -> chunks at 0, 40, 80 -> sizes 50, 50, 15
    assert [r.n_chunk_tokens for r in by_doc[1]] == [50, 50, 15]
    # overlap: chunk 1 starts at token 40
    assert by_doc[1][1].chunk_tokens[0] == "t40"
    # doc 2: single short chunk; doc 3 (whitespace only): no chunks
    assert [r.n_chunk_tokens for r in by_doc[2]] == [2]
    assert 3 not in by_doc


def test_chunk_documents_stride_exceeds_size_no_phantom(spark):
    from convert_parquet_to_csv_spark.operators.chunking import chunk_documents

    # 50 tokens, size 10, stride 100: exactly one chunk, no empty tail
    text = " ".join(f"t{i}" for i in range(50))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(df, size=10, stride=100).collect()
    assert [(r.chunk_idx, r.n_chunk_tokens) for r in rows] == [(0, 10)]


def test_pack_sequences_contiguous_fill(spark):
    from convert_parquet_to_csv_spark.operators.chunking import pack_sequences

    chunks = spark.createDataFrame(
        [(1, 0, 300), (1, 1, 300), (2, 0, 300), (2, 1, 100)],
        "doc_id long, chunk_idx int, n_chunk_tokens long",
    )
    out = pack_sequences(chunks, budget=512).orderBy("doc_id", "chunk_idx")
    rows = [(r.doc_id, r.chunk_idx, r.bin_id) for r in out.collect()]
    # exclusive cumsums: 0, 300, 600, 900 -> bins 0, 0, 1, 1
    assert rows == [(1, 0, 0), (1, 1, 0), (2, 0, 1), (2, 1, 1)]


def test_redact_pii_all_kinds_and_ordering(spark):
    from convert_parquet_to_csv_spark.functions.text import (
        pii_counts,
        redact_pii,
    )

    text = (
        "mail a.user+x@sub.example.org phone 555-123-4567 "
        "ip 192.168.1.1 ssn 123-45-6789 end"
    )
    df = spark.createDataFrame([(text,)], "t string")
    red = df.select(redact_pii("t").alias("r")).collect()[0].r
    # Every kind masked; SSN not half-eaten by the phone rule, IP not
    # eaten by the phone rule (redaction order: email, ip, ssn, phone).
    assert "<EMAIL>" in red and "<PHONE>" in red
    assert "<IP>" in red and "<SSN>" in red
    assert "@" not in red and "123-45-6789" not in red
    assert "192.168" not in red

    counts = df.select(
        *[c.alias(k) for k, c in pii_counts("t").items()]
    ).collect()[0]
    assert counts.n_email == 1 and counts.n_ssn == 1
    assert counts.n_ipv4 == 1


def test_redact_pii_leaves_clean_text_alone(spark):
    from convert_parquet_to_csv_spark.functions.text import redact_pii

    df = spark.createDataFrame([("just plain words here",)], "t string")
    assert (
        df.select(redact_pii("t").alias("r")).collect()[0].r
        == "just plain words here"
    )


def test_concat_chunk_pack_matches_naive_and_conserves_tokens(spark):
    """Two-level binned packing offset == naive global cumsum, and
    the per-chunk report conserves every token: sum(n_tokens) ==
    corpus BPE tokens + one EOS per doc; every chunk but the last is
    filled to exactly ctx; doc starts sum to the doc count."""
    from convert_parquet_to_csv_spark.functions.text import (
        token_count_bpe,
    )
    from convert_parquet_to_csv_spark.operators.chunking import (
        concat_chunk_pack,
    )

    rows = [
        (i, ("word " * (i % 37)) + ("x.y," * (i % 5)))
        for i in range(0, 400, 3)  # gappy ids exercise the id binning
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    ctx = 64
    got = {
        r["chunk_id"]: (r["n_docs"], r["n_docs_start"], r["n_tokens"])
        for r in concat_chunk_pack(df, ctx=ctx, num_bins=16).collect()
    }

    # naive python replay
    counts = {
        r["doc_id"]: r["nt"]
        for r in df.select(
            "doc_id", (token_count_bpe("text") + 1).alias("nt")
        ).collect()
    }
    want: dict[int, list[int]] = {}
    start = 0
    for doc_id in sorted(counts):
        nt = counts[doc_id]
        for cid in range(start // ctx, (start + nt - 1) // ctx + 1):
            w = want.setdefault(cid, [0, 0, 0])
            w[0] += 1
            w[1] += 1 if start // ctx == cid else 0
            w[2] += min((cid + 1) * ctx, start + nt) - max(
                cid * ctx, start
            )
        start += nt
    assert got == {k: tuple(v) for k, v in want.items()}
    total = sum(counts.values())
    assert sum(v[2] for v in got.values()) == total
    last = max(got)
    assert all(got[c][2] == ctx for c in got if c != last)
    assert sum(v[1] for v in got.values()) == len(counts)


def test_bpe_learn_merges_matches_python_reference(spark):
    """Three learned merges vs a pure-Python Sennrich-style BPE on a
    designed corpus: frequency-weighted pair counts, lexicographic
    tie-break, greedy LTR non-overlapping merge within a round (the
    'aaa' overlap case is in the corpus), later rounds seeing merged
    symbols as atoms."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_learn_merges,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "aaa aaa banana",
        "aaaaa aaaa",  # l == r runs: greedy must pair (0,1),(2,3)...
    ]
    rows = [(i, t) for i, t in enumerate(texts)]

    def greedy(sy, l, r):
        # tokenwise greedy LTR non-overlapping merge — the Sennrich
        # rule, independent of the operator's aggregate-fold device
        out, i = [], 0
        while i < len(sy):
            if i + 1 < len(sy) and sy[i] == l and sy[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sy[i])
                i += 1
        return out

    def ref(texts, rounds):
        from collections import Counter
        vocab = Counter()
        for t in texts:
            for w in t.split():
                vocab[tuple(w)] += 1
        merges = []
        for _ in range(rounds):
            pairs = Counter()
            for sy, f in vocab.items():
                for a, b in zip(sy, sy[1:]):
                    pairs[(a, b)] += f
            if not pairs:
                break
            (l, r), w = min(
                pairs.items(), key=lambda kv: (-kv[1], kv[0])
            )
            merges.append((l, r, w))
            nv = Counter()
            for sy, f in vocab.items():
                nv[tuple(greedy(list(sy), l, r))] += f
            vocab = nv
        return merges

    expect = [
        (i + 1, l, r, w) for i, (l, r, w) in enumerate(ref(texts, 3))
    ]
    corpus = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = [
        (r["rank"], r["l"], r["r"], r["pair_weight"])
        for r in bpe_learn_merges(corpus, rounds=3)
        .orderBy("rank")
        .collect()
    ]
    assert got == expect


def _ref_bpe(texts, rounds):
    """Pure-Python Sennrich BPE (learn + greedy-LTR apply) — the
    implementation-independent reference shared by the r8 encode/
    curve tests; returns (merges, encode_fn)."""
    from collections import Counter

    def greedy(sy, l, r):
        out, i = [], 0
        while i < len(sy):
            if i + 1 < len(sy) and sy[i] == l and sy[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(sy[i])
                i += 1
        return out

    vocab = Counter()
    for t in texts:
        for w in t.split():
            vocab[tuple(w)] += 1
    merges = []
    for _ in range(rounds):
        pairs = Counter()
        for sy, f in vocab.items():
            for a, b in zip(sy, sy[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        (l, r), w = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, w))
        nv = Counter()
        for sy, f in vocab.items():
            nv[tuple(greedy(list(sy), l, r))] += f
        vocab = nv

    def encode_len(text):
        n = 0
        for w in text.split():
            sy = list(w)
            for l, r, _ in merges:
                sy = greedy(sy, l, r)
            n += len(sy)
        return n

    return merges, encode_len


def test_bpe_apply_merges_matches_python_reference(spark):
    """bpe_apply_merges on the LEARNED table == the pure-Python
    greedy encoder applied per word, including the l == r run corpus
    and an empty doc (→ 0, not NULL)."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_apply_merges,
        bpe_learn_merges,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "aaa aaa banana",
        "aaaaa aaaa",
        "",  # empty doc: encodes to 0
    ]
    _, encode_len = _ref_bpe([t for t in texts if t], rounds=3)
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    merges = bpe_learn_merges(corpus, rounds=3)
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_apply_merges(corpus, merges, rounds=3).collect()
    }
    assert set(got) == set(range(len(texts)))
    for i, t in enumerate(texts):
        assert got[i] == encode_len(t), (i, got[i], encode_len(t))


def test_bpe_compression_curve_matches_python_reference(spark):
    """rank 0 == total char occurrences; every snapshot equals the
    pure-Python greedy encoder's corpus symbol count after that many
    merges. Each marginal drop is the number of CHOSEN
    (non-overlapping) merge occurrences — ≤ pair_weight, strictly
    less on overlapping l == r runs ('aaaaa' counts 4 (a,a) pairs
    but greedy collapses only 2), which the corpus includes so the
    distinction is exercised, not assumed away."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        bpe_compression_curve,
        bpe_learn_merges,
    )

    texts = [
        "low low low lower lowest",
        "new newer newest new new",
        "aaaaa aaaa",
    ]
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id LONG, text STRING"
    )
    curve = {
        r["rank"]: r["corpus_tokens"]
        for r in bpe_compression_curve(corpus, rounds=3).collect()
    }
    weights = {
        r["rank"]: r["pair_weight"]
        for r in bpe_learn_merges(corpus, rounds=3).collect()
    }
    total_chars = sum(len(w) for t in texts for w in t.split())
    assert curve[0] == total_chars
    for i in (1, 2, 3):
        # reference snapshot: encode with the first i merges only
        _, enc_i = _ref_bpe(texts, rounds=i)
        assert curve[i] == sum(enc_i(t) for t in texts), i
        drop = curve[i - 1] - curve[i]
        assert 0 < drop <= weights[i], i
    # the l == r overlap corpus makes at least one drop STRICTLY
    # below its pair_weight (the curve-vs-weight distinction is real)
    assert any(
        curve[i - 1] - curve[i] < weights[i] for i in (1, 2, 3)
    )


def test_concat_chunk_pack_counts_df_override(spark):
    """counts_df rebases the packing on external per-doc counts (+1
    EOS still added); the default path is untouched."""
    from convert_parquet_to_csv_spark.operators.chunking import (
        concat_chunk_pack,
    )

    docs = spark.createDataFrame(
        [(i, "irrelevant text") for i in range(6)],
        "doc_id LONG, text STRING",
    )
    counts = spark.createDataFrame(
        [(i, 7 + i) for i in range(6)], "doc_id LONG, n_bpe_tokens LONG"
    )
    ctx = 10
    got = {
        r["chunk_id"]: (r["n_docs"], r["n_docs_start"], r["n_tokens"])
        for r in concat_chunk_pack(
            docs, ctx=ctx, counts_df=counts
        ).collect()
    }
    # naive reference over nt = counts + 1 EOS
    nts = [7 + i + 1 for i in range(6)]
    starts, s = [], 0
    for nt in nts:
        starts.append(s)
        s += nt
    ref = {}
    for d, (st, nt) in enumerate(zip(starts, nts)):
        for cid in range(st // ctx, (st + nt - 1) // ctx + 1):
            n, nst, tok = ref.get(cid, (0, 0, 0))
            ref[cid] = (
                n + 1,
                nst + (1 if st // ctx == cid else 0),
                tok
                + min((cid + 1) * ctx, st + nt)
                - max(cid * ctx, st),
            )
    assert got == ref


# --------------------------------------------------------------------------
# fill-in-the-middle transform (slated future registration: fim_transform)
# --------------------------------------------------------------------------


def test_fim_transform_matches_independent_python_reference(spark):
    """Third-implementation check: recompute the md5 split points and
    PSM rendering in pure Python (hashlib + str.split — independent
    of both Spark and DuckDB) for real sf0.001 docs."""
    import hashlib
    import os

    from convert_parquet_to_csv_spark.operators.chunking import (
        fim_transform,
    )

    sf = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    docs = (
        spark.read.parquet(os.path.join(sf, "sf0.001", "documents.parquet"))
        .filter(F.col("doc_id") < 20)
        .select("doc_id", "text")
    )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["mode"],
            r["i_split"],
            r["j_split"],
            r["fim_text"],
        )
        for r in fim_transform(docs).collect()
    }

    def h(salt: str, x: int) -> int:
        return int(
            hashlib.md5(f"{salt}{x}".encode()).hexdigest()[:15], 16
        )

    for row in docs.collect():
        d, tk = row["doc_id"], row["text"].split()
        n = len(tk)
        if h("fim-sel:", d) % 2 == 0 and n >= 3:
            # sort-two-uniform (ADVICE r11): two independent draws
            a, b = h("fim-i:", d) % (n + 1), h("fim-j:", d) % (n + 1)
            i, j = min(a, b), max(a, b)
            txt = " ".join(
                ["<PRE>"] + tk[:i] + ["<SUF>"] + tk[j:] + ["<MID>"]
                + tk[i:j]
            )
            assert got[d] == (n, "psm", i, j, txt), d
        else:
            assert got[d] == (n, "plain", None, None, " ".join(tk)), d


def _fim_oracle_sql(parquet_path: str) -> str:
    from convert_parquet_to_csv_spark.functions.text import md5_long_sql

    sel = md5_long_sql("doc_id", "fim-sel:")
    ui = md5_long_sql("doc_id", "fim-i:")
    uj = md5_long_sql("doc_id", "fim-j:")
    return f"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'),
                     t -> t != '') AS tk
  FROM '{parquet_path}'
), base AS (
  SELECT doc_id, tk, len(tk) AS n,
         ({sel} % 2 = 0) AND (len(tk) >= 3) AS sel,
         {ui} % (len(tk) + 1) AS a,
         {uj} % (len(tk) + 1) AS b
  FROM tok
), split AS (
  SELECT doc_id, tk, n, sel,
         least(a, b) AS i, greatest(a, b) AS j
  FROM base
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CASE WHEN sel THEN 'psm' ELSE 'plain' END AS mode,
       CASE WHEN sel THEN CAST(i AS BIGINT) END AS i_split,
       CASE WHEN sel THEN CAST(j AS BIGINT) END AS j_split,
       CASE WHEN sel THEN array_to_string(
            ['<PRE>'] || list_slice(tk, 1, i) || ['<SUF>']
            || list_slice(tk, j + 1, n) || ['<MID>']
            || list_slice(tk, i + 1, j), ' ')
         ELSE array_to_string(tk, ' ') END AS fim_text
FROM split
"""


def test_fim_gate_prevalidation_duckdb_replay(spark):
    """Future-registration gate design pre-validated tri-SF (the
    day-one rule's oracle, run in-suite until a gate slot opens —
    the WAV/BMP device): fim_transform on the documents table vs the
    full DuckDB replay of the md5 split-point chain, value-exact at
    sf0.001, sf0.01 AND sf0.1."""
    import os

    import duckdb

    from convert_parquet_to_csv_spark.operators.chunking import (
        fim_transform,
    )

    base = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        path = os.path.join(base, sf, "documents.parquet")
        docs = spark.read.parquet(path).select("doc_id", "text")
        got = {
            r["doc_id"]: (
                r["n_tokens"],
                r["mode"],
                r["i_split"],
                r["j_split"],
                r["fim_text"],
            )
            for r in fim_transform(docs).collect()
        }
        con = duckdb.connect()
        want = {
            r[0]: tuple(r[1:])
            for r in con.sql(_fim_oracle_sql(path)).fetchall()
        }
        assert got == want, sf
        # the transform actually fires: both modes present
        modes = {v[1] for v in got.values()}
        assert modes == {"psm", "plain"}, sf


def test_fim_transform_edges_and_reassembly(spark):
    """Edge docs (empty, blank, sub-min_tokens, control-char tokens,
    messy whitespace) + the reassembly invariant: stripping the
    three tags and re-ordering PSM -> prefix middle suffix must
    reproduce the whitespace-normalized token stream exactly."""
    import hashlib

    from convert_parquet_to_csv_spark.operators.chunking import (
        fim_transform,
    )

    docs = spark.createDataFrame(
        [
            (0, ""),
            (1, "   "),
            (2, "one"),
            (3, "one two"),
            (4, "a b c"),
            (5, " a\tb\nc  d \x01e "),
            (6, None),
            (7, "w x y z " * 10),
        ],
        "doc_id LONG, text STRING",
    )
    got = {r["doc_id"]: r.asDict() for r in fim_transform(docs).collect()}
    assert set(got) == set(range(8))

    def h(salt, x):
        return int(
            hashlib.md5(f"{salt}{x}".encode()).hexdigest()[:15], 16
        )

    for d, text in [
        (0, ""), (1, "   "), (2, "one"), (3, "one two"),
        (4, "a b c"), (5, " a\tb\nc  d \x01e "), (7, "w x y z " * 10),
    ]:
        tk = text.split()
        n = len(tk)
        r = got[d]
        assert r["n_tokens"] == n
        if n < 3 or h("fim-sel:", d) % 2 != 0:
            assert r["mode"] == "plain"
            assert r["fim_text"] == " ".join(tk)
            assert r["i_split"] is None and r["j_split"] is None
        else:
            assert r["mode"] == "psm"
            i, j = r["i_split"], r["j_split"]
            assert 0 <= i <= j <= n
            out = r["fim_text"].split()
            # strip tags, reorder PSM -> original
            p_at = out.index("<PRE>")
            s_at = out.index("<SUF>")
            m_at = out.index("<MID>")
            prefix = out[p_at + 1 : s_at]
            suffix = out[s_at + 1 : m_at]
            middle = out[m_at + 1 :]
            assert prefix + middle + suffix == tk
    # NULL text propagates as NULLs, plain mode
    assert got[6]["n_tokens"] is None
    assert got[6]["fim_text"] is None
    assert got[6]["mode"] == "plain"


def test_md5_long_pair_cross_engine(spark):
    """The shared house-RNG pair: functions.text.md5_long (Spark)
    and md5_long_sql (DuckDB rendering) agree value-for-value over
    ids and salts — the one rule every new deterministic-selection
    consumer (FIM splits, noise flips, future gates) inherits."""
    import duckdb

    ids = list(range(0, 2000, 7)) + [10**12, 10**15]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id LONG")
    # "it's:" pins the ADVICE r11 escaping fix: a single quote in the
    # salt must render a VALID oracle literal that still agrees
    for salt in ("", "fim-sel:", "x:", "it's:"):
        got = {
            r["doc_id"]: r["v"]
            for r in df.select(
                "doc_id", T.md5_long("doc_id", salt=salt).alias("v")
            ).collect()
        }
        con = duckdb.connect()
        want = dict(
            con.sql(
                "SELECT doc_id, "
                + T.md5_long_sql("doc_id", salt=salt)
                + " AS v FROM (SELECT unnest(?) AS doc_id)",
                params=[ids],
            ).fetchall()
        )
        assert got == want, salt
        assert all(v >= 0 for v in got.values())

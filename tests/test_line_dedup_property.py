"""Property-based cross-check of the r8 removal family against
independent pure-Python references: for random corpora (tiny line /
token vocabularies so real duplicates occur, plus NULL and blank
degenerates), Spark's ``remove_duplicated_lines`` must equal the
keep-global-first line rule exactly, and ``remove_within_doc_repeats``
the keep-first in-document gram rule — clean text, kept and removed
counts, and the NULL contract, row for row."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from convert_parquet_to_csv_spark.operators import dedup as D

# tiny vocabularies → real cross-doc collisions in a handful of docs
_LINES = ["footer x", "menu a b", "alpha", "beta c", "", "  "]
_WORDS = [f"w{i}" for i in range(5)]

_line_docs = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.sampled_from(_LINES), min_size=0, max_size=6),
    ),
    min_size=1,
    max_size=5,
)

_word_docs = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=16),
    ),
    min_size=1,
    max_size=4,
)


def _ref_line_dedup(rows: list[tuple[int, str | None]]) -> dict:
    """Keep-global-first by (doc_id, line_pos); blank/whitespace-only
    lines and singletons never removed; NULL text -> (NULL, 0, 0)."""
    first: dict[str, tuple] = {}
    counts: dict[str, int] = {}
    for i, text in rows:
        if text is None:
            continue
        for p, line in enumerate(text.split("\n")):
            if "".join(line.split()):  # non-blank (any whitespace)
                first.setdefault(line, (i, p))
                counts[line] = counts.get(line, 0) + 1
    out = {}
    for i, text in rows:
        if text is None:
            out[i] = (None, 0, 0)
            continue
        lines = text.split("\n")
        kept = [
            ln
            for p, ln in enumerate(lines)
            if not "".join(ln.split())
            or counts[ln] == 1
            or first[ln] == (i, p)
        ]
        out[i] = ("\n".join(kept), len(kept), len(lines) - len(kept))
    return out


def _ref_within_doc(text: str | None, k: int) -> tuple:
    if text is None:
        return (None, 0, 0)
    toks = text.split()
    firsts: dict[tuple, int] = {}
    covered: set[int] = set()
    for p in range(max(len(toks) - k + 1, 0)):
        g = tuple(toks[p : p + k])
        if g in firsts:
            covered.update(range(p, p + k))
        else:
            firsts[g] = p
    kept = [w for i, w in enumerate(toks) if i not in covered]
    return (" ".join(kept), len(kept), len(toks) - len(kept))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_line_docs)
def test_line_dedup_matches_python_reference(spark, docs):
    rows = [
        (i, None if lines is None else "\n".join(lines))
        for i, lines in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (
            r["clean_text"], r["n_lines_kept"], r["n_lines_removed"]
        )
        for r in D.remove_duplicated_lines(df).collect()
    }
    assert got == _ref_line_dedup(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_word_docs, k=st.integers(2, 3))
def test_within_doc_repeats_matches_python_reference(spark, docs, k):
    rows = [
        (i, None if toks is None else " ".join(toks))
        for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_removed"])
        for r in D.remove_within_doc_repeats(df, k=k).collect()
    }
    want = {i: _ref_within_doc(text, k) for i, text in rows}
    assert got == want


# paragraphs: tiny paragraph vocabulary, docs join them with "\n\n"
_PARAS = ["footer x\nmenu a", "alpha b", "beta\nc d", "solo"]

_para_docs = st.lists(
    st.one_of(
        st.none(),
        st.lists(st.sampled_from(_PARAS), min_size=0, max_size=5),
    ),
    min_size=1,
    max_size=5,
)


def _ref_para_dedup(rows: list[tuple[int, str | None]]) -> dict:
    """Keep-global-first at \\n\\n+ granularity; reassembly uses the
    kernel's normalized single newline between kept paragraphs."""
    import re

    first: dict[str, tuple] = {}
    counts: dict[str, int] = {}
    split = lambda t: re.split(r"\n{2,}", t)  # noqa: E731
    for i, text in rows:
        if text is None:
            continue
        for p, para in enumerate(split(text)):
            if "".join(para.split()):
                first.setdefault(para, (i, p))
                counts[para] = counts.get(para, 0) + 1
    out = {}
    for i, text in rows:
        if text is None:
            out[i] = (None, 0, 0)
            continue
        paras = split(text)
        kept = [
            pa
            for p, pa in enumerate(paras)
            if not "".join(pa.split())
            or counts[pa] == 1
            or first[pa] == (i, p)
        ]
        out[i] = ("\n".join(kept), len(kept), len(paras) - len(kept))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=_para_docs)
def test_paragraph_dedup_matches_python_reference(spark, docs):
    """The r9 paragraph knob (VERDICT r8 item 7): the same kernel at
    sep_regex='\\n{2,}' must equal the keep-global-first paragraph
    rule — paragraphs keep their INTERNAL single newlines, and kept
    paragraphs re-join with the normalized single newline."""
    rows = [
        (i, None if paras is None else "\n\n".join(paras))
        for i, paras in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: (
            r["clean_text"], r["n_lines_kept"], r["n_lines_removed"]
        )
        for r in D.remove_duplicated_lines(
            df, sep_regex=r"\n{2,}"
        ).collect()
    }
    assert got == _ref_para_dedup(rows)


def test_synth_token_paragraphs_shape(spark):
    """4-token lines, 2-line paragraphs, '\\n\\n' between paragraphs;
    NULL -> NULL, token-less -> ''; ragged tails stay ragged."""
    from pyspark.sql import functions as F

    from convert_parquet_to_csv_spark.functions.text import (
        synth_token_paragraphs,
    )

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 3 lines
            (2, "a b"),
            (3, ""),
            (4, None),
        ],
        "doc_id LONG, text STRING",
    ).select(
        "doc_id", synth_token_paragraphs("text").alias("p")
    )
    got = {r["doc_id"]: r["p"] for r in df.collect()}
    assert got[1] == "t0 t1 t2 t3\nt4 t5 t6 t7\n\nt8 t9"
    assert got[2] == "a b"
    assert got[3] == ""
    assert got[4] is None


def test_null_id_contract_matches_oracle_all_three_gates(
    spark, tmp_path
):
    """NULL-id rows are EXCLUDED from every cross-row election and
    pass through intact (review r9): the three removal-family gated
    queries and their DuckDB oracles must agree on a fixture that
    actually CONTAINS NULL ids — two NULL-id copies of boilerplate a
    real doc also holds (the case where the old null-unsafe joins
    silently diverged: oracle said ('', 0, 0), kernel kept text)."""
    import duckdb

    from convert_parquet_to_csv_spark.plans import registry

    registry.load_all()
    boiler = " ".join(f"b{i}" for i in range(8))
    rows = [
        (1, f"{boiler} unique one tail"),
        (2, f"lead in {boiler}"),
        (None, boiler),
        (None, boiler + " again again"),
        (3, None),
        (None, None),
    ]
    fixture = str(tmp_path / "documents.parquet")
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING"
    ).coalesce(1).write.parquet(fixture)
    sf_dir = str(tmp_path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fixture}/*.parquet')"
    )
    for name in (
        "line_dedup_boilerplate",
        "paragraph_dedup_boilerplate",
        "dedup_within_doc_repeats",
    ):
        got = sorted(
            map(tuple, registry.QUERIES[name](spark, sf_dir).collect()),
            key=repr,
        )
        want = sorted(
            map(tuple, con.execute(registry.ORACLES[name]).fetchall()),
            key=repr,
        )
        assert got == want, name
        spark.catalog.clearCache()
        # and the NULL-id rows really passed through un-deduped
        nulls = [r for r in got if r[0] is None]
        assert len(nulls) == 3, name
        assert all(
            (r[1] is None and r[2] == 0) or r[2] > 0 or r[1] == ""
            for r in nulls
        ), name

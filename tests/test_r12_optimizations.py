"""Equivalence pins for the r12 optimization-round rewrites.

Each r12 physical rewrite claims RESULT-IDENTICAL output; the tri-SF
oracle replays prove it on the fixtures, and these tests pin it on
the adversarial edge cases the fixtures may not exercise — so a
future refactor of either form cannot silently diverge from the
other.

1. ``hashed_ngram_buckets(hash_fn='md5')``: exploded-position codegen
   form vs a reference reimplementation of the pre-r12 per-doc
   ``ngrams()`` + flatten + explode form (byte-identical gram strings
   => identical md5 buckets).
2. ``dot_product_fixed`` / ``sq_l2_fixed``: unrolled F.get arithmetic
   vs the zip_with/aggregate HOF forms — bit-identical doubles,
   including NULL-element and short-array propagation.
3. ``_gopher_gram_masses``: the single doc-keyed exchange form vs the
   declared masses on hand-computed inputs (repetition arithmetic
   unchanged by the exchange consolidation).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from convert_parquet_to_csv_spark.functions.text import ngrams
from convert_parquet_to_csv_spark.functions.vectors import (
    dot_product,
    dot_product_fixed,
    sq_l2_fixed,
)
from convert_parquet_to_csv_spark.operators.curation import (
    _gopher_gram_masses,
    hashed_ngram_buckets,
)

EDGE_DOCS = [
    (1, "the cat sat on the mat"),
    (2, ""),  # no tokens
    (3, None),  # NULL text
    (4, "   "),  # whitespace-only -> no tokens
    (5, "single"),  # 1 token: unigram only, no bigram
    (6, "a  b\t\tc\nd"),  # multi-whitespace separators collapse
    (7, "Mixed CASE Tokens mixed case tokens"),  # lowercasing
    (8, "naïve café 東京 emoji🎉 tail"),  # non-ASCII bytes through md5
    (9, "x " * 200),  # long repetitive doc (within-doc duplicates)
    (None, "null id row keeps flowing"),  # NULL id not dropped here
]


def _ref_md5_buckets(df, num_buckets, ngram_ns):
    """The pre-r12 md5 branch, verbatim: per-doc ngrams() string
    arrays, flattened and exploded, then md5 -> 15-hex-digit parse ->
    pmod."""
    grams = F.flatten(
        F.array(*[ngrams("text", n=n) for n in ngram_ns])
    )
    return df.select(
        F.col("doc_id"), F.explode(grams).alias("_g")
    ).select(
        "doc_id",
        F.pmod(
            F.conv(
                F.substring(F.md5(F.col("_g")), 1, 15), 16, 10
            ).cast("long"),
            F.lit(num_buckets),
        ).alias("_b"),
    )


def test_md5_bucket_rewrite_matches_ngrams_reference(spark):
    df = spark.createDataFrame(
        EDGE_DOCS,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        ),
    )
    for ngram_ns in [(1, 2), (2,), (1, 2, 3)]:
        got = (
            hashed_ngram_buckets(
                df, "doc_id", "text", 512, ngram_ns, "md5"
            )
            .groupBy("doc_id", "_b")
            .count()
            .orderBy("doc_id", "_b")
            .collect()
        )
        want = (
            _ref_md5_buckets(df, 512, ngram_ns)
            .groupBy("doc_id", "_b")
            .count()
            .orderBy("doc_id", "_b")
            .collect()
        )
        assert got == want, f"ngram_ns={ngram_ns}"


VEC_ROWS = [
    (1, [1.0, 2.0, 3.0, 4.0], [0.5, -1.5, 2.5, -3.5]),
    (2, [0.0, 0.0, 0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),
    (3, [1e30, -1e30, 1e-30, 7.0], [2.0, 2.0, 2.0, 2.0]),  # magnitude mix
    (4, [1.0, None, 3.0, 4.0], [1.0, 1.0, 1.0, 1.0]),  # NULL element
    (5, [1.0, 2.0], [1.0, 1.0, 1.0, 1.0]),  # short left side
    (6, None, [1.0, 1.0, 1.0, 1.0]),  # NULL array
    (7, [-0.0, 0.0, -0.0, 0.0], [1.0, 1.0, 1.0, 1.0]),  # signed zeros
    # BOTH sides short (ADVICE r12): the one case where the forms
    # intentionally diverge — zip_with pads nothing and returns the
    # finite 2-term sum, the unrolled form returns NULL (the safer
    # output for an undersized vector). Asserted as a divergence
    # below so the contract cannot drift silently.
    (8, [1.0, 2.0], [3.0, 4.0]),
]

_VEC_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("a", ArrayType(FloatType())),
        StructField("b", ArrayType(FloatType())),
    ]
)


def test_dot_product_fixed_bitwise_matches_hof(spark):
    df = spark.createDataFrame(VEC_ROWS, _VEC_SCHEMA)
    rows = df.select(
        "id",
        dot_product("a", "b").alias("hof"),
        dot_product_fixed("a", "b", 4).alias("unrolled"),
    ).collect()
    by_id = {r.id: r for r in rows}
    for r in rows:
        if r.id == 8:
            continue  # the documented both-short divergence, below
        # bitwise: both NULL or exactly equal doubles
        assert (r.hof is None) == (r.unrolled is None), r
        if r.hof is not None:
            assert r.hof == r.unrolled, r
    # NULL/one-side-short inputs must propagate to NULL in BOTH forms
    assert by_id[4].hof is None and by_id[4].unrolled is None
    assert by_id[5].hof is None and by_id[5].unrolled is None
    assert by_id[6].hof is None and by_id[6].unrolled is None
    # both-sides-short (id 8): intentional divergence — HOF sums the
    # 2 available terms (1*3 + 2*4 = 11), unrolled declares NULL.
    assert by_id[8].hof == 11.0 and by_id[8].unrolled is None


def test_sq_l2_fixed_bitwise_matches_hof(spark):
    df = spark.createDataFrame(VEC_ROWS, _VEC_SCHEMA)
    hof = F.aggregate(
        F.zip_with(
            "a",
            "b",
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = df.select(
        "id",
        hof.alias("hof"),
        sq_l2_fixed("a", "b", 4).alias("unrolled"),
    ).collect()
    for r in rows:
        if r.id == 8:
            # both-sides-short divergence (see dot test): HOF sums 2
            # terms ((1-3)^2 + (2-4)^2 = 8), unrolled declares NULL.
            assert r.hof == 8.0 and r.unrolled is None
            continue
        assert (r.hof is None) == (r.unrolled is None), r
        if r.hof is not None:
            assert r.hof == r.unrolled, r


def test_gopher_masses_consolidated_exchange_values(spark):
    # "w w w w" (4x 1-char token): top 2-gram "w w" count 3, len 3 ->
    # tm2 = 9; dup mass n=2: 3*3 = 9; n=3 gram "w w w" count 2 len 5
    # -> tm3 = 10, dm5..10 absent (doc too short for n >= 5 to repeat
    # ... n=5+ grams need >= 5 tokens; none here).
    df = spark.createDataFrame(
        [(1, "w w w w"), (2, "a b"), (3, "")],
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("text", StringType()),
            ]
        ),
    )
    rows = {
        r.doc_id: r
        for r in _gopher_gram_masses(df, "doc_id", "text").collect()
    }
    assert rows[1]._tm2 == 9  # "w w" occurs 3x, 3 chars
    assert rows[1]._dm5 == 0
    assert rows[2]._tm2 == 3  # "a b" once, 3 chars, count 1
    assert rows[2]._dm5 == 0 and rows[2]._dm6 == 0
    assert 3 not in rows  # token-less docs absent (caller coalesces)

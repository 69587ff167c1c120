"""Property-based parquet→CSV→readback roundtrip tests (SURVEY.md §5.2
layer 2): randomized values over the §1.2 type surface — ints, doubles,
strings (quotes, commas, newlines, unicode), timestamps, nulls.

The core correctness statement of a conversion engine: readback with
the original schema equals the original data, modulo CSV's inherent
type erasure (documented normalizations below).
"""

from __future__ import annotations

import datetime as dt
import math
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from convert_parquet_to_csv_spark.sources import (
    convert_parquet_to_csv,
    read_csv,
    read_parquet,
)

# CSV-erasure normalization: empty string is indistinguishable from
# NULL in the pinned dialect (both render as "", like the reference's
# engines); NaN compares equal to itself.
def _norm(v):
    if isinstance(v, str) and v == "":
        return None
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


# \x00 exclusion: NUL is outside the supported CSV dialect — the
# writer emits it verbatim, but univocity (Spark's CSV parser) uses
# '\0' as an internal no-character sentinel and silently drops a
# quoted value's TRAILING NUL on readback (interior and unquoted NULs
# survive). Hypothesis found the edge ('\n\x00'); the exact behavior
# is pinned by tests/test_io_ops.py::test_csv_nul_byte_dialect_edge.
_strings = st.one_of(
    st.none(),
    st.text(
        alphabet=st.characters(
            codec="utf-8",
            exclude_categories=("Cs",),
            exclude_characters="\r\x00",
        ),
        max_size=40,
    ),
)
_ints = st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1))
_longs = st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1))
_doubles = st.one_of(
    st.none(),
    st.floats(allow_infinity=True, allow_nan=True, width=64),
)
_timestamps = st.one_of(
    st.none(),
    st.datetimes(
        min_value=dt.datetime(1900, 1, 1),
        max_value=dt.datetime(2099, 12, 31, 23, 59, 59, 999999),
    ),
)

_rows = st.lists(
    st.tuples(_ints, _longs, _doubles, _strings, _timestamps),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_rows)
def test_roundtrip_random_rows(spark, tmp_path_factory, rows):
    base = str(tmp_path_factory.mktemp("prop_rt"))
    src, dst = os.path.join(base, "src.parquet"), os.path.join(base, "out_csv")
    schema = "a INT, b LONG, c DOUBLE, s STRING, t TIMESTAMP"
    df = spark.createDataFrame(rows, schema)
    df.write.mode("overwrite").parquet(src)

    convert_parquet_to_csv(spark, src, dst)
    back = read_csv(spark, dst, schema=read_parquet(spark, src).schema)

    want = sorted(
        (tuple(_norm(v) for v in r) for r in rows), key=repr
    )
    got = sorted(
        (tuple(_norm(v) for v in r) for r in back.collect()), key=repr
    )
    assert got == want

"""Vector math over ``array<float>`` embedding columns — pure built-in
expressions (JVM, codegen), no UDFs.

Accumulation is float64 left-to-right (``aggregate`` over
element-cast-to-double), the same sequential order DuckDB's list
functions use — keeping similarity values bitwise comparable for the
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate — whole-stage codegen."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    return F.sqrt(dot_product(a, a))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a,b); 0.0 when either vector is all-zero (defined, not NaN)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def l2_normalize(a: Column | str) -> Column:
    """x / ‖x‖ elementwise (double); all-zero vectors pass through
    unscaled (division guard) rather than producing NaNs."""
    v = _c(a)
    n = l2_norm(v)
    return F.when(
        n > 0, F.transform(v, lambda x: x.cast("double") / n)
    ).otherwise(F.transform(v, lambda x: x.cast("double")))


def quantize_int8(a: Column | str, scale: Column | None = None) -> Column:
    """Symmetric int8 quantization: round(x·127/max|x|) per element.

    Rounding is ``floor(y + 0.5)`` — round-half-up for either sign,
    chosen because both Spark and DuckDB evaluate it bit-identically
    (native ``round`` functions disagree on ties across engines).
    Returns array<int> in [-127, 127]; the companion scale factor is
    :func:`quantize_scale` (store both — dequantize is x·max|x|/127).
    """
    v = _c(a)
    s = scale if scale is not None else quantize_scale(v)
    return F.transform(
        v,
        lambda x: F.floor(x.cast("double") * s + F.lit(0.5)).cast("int"),
    )


def quantize_scale(a: Column | str) -> Column:
    """127 / max|x| (0-safe): the per-vector quantization factor."""
    v = _c(a)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    return F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))

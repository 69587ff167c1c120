"""Approximate sketch operators: HLL distinct counting, quantile sketch.

The reference computes nothing approximate (SURVEY.md §2.1 has no
aggregation at all), but at 100 TB exact COUNT(DISTINCT) is a shuffle
of every distinct value and exact percentiles hold whole groups in
memory. Sketches are the scale path, and both engines Spark ships are
*mergeable* — the property that matters on a cluster:

- **HLL (Apache DataSketches)**: `hll_sketch_agg` builds a fixed
  2^lgConfigK-byte sketch per group on each partition, partial-merges
  map-side, and `hll_union_agg` merges sketches across groups / days /
  tables without rescanning rows. Standard error ≈ 1.04/sqrt(2^lgK)
  (~0.8% at lgK=14).
- **percentile_approx (Greenwald-Khanna variant)**: bounded-memory
  quantile summary with a *rank* guarantee — the returned value's rank
  is within 1/accuracy of the requested percentile.

Both stay entirely JVM-side (no Python row path) and both replace
their exact counterparts at one call site each
(plans/relational_queries.py documents the swap in the other
direction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketches(df: DataFrame, key: str, col: str, lgk: int = 14) -> DataFrame:
    """Per-``key`` HLL sketches of distinct ``col`` values.

    Returns ``(key, hll_sketch binary)`` — keep the sketch, not just
    the estimate: sketches re-aggregate (day → month → all-time) while
    estimates don't.
    """
    return df.groupBy(key).agg(
        F.hll_sketch_agg(F.col(col).cast("string"), F.lit(lgk)).alias("hll_sketch")
    )


def hll_estimate(sketches: DataFrame) -> DataFrame:
    """Estimated distinct count per key from stored sketches."""
    return sketches.select(
        *[c for c in sketches.columns if c != "hll_sketch"],
        F.hll_sketch_estimate("hll_sketch").alias("n_distinct_est"),
    )


def hll_merge_estimate(sketches: DataFrame) -> Column:
    """Merge ALL stored sketches into one global estimate (aggregate
    expression) — the cross-group union that exact COUNT(DISTINCT)
    can't do without a rescan."""
    return F.hll_sketch_estimate(F.hll_union_agg("hll_sketch"))


def cms_tables(
    df: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of ``col`` as a (row, bucket, count) table.

    The classic heavy-hitter sketch expressed as one declarative plan:
    each input row hashes into ``depth`` buckets (xxhash64 seeded by
    the row index, mod ``width``), and ONE groupBy builds all d×w
    counters with map-side partial aggregation — the shuffle carries
    at most depth·width rows per partition, independent of data size.
    The counter table is mergeable across partitions/days by summing
    counts (the same property the HLL sketches above rely on).
    """
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("_row"),
                    F.pmod(
                        F.xxhash64(F.lit(j), F.col(col)), F.lit(width)
                    ).alias("_bucket"),
                )
                for j in range(depth)
            ]
        )
    ).alias("_rb")
    return (
        df.select(rows)
        .select("_rb._row", "_rb._bucket")
        .groupBy("_row", "_bucket")
        .agg(F.count("*").alias("_count"))
    )


def cms_estimate(
    keys: DataFrame,
    cms: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: est(k) = min over rows of the counter
    at (row, hash_row(k)).

    CMS guarantees est ≥ true count ALWAYS (hash collisions only ever
    add), and est ≤ true + εN with probability 1-δ (ε = e/width,
    δ = e^-depth). ``keys`` must use the same depth/width/hash family
    as the sketch. Adds ``cms_count`` to ``keys``; the join is against
    the ≤ d·w-row counter table, broadcast-small by construction.
    """
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("_row"),
                        F.pmod(
                            F.xxhash64(F.lit(j), F.col(col)),
                            F.lit(width),
                        ).alias("_bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_rb"),
    ).select("*", "_rb._row", "_rb._bucket").drop("_rb")
    joined = probes.join(F.broadcast(cms), ["_row", "_bucket"], "left")
    group_cols = [c for c in keys.columns]
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.min(F.coalesce("_count", F.lit(0))).alias("cms_count")
        )
    )


def approx_quantiles(
    df: DataFrame,
    key: str,
    col: str,
    probs: list[float],
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-key approximate percentiles (rank error ≤ 1/accuracy).

    One map-side-combinable aggregation; memory is O(accuracy) per
    group regardless of group size — the property exact ``percentile``
    lacks.
    """
    arr = F.array(*[F.lit(p) for p in probs])
    q = F.percentile_approx(col, arr, F.lit(accuracy)).alias("_q")
    out = df.groupBy(key).agg(q)
    return out.select(
        key,
        *[
            F.col("_q")[i].alias(f"p{int(p * 100):02d}")
            for i, p in enumerate(probs)
        ],
    )

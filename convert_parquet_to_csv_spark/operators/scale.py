"""Scale techniques: bucketed co-located joins, salted skew joins.

Neither exists in the reference (single-process, ≤10M rows), but both
are load-bearing at 100 TB:

- **Bucketing** pre-shuffles a table once at write time
  (``bucketBy(n, key)``): every later equi-join or aggregation on the
  bucket key reads co-located partitions and skips its Exchange
  entirely. Amortizes the big-fact-join shuffle across every query
  that touches the table — the Spark-native answer to the "co-located
  join" row of the scale checklist.

- **Salting** splits a hot join key across ``n_salts`` artificial
  sub-keys: the left side gets a random salt, the small side is
  replicated once per salt value, and the join key becomes
  (key, salt) — a hot key's rows now land on ``n_salts`` tasks
  instead of one straggler. Complements AQE's skew-join splitting
  (which handles moderate skew automatically); explicit salting is
  for the pathological keys you know about.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table.

    Joins/aggregations between tables bucketed on the same key with
    the same bucket count run shuffle-free (verified: zero Exchange
    in the executed plan — tests/test_scale.py). Sorting within
    buckets additionally enables merge-join without a sort step.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_by
    )
    if sort_by is not None:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a saved (possibly bucketed) table; bucket metadata comes
    from the catalog, so the bucketed-join optimization applies."""
    return spark.table(table)


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet location into right-sized files; returns the
    new file count.

    The small-files problem is the dominant operational failure at
    scale: a streaming or per-batch writer leaves thousands of KB-size
    files per partition, and every later scan pays per-file open cost
    (plus driver memory for the file index). Compaction = read →
    repartition to ⌈bytes/target⌉ → atomic-ish rewrite (write to a
    sibling temp dir, then swap) — run it per landed partition, not
    over the whole table.

    ``partition_by`` preserves a hive layout through the rewrite
    (files are compacted *within* each partition directory via one
    extra repartition column).
    """
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    size = fs.getContentSummary(hpath).getLength()
    n_files = max(1, -(-size // target_file_bytes))  # ceil

    df = spark.read.parquet(path)
    if partition_by:
        df = df.repartition(int(n_files), *partition_by)
    else:
        df = df.repartition(int(n_files))
    tmp = path.rstrip("/") + "._compact_tmp"
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(tmp)

    # Hadoop FileSystem reports most failures as a False return, not an
    # exception — an unchecked swap can silently lose the table (the
    # same contract upsert_parquet enforces for its swap).
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    if not fs.delete(hpath, True):
        raise IOError(
            f"compact_parquet: delete of {path} failed; compacted data "
            f"is intact at {tmp}"
        )
    if not fs.rename(tmp_path, hpath):
        raise IOError(
            f"compact_parquet: rename {tmp} -> {path} failed after "
            f"delete; compacted data is intact at {tmp}"
        )

    out = 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        if it.next().getPath().getName().endswith(".parquet"):
            out += 1
    return out


def write_range_partitioned(
    df: DataFrame,
    path: str,
    range_by: str,
    n_partitions: int = 32,
) -> None:
    """Persist ``df`` with a global range layout on ``range_by``.

    ``repartitionByRange`` samples the column, computes balanced range
    bounds, and shuffles once so file *i* holds a contiguous key range;
    ``sortWithinPartitions`` orders rows inside each file. The payoff
    is at read time: parquet row-group min/max statistics become tight
    under this layout, so a range predicate on ``range_by`` skips
    whole files and row groups instead of scanning everything —
    poor-man's zone maps, no index structure needed. The same layout
    also feeds merge-joins and ordered exports without a re-sort.

    One shuffle at write time, amortized over every later range scan —
    the time-series/date-keyed analog of :func:`write_bucketed`.
    """
    (
        df.repartitionByRange(n_partitions, range_by)
        .sortWithinPartitions(range_by)
        .write.mode("overwrite")
        .parquet(path)
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to hot keys on the (large) left side.

    The left side gets a uniform random salt in [0, n_salts); the
    right side is replicated ``n_salts``× via an exploded literal
    array (map-side, no shuffle of the original rows beyond the join
    itself). The join key becomes (on, salt).

    Results are identical to ``left.join(right, on, how)`` only for
    the salt-safe modes (inner, left outer, left semi, left anti):
    every left row carries exactly one salt, and the right side is
    replicated across all salts, so each left row sees the full right
    key set exactly once. Right/full outer are rejected — an unmatched
    right row exists once per salt replica and would be emitted
    ``n_salts`` times.

    Use when one side is too big to broadcast AND specific keys are
    pathologically hot; for moderate skew prefer AQE
    (``spark.sql.adaptive.skewJoin.enabled``, on by default here).
    """
    safe = {
        "inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "left_anti", "leftanti",
    }
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} is not salt-safe (unmatched "
            f"right rows would be replicated {n_salts}x); use "
            f"inner/left/left_semi/left_anti, or an unsalted join"
        )
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    l_s = left.withColumn(
        "_salt", (F.rand() * n_salts).cast("int")
    )
    r_s = right.withColumn("_salt", F.explode(salts))
    out = l_s.join(r_s, [on, "_salt"], how)
    return out.drop("_salt")


def _spread_bits16(c: Column) -> Column:
    """Interleave-ready bit spread: 16-bit value → even bit positions
    of a 32-bit word (classic magic-number spreading, expressed as
    Column bit ops so it stays in codegen)."""
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF).cast("long"))
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)):
        x = (
            x.bitwiseOR(F.shiftleft(x, shift))
            .bitwiseAND(F.lit(mask).cast("long"))
        )
    return x


def morton_code(a: Column, b: Column) -> Column:
    """Z-order (Morton) interleave of two 16-bit dimensions.

    Sorting by the interleaved code clusters rows that are close in
    BOTH dimensions into the same files/row groups, so parquet min/max
    stats prune 2-D range predicates — one clustered layout serving
    two predicate columns, where a plain sort serves only its leading
    column. Inputs are clamped to [0, 65535]; pre-bucket wider domains
    first (e.g. days-since-epoch, id % 65536 is NOT order-preserving —
    use a monotone rescale).
    """
    ca = F.least(F.greatest(a.cast("long"), F.lit(0)), F.lit(0xFFFF))
    cb = F.least(F.greatest(b.cast("long"), F.lit(0)), F.lit(0xFFFF))
    return _spread_bits16(ca).bitwiseOR(
        F.shiftleft(_spread_bits16(cb), 1)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    dim_a: Column,
    dim_b: Column,
    n_partitions: int = 32,
) -> None:
    """Persist ``df`` clustered by the Morton code of two dimensions —
    the multi-column analog of :func:`write_range_partitioned` (one
    shuffle at write, 2-D file/row-group skipping at every later read).
    """
    (
        df.withColumn("_z", morton_code(dim_a, dim_b))
        .repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def exact_rank_boundaries(
    df: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    coarse_shift: int = 16,
) -> DataFrame:
    """Exact order-statistic bucket boundaries WITHOUT a global sort —
    the at-scale replacement for ``NTILE``'s single-task ordering.

    Returns a 1-row DataFrame with column ``bs``: the sorted array of
    (at most) ``n_buckets - 1`` boundary values, where boundary k is
    the exact order statistic at rank ``ceil(n*k/n_buckets)`` over an
    integer ``value_col``. Assign buckets map-side as "count of
    boundaries strictly below the value" (broadcast the 1-row
    result); equal values always share a bucket, so bucket
    populations are equal only up to ties — the documented trade
    for map-side assignment.

    Plan (two-level histogram rank, all lazy — no driver action):

    1. value-frequency histogram ``groupBy(value)`` — the only
       data-proportional shuffle;
    2. coarse buckets ``value >> coarse_shift``: cumulative offsets
       via a broadcast non-equi self-join over the coarse table,
       whose size is bounded by the VALUE RANGE (scale-independent),
       never by row count — and never an unpartitioned window;
    3. running counts within each coarse bucket (window PARTITIONED
       by coarse key) + offsets → every distinct value knows its
       global rank interval [rank_end - cnt + 1, rank_end];
    4. targets ``ceil(n*k/n_buckets)`` from a lazy 1-row total ×
       ``spark.range``; each target picks the unique value whose
       rank interval covers it via a broadcast interval join over
       n_buckets - 1 rows.

    Negative values order correctly through the shifted coarse key
    (``shiftright`` is arithmetic, so coarse keys stay
    sign-ordered). Gated end-to-end by ``decile_binning_mapside``
    (plans/analytics_queries.py) against a DuckDB ROW_NUMBER oracle
    at sf0.001/0.01/0.1; edge cases (ties, n < n_buckets, all-equal,
    empty) are pinned in tests/test_scale.py.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    v = df.select(F.col(value_col).alias("_v"))
    hist = v.groupBy("_v").agg(F.count(F.lit(1)).alias("_cnt"))
    hist = hist.withColumn(
        "_coarse", F.shiftright(F.col("_v"), coarse_shift)
    )
    coarse = hist.groupBy("_coarse").agg(F.sum("_cnt").alias("_ccnt"))
    below = coarse.select(
        F.col("_coarse").alias("_bc"), F.col("_ccnt").alias("_bcnt")
    )
    offsets = (
        coarse.join(
            F.broadcast(below), F.col("_bc") < F.col("_coarse"), "left"
        )
        .groupBy("_coarse")
        .agg(F.coalesce(F.sum("_bcnt"), F.lit(0)).alias("_offset"))
    )
    w_in = (
        Window.partitionBy("_coarse")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = hist.join(F.broadcast(offsets), "_coarse").select(
        "_v",
        "_cnt",
        (F.col("_offset") + F.sum("_cnt").over(w_in)).alias("_re"),
    )
    total = v.agg(F.count(F.lit(1)).alias("_n"))
    targets = total.crossJoin(
        spark.range(1, n_buckets).select(F.col("id").alias("_k"))
    ).select(
        F.expr(f"(_n * _k + {n_buckets - 1}) div {n_buckets}")
        .cast("bigint")
        .alias("_t")
    )
    return (
        ranked.join(
            F.broadcast(targets),
            (F.col("_re") >= F.col("_t"))
            & (F.col("_re") - F.col("_cnt") < F.col("_t")),
        )
        .select(F.col("_v").alias("_b"))
        .distinct()
        .agg(F.sort_array(F.collect_list("_b")).alias("bs"))
    )

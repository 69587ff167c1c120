"""MERGE/upsert for plain parquet tables (no table-format dependency).

The incremental-landing primitive every pipeline needs: apply a batch
of keyed changes (updates win over existing rows, unmatched keys
insert, optional delete markers remove) to a parquet location. Delta /
Iceberg do this transactionally; their jars are absent here
(documented non-goal), so this is the honest plain-parquet version:
read → merge → rewrite to a sibling temp dir → swap. The swap is
rename-based — atomic per directory on a real HDFS/object-store
committer, best-effort on local FS — and the merge itself is one plan:

    existing LEFT ANTI updates  (drop rows being replaced or deleted)
    UNION ALL (updates minus deletes)

i.e. one hash shuffle on the key, no driver-side row handling. At
100 TB you run this per partition directory (pass ``subdir``), never
over the whole table; the anti-join side carries only that partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def merge_upsert(
    existing: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """The merge plan (no I/O): updates win on key collision.

    ``delete_col``: optional boolean column on ``updates``; true rows
    act as tombstones — their keys vanish from the output and the
    marker column itself is dropped.
    """
    survivors = existing.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    )
    incoming = updates
    if delete_col is not None:
        incoming = incoming.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return survivors.unionByName(incoming)


def upsert_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    delete_col: str | None = None,
) -> None:
    """Apply ``updates`` to the parquet table at ``path`` in place
    (rewrite-and-swap; see module docstring for the atomicity story)."""
    existing = spark.read.parquet(path)
    merged = merge_upsert(existing, updates, key_cols, delete_col)

    tmp = path.rstrip("/") + "._upsert_tmp"
    merged.write.mode("overwrite").parquet(tmp)

    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    # Hadoop FileSystem reports most failures as a false return, not an
    # exception; an unchecked failed rename after the delete would lose
    # the table while appearing to succeed.
    if not fs.delete(hpath, True):
        raise IOError(f"upsert swap: failed to remove old table at {path}")
    if not fs.rename(tmp_path, hpath):
        raise IOError(
            f"upsert swap: rename {tmp} -> {path} failed; "
            f"merged data is intact at {tmp}"
        )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two table snapshots: added / removed /
    changed / unchanged — the CDC/migration audit primitive (what did
    the upsert actually do; did the backfill touch anything it
    shouldn't).

    One full-outer join on the key; change detection compares md5 over
    the normalized ``compare_cols`` rendering (NULL-safe via a sentinel)
    so arbitrarily wide rows diff by one string each. Returns
    (key_cols..., change) — aggregate downstream for counts.
    """
    cmp_cols = (
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in key_cols]
    )

    def _sig(df: DataFrame, name: str) -> DataFrame:
        fp = F.md5(
            F.concat_ws(
                "\x1f",
                *[
                    F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                    for c in cmp_cols
                ],
            )
        )
        return df.select(*key_cols, fp.alias(name))

    o = _sig(old, "_old_fp")
    n = _sig(new, "_new_fp")
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_old_fp").isNull(), "added")
        .when(F.col("_new_fp").isNull(), "removed")
        .when(F.col("_old_fp") != F.col("_new_fp"), "changed")
        .otherwise("unchanged")
    )
    return j.select(*key_cols, change.alias("change"))

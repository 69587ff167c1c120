"""Driver-checked queries: explicit scale techniques (operators/scale.py).

Both are *result-invariant* transformations — salting only changes row
placement, compaction only changes file layout — so each gets a plain
DuckDB oracle over the logical result, proving the scale machinery
never leaks into answers.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.operators.scale import (
    compact_parquet,
    salted_join,
)
from convert_parquet_to_csv_spark.plans.common import dec as _d
from convert_parquet_to_csv_spark.plans.common import load_table as _t
from convert_parquet_to_csv_spark.plans.registry import query


_SALTED_ORACLE = """
SELECT p_type,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
            AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_type
"""


@query("salted_join_revenue", oracle=_SALTED_ORACLE)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-resilient join via explicit salting
    (operators/scale.salted_join): the fact side gets a random salt in
    [0,16), the dim side is replicated 16× map-side, and the join key
    becomes (partkey, salt) — a pathologically hot part now spreads
    over 16 tasks instead of one straggler.

    The oracle is the PLAIN join: salting must be invisible in the
    result (the salt column only affects placement), and the
    value-hash check proves exactly that."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").withColumnRenamed("p_partkey", "l_partkey")
    joined = salted_join(li, part, on="l_partkey", n_salts=16)
    return joined.groupBy("p_type").agg(
        F.sum(_d(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
    )


_COMPACT_ORACLE = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
"""


@query("compaction_roundtrip", oracle=_COMPACT_ORACLE)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction (operators/scale.compact_parquet),
    value-checked end to end: fragment the events table into 64 tiny
    files (the streaming-landing-zone pathology), compact to
    right-sized files via repartition + rewrite-and-swap, then
    aggregate the compacted copy. The oracle aggregates the ORIGINAL
    table — compaction must be a pure layout change.

    (Timestamps pass through the rewrite as parquet microseconds; the
    aggregate here deliberately avoids the nanos column semantics by
    grouping on event_type only.)"""
    scratch = os.path.join(tempfile.gettempdir(), "cptc_compact_events")
    shutil.rmtree(scratch, ignore_errors=True)
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    ev.repartition(64).write.mode("overwrite").parquet(scratch)
    compact_parquet(spark, scratch, target_file_bytes=32 * 1024 * 1024)
    back = spark.read.parquet(scratch)
    return back.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(_d("value")).cast("double").alias("total_value"),
    )

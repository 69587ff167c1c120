"""Driver-checked queries for the conversion/scan surface (Ops 1-2, 7-11).

Each query returns a DataFrame whose values must hash-match the
registered DuckDB oracle at sf=0.01.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.plans.scratch import scratch_dir
from convert_parquet_to_csv_spark.sources import (
    convert_parquet_to_csv,
    read_csv,
    read_parquet,
)


@query(
    "convert_roundtrip",
    oracle="SELECT * FROM lineitem",
)
def convert_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship kernel correctness: parquet → CSV → typed readback.

    The returned (read-back) DataFrame must equal the original table —
    the core claim of a conversion engine (reference utils.py:114-244;
    SURVEY.md §5.2 layer 2). Exercises scan→sink dialect pinning:
    header, RFC-4180 quoting, empty-string nulls, microsecond
    timestamps, round-trippable double rendering.
    """
    src = os.path.join(sf_dir, "lineitem.parquet")
    # Stable overwrite location: the read-back DataFrame stays lazy (the
    # caller collects it), so the CSV must outlive this function. The
    # reference's rmtree-after-run cleanup (utils.py:134-137) lives in
    # the benchmark harness instead (pipeline.run_benchmark).
    dst = scratch_dir(sf_dir, "convert_roundtrip", "lineitem_csv")
    convert_parquet_to_csv(spark, src, dst, max_records_per_file=500_000)
    schema = read_parquet(spark, src).schema
    return read_csv(spark, dst, schema=schema)


@query(
    "merged_scan_provenance",
    oracle="SELECT *, 'lineitem.parquet' AS filename FROM lineitem",
)
def merged_scan_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file merge scan with filename provenance (Ops 1-2).

    Reference: ``read_parquet({urls}, union_by_name=true,
    filename=true)`` (utils.py:97-105). Spark: mergeSchema scan +
    ``input_file_name()``, with the path reduced to its basename so the
    value is location-independent (the oracle can't see our absolute
    paths).
    """
    src = os.path.join(sf_dir, "lineitem.parquet")
    df = read_parquet(spark, src, merge_schema=True, provenance_col="filename")
    return df.withColumn(
        "filename", F.regexp_extract(F.col("filename"), r"([^/]+)$", 1)
    )


# --- Arrow engine hand-off (reference Op-2) -------------------------------

_ARROW_INTEROP_ORACLE = """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
         AS sum_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


@query("arrow_interop_roundtrip", oracle=_ARROW_INTEROP_ORACLE)
def arrow_interop_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's engine hand-off (SURVEY §2 Op-2, utils.py:105
    ``.pl()``) made explicit and gated: an aggregate leaves Spark as
    an Arrow table (``toArrow``), lives briefly as a foreign
    in-memory frame (pandas via Arrow, zero-copy for numeric
    columns), and re-enters through ``createDataFrame`` — values
    must survive both boundary crossings bit-for-bit. Only the
    AGGREGATE crosses (6 rows); the hand-off pattern is for results
    and dimension tables, never the fact stream — at 100 TB the
    fact-side equivalents are mapInArrow/mapInPandas, which keep
    batches distributed (functions/vectors.py)."""
    li = read_parquet(
        spark, os.path.join(sf_dir, "lineitem.parquet")
    )
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_quantity").cast("decimal(18,4)"))
        .cast("double")
        .alias("sum_qty"),
    )
    tbl = agg.toArrow()  # Spark -> Arrow (the .pl() seam)
    pdf = tbl.to_pandas()  # Arrow -> foreign engine frame
    back = spark.createDataFrame(pdf)  # foreign frame -> Spark
    return back.select(
        "l_returnflag",
        "l_linestatus",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("sum_qty").cast("double").alias("sum_qty"),
    )


# --- maxRecordsPerFile cap, hard-gated ------------------------------------

_CAP_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price,
       TRUE AS all_files_capped,
       TRUE AS multiple_files
FROM lineitem
"""


@query("max_records_per_file_cap", oracle=_CAP_ORACLE)
def max_records_per_file_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's size-capped partitioned sink semantics
    (SURVEY §2 Op-11, polars ``PartitionMaxSize``) through the HARD
    gate: lineitem is written as CSV with ``maxRecordsPerFile=500``,
    the directory is read back WITH provenance, and per-file row
    counts are audited inside the query — every file ≤ 500 rows
    (all_files_capped) and the write actually split
    (multiple_files) — while row count and value sum prove the cap
    lost nothing. The cap is the property that keeps output files
    right-sized at any input scale; previously pytest-only."""
    import os as _os

    from convert_parquet_to_csv_spark.plans.scratch import (
        scratch_dir as _scratch_dir,
    )
    from convert_parquet_to_csv_spark.sources import (
        convert_parquet_to_csv,
        read_csv,
    )

    src = _os.path.join(sf_dir, "lineitem.parquet")
    dst = _scratch_dir(sf_dir, "cap_gate")
    convert_parquet_to_csv(
        spark, src, dst, max_records_per_file=500
    )
    back = read_csv(
        spark,
        dst,
        schema=(
            "l_orderkey LONG, l_partkey LONG, l_suppkey LONG,"
            "l_linenumber INT, l_quantity DOUBLE,"
            "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE,"
            "l_returnflag STRING, l_linestatus STRING,"
            "l_shipdate TIMESTAMP"
        ),
        infer_schema=False,
    ).withColumn("_file", F.input_file_name())
    per_file = back.groupBy("_file").agg(
        F.count(F.lit(1)).alias("c")
    )
    audit = per_file.agg(
        F.max("c").alias("max_c"), F.count(F.lit(1)).alias("n_files")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price"),
    ).crossJoin(F.broadcast(audit)).select(
        "n_rows",
        "total_price",
        (F.col("max_c") <= 500).alias("all_files_capped"),
        (F.col("n_files") > 1).alias("multiple_files"),
    )

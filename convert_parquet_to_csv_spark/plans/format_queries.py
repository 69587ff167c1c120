"""Driver-checked source/sink format coverage beyond parquet+CSV.

The reference's format surface is exactly parquet-in/CSV-out
(SURVEY.md §2.1 scans row); a general engine needs the other
Spark-native formats. Each query is a write→typed-readback→aggregate
roundtrip whose oracle runs the same aggregate directly on the parquet
view — proving the format preserved values, not just row counts.

JSON-lines and ORC ship in stock Spark (no external jars); Avro does
not (requires the spark-avro package), so it is intentionally absent
rather than stubbed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.plans.scratch import scratch_dir
from convert_parquet_to_csv_spark.sources import read_parquet

_AGG_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY lang
"""


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@query("json_roundtrip", oracle=_AGG_ORACLE)
def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSON-lines sink → schema'd readback → aggregate.

    JSON-lines is the landing format of most document pipelines. The
    readback supplies the parquet schema explicitly — no inference
    pass (at 100 TB, schema inference is a full extra scan) — and the
    sink is partition-parallel like every Spark file sink.
    """
    docs = _docs(spark, sf_dir)
    dst = scratch_dir(sf_dir, "json_roundtrip")
    docs.write.mode("overwrite").json(dst)
    back = spark.read.schema(docs.schema).json(dst)
    return _agg(back)


_PRUNE_ORACLE = """
SELECT CAST(EXTRACT(month FROM o_orderdate) AS INT) AS order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
WHERE EXTRACT(year FROM o_orderdate) = 1996
GROUP BY order_month
"""


@query("partition_pruned_scan", oracle=_PRUNE_ORACLE)
def partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned layout + partition pruning.

    orders is re-written partitioned by ``order_year=...`` directories
    (sources.write_parquet(partition_by=...)); the year filter then
    prunes at the *directory* level — ``PartitionFilters`` in the scan,
    zero I/O for other years (verified in tests/test_io_ops.py). The
    layout decision that turns a 100 TB scan into a 1-year scan.
    """
    from convert_parquet_to_csv_spark.sources import write_parquet

    orders = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    dst = scratch_dir(sf_dir, "orders_partitioned")
    write_parquet(
        orders.withColumn("order_year", F.year("o_orderdate").cast("int")),
        dst,
        partition_by=["order_year"],
    )
    back = spark.read.parquet(dst).filter(F.col("order_year") == 1996)
    return back.groupBy(
        F.month("o_orderdate").cast("int").alias("order_month")
    ).agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price"),
    )


_RANGE_ORACLE = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate < TIMESTAMP '1995-07-01'
GROUP BY o_orderpriority
"""


@query("range_layout_scan", oracle=_RANGE_ORACLE)
def range_layout_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partitioned layout + range-predicate scan.

    orders is re-written with operators.scale.write_range_partitioned
    on o_orderdate (one sampling shuffle, contiguous date range per
    file, sorted within files), then a half-year predicate is pushed
    into the scan. Under this layout parquet min/max stats are tight,
    so the pushed filter skips whole files/row groups — the date-keyed
    analog of hive partition pruning, without the directory explosion
    of one-directory-per-day (tests assert the pushdown and the
    value-level correctness; the oracle proves the rewrite lost
    nothing).
    """
    from convert_parquet_to_csv_spark.operators.scale import (
        write_range_partitioned,
    )

    orders = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    dst = scratch_dir(sf_dir, "orders_rangeparts")
    write_range_partitioned(orders, dst, "o_orderdate", n_partitions=16)
    back = spark.read.parquet(dst).filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1995-07-01")
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
        .cast("double")
        .alias("total_price"),
    )


@query("orc_roundtrip", oracle=_AGG_ORACLE)
def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ORC sink → readback → aggregate.

    ORC is the other columnar format Spark supports natively
    (vectorized reader, predicate pushdown, same scan machinery as
    parquet). Schema comes from ORC metadata — no inference needed.
    """
    docs = _docs(spark, sf_dir)
    dst = scratch_dir(sf_dir, "orc_roundtrip")
    docs.write.mode("overwrite").orc(dst)
    return _agg(spark.read.orc(dst))


_BINARY_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5
FROM documents
WHERE doc_id % 41 = 0
"""


@query("binaryfile_ingest", oracle=_BINARY_ORACLE)
def binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-bytes ingest via Spark's ``binaryFile`` source — the
    entry point for multimodal corpora (operators/multimodal.py): one
    row per file with (path, length, content BINARY).

    The fixture materializes a small deterministic subset of documents
    as UTF-8 ``.txt`` files, reads them back through binaryFile, and
    proves byte fidelity with md5(content) — DuckDB's md5 over the
    source string hashes the identical UTF-8 bytes. doc_id is
    recovered from the file stem with regexp_extract.

    Scale: binaryFile lists + reads files partition-parallel and
    supports ``pathGlobFilter``/``recursiveFileLookup`` for lake
    layouts; content is one cell per file, so the format is for
    payloads (images/audio), not splittable text — large-corpus text
    lands as parquet/JSON-lines instead.

    LOCAL-MODE ASSUMPTION (review finding): the fixture files are
    written to the *driver's* local tmpdir and then scanned — visible
    to executors only because local mode shares one filesystem. On a
    real cluster the fixture path must be a shared filesystem
    (HDFS/object store); the binaryFile scan itself is
    cluster-correct, only this test-fixture materialization is not.
    """
    import shutil

    docs = _docs(spark, sf_dir).filter(F.col("doc_id") % 41 == 0)
    sub = docs.select("doc_id", "text").collect()  # tiny: |corpus|/41
    dst = scratch_dir(sf_dir, "binaryfile")
    # Recreate from scratch: the dir is keyed by sf_dir only, so
    # leftover files from a previous fixture generation (regenerated
    # every round) would otherwise leak into the scan and mismatch an
    # oracle computed from the CURRENT documents table.
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for row in sub:
        with open(os.path.join(dst, f"{row.doc_id}.txt"), "wb") as fh:
            fh.write(row.text.encode("utf-8"))
    media = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(dst)
    )
    return media.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.txt$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


_PYSOURCE_ORACLE = """
SELECT i AS id,
       md5(CAST(i AS VARCHAR)) AS fingerprint,
       CAST(10 + CAST('0x' || substring(md5(CAST(i AS VARCHAR)), 1, 8)
                 AS BIGINT) % 100 AS INT) AS n_tokens
FROM (SELECT unnest(range(50, 150)) AS i)
"""


@query("python_datasource_scan", oracle=_PYSOURCE_ORACLE)
def python_datasource_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python data source (Spark 4 ``pyspark.sql.datasource``)
    through the driver gate: the synthdocs generator source scans
    partition-parallel with id-range ``pushFilters`` pruning — the
    [50, 150) predicate narrows the range BEFORE partition planning
    (sources/pysource.py), the Python-source analog of row-group
    skipping. Every cell derives from md5(id), so the DuckDB oracle
    replays the generator exactly."""
    from convert_parquet_to_csv_spark.sources.pysource import (
        register_once,
        SynthDocsDataSource,
    )

    register_once(spark, SynthDocsDataSource)
    return (
        spark.read.format("synthdocs")
        .option("n_rows", 1000)
        .option("n_parts", 8)
        .load()
        .filter((F.col("id") >= 50) & (F.col("id") < 150))
    )


_PYSINK_ORACLE = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE doc_id % 7 = 0
"""


@query("python_datasource_write_roundtrip", oracle=_PYSINK_ORACLE)
def python_datasource_write_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Writer half of the Python data source surface (VERDICT r2 item
    2): a documents subset goes out through ``jsonlsink`` — a custom
    ``DataSourceWriter`` with real two-phase task commit (staged
    per-task files → driver-side rename + ``_SUCCESS``,
    sources/pysource.py) — and is read back with an explicit schema.
    The oracle checks the round-trip bytes against the source table,
    so a lost task file, a double-committed speculative attempt, or a
    stale leftover from a previous overwrite all surface as row/hash
    mismatches.

    Same local-mode fixture note as ``binaryfile_ingest``: the sink
    directory lives on the driver's local FS, shared with executors
    only under local mode; the commit protocol itself is
    cluster-correct on a shared filesystem."""
    import shutil

    from convert_parquet_to_csv_spark.sources.pysource import (
        register_once,
        JsonlSinkDataSource,
    )

    register_once(spark, JsonlSinkDataSource)
    sub = _docs(spark, sf_dir).filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", "lang", "n_chars"
    )
    dst = scratch_dir(sf_dir, "jsonlsink")
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    sub.write.format("jsonlsink").mode("overwrite").option(
        "path", dst
    ).save()
    return spark.read.schema(
        "doc_id BIGINT, lang STRING, n_chars BIGINT"
    ).json(dst)


@query("xml_roundtrip", oracle=_AGG_ORACLE)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → XML sink → schema'd readback → aggregate, on the
    XML data source built into Spark 4 (the spark-xml package
    mainlined). Same contract as the JSON/ORC roundtrips: explicit
    readback schema (no inference scan), partition-parallel sink,
    markup escaping exercised by the free-text column (&, <, quotes
    all appear in the fixture corpus). The aggregate hashes lang +
    n_chars, so the gate proves values survive the markup layer
    intact."""
    docs = _docs(spark, sf_dir)
    dst = scratch_dir(sf_dir, "xml_roundtrip")
    (
        docs.write.mode("overwrite")
        .format("xml")
        .option("rootTag", "docs")
        .option("rowTag", "doc")
        .save(dst)
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "doc")
        .schema(docs.schema)
        .load(dst)
    )
    return _agg(back)


# --- dynamic partition pruning --------------------------------------------

_DPP_ORACLE = """
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price
FROM orders
WHERE EXTRACT(year FROM o_orderdate) IN (1995, 1996)
GROUP BY 1
"""


@query("dynamic_partition_pruning_join", oracle=_DPP_ORACLE)
def dynamic_partition_pruning_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dynamic partition pruning: the fact side is year-partitioned
    on disk and the year filter lives on the DIMENSION side of a
    join, so no static filter can prune the scan — at runtime Spark
    executes the dim subquery first and injects its year set into the
    fact scan's PartitionFilters (``dynamicpruningexpression``,
    asserted in tests/test_io_ops.py). This is the mechanism that
    turns "join a 100 TB partitioned fact to a filtered date dim"
    into a two-partition read — the star-schema workhorse
    partition_pruned_scan's static pruning can't cover."""
    from convert_parquet_to_csv_spark.sources import write_parquet

    orders = read_parquet(spark, os.path.join(sf_dir, "orders.parquet"))
    dst = scratch_dir(sf_dir, "dpp_orders_gate")
    write_parquet(
        orders.withColumn(
            "order_year", F.year("o_orderdate").cast("int")
        ),
        dst,
        partition_by=["order_year"],
    )
    fact = spark.read.parquet(dst)
    dim = (
        orders.select(
            F.year("o_orderdate").cast("int").alias("year")
        )
        .distinct()
        .filter(F.col("year").isin(1995, 1996))
    )
    return (
        fact.join(dim, fact.order_year == dim.year)
        .groupBy("order_year")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# --- line-oriented text format --------------------------------------------

_TEXT_ORACLE = """
WITH flat AS (
  SELECT doc_id,
         trim(regexp_replace(text, '\\s+', ' ', 'g')) AS line
  FROM documents WHERE text IS NOT NULL
)
SELECT COUNT(*) AS n_lines,
       CAST(SUM(length(line)) AS BIGINT) AS total_chars,
       CAST(SUM(CAST('0x' || substring(md5(line), 1, 10) AS BIGINT))
            AS BIGINT) AS content_checksum
FROM flat
"""


@query("textfile_roundtrip", oracle=_TEXT_ORACLE)
def textfile_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-oriented text format (``spark.read/write.text``) — the
    rawest corpus interchange format (one doc per line, the common
    LLM-corpus shape). Docs are whitespace-flattened first because
    the format's contract IS the newline delimiter; the readback is
    checksummed order-independently (sum of per-line md5 prefixes —
    the table_checksum device) so the oracle proves content survived
    byte-exactly without trusting row order, which a parallel text
    write does not preserve."""
    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    )
    # The text sink rejects NULL values outright — filter (mirrored
    # in the oracle) so a fixture refresh with NULL text degrades to
    # a value diff, not a job crash.
    flat = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.trim(F.regexp_replace("text", r"\s+", " ")).alias("line"),
    )
    dst = scratch_dir(sf_dir, "textfile_rt")
    flat.select("line").write.mode("overwrite").text(dst)
    back = spark.read.text(dst)
    return back.agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.length("value")).cast("bigint").alias("total_chars"),
        F.sum(
            F.conv(F.substring(F.md5("value"), 1, 10), 16, 10).cast(
                "bigint"
            )
        ).cast("bigint").alias("content_checksum"),
    )


# --- columnar compression codecs ------------------------------------------

_CODEC_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
         AS total_price,
       TRUE AS codecs_agree
FROM orders GROUP BY o_orderstatus
"""


@query("compression_codec_roundtrip", oracle=_CODEC_ORACLE)
def compression_codec_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parquet compression codecs are a pure layout knob: the same
    table written with snappy (the default: fast, ~2× ratio) and
    zstd (the cold-storage choice: slower, better ratio — the codec
    a 100 TB archive actually uses) must read back value-identical.
    Both copies are aggregated and compared INSIDE the query;
    ``codecs_agree`` folds the cross-codec equality into the gate,
    and the oracle aggregates the original table — two independent
    invariances in one row set."""
    orders = read_parquet(
        spark, os.path.join(sf_dir, "orders.parquet")
    )
    base = scratch_dir(sf_dir, "codec_rt")
    for codec in ("snappy", "zstd"):
        orders.write.mode("overwrite").option(
            "compression", codec
        ).parquet(f"{base}_{codec}")

    def agg(df: DataFrame, pfx: str) -> DataFrame:
        return df.groupBy("o_orderstatus").agg(
            F.count(F.lit(1)).alias(f"{pfx}_n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias(
                f"{pfx}_sum"
            ),
        )

    sn = agg(spark.read.parquet(f"{base}_snappy"), "sn")
    zs = agg(spark.read.parquet(f"{base}_zstd"), "zs")
    return sn.join(zs, "o_orderstatus").select(
        "o_orderstatus",
        F.col("sn_n").alias("n_orders"),
        F.col("sn_sum").cast("double").alias("total_price"),
        (
            (F.col("sn_n") == F.col("zs_n"))
            & (F.col("sn_sum") == F.col("zs_sum"))
        ).alias("codecs_agree"),
    )


# --- adversarial CSV dialect roundtrip ------------------------------------

_CSV_ADV_ORACLE = """
WITH adv AS (
  SELECT doc_id,
         concat('a,"b', chr(10), coalesce(text, ''), chr(9), '"" ', 'c') AS payload,
         n_chars
  FROM documents WHERE doc_id % 20 = 0
)
SELECT COUNT(*) AS n_rows,
       CAST(SUM(length(payload)) AS BIGINT) AS total_payload_chars,
       CAST(SUM(CAST('0x' || substring(md5(payload), 1, 10) AS BIGINT))
            AS BIGINT) AS payload_checksum,
       CAST(SUM(n_chars) AS BIGINT) AS total_n_chars
FROM adv
"""


@query("csv_adversarial_roundtrip", oracle=_CSV_ADV_ORACLE)
def csv_adversarial_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The CSV dialect under fire: payloads carrying embedded commas,
    double quotes, a literal newline, a tab, and trailing spaces are
    written through the engine's pinned dialect (RFC-4180 quoting,
    ``escape='"'``, whitespace-trim off — ``CSV_DEFAULTS``) and read
    back typed; the order-independent md5 checksum proves every byte
    survived. This gates through DuckDB what the hypothesis roundtrip
    suite pins in pytest — the sink semantics the reference benchmark
    is ABOUT (SURVEY §2.2): a dialect bug (e.g. Spark's default
    backslash escape, or the writer's default whitespace trim) fails
    the hash here. ``multiLine`` readback is the documented cost of
    embedded newlines (unsplittable files; newline-free data should
    read with multi_line=False)."""
    from convert_parquet_to_csv_spark.sources.io_ops import (
        CSV_DEFAULTS,
        read_csv,
    )

    docs = read_parquet(
        spark, os.path.join(sf_dir, "documents.parquet")
    ).filter(F.col("doc_id") % 20 == 0)
    adv = docs.select(
        "doc_id",
        # coalesce: Spark concat null-propagates while DuckDB concat
        # skips NULL args — normalize before the dialect test.
        F.concat(
            F.lit('a,"b'),
            F.lit("\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\t"),
            F.lit('"" '),
            F.lit("c"),
        ).alias("payload"),
        "n_chars",
    )
    dst = scratch_dir(sf_dir, "csv_adversarial")
    w = adv.write.mode("overwrite")
    for k, v in CSV_DEFAULTS.items():
        w = w.option(k, v)
    w.csv(dst)
    back = read_csv(
        spark,
        dst,
        schema="doc_id LONG, payload STRING, n_chars LONG",
        infer_schema=False,
    )
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("payload")).cast("bigint").alias(
            "total_payload_chars"
        ),
        F.sum(
            F.conv(F.substring(F.md5("payload"), 1, 10), 16, 10).cast(
                "bigint"
            )
        ).cast("bigint").alias("payload_checksum"),
        F.sum("n_chars").cast("bigint").alias("total_n_chars"),
    )

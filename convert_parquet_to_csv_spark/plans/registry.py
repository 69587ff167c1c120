"""Central registry mapping query names → (Spark callable, oracle SQL).

The driver contract (``/root/repo/__spark_entry__.py``) needs
``queries()`` and ``oracle_sql()`` dicts; every operator module
registers its demonstration queries here with the :func:`query`
decorator so the two stay in lockstep by construction.

Cross-engine determinism rules every registered query follows
(SURVEY.md §7.3d — hash-match the DuckDB oracle):

- **Alias every computed column identically** in Spark and SQL (the
  driver sorts columns by name before hashing).
- **Floating aggregation goes through DECIMAL.** ``SUM(double)`` is
  order-dependent in the last ulp; ``SUM(CAST(x AS DECIMAL(18,4)))``
  is exact and engine-independent; cast the result back to DOUBLE so
  both engines report the same column type.
- **No RNG.** Deterministic "randomness" uses cryptographic hashes of
  key columns (md5), identical in both engines.
- **Timestamps stay timestamps** (session TZ pinned to UTC; DuckDB is
  naive — values align).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; optionally with DuckDB oracle SQL.

    Queries without an oracle get the driver's weaker rows-only check —
    reserved for genuinely non-SQL-expressible ops (LSH bucketing,
    streaming state), per ``__spark_entry__.py:34-37``.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    # Imports are at call time so the registry can be populated without
    # circular-import headaches; each module registers on first import.
    from convert_parquet_to_csv_spark.plans import (  # noqa: F401
        conversion_queries,
    )
    _optional = [
        "convert_parquet_to_csv_spark.plans.analytics_queries",
        "convert_parquet_to_csv_spark.plans.relational_queries",
        "convert_parquet_to_csv_spark.plans.temporal_queries",
        "convert_parquet_to_csv_spark.plans.sampling_queries",
        "convert_parquet_to_csv_spark.plans.dedup_queries",
        "convert_parquet_to_csv_spark.plans.similarity_queries",
        "convert_parquet_to_csv_spark.plans.text_queries",
        "convert_parquet_to_csv_spark.plans.streaming_queries",
        "convert_parquet_to_csv_spark.plans.multimodal_queries",
        "convert_parquet_to_csv_spark.plans.format_queries",
        "convert_parquet_to_csv_spark.plans.kafka_queries",
        "convert_parquet_to_csv_spark.plans.sketch_queries",
        "convert_parquet_to_csv_spark.plans.scale_queries",
    ]
    import importlib
    import warnings

    for mod in _optional:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as exc:
            # Only the module itself being absent is "optional" — a
            # missing TRANSITIVE import is a real defect that would
            # otherwise silently shrink the correctness gate.
            if exc.name != mod:
                raise
            warnings.warn(
                f"query module {mod} not found; its queries are "
                f"excluded from the registry",
                stacklevel=2,
            )

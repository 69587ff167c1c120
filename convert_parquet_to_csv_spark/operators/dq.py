"""Data-quality constraint checking — the expectations gate a pipeline
runs before promoting a table (dbt tests / Great Expectations shape,
expressed as Spark plans).

Design: each constraint compiles to an aggregate over at most one scan
of its table — all single-table constraints for one table fuse into ONE
pass of conditional aggregates (no per-constraint scans); referential
checks are left-anti joins. Results union into the canonical
(check_name, n_violations, ok) report — tiny output, safe to collect.

Scale notes: the fused per-table pass is a single partial→final
aggregate regardless of how many constraints it carries. Uniqueness
runs as count vs count-distinct inside the same pass (exact; swap in
approx_count_distinct at 100 TB if a 2% error budget is acceptable).
FK orphan checks broadcast the parent's key projection when the parent
is dimension-sized; two big tables shuffle on the key once.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Constraint:
    """One named expectation. ``violation`` is a boolean Column that is
    TRUE for a row violating the constraint (row-level constraints),
    or None for table-level constraints handled specially."""

    name: str
    violation: Column | None = None


def not_null(col: str) -> Constraint:
    return Constraint(f"not_null({col})", F.col(col).isNull())


def accepted_values(col: str, values: list) -> Constraint:
    return Constraint(
        f"accepted_values({col})", ~F.col(col).isin(values)
    )


def in_range(col: str, lo=None, hi=None) -> Constraint:
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return Constraint(f"in_range({col})", cond)


def expression_ok(name: str, ok: Column) -> Constraint:
    """Generic row expectation: ``ok`` TRUE means the row passes."""
    return Constraint(name, ~ok)


def check_rowlevel(
    df: DataFrame,
    constraints: list[Constraint],
    unique: list[list[str]] | None = None,
) -> DataFrame:
    """All row-level constraints in ONE scan: each compiles to a
    conditional count inside the same aggregate. ``unique`` key lists
    fold into the same pass as count-minus-count-distinct columns, so
    a table's whole single-table expectation suite costs one job."""
    names = [c.name for c in constraints]
    # coalesce to 0: on an EMPTY table sum() is NULL, and a NULL
    # n_violations makes dq_report's ok flag NULL — a promotion gate
    # filtering on ok would silently drop the check. An empty table
    # violates nothing; it must read as a pass.
    aggs = [
        F.coalesce(F.sum(F.when(c.violation, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias(c.name)
        for c in constraints
    ]
    for cols in unique or []:
        name = f"unique({','.join(cols)})"
        names.append(name)
        aggs.append(
            (F.count("*") - F.count_distinct(*[F.col(c) for c in cols]))
            .cast("bigint")
            .alias(name)
        )
    if not names:
        raise ValueError(
            "check_rowlevel needs at least one constraint or unique "
            "key list (stack(0, ...) does not parse)"
        )
    wide = df.agg(*aggs)
    # long form: (check_name, n_violations)
    stack = F.expr(
        "stack({n}, {pairs}) as (check_name, n_violations)".format(
            n=len(names),
            pairs=", ".join(f"'{n}', `{n}`" for n in names),
        )
    )
    return wide.select(stack)


def check_unique(df: DataFrame, cols: list[str]) -> DataFrame:
    """Uniqueness of a key: total minus distinct = duplicated rows."""
    name = f"unique({','.join(cols)})"
    return df.agg(
        (F.count("*") - F.count_distinct(*[F.col(c) for c in cols]))
        .cast("bigint")
        .alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def check_foreign_key(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast_parent: bool = True,
) -> DataFrame:
    """Referential integrity: NON-NULL child keys with no parent row.

    NULL child keys are skipped (the dbt relationship-test and SQL
    ``NOT IN`` convention — a NULL key makes the predicate NULL, not
    a violation; pair with :func:`not_null` to police the NULLs
    themselves). A left_anti join would otherwise count every NULL
    as an orphan and diverge from the NOT-IN oracle."""
    name = f"fk({child_col}->{parent_col})"
    keys = parent.select(F.col(parent_col).alias(child_col)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = (
        child.select(child_col)
        .filter(F.col(child_col).isNotNull())
        .join(keys, child_col, "left_anti")
    )
    return orphans.agg(
        F.count("*").cast("bigint").alias("n_violations")
    ).select(F.lit(name).alias("check_name"), "n_violations")


def dq_report(parts: list[DataFrame]) -> DataFrame:
    """Union the constraint partials into the final report with the
    pass flag."""
    from functools import reduce

    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.select(
        "check_name",
        "n_violations",
        (F.col("n_violations") == 0).alias("ok"),
    )

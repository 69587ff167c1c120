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
from pyspark.sql.window import Window


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
    bounds = []
    if lo is not None:
        cond = cond | (F.col(col) < lo)
        bounds.append(f"lo={lo}")
    if hi is not None:
        cond = cond | (F.col(col) > hi)
        bounds.append(f"hi={hi}")
    # Bounds are part of the name: two in_range checks on the same
    # column with different bounds must not collide into one aggregate
    # alias (review finding — the bare in_range(col) name made them
    # duplicate and fail at analysis).
    return Constraint(f"in_range({col},{','.join(bounds)})", cond)


def expression_ok(name: str, ok: Column) -> Constraint:
    """Generic row expectation: ``ok`` TRUE means the row passes."""
    return Constraint(name, ~ok)


def _validate_check_names(names: list[str]) -> None:
    """Reject names that cannot be safely spliced into the ``stack()``
    literal of :func:`check_rowlevel` (quotes/backticks — easy to
    produce via :func:`expression_ok`), and duplicates (two identical
    aggregate aliases fail analysis with an opaque error)."""
    for n in names:
        if "'" in n or "`" in n:
            raise ValueError(
                f"constraint name {n!r} contains a quote or backtick; "
                "these cannot be embedded in the stack() expression"
            )
    seen = set()
    for n in names:
        if n in seen:
            raise ValueError(f"duplicate constraint name: {n!r}")
        seen.add(n)


def check_rowlevel(
    df: DataFrame,
    constraints: list[Constraint],
    unique: list[list[str]] | None = None,
) -> DataFrame:
    """All row-level constraints in ONE scan: each compiles to a
    conditional count inside the same aggregate. ``unique`` key lists
    fold into the same pass as count-minus-count-distinct columns, so
    a table's whole single-table expectation suite costs one job.

    Constraint names are embedded in a ``stack()`` SQL literal below,
    so they are validated here: quotes/backticks would break parsing
    (or worse, splice expressions), and duplicate names would collide
    as aggregate aliases and fail at analysis with an opaque error.
    """
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
    _validate_check_names(names)
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
    as an orphan and diverge from the NOT-IN oracle.

    NULL PARENT keys are dropped before the anti join. SQL ``NOT IN``
    degenerates when the parent side contains a NULL (every row's
    predicate becomes NULL → zero violations reported), while a
    left_anti join keeps matching on the non-null keys; filtering the
    parent keeps this check reporting real orphans on a dirty parent
    table and documents that policing NULL parent keys is
    :func:`not_null`'s job, not this check's (review finding)."""
    name = f"fk({child_col}->{parent_col})"
    keys = (
        parent.select(F.col(parent_col).alias(child_col))
        .filter(F.col(child_col).isNotNull())
        .distinct()
    )
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


def fs_link_scores(
    a: DataFrame,
    b: DataFrame,
    block_col: str,
    fields: "list[tuple[Column, int, int]]",
    threshold_milli: int = 0,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter
    1969; the Splink/dedupe model): candidate pairs come from a
    blocking equi-join on ``block_col``, and each pair's match score
    is the sum of per-field log-likelihood weights — ``w_agree =
    log2(m/u)`` when the field agrees, ``w_disagree =
    log2((1−m)/(1−u))`` when it doesn't (m = P(agree | match), u =
    P(agree | non-match); both are MODEL PARAMETERS the caller fixes
    — EM estimation is an offline concern). Weights are integer
    MILLI-log2 units, so the score sum is exact and engine-portable;
    pairs at or above ``threshold_milli`` survive.

    ``a`` and ``b`` must carry ``block_col`` plus the columns the
    ``fields`` conditions reference (disambiguate names before the
    call — the conditions are evaluated on the joined frame). Each
    fields entry: (agreement Column, w_agree_milli, w_disagree_milli).

    Scale shape: ONE blocking equi-join (candidate volume =
    Σ|block_a|·|block_b| — at web scale you run multiple passes with
    finer block keys, sorted-neighborhood or rolling blocks; the
    score algebra is identical) and a map-side score projection. No
    windows, no UDFs."""
    import functools
    import operator as _op

    if not fields:
        raise ValueError(
            "fs_link_scores requires at least one field "
            "(a config-driven caller filtered them all out?)"
        )
    cand = a.join(b, block_col)
    score = functools.reduce(
        _op.add,
        [
            F.when(cond, F.lit(w_agree)).otherwise(F.lit(w_dis))
            for cond, w_agree, w_dis in fields
        ],
    )
    return cand.withColumn(
        "score_milli", score.cast("bigint")
    ).filter(F.col("score_milli") >= threshold_milli)


def sorted_neighborhood_pairs(
    df: DataFrame,
    sort_cols: "Sequence[str | Column]",
    window: int = 3,
    partition_cols: "Sequence[str] | None" = None,
    key_col: str = "rec_key",
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995, the
    merge/purge method): records sort by a discriminating key and
    every record pairs with its ``window − 1`` successors — the
    candidate generator for record linkage when no clean equi-join
    block key exists (typos break exact blocking; neighbors in sort
    order survive them). Compose with :func:`fs_link_scores`-style
    scoring on the emitted pairs.

    Scale shape: the sort runs WITHIN ``partition_cols`` (production
    practice — a coarse reliable key bounds every sort partition;
    passing none is the single-partition textbook form and is for
    dimension-scale inputs only), and pair generation is window-1
    ``lead`` projections per row — no self-join, no explode beyond
    the window constant, candidates AT MOST (window−1)·n rows (the
    last window−1 records of each sort partition have fewer
    successors and emit fewer pairs).

    Output: (key_a, key_b, neighbor_rank) — rank 1 = adjacent in
    sort order."""
    parts = list(partition_cols or [])
    w = (
        Window.partitionBy(*parts) if parts else Window.partitionBy()
    ).orderBy(*[F.col(c) if isinstance(c, str) else c for c in sort_cols],
              key_col)
    leads = [
        F.lead(key_col, i).over(w).alias(f"_n{i}")
        for i in range(1, window)
    ]
    wide = df.select(F.col(key_col), *leads)
    stacked = wide.select(
        F.col(key_col).alias("key_a"),
        F.explode(
            F.arrays_zip(
                F.array(*[F.col(f"_n{i}") for i in range(1, window)]),
                F.array(*[F.lit(i) for i in range(1, window)]),
            )
        ).alias("_z"),
    )
    return stacked.select(
        "key_a",
        F.col("_z")["0"].alias("key_b"),
        F.col("_z")["1"].alias("neighbor_rank"),
    ).filter(F.col("key_b").isNotNull())

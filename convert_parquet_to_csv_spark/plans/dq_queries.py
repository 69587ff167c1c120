"""Driver-checked queries: data-quality expectations, SCD2 history
building, and contrastive negative sampling.

The DQ report shape is (constraint, n_violations, ok) — ok is what a
promotion gate branches on; n_violations is what the on-call reads.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from convert_parquet_to_csv_spark.operators import dq as Q
from convert_parquet_to_csv_spark.plans.common import load_table as _t
from convert_parquet_to_csv_spark.plans.registry import query
from convert_parquet_to_csv_spark.plans.scratch import scratch_dir

# --- DQ expectations over the orders/lineitem star -----------------------

_DQ_ORACLE = """
WITH rowlevel AS (
  SELECT * FROM (VALUES
    ('not_null(o_custkey)',
     (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)),
    ('accepted_values(o_orderstatus)',
     (SELECT COUNT(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P'))),
    ('in_range(o_totalprice,lo=0)',
     (SELECT COUNT(*) FROM orders WHERE o_totalprice < 0)),
    ('discount_bounds',
     (SELECT COUNT(*) FROM lineitem
      WHERE NOT (l_discount >= 0 AND l_discount <= 1))),
    ('unique(o_orderkey)',
     (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)),
    ('fk(l_orderkey->o_orderkey)',
     (SELECT COUNT(*) FROM lineitem
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))),
    ('fk(o_custkey->c_custkey)',
     (SELECT COUNT(*) FROM orders
      WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)))
  ) AS t(check_name, n_violations)
)
SELECT check_name, CAST(n_violations AS BIGINT) AS n_violations,
       n_violations = 0 AS ok
FROM rowlevel
"""


@query("dq_constraint_checks", oracle=_DQ_ORACLE)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-gate expectations over the star: null/domain/range
    checks fused into ONE orders scan + one lineitem scan
    (operators/dq.check_rowlevel compiles every row-level constraint
    to a conditional count in the same aggregate), uniqueness in the
    same pass shape, and two FK orphan checks as broadcast left-anti
    joins. Output is the canonical (constraint, n_violations, ok)
    report — tiny, collectable, branchable."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")
    parts = [
        Q.check_rowlevel(
            orders,
            [
                Q.not_null("o_custkey"),
                Q.accepted_values("o_orderstatus", ["O", "F", "P"]),
                Q.in_range("o_totalprice", lo=0),
            ],
            unique=[["o_orderkey"]],
        ),
        Q.check_rowlevel(
            lineitem,
            [
                Q.expression_ok(
                    "discount_bounds",
                    (F.col("l_discount") >= 0) & (F.col("l_discount") <= 1),
                )
            ],
        ),
        Q.check_foreign_key(lineitem, "l_orderkey", orders, "o_orderkey",
                            broadcast_parent=False),
        Q.check_foreign_key(orders, "o_custkey", customer, "c_custkey"),
    ]
    return Q.dq_report(parts)


# --- SCD2 history from an event stream ------------------------------------

_SCD2_ORACLE = """
WITH seq AS (
  SELECT user_id, ts, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type,
         event_id
  FROM events
), changes AS (
  SELECT user_id, ts AS valid_from, event_type
  FROM seq
  WHERE prev_type IS NULL OR event_type <> prev_type
), versions AS (
  SELECT user_id, event_type AS state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, event_type)
           AS valid_to
  FROM changes
)
SELECT user_id, state, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM versions
"""


@query("scd2_user_state_history", oracle=_SCD2_ORACLE)
def scd2_user_state_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing dimension built from the raw event
    stream: collapse consecutive same-state events per user, then
    close each version with the next version's start
    (valid_from/valid_to/is_current). The lag→filter→lead pipeline
    runs on ONE user_id exchange reused by both windows — the standard
    way a 100 TB event log becomes a point-in-time joinable dimension.
    Deterministic tiebreak: (ts, event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w).alias("_prev"),
        )
        .filter(
            F.col("_prev").isNull() | (F.col("event_type") != F.col("_prev"))
        )
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.col("event_type").alias("state"),
        )
    )
    # (valid_from, state) ordering: two same-ts change rows for one
    # user would otherwise make lead() assignment engine-dependent.
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "state")
    return changes.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


# --- contrastive negative sampling ----------------------------------------

_NEG_ORACLE = """
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
anchors AS (
  SELECT doc_id AS anchor_id FROM documents WHERE doc_id % 29 = 0
),
cand AS (
  SELECT a.anchor_id, k.k,
         CAST('0x' || substring(md5(CAST(a.anchor_id AS VARCHAR) || ':' ||
                        CAST(k.k AS VARCHAR)), 1, 12) AS BIGINT)
           % (SELECT n_docs FROM n) AS neg_idx
  FROM anchors a CROSS JOIN (SELECT unnest(range(4)) AS k) k
)
SELECT anchor_id, CAST(k AS INT) AS k, d.doc_id AS negative_id
FROM cand JOIN documents d ON d.doc_id = cand.neg_idx
WHERE d.doc_id <> cand.anchor_id
"""


@query("negative_sampling_pairs", oracle=_NEG_ORACLE)
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor doc draws 4 pseudo-random negatives via md5(anchor,k) mod N
    — seedless, reproducible, engine-identical (the repo-wide no-RNG
    rule). Accidental self-pairs are dropped rather than re-drawn
    (standard practice: a contrastive batch tolerates k-1 negatives).

    Plan: anchors × 4 is an explode, the candidate index joins the
    docs table on its key — one broadcast (anchors are a sample) or
    one key shuffle at scale. No collect, no RNG state."""
    docs = _t(spark, sf_dir, "documents")
    n_docs = docs.select(F.count("*").alias("n_docs"))
    anchors = docs.filter(F.col("doc_id") % 29 == 0).select(
        F.col("doc_id").alias("anchor_id")
    )
    cand = (
        anchors.join(F.broadcast(n_docs))
        .select(
            "anchor_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("k"),
            "n_docs",
        )
        .select(
            "anchor_id",
            F.col("k").cast("int").alias("k"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                ":",
                                F.col("anchor_id").cast("string"),
                                F.col("k").cast("string"),
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long")
                % F.col("n_docs")
            ).alias("neg_idx"),
        )
    )
    return (
        cand.join(docs, cand.neg_idx == docs.doc_id)
        .filter(F.col("doc_id") != F.col("anchor_id"))
        .select(
            "anchor_id", "k", F.col("doc_id").alias("negative_id")
        )
    )


# --- multi-touch attribution ----------------------------------------------

_MTA_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT event_id AS view_id, user_id, ts AS view_ts
  FROM events WHERE event_type = 'view'
), touched AS (
  SELECT p.purchase_id, v.view_id, v.view_ts
  FROM p JOIN v ON p.user_id = v.user_id
   AND v.view_ts > p.purchase_ts - INTERVAL 30 MINUTE
   AND v.view_ts <= p.purchase_ts
)
SELECT purchase_id, view_id,
       1.0 / COUNT(*) OVER (PARTITION BY purchase_id) AS weight
FROM touched
"""


@query("multi_touch_attribution", oracle=_MTA_ORACLE)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every view in the 30 minutes
    before a purchase shares credit equally (weight 1/n per touch) —
    the n-touch generalization of the as-of join's last-touch model
    (asof_click_attribution).

    The interval pairing reuses operators/rangejoin.interval_join —
    (user, time-bin) equi-join, never a cross join — and the 1/n is
    one count window per purchase. 1/n is a single IEEE division, so
    weights are bit-identical across engines."""
    from convert_parquet_to_csv_spark.operators.rangejoin import (
        interval_join,
    )

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )
    touched = interval_join(
        p,
        v,
        on="user_id",
        left_ts="purchase_ts",
        right_ts="view_ts",
        lower_us=-30 * 60 * 1_000_000,
        upper_us=0,
    )
    w = Window.partitionBy("purchase_id")
    return touched.select(
        "purchase_id",
        "view_id",
        (F.lit(1.0) / F.count("*").over(w)).alias("weight"),
    )


# --- observe(): single-pass piggyback metrics -----------------------------

_OBSERVE_ORACLE = """
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty_sum,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_discounted,
       CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_null_ship
FROM lineitem
"""


@query("observe_metrics_single_pass", oracle=_OBSERVE_ORACLE)
def observe_metrics_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``DataFrame.observe`` — DQ metrics that PIGGYBACK on a real
    job instead of costing a second scan: the observation's
    aggregates are evaluated inline by CollectMetricsExec while the
    noop write streams the table through, and the driver reads them
    from the query's metrics afterward (``Observation.get`` blocks on
    the listener). At 100 TB this is the difference between free
    row-count/null-count/sum audits on every production write and
    doubling the pipeline's scan bill — the pattern behind Delta-
    style write metrics. The returned 1-row frame re-materializes the
    observed dict so the gate can hash it against a plain aggregate
    oracle."""
    li = _t(spark, sf_dir, "lineitem")
    from pyspark.sql import Observation

    obs = Observation("dq_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.expr(
            "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)"
        ).alias("qty_sum"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_shipdate").isNull()).alias("n_null_ship"),
    )
    # the "real" job the metrics ride on — a full materialization
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["qty_sum"],
                m["n_discounted"],
                m["n_null_ship"],
            )
        ],
        "n_rows bigint, qty_sum double, n_discounted bigint, "
        "n_null_ship bigint",
    )


# --- GDPR erasure cascade -------------------------------------------------

_GDPR_ORACLE = """
WITH erase AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0
)
SELECT 'events' AS tbl,
       (SELECT COUNT(*) FROM events) AS n_before,
       (SELECT COUNT(*) FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM erase x
                          WHERE x.user_id = e.user_id)) AS n_after,
       (SELECT COUNT(*) FROM events e
        WHERE EXISTS (SELECT 1 FROM erase x
                      WHERE x.user_id = e.user_id)) AS n_erased
UNION ALL
SELECT 'orders' AS tbl,
       (SELECT COUNT(*) FROM orders) AS n_before,
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM erase x
                          WHERE x.user_id = o.o_custkey)) AS n_after,
       (SELECT COUNT(*) FROM orders o
        WHERE EXISTS (SELECT 1 FROM erase x
                      WHERE x.user_id = o.o_custkey)) AS n_erased
"""


@query("gdpr_erasure_cascade", oracle=_GDPR_ORACLE)
def gdpr_erasure_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation: one erasure list (users with
    ``user_id % 97 == 0`` stand in for the request queue) anti-joined
    across EVERY table keyed by that identity, with a per-table
    before/after/erased reconciliation row — the compliance receipt
    (n_before = n_after + n_erased by construction, and the gate
    hash-pins all three).

    Scale shape: the erasure list is tiny and BROADCAST; each fact
    table pays one map-side anti-join scan and a rewrite — no
    shuffle of the fact stream. On real storage the rewrite targets
    only files whose min/max user_id stats overlap the list (the
    upsert.py MERGE machinery); here the filtered copies land in
    scratch parquet to keep the write path honest."""
    import shutil
    import tempfile

    ev = _t(spark, sf_dir, "events")
    orders = _t(spark, sf_dir, "orders")
    # Renamed key avoids the ambiguous self-name equality (Spark
    # warns "trivially true predicate" when both sides share a name).
    erase = (
        ev.filter(F.col("user_id") % 97 == 0)
        .select(F.col("user_id").alias("_erase_id"))
        .distinct()
    )
    scratch = scratch_dir(sf_dir, "gdpr_out")
    shutil.rmtree(scratch, ignore_errors=True)

    rows = []
    for name, df, key in (
        ("events", ev, "user_id"),
        ("orders", orders, "o_custkey"),
    ):
        kept = df.join(
            F.broadcast(erase),
            df[key] == erase["_erase_id"],
            "left_anti",
        )
        kept.write.mode("overwrite").parquet(f"{scratch}/{name}")
        back = spark.read.parquet(f"{scratch}/{name}")
        rows.append(
            df.agg(F.count(F.lit(1)).alias("n_before"))
            .crossJoin(back.agg(F.count(F.lit(1)).alias("n_after")))
            .select(
                F.lit(name).alias("tbl"),
                "n_before",
                "n_after",
                (F.col("n_before") - F.col("n_after")).alias(
                    "n_erased"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# --- row-level security + column masking view -----------------------------

_RLS_ORACLE = """
WITH v AS (
  SELECT c_custkey,
         concat('Customer#', substring(md5(c_name), 1, 8)) AS masked_name,
         c_nationkey, c_acctbal, c_mktsegment
  FROM customer
  WHERE c_mktsegment <> 'AUTOMOBILE' AND c_acctbal >= 0
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
         AS total_acctbal,
       CAST(COUNT(DISTINCT masked_name) AS BIGINT) AS n_distinct_masked
FROM v GROUP BY c_mktsegment
"""


@query("rls_masked_view", oracle=_RLS_ORACLE)
def rls_masked_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level security + column masking as a VIEW: consumers query
    ``customer_secure`` and never see AUTOMOBILE-segment rows,
    negative balances, or raw names (masked to a deterministic md5
    token that PRESERVES JOINABILITY — equal names mask equally, so
    the distinct count survives). This is the governance layer's
    query-rewrite pattern: policy lives in the view definition,
    Catalyst inlines it, and the predicates still reach the scan as
    PushedFilters — policy costs nothing at plan time. The gate
    aggregates through the view; the oracle applies the same policy
    inline."""
    cust = _t(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("customer_raw")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW customer_secure AS
        SELECT c_custkey,
               concat('Customer#', substring(md5(c_name), 1, 8))
                 AS masked_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM customer_raw
        WHERE c_mktsegment <> 'AUTOMOBILE' AND c_acctbal >= 0
        """
    )
    return spark.sql(
        """
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                 AS total_acctbal,
               CAST(COUNT(DISTINCT masked_name) AS BIGINT)
                 AS n_distinct_masked
        FROM customer_secure GROUP BY c_mktsegment
        """
    )

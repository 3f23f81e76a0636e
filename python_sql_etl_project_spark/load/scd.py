"""Slowly-changing-dimension type 2: versioned dimension rows.

The one warehouse pattern the reference's PK-append load cannot express
(``/root/reference/src/load.py`` only ever inserts brand-new keys —
an attribute change on an existing key is silently ignored). SCD2 keeps
every historical value as a dated interval::

    key | tracked attrs | effective_from | effective_to | is_current

Two surfaces:

* :func:`scd2_merge` — the incremental operator: apply one change batch
  to the current dimension state (close superseded intervals, open new
  ones, pass unchanged rows through). Pure DataFrame composition — the
  only shuffles are on the dimension key.
* ``scd2_customer_status_history`` (registry) — the one-shot build: the
  full interval history derived from a change log in two window scans.
  Folding :func:`scd2_merge` over the log's date-batches produces the
  SAME table (pinned by ``tests/test_scd2.py``), which is what makes the
  incremental operator trustworthy.

Scale shape: everything partitions by the dimension key; change
detection and interval chaining are window scans over that one
partitioning (no self-joins), and the merge's joins are key-equi-joins
AQE can broadcast when the batch is small. ``effective_from/to`` are
emitted as ``yyyy-MM-dd`` strings (cross-engine date-type rule) and
``is_current`` as int.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: SCD2 bookkeeping columns added to the tracked attributes.
META_COLS = ("effective_from", "effective_to", "is_current")


def _collapse_changes(updates: DataFrame, key: str, tracked: list[str],
                      ts_col: str, order_cols: list[str]) -> DataFrame:
    """Keep only rows whose tracked attributes differ from the previous
    row of the same key (change-log compaction): the first row of every
    run of equal values survives."""
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev = [F.lag(c).over(w).alias(f"_prev_{c}") for c in tracked]
    staged = updates.select(
        key, *tracked, ts_col, *order_cols[1:],
        F.row_number().over(w).alias("_rn"), *prev,
    )
    changed = F.col("_rn") == 1
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"_prev_{c}"))
    return staged.filter(changed).drop(
        "_rn", *[f"_prev_{c}" for c in tracked]
    )


def scd2_merge(
    dim: DataFrame | None,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Apply one change batch to an SCD2 dimension; returns the new state.

    ``dim`` is the current SCD2 table (``None`` or empty for the first
    batch); ``updates`` carries ``key``, the tracked attributes and a
    ``ts_col`` change timestamp (already formatted comparably to
    ``effective_from``). ``tiebreak`` orders same-timestamp updates
    deterministically.

    Steps (all key-partitioned):

    1. compact the batch to actual changes per key (window scan);
    2. drop a batch's FIRST change when it equals the key's current open
       value — a no-op continuation, not a new version;
    3. close open intervals superseded by a key's earliest surviving
       change (``effective_to`` = that change's timestamp);
    4. chain the surviving changes into intervals (second window scan);
       the last one per key stays open (``is_current`` = 1).
    """
    order_cols = [ts_col] + ([tiebreak] if tiebreak else [])
    changes = _collapse_changes(updates, key, tracked, ts_col, order_cols)

    have_dim = dim is not None and not dim.isEmpty()
    if have_dim:
        cur = dim.filter(F.col("is_current") == 1).select(
            key,
            F.lit(1).alias("_has_cur"),
            *[F.col(c).alias(f"_cur_{c}") for c in tracked],
        )
        w = Window.partitionBy(key).orderBy(*order_cols)
        first = F.row_number().over(w) == 1
        # _has_cur guards the null case: a NEW key whose tracked value is
        # null must not match the all-null columns of a left-join miss.
        same_as_cur = F.col("_has_cur").isNotNull()
        for c in tracked:
            same_as_cur = same_as_cur & (
                F.col(c).eqNullSafe(F.col(f"_cur_{c}"))
            )
        changes = (
            changes.withColumn("_is_first", first)
            .join(cur, key, "left")
            .filter(~(F.col("_is_first") & same_as_cur))
            .drop("_is_first", "_has_cur", *[f"_cur_{c}" for c in tracked])
        )

    w2 = Window.partitionBy(key).orderBy(*order_cols)
    new_rows = changes.select(
        key,
        *tracked,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w2).alias("effective_to"),
        F.when(F.lead(ts_col).over(w2).isNull(), 1).otherwise(0).alias(
            "is_current"
        ),
    )
    if tiebreak:
        new_rows = new_rows.drop(tiebreak)

    if not have_dim:
        return new_rows

    supersede = changes.groupBy(key).agg(
        F.min(ts_col).alias("_close_at")
    )
    out_cols = [key, *tracked, *META_COLS]
    closed_or_kept = (
        dim.join(supersede, key, "left")
        .select(
            key,
            *tracked,
            "effective_from",
            F.when(
                (F.col("is_current") == 1) & F.col("_close_at").isNotNull(),
                F.col("_close_at"),
            )
            .otherwise(F.col("effective_to"))
            .alias("effective_to"),
            F.when(
                (F.col("is_current") == 1) & F.col("_close_at").isNotNull(), 0
            )
            .otherwise(F.col("is_current"))
            .alias("is_current"),
        )
    )
    return closed_or_kept.select(*out_cols).unionByName(
        new_rows.select(*out_cols)
    )


from pyspark.sql import SparkSession  # noqa: E402

from ..registry import query  # noqa: E402
from ..session import read_table  # noqa: E402


#: The full SCD2 history build as oracle SQL — shared by the history
#: query and the point-in-time lookup so the two can never drift.
_HISTORY_SQL = """
    WITH log AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus,
               lag(o_orderstatus) OVER w AS prev
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    changes AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderstatus
        FROM log WHERE prev IS NULL OR o_orderstatus <> prev
    )
    SELECT o_custkey AS custkey,
           o_orderstatus AS status,
           strftime(o_orderdate, '%Y-%m-%d') AS effective_from,
           strftime(lead(o_orderdate) OVER w2, '%Y-%m-%d') AS effective_to,
           CASE WHEN lead(o_orderdate) OVER w2 IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


@query("scd2_customer_status_history", oracle=_HISTORY_SQL)
def scd2_customer_status_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 one-shot build: each customer's order-status intervals derived
    from the orders change log. Change detection (``lag``) and interval
    chaining (``lead``) are two window scans over ONE partitioning on the
    dimension key — a single shuffle end to end; ``o_orderkey`` breaks
    same-day ties deterministically on both engines."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        "o_orderkey",
        "o_orderstatus",
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    changes = (
        o.withColumn("prev", F.lag("o_orderstatus").over(w))
        .filter(
            F.col("prev").isNull()
            | (F.col("o_orderstatus") != F.col("prev"))
        )
        .drop("prev")
    )
    w2 = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.col("d").alias("effective_from"),
        F.lead("d").over(w2).alias("effective_to"),
        F.when(F.lead("d").over(w2).isNull(), 1).otherwise(0).alias(
            "is_current"
        ),
    )


AS_OF_DATE = "1998-06-30"


@query(
    "scd2_point_in_time",
    oracle=f"""
    WITH hist AS ({_HISTORY_SQL})
    SELECT custkey, status, effective_from
    FROM hist
    WHERE effective_from <= '{AS_OF_DATE}'
      AND (effective_to IS NULL OR effective_to > '{AS_OF_DATE}')
    """,
)
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) snapshot of the SCD2 dimension: each
    customer's status row that was in force on {AS_OF_DATE} — the lookup
    every time-travel join against a versioned dimension performs
    (training-data reproducibility: "rebuild the exact feature values
    the model saw on day X").

    The interval predicate is a pure row filter over the history build
    (ISO ``yyyy-MM-dd`` strings compare correctly lexicographically, the
    engine's no-DATE-columns parity rule), so the plan adds ZERO
    shuffles; at scale the history table is effective_from-partitioned
    and the filter prunes to at most one version per key.
    """
    h = scd2_customer_status_history(spark, sf_dir)
    d = F.lit(AS_OF_DATE)
    return h.filter(
        (F.col("effective_from") <= d)
        & (F.col("effective_to").isNull() | (F.col("effective_to") > d))
    ).select("custkey", "status", "effective_from")


def merge_upsert(
    target: DataFrame, source: DataFrame, key: str, update_cols: list[str]
) -> DataFrame:
    """MERGE INTO as a DataFrame plan: full-outer join target and source
    on the key; matched rows take the source's ``update_cols``, unmatched
    source rows insert, unmatched target rows pass through. One shuffle
    on the key — the same plan Delta/Iceberg MERGE compiles to before
    file-level pruning; with a bucketed target the shuffle drops to the
    source side only. Returns the post-merge state plus a ``merge_action``
    column ('updated' / 'inserted' / 'unchanged') so callers can audit
    the write instead of diffing tables."""
    t = target.select(
        F.col(key),
        F.lit(1).alias("t_mark"),
        *[F.col(c).alias(f"t_{c}") for c in target.columns if c != key],
    )
    s = source.select(
        F.col(key),
        F.lit(1).alias("s_mark"),
        *[F.col(c).alias(f"s_{c}") for c in source.columns if c != key],
    )
    joined = t.join(s, key, "full_outer")
    out_cols = [F.col(key)]
    src_cols = set(source.columns)
    for c in (c for c in target.columns if c != key):
        if c in update_cols:
            out_cols.append(F.coalesce(F.col(f"s_{c}"), F.col(f"t_{c}")).alias(c))
        elif c in src_cols:
            out_cols.append(F.coalesce(F.col(f"t_{c}"), F.col(f"s_{c}")).alias(c))
        else:
            # column absent from the batch: inserts land NULL here
            out_cols.append(F.col(f"t_{c}").alias(c))
    action = (
        F.when(
            F.col("t_mark").isNotNull() & F.col("s_mark").isNotNull(), "updated"
        )
        .when(F.col("s_mark").isNotNull(), "inserted")
        .otherwise("unchanged")
    )
    return joined.select(*out_cols, action.alias("merge_action"))


MERGE_UPDATE_MOD = 20  # every 20th customer gets a correction
MERGE_INSERT_N = 25  # synthetic new customers appended by the batch


@query(
    "ld_merge_upsert",
    oracle=f"""
    WITH mx AS (SELECT max(c_custkey) AS mk FROM customer),
    merged AS (
        SELECT CASE WHEN c_custkey % {MERGE_UPDATE_MOD} = 0
                    THEN 'updated' ELSE 'unchanged' END AS merge_action,
               CASE WHEN c_custkey % {MERGE_UPDATE_MOD} = 0
                    THEN 'CORRECTED' ELSE c_mktsegment END AS c_mktsegment
        FROM customer
        UNION ALL
        SELECT 'inserted' AS merge_action, 'NEWSEG' AS c_mktsegment
        FROM mx, range(1, {MERGE_INSERT_N} + 1)
    )
    SELECT merge_action, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM merged
    GROUP BY 1, 2
    """,
)
def ld_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse MERGE (upsert): a correction batch — every 20th
    customer's market segment re-labelled, plus 25 brand-new customers —
    merged into the customer dim via :func:`merge_upsert`, reporting the
    per-action census the write audit wants. The oracle derives the same
    post-merge state set-theoretically (CASE over the target ∪ inserts),
    so the hash gate proves the full-outer-join MERGE plan implements
    textbook MERGE semantics: matched→update, not-matched-by-target→
    insert, not-matched-by-source→unchanged.
    """
    cust = read_table(spark, sf_dir, "customer")
    mk = cust.agg(F.max("c_custkey")).first()[0]
    source = (
        cust.filter(F.col("c_custkey") % MERGE_UPDATE_MOD == 0)
        .select("c_custkey", F.lit("CORRECTED").alias("c_mktsegment"))
        .unionByName(
            spark.range(1, MERGE_INSERT_N + 1).select(
                (F.col("id") + mk).alias("c_custkey"),
                F.lit("NEWSEG").alias("c_mktsegment"),
            )
        )
    )
    merged = merge_upsert(cust, source, "c_custkey", ["c_mktsegment"])
    return merged.groupBy("merge_action", "c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )


def _scd2_integrity_oracle() -> str:
    from ..registry import ORACLES

    return f"""
    WITH hist AS ({ORACLES["scd2_customer_status_history"]}),
    checked AS (
        SELECT custkey, effective_from, effective_to, is_current,
               lead(effective_from) OVER (
                   PARTITION BY custkey
                   ORDER BY effective_from,
                            coalesce(effective_to, '9999-12-31'), status
               ) AS next_from
        FROM hist
    )
    SELECT CAST(count(DISTINCT custkey) AS BIGINT) AS n_customers,
           CAST(count(*) AS BIGINT) AS n_versions,
           CAST(sum(is_current) AS BIGINT) AS n_current,
           CAST(sum(CASE WHEN next_from IS NOT NULL
                          AND effective_to <> next_from
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_chain_breaks,
           CAST(sum(CASE WHEN next_from IS NULL AND is_current = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dangling_closed
    FROM checked
    """


@query("scd2_interval_integrity", oracle=_scd2_integrity_oracle())
def scd2_interval_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval-integrity audit over the REGISTERED history build
    (shared callable — the audit and the dimension cannot drift): every
    customer's versions must chain exactly (each row's ``effective_to``
    equals the next row's ``effective_from``), the last version must be
    the current one, and each customer has exactly one current row
    (``n_current == n_customers``, pinned by test). This is the
    invariant a warehouse checks after every SCD2 merge — run it over a
    billion-row dimension and the cost is one window over the existing
    dimension-key partitioning plus a 1-row census.
    """
    from ..registry import QUERIES

    hist = QUERIES["scd2_customer_status_history"](spark, sf_dir)
    # same-day version pairs exist (same-date status flips, orderkey
    # tiebroken upstream); coalesce keeps NULL ordering engine-neutral
    w = Window.partitionBy("custkey").orderBy(
        "effective_from",
        F.coalesce("effective_to", F.lit("9999-12-31")),
        "status",
    )
    checked = hist.withColumn(
        "next_from", F.lead("effective_from").over(w)
    )
    return checked.agg(
        F.count_distinct("custkey").cast("bigint").alias("n_customers"),
        F.count(F.lit(1)).cast("bigint").alias("n_versions"),
        F.sum("is_current").cast("bigint").alias("n_current"),
        F.sum(
            F.when(
                F.col("next_from").isNotNull()
                & (F.col("effective_to") != F.col("next_from")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_chain_breaks"),
        F.sum(
            F.when(
                F.col("next_from").isNull() & (F.col("is_current") == 0), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_dangling_closed"),
    )


#: Calendar-year batch boundaries for the fold-rebuild audit: the
#: synthetic order log spans 1995-2001 at every SF, so 7 fixed,
#: data-independent batches exercise every merge path (dim=None
#: bootstrap, open-interval supersession, no-op continuation drop,
#: multi-change batches). A batch that misses log rows would surface
#: instantly as n_versions_fold < n_versions_oneshot in the audit.
FOLD_YEARS = tuple(str(y) for y in range(1995, 2002))


@query(
    "scd2_rebuild_fold_audit",
    oracle=f"""
    WITH hist AS ({_HISTORY_SQL})
    SELECT CAST(count(*) AS BIGINT) AS n_versions_fold,
           CAST(count(*) AS BIGINT) AS n_versions_oneshot,
           CAST(sum(is_current) AS BIGINT) AS n_current_fold,
           CAST(0 AS BIGINT) AS n_only_in_fold,
           CAST(0 AS BIGINT) AS n_only_in_oneshot
    FROM hist
    """,
)
def scd2_rebuild_fold_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 FULL-HISTORY REBUILD AUDIT: fold :func:`scd2_merge` over the
    order change log in 7 fixed calendar-year batches, then prove the
    incrementally-folded dimension is row-for-row identical to the
    one-shot windowed build (``scd2_customer_status_history``) — the
    audit a warehouse owner runs before trusting the nightly merge path,
    because if the incremental and batch rebuilds ever disagree the
    dimension silently forks (the pytest pin of this property,
    ``tests/test_scd2.py::test_fold_equals_one_shot_history``, promoted
    to an externally hash-gated query). The oracle knows only the
    engine-independent one-shot history, so it prices the comparison at
    (N, N, C, 0, 0): any fold divergence changes ``n_versions_fold`` or
    the two asymmetric-difference counters and fails the hash gate.

    Scale shape: each of the 7 merges is key-partitioned end to end
    (two window scans + key-equi-joins — see :func:`scd2_merge`) and is
    ``localCheckpoint``-ed so lineage stays one-merge deep, the same
    Pregel-as-joins discipline as the graph loops; the set comparison
    is ONE unionByName + one groupBy over the dimension key columns.
    In production the fold runs once per backfill over partition-pruned
    batches; the audit's cost is the rebuild itself plus a single
    census aggregate.
    """
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d"),
        F.col("o_orderkey").alias("tb"),
    )
    dim = None
    for y in FOLD_YEARS:
        batch = o.filter(F.substring("d", 1, 4) == y)
        dim = scd2_merge(dim, batch, "custkey", ["status"], "d", tiebreak="tb")
        dim = dim.localCheckpoint()
    from ..registry import QUERIES

    one_shot = QUERIES["scd2_customer_status_history"](spark, sf_dir)
    cols = ["custkey", "status", "effective_from", "effective_to", "is_current"]
    u = dim.select(*cols, F.lit(1).alias("f"), F.lit(0).alias("o")).unionByName(
        one_shot.select(*cols, F.lit(0).alias("f"), F.lit(1).alias("o"))
    )
    per_version = u.groupBy(*cols).agg(
        F.sum("f").alias("nf"), F.sum("o").alias("no")
    )
    return per_version.agg(
        F.sum("nf").cast("bigint").alias("n_versions_fold"),
        F.sum("no").cast("bigint").alias("n_versions_oneshot"),
        F.sum(F.col("nf") * F.col("is_current"))
        .cast("bigint")
        .alias("n_current_fold"),
        F.sum(F.greatest(F.col("nf") - F.col("no"), F.lit(0)))
        .cast("bigint")
        .alias("n_only_in_fold"),
        F.sum(F.greatest(F.col("no") - F.col("nf"), F.lit(0)))
        .cast("bigint")
        .alias("n_only_in_oneshot"),
    )

"""Sampling / splitting / packing operators for training-data pipelines.

The reference has no sampling surface at all (its whole corpus is one
Excel workbook — ``/root/reference/src/extract.py:130-158`` loads
everything, every run). At 100 TB the first thing a training pipeline
does is the opposite: carve deterministic subsets. These operators are
the north-star additions:

* ``smp_hash_split``       — reproducible train/val/test assignment
* ``smp_stratified_sample`` — per-stratum rate-controlled downsampling
* ``smp_fixed_k_sample``   — exact-size uniform sample via hash top-k
* ``pack_token_budget``    — greedy-by-order sequence packing into
                             fixed token budgets (context windows)

Scale notes (the design constraint, not the test scale):

* Every operator keys randomness off ``md5(doc_id)`` — a *pure, narrow
  projection*: no shuffle, no RNG state, no seed-broadcast, and the
  assignment of a given document never changes when the corpus grows
  (critical for incremental training-set builds; a ``rand(seed)`` column
  changes wholesale when partitioning changes).
* ``smp_fixed_k_sample`` is ``ORDER BY hash LIMIT k``: Spark plans this
  as TakeOrderedAndProject — per-partition top-k then a k-row merge on
  the driver — NOT a global sort; the shuffle carries k rows per
  partition, so it survives a 100× scale-up as long as k is small.
* ``pack_token_budget`` is one window scan per source partition; the
  shuffle is on ``source`` (few, coarse partitions). Skewed sources
  would need a salt on a real corpus; at that point packing becomes
  approximate-per-salt-group, which is acceptable for training batches.

Cross-engine determinism: hex md5 strings compare identically in Spark
and DuckDB, so split thresholds are *string* comparisons against fixed
hex prefixes (no hex→int conversion, which the two engines spell
differently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..session import read_table

#: 80/10/10 split: md5 hex is uniform over [0,16^32); the first two hex
#: digits give 256 buckets — 'cc' = 204/256 ≈ 0.797, 'e6' = 230/256 ≈ 0.898.
SPLIT_TRAIN_UPPER = "cc"
SPLIT_VAL_UPPER = "e6"

#: Per-language keep-rates for the stratified sample, expressed as a hex
#: first-digit threshold (out of 16): keep iff first hex digit < bound.
STRATUM_BOUNDS = {"en": 4, "es": 8, "de": 12}  # 25% / 50% / 75%
DEFAULT_BOUND = 16  # unknown strata: keep everything

FIXED_K = 500
TOKEN_BUDGET = 2048


@query(
    "smp_hash_split",
    oracle=f"""
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT n_chars,
               CASE WHEN substr(md5(concat('split:', doc_id)), 1, 2) < '{SPLIT_TRAIN_UPPER}'
                         THEN 'train'
                    WHEN substr(md5(concat('split:', doc_id)), 1, 2) < '{SPLIT_VAL_UPPER}'
                         THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY split
    """,
)
def smp_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (80/10/10) keyed on md5(doc_id).

    The assignment is a narrow projection — no shuffle until the audit
    aggregate — and is stable under corpus growth: adding documents
    never reassigns existing ones, unlike ``rand(seed)`` or
    ``randomSplit`` (both repartition-sensitive). The query returns the
    per-split audit (doc count + char mass) a pipeline logs every build.
    """
    bucket = F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id"))), 1, 2)
    split = (
        F.when(bucket < SPLIT_TRAIN_UPPER, "train")
        .when(bucket < SPLIT_VAL_UPPER, "val")
        .otherwise("test")
    )
    return (
        read_table(spark, sf_dir, "documents")
        .select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@query(
    "smp_stratified_sample",
    oracle=f"""
    SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
    FROM documents
    WHERE substr(md5(concat('strat:', doc_id)), 1, 1) <
          CASE lang WHEN 'en' THEN '{STRATUM_BOUNDS["en"]:x}'
                    WHEN 'es' THEN '{STRATUM_BOUNDS["es"]:x}'
                    WHEN 'de' THEN '{STRATUM_BOUNDS["de"]:x}'
                    ELSE 'g' END
    GROUP BY lang
    """,
)
def smp_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling: per-language keep-rates (25/50/75%),
    decided row-locally by a hash threshold — the deterministic,
    scale-stable form of ``df.sampleBy(fractions, seed)``. Grouped audit
    so the oracle checks both membership (min/max ids) and rates.
    """
    digit = F.substring(F.md5(F.concat(F.lit("strat:"), F.col("doc_id"))), 1, 1)
    bound = F.lit(None).cast("string")
    for lang, b in STRATUM_BOUNDS.items():
        bound = F.when(F.col("lang") == lang, f"{b:x}").otherwise(bound)
    bound = F.coalesce(bound, F.lit("g"))  # > 'f': keep all
    return (
        read_table(spark, sf_dir, "documents")
        .filter(digit < bound)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@query(
    "smp_fixed_k_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    ORDER BY md5(concat('fk:', doc_id)), doc_id
    LIMIT {FIXED_K}
    """,
)
def smp_fixed_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size uniform sample: the k smallest ``md5(doc_id)`` values.

    This is distributed reservoir sampling done right: Spark plans
    ``orderBy().limit(k)`` as TakeOrderedAndProject — each partition
    keeps its local top-k and only k-row heaps cross the wire — so the
    cost at 100 TB is one scan plus a k-row merge, never a global sort.
    Deterministic (hash order), repeatable across runs and partitionings.
    """
    h = F.md5(F.concat(F.lit("fk:"), F.col("doc_id")))
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "source", h.alias("_h"))
        .orderBy("_h", "doc_id")
        .limit(FIXED_K)
        .drop("_h")
    )


@query(
    "pack_token_budget",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source,
               CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    runs AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS run_total
        FROM toks
    )
    SELECT source,
           CAST((run_total - n_tokens) // {TOKEN_BUDGET} AS BIGINT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
    FROM runs
    GROUP BY source, pack_id
    """,
)
def pack_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: concatenate documents per source in doc_id order
    and cut into {TOKEN_BUDGET}-token context windows; a doc belongs to
    the pack where its first token lands.

    One window scan per source group (running token sum), then the pack
    assignment is pure arithmetic — the standard "concat-then-chunk"
    packing used for LLM pretraining batches, as a single shuffle on the
    coarse ``source`` key. Returns the per-pack audit (docs, token mass).
    """
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        read_table(spark, sf_dir, "documents")
        .select("doc_id", "source", n_tokens.alias("n_tokens"))
        .withColumn("run_total", F.sum("n_tokens").over(w))
        .select(
            "source",
            F.floor((F.col("run_total") - F.col("n_tokens")) / TOKEN_BUDGET)
            .cast("bigint")
            .alias("pack_id"),
            "n_tokens",
        )
        .groupBy("source", "pack_id")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
        )
    )

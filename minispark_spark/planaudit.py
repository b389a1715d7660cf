"""Registry-wide plan audit: every query's physical plan is linted
(planlint) and every finding must be covered by a WRITTEN-DOWN
boundedness argument below — otherwise the audit fails. This converts
the per-round manual anti-pattern sweep ("every collect/crossJoin/
global-window call site has a bound stated in a comment") into a
checked artifact: `tools/lint_registry.py` renders LINT.md, and
tests/test_planlint_registry.py fails on any UNDOCUMENTED finding.

The allow table is deliberately per-query, not per-check: a new query
that plans a cartesian or a single-partition exchange turns the test
red until its boundedness argument is added here (or the plan fixed).
"""

from __future__ import annotations

# query -> (allowed checks, boundedness argument)
ALLOW: dict[str, tuple[frozenset[str], str]] = {}

_CART = "cartesian-product"
_SINGLE = "single-partition-exchange"
_SORT = "global-sort"

_Q_SET = (
    "build side is the broadcast QUERY SET (N_QUERIES=10 rows by "
    "construction); scoring the corpus against a fixed bounded probe "
    "set is the operator itself — one narrow corpus pass, never "
    "corpus x corpus"
)
for _q in (
    "ann_cosine_topk",
    "ann_filtered_recall",
    "ann_hard_negatives",
    "ann_ivf_filtered_topk",
    "ann_ivf_probe_curve",
    "ann_ivf_recall",
    "ann_ivf_topk",
    "ann_ivf_trained_topk",
    "ann_mmr_rerank",
    "ann_retrieval_metrics",
    "ann_truncated_recall",
    "hybrid_search_rrf",
):
    ALLOW[_q] = (frozenset({_CART}), _Q_SET)

ALLOW["embedding_near_dup"] = (
    frozenset({_CART}),
    "the EXACT all-pairs baseline that verifies the LSH scale path "
    "(labeled so in VERDICT r3); quadratic by definition, gate-scale "
    "only",
)
ALLOW["knn_classify"] = (
    frozenset({_CART}),
    "build side is the broadcast labeled training sample (bounded "
    "k-NN probe set), same shape as the ANN query-set joins",
)
ALLOW["corpus_report"] = (
    frozenset({_CART}),
    "outer join against broadcast 1-row corpus summary frames "
    "(global counts), 1 row x N",
)
ALLOW["cross_join_region_pairs"] = (
    frozenset({_CART}),
    "the operator IS a cross join, over the 5-row region DIMENSION "
    "(bounded by the catalog, stated in its doc)",
)
ALLOW["embedding_pca_covariance"] = (
    frozenset({_CART}),
    "cross against the broadcast 1-row mean vector frame; the "
    "covariance pass itself is one narrow scan",
)
ALLOW["events_acf_hourly"] = (
    frozenset({_CART}),
    "cross against broadcast 1-row mean/variance frames over the "
    "domain-compressed hourly series",
)
ALLOW["events_hll_overlap"] = (
    frozenset({_CART}),
    "pairwise join of PER-EVENT-TYPE sketch rows (bounded by the "
    "event-type domain, ~5 rows), not of events",
)
ALLOW["events_seasonal_outliers"] = (
    frozenset({_CART, _SINGLE}),
    "crosses and windows run over the 168-row hour-of-week seasonal "
    "profile and 1-row MAD frames — domain-compressed, corpus-size-"
    "independent",
)

_NB = (
    "crosses are vocab x the broadcast CLASS-DIMENSION frame "
    "(distinct label values, ~5 rows) and test-docs x the broadcast "
    "class-prior frame — both bounded by the label domain, plus a "
    "1-row vocab-size frame; the data-sized joins (counting, grid, "
    "scoring) all hash-shuffle on token"
)
for _q in (
    "docs_nb_token_weights",
    "docs_nb_classify",
    "docs_nb_metrics",
    "docs_token_chi2_topk",
    "docs_quality_nb_filter",
    "docs_nb_calibration",
):
    ALLOW[_q] = (frozenset({_CART}), _NB)

_IVF_IDX = (
    "crosses are query/batch vectors x the broadcast CENTROID frame "
    "(IVF_K=16 rows, fixed at index creation) — the standard IVF "
    "assignment/probe shape; search reads only the probed postings "
    "lists"
)
for _q in (
    "ann_ivf_index_append",
    "ann_ivf_index_compact",
    "ann_ivf_index_delete",
):
    ALLOW[_q] = (frozenset({_CART}), _IVF_IDX)

ALLOW["dedup_minhash_band_curve"] = (
    frozenset({_CART}),
    "per-config summary rows are built by crossing broadcast 1-ROW "
    "aggregates (candidate count, truth count, hit count); the "
    "data-sized work is one (band, bucket) shuffle per config and the "
    "labeled quadratic exact-truth baseline (gate scale only)",
)

ALLOW["stats_gd_linear_fit"] = (
    frozenset({_CART}),
    "every cross is against a broadcast 1-ROW frame (the weight "
    "vector, the gradient aggregate, the SSE/count scalars) — the "
    "iterative-optimizer broadcast shape; per-iteration data work is "
    "one partial aggregate of three longs",
)

_DOMAIN = (
    "the windowed frame is DOMAIN-COMPRESSED first (distinct cents / "
    "hour / rank levels via a groupBy), so the single partition holds "
    "the value domain, not the corpus — the pattern the r3 verdict "
    "audited as not-weak for medians/Gini/deciles"
)
for _q in (
    "customers_pareto_revenue",
    "customers_survival_km",
    "events_kruskal_wallis",
    "events_mann_whitney",
    "events_seasonal_decompose",
    "events_user_gini",
    "orders_cdf_normalize",
    "parts_skyline",
):
    ALLOW[_q] = (frozenset({_SINGLE}), _DOMAIN)

ALLOW["approx_distinct_rollup_hll"] = (
    frozenset({_SORT}),
    "final ORDER BY over the grouping-set rollup result (rows = "
    "event-type domain + 1), display ordering of a bounded frame",
)
ALLOW["events_ks_test"] = (
    frozenset({_SORT, _SINGLE}),
    "sort + window over the domain-compressed pooled-value CDF frame "
    "(distinct cent levels), then a 1-row extremum",
)

# Side-effecting / sink-backed entries whose executed plan is a rescan
# of their own output (lint would see the sink read, not the pipeline).
SKIP: frozenset[str] = frozenset(
    {
        "blockfile_roundtrip",
        "events_cdc_upsert",
        "zorder_pruned_scan",
        "snapshot_read_committed",
        "arrow_ipc_roundtrip",
    }
)


def audit(spark, sf_dir: str):
    """[(name, findings, allowed_reason|None, ok)] for every
    non-streaming registry query; ok=False means an UNDOCUMENTED
    finding."""
    from minispark_spark.planlint import lint
    from minispark_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    rows = []
    for name in sorted(REGISTRY):
        if name.startswith("stream_") or name in SKIP:
            continue
        findings = lint(REGISTRY[name].fn(spark, sf_dir))
        checks = {f.check for f in findings}
        allowed, reason = ALLOW.get(name, (frozenset(), None))
        ok = checks <= allowed
        rows.append((name, findings, reason if checks else None, ok))
    return rows

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

ALLOW["stream_ivf_index_ingest"] = (frozenset({_CART}), _IVF_IDX)

# Streaming drains and side-effecting sink-backed entries: their
# registry fn's EXECUTED plan is a rescan of their own sink, which is
# not the plan that matters. VERDICT r6 item #6: lint the pre-sink /
# foreachBatch-inner plans instead — each entry below maps to builders
# returning the batch-planned equivalents of those inner chains (the
# SAME factored transformation functions the streaming entries apply
# to their stream sources; Spark transformations are source-agnostic).
# For the two applyInPandasWithState entries the state operator itself
# is streaming-only, so the lintable twin is its partitioning shape
# (bounded.stateful_partition_twin — documented there).


def inner_plans(spark, sf_dir: str) -> dict[str, list]:
    """name -> [inner DataFrames to lint] for every entry the direct
    fn-result audit cannot see through (streaming drains + sink-backed
    roundtrips)."""
    from pyspark.sql import functions as F

    from minispark_spark.operators import vecindex as V
    from minispark_spark.plans import web as W
    from minispark_spark.registry import REGISTRY
    from minispark_spark.sources.layout import with_z_column
    from minispark_spark.sources.sidecache import side_dir
    from minispark_spark.sources.tables import load_table
    from minispark_spark.sources.upsert import latest_wins_plan
    from minispark_spark.streaming import bounded as B
    from minispark_spark.streaming import neardup as N

    def fn(name):
        return REGISTRY[name].fn(spark, sf_dir)

    ev = spark.read.parquet(B._events_stream_src(spark, sf_dir, "events4", dup=False))
    ev_dup = spark.read.parquet(
        B._events_stream_src(spark, sf_dir, "events_dup4", dup=True)
    )
    late = spark.read.parquet(B._late_stream_src(spark, sf_dir))
    docs = spark.read.parquet(B._docs_stream_src(spark, sf_dir))

    changes = B.cdc_changes_plan(ev)
    cdc_latest = latest_wins_plan(
        changes.filter(F.col("event_id") % 3 != 0),
        changes.filter(F.col("event_id") % 3 == 0),
        ["user_id", "event_type", "day"],
        "event_id",
    )

    # IVF ingest: running the registry fn first guarantees the side
    # index (and its centroid file) exists before the assign plan is
    # built. The neardup frames need no index: _index_frames is the
    # pure per-batch transformation the foreachBatch sink writes.
    ivf_search = fn("stream_ivf_index_ingest")
    ivf_dir = side_dir("/tmp/minispark_ivf_stream_index", sf_dir, "ivf")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ndp_postings, ndp_shingles = N._index_frames(docs.select("doc_id", "text"))

    zsrc = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    zplan = (
        with_z_column(zsrc, ["user_id", "value"])
        .repartitionByRange(8, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )

    plans = {
        "stream_hourly_event_stats": [B.hourly_stats_plan(ev)],
        "stream_sliding_user_activity": [B.sliding_activity_plan(ev)],
        "stream_dedup_events": [B.dedup_gate_plan(ev_dup, streaming=False)],
        "stream_user_running_totals": [B.stateful_partition_twin(ev)],
        "stream_state_timeout_sessions": [B.stateful_partition_twin(late)],
        "stream_interval_join": [B.interval_join_plan(ev, ev)],
        "stream_left_outer_join": [
            B.interval_join_plan(late, late, how="leftOuter", watermark="1 hour")
        ],
        "stream_session_window": [B.session_window_plan(ev)],
        "stream_late_data_discard": [B.late_discard_plan(late)],
        "stream_cdc_upsert": [cdc_latest],
        "stream_arrow_sink": [fn("stream_arrow_sink")],
        "stream_url_frontier_gate": [W.frontier_gate_plan(docs)],
        "stream_neardup_index_ingest": [
            ndp_postings,
            ndp_shingles,
            fn("stream_neardup_index_ingest"),
        ],
        "stream_ivf_index_ingest": [
            V._assign(V._nv(emb), V._load_centroids(spark, ivf_dir)),
            ivf_search,
        ],
        # sink-backed batch entries: pre-sink plan + the readback plan
        "blockfile_roundtrip": [fn("blockfile_roundtrip")],
        "events_cdc_upsert": [cdc_latest, fn("events_cdc_upsert")],
        "zorder_pruned_scan": [zplan, fn("zorder_pruned_scan")],
        "snapshot_read_committed": [fn("snapshot_read_committed")],
        "arrow_ipc_roundtrip": [fn("arrow_ipc_roundtrip")],
    }
    return plans


# Entries audited through inner_plans instead of their fn result.
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
    """[(name, findings, allowed_reason|None, ok)] for EVERY registry
    query — batch entries via their fn result, streaming/sink-backed
    entries via their pre-sink inner plans; ok=False means an
    UNDOCUMENTED finding."""
    from minispark_spark.planlint import lint
    from minispark_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    inner = inner_plans(spark, sf_dir)
    rows = []
    for name in sorted(REGISTRY):
        if name.startswith("stream_") or name in SKIP:
            if name not in inner:
                raise KeyError(
                    f"{name}: streaming/sink-backed entry with no inner-plan "
                    "builder — add it to planaudit.inner_plans so the "
                    "registry-wide audit stays 308/308 (VERDICT r6 #6)"
                )
            dfs = inner[name]
        else:
            dfs = [REGISTRY[name].fn(spark, sf_dir)]
        findings = [f for df in dfs for f in lint(df)]
        checks = {f.check for f in findings}
        allowed, reason = ALLOW.get(name, (frozenset(), None))
        ok = checks <= allowed
        rows.append((name, findings, reason if checks else None, ok))
    return rows

"""Pin the driver-facing registry iteration order (VERDICT r4 item #1).

The driver samples ~50 of the 279 registry queries per round, in practice
overlapping heavily across rounds; 4 rounds produced driver rows for only
100 unique names. ``registry.all_queries()`` therefore yields
never-driver-sampled names FIRST, with the flagship families (TPC-H,
joins/aggs, windows/stats) leading, so each round's sample is maximally
informative. Ledger: minispark_spark/driver_sampled.py.
"""

from minispark_spark import registry
from minispark_spark.driver_sampled import DRIVER_SAMPLED


def test_never_sampled_names_lead():
    names = list(registry.all_queries())
    fresh_count = sum(1 for n in names if n not in DRIVER_SAMPLED)
    assert all(n not in DRIVER_SAMPLED for n in names[:fresh_count])
    assert all(n in DRIVER_SAMPLED for n in names[fresh_count:])


def test_flagship_families_lead_the_fresh_block():
    # Head window = flagship families (VERDICT #1) PLUS the rows the
    # verdict's other items name explicitly (filtered ANN, index
    # append, codecs, pruned layout — registry._ROUND_NEW); 58 keeps
    # both pinned even if the driver samples slightly over 50.
    names = list(registry.all_queries())
    head = set(names[:58])
    assert names[0] == "q1_pricing_summary"
    for required in (
        "q21_waiting_orders",
        "q5_bucketed",
        "join_left_outer",
        "join_full_outer",
        "order_by_limit",
        "window_rank",
        "stats_moments",
        "ann_ivfpq_filtered_k256",
        "neardup_index_append",
        "multimodal_decode_jpeg",
        "events_hourly_stats_pruned",
    ):
        assert required in head, f"{required} not in the leading 58 sample"


def test_ordering_is_a_permutation_of_the_registry():
    registry._ensure_loaded()
    assert set(registry.all_queries()) == set(registry.REGISTRY)
    assert set(registry.all_oracles()) == {
        n for n, s in registry.REGISTRY.items() if s.oracle is not None
    }


def test_ledger_names_exist_in_registry():
    registry._ensure_loaded()
    missing = DRIVER_SAMPLED - set(registry.REGISTRY)
    assert not missing, f"ledger names no longer registered: {sorted(missing)}"

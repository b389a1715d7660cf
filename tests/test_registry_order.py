"""Pin the driver-facing registry iteration order (VERDICT r4 item #1,
refined r6/r7).

The driver samples ~50 of the registry queries per round, in iteration
order. ``registry.all_queries()`` therefore yields the round-pinned
names (``registry._ROUND_NEW``) and the never-driver-GREEN names FIRST
(a red/errored row keeps a name in the head until the driver verifies
it green — VERDICT r6 item #3), previously-verified names after.
Ledger: minispark_spark/driver_sampled.py.
"""

from minispark_spark import registry
from minispark_spark.driver_sampled import DRIVER_GREEN, DRIVER_SAMPLED


def test_fresh_and_round_pinned_names_lead():
    names = list(registry.all_queries())

    def head(n):
        return n not in DRIVER_GREEN or n in registry._ROUND_NEW

    fresh_count = sum(1 for n in names if head(n))
    assert all(head(n) for n in names[:fresh_count])
    assert all(not head(n) for n in names[fresh_count:])


def test_round_pinned_rows_lead_the_sample():
    # The r6 verdict's "Done =" rows by name: the one sampled-but-
    # never-green entry (approx_distinct_rollup_hll, r1 `err:
    # no_oracle`; oracle added since) must land in a strict 50-name
    # driver sample — pin it to the first 25 for slack.
    names = list(registry.all_queries())
    head = set(names[:25])
    for required in sorted(registry._ROUND_NEW):
        assert required in head, f"{required} not in the leading 25"
    # Session-new names (none in r7 — registry growth capped while the
    # verification backlog burns down) follow inside the 50.
    head50 = set(names[:50])
    for required in sorted(registry._SESSION_NEW - DRIVER_GREEN):
        assert required in head50, f"{required} not in the leading 50"


def test_red_rows_are_not_buried_by_their_own_sample():
    # The r5 agg_collect_sorted lesson: a name sampled RED must stay in
    # the head until green. Every sampled-but-never-green name must
    # precede every green name.
    names = list(registry.all_queries())
    red_only = (DRIVER_SAMPLED - DRIVER_GREEN) & set(names)
    if not red_only:
        return
    last_red = max(names.index(n) for n in red_only)
    first_green = min(
        (names.index(n) for n in names if n in DRIVER_GREEN and n not in registry._ROUND_NEW),
        default=len(names),
    )
    assert last_red < first_green


def test_ordering_is_a_permutation_of_the_registry():
    registry._ensure_loaded()
    assert set(registry.all_queries()) == set(registry.REGISTRY)
    assert set(registry.all_oracles()) == {
        n for n, s in registry.REGISTRY.items() if s.oracle is not None
    }


def test_round_new_names_exist_in_registry():
    registry._ensure_loaded()
    missing = (registry._ROUND_NEW | registry._SESSION_NEW) - set(registry.REGISTRY)
    assert not missing, f"pinned names not registered: {sorted(missing)}"


def test_ledger_names_exist_in_registry():
    registry._ensure_loaded()
    missing = DRIVER_SAMPLED - set(registry.REGISTRY)
    assert not missing, f"ledger names no longer registered: {sorted(missing)}"
    assert DRIVER_GREEN <= DRIVER_SAMPLED

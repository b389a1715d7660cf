"""Pin bench.py's driver-facing output contract.

BENCH_r05.json recorded ``"parsed": null`` because the printed JSON
line carried 60+ per-query timings and overflowed the driver's stdout
capture — only a tail survived, losing the headline q1 number. The
contract now: the ONE printed line stays compact (flagship value,
totals, a small fixed subset); the full per-query map goes to
bench_full.json. These tests rebuild the payload exactly as bench.main
does and fail if the printed line can outgrow the capture again.
"""

from __future__ import annotations

import json

import bench


def _payload(timings: dict[str, float]) -> dict:
    # Mirror of bench.main's payload construction (kept in sync by the
    # key assertions below).
    total = round(sum(timings.values()), 4)
    head = {
        k: timings[k]
        for k in (
            "q1_pricing_summary",
            "q3_shipping_priority",
            "q6_forecast_revenue",
            "q18_large_orders",
            "dedup_minhash_lsh",
            "ann_ivf_topk",
            "graph_components_converged",
        )
        if k in timings
    }
    return {
        "metric": "q1_pricing_summary",
        "value": timings["q1_pricing_summary"],
        "unit": "sec",
        "total_s": total,
        "n_queries": len(timings),
        "queries": head,
        "sf": 0.1,
        "full": "bench_full.json",
    }


def test_printed_line_stays_compact():
    # Worst case: every headline query present with a 4-decimal timing.
    timings = {name: 123.4567 for name in bench.HEADLINE}
    line = json.dumps(_payload(timings))
    assert len(line) < 1000, f"bench line {len(line)}B — would overflow capture"


def test_payload_schema_matches_bench_source():
    # The mirror above must not drift from bench.py: the source must
    # build the same headline subset and the same compact keys.
    import inspect

    src = inspect.getsource(bench.main)
    for key in ('"metric"', '"total_s"', '"n_queries"', '"full"'):
        assert key in src
    for name in (
        "q1_pricing_summary",
        "graph_components_converged",
        "dedup_minhash_lsh",
    ):
        assert f'"{name}"' in src
    assert "bench_full.json" in src


def test_headline_names_are_registered():
    from minispark_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"bench.HEADLINE names not in registry: {missing}"

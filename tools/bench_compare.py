"""Round-over-round bench regression check.

Compares two bench artifacts' per-query timings and reports
regressions/improvements past a threshold. Accepts either format:

- the full payload bench.py persists to .bench_cache/bench_sf{sf}.json
  (``{"queries": {name: sec, ...}, ...}``) — the stable path added so
  round-over-round checks cover EVERY query;
- a driver BENCH_r0N.json (``{"tail": "...truncated stdout..."}``),
  from which per-query pairs are recovered by regex (best effort: the
  tail is truncated, so only surviving queries compare).

Usage:
    python tools/bench_compare.py OLD.json NEW.json [threshold=0.30]

Exit code 1 if any query regressed past the threshold (so a round
script can gate on it).
"""
from __future__ import annotations

import json
import re
import sys


def load_timings(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if isinstance(d, dict) and isinstance(d.get("queries"), dict):
        return {k: float(v) for k, v in d["queries"].items()}
    if isinstance(d, dict) and isinstance(d.get("parsed"), dict):
        q = d["parsed"].get("queries")
        if isinstance(q, dict):
            return {k: float(v) for k, v in q.items()}
    if isinstance(d, dict) and isinstance(d.get("tail"), str):
        pairs = re.findall(r'"([a-z0-9_]+)":\s*([0-9]+\.[0-9]+)', d["tail"])
        # Drop payload metadata that regex-matches like a query timing.
        # NOTE the top-level "value" is NOT comparable across rounds by
        # name alone — r5 and earlier printed the suite total there,
        # r6+ print the query named by "metric" (r6 ADVICE #3); only
        # per-query keys and total_s (excluded here, compared by the
        # caller if desired) are stable meanings.
        return {
            k: float(v)
            for k, v in pairs
            if k not in ("value", "sf", "total_s", "n_queries")
        }
    raise SystemExit(f"{path}: unrecognized bench artifact shape")


def load_structural(path: str) -> dict[str, dict[str, int]]:
    """Per-query structural rows (bench_full.json r7+), {} if absent."""
    with open(path) as f:
        d = json.load(f)
    s = d.get("structural") if isinstance(d, dict) else None
    return s if isinstance(s, dict) else {}


def structural_drift(
    old: dict[str, dict[str, int]], new: dict[str, dict[str, int]]
) -> list[tuple[str, str, int, int]]:
    """Load-INVARIANT round-over-round signal (r6 lesson: wall clocks
    swing 1.2-1.8x with external tenants while plans are identical):
    flag queries whose stage count or shuffle bytes grew past the same
    slack the structural-budget gate uses. Wall regressions with zero
    structural drift are host load; structural drift is a plan change."""
    flagged = []
    for name in sorted(set(old) & set(new)):
        o, n = old[name], new[name]
        if n.get("stages", 0) > o.get("stages", 0) + max(2, o.get("stages", 0) // 2):
            flagged.append((name, "stages", o.get("stages", 0), n.get("stages", 0)))
        ob, nb = o.get("shuffle_write_bytes", 0), n.get("shuffle_write_bytes", 0)
        if nb > ob * 2 + 65536:
            flagged.append((name, "shuffle_write_bytes", ob, nb))
    return flagged


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 0.30
    old, new = load_timings(old_path), load_timings(new_path)
    common = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    regressed, improved = [], []
    for name in common:
        a, b = old[name], new[name]
        if a <= 0:
            continue
        ratio = b / a
        if ratio > 1 + thresh and b - a > 0.1:  # ignore sub-100ms jitter
            regressed.append((name, a, b, ratio))
        elif ratio < 1 - thresh and a - b > 0.1:
            improved.append((name, a, b, ratio))
    print(f"compared {len(common)} queries ({old_path} -> {new_path}), "
          f"threshold {thresh:.0%}")
    if only_new:
        print(f"new queries ({len(only_new)}): {', '.join(only_new[:20])}")
    if only_old:
        print(f"dropped queries ({len(only_old)}): {', '.join(only_old[:20])}")
    for name, a, b, r in sorted(regressed, key=lambda t: -t[3]):
        print(f"REGRESSED {r:5.2f}x  {a:7.3f}s -> {b:7.3f}s  {name}")
    for name, a, b, r in sorted(improved, key=lambda t: t[3]):
        print(f"improved  {r:5.2f}x  {a:7.3f}s -> {b:7.3f}s  {name}")
    if not regressed and not improved:
        print("no changes past threshold")
    drift = structural_drift(load_structural(old_path), load_structural(new_path))
    for name, metric, o, n in drift:
        print(f"STRUCTURAL {metric} {o} -> {n}  {name}")
    if regressed and not drift:
        print(
            "wall regressions with ZERO structural drift — consistent "
            "with host load, not a plan change (see BASELINE.md r6 "
            "variance investigation)"
        )
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())

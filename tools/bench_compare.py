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
    return 1 if regressed else 0


if __name__ == "__main__":
    sys.exit(main())

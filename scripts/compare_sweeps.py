"""Compare two bench_registry.py sweeps (e.g. sf1 vs sf10) and flag
entries whose large-SF time exceeds K x the linear extrapolation —
where a hidden single-partition sort or re-execution would surface.

Usage: python scripts/compare_sweeps.py SMALL.jsonl BIG.jsonl RATIO K
  RATIO: data-size ratio big/small (e.g. 10)
  K: flag threshold on t_big / (RATIO * t_small), default 2.0

Sub-linear entries are normal (fixed overhead amortizes); flagged
entries need an explanation or a fix. Tiny small-SF times are floored
at 0.2s so job-dispatch noise can't flag a 0.1s -> 0.5s entry.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    out = {}
    for line in open(path):
        r = json.loads(line)
        if "sec" in r and "error" not in r and "skipped" not in r:
            out[r["query"]] = r["sec"]
    return out


def main():
    small = load(sys.argv[1])
    big = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    k = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    flagged = []
    rows = []
    for q, tb in sorted(big.items(), key=lambda kv: -kv[1]):
        ts = small.get(q)
        if ts is None:
            continue
        scale = tb / (ratio * max(ts, 0.2))
        rows.append((q, ts, tb, scale))
        if scale > k:
            flagged.append((q, ts, tb, scale))
    print(f"{'query':38s} {'small':>8s} {'big':>8s} {'x-linear':>9s}")
    for q, ts, tb, sc in rows:
        mark = "  <-- FLAG" if sc > k else ""
        print(f"{q:38s} {ts:8.2f} {tb:8.2f} {sc:9.2f}{mark}")
    print(
        f"\n{len(rows)} compared, {len(flagged)} above {k}x linear; "
        f"totals {sum(small.values()):.1f}s -> {sum(big.values()):.1f}s"
    )


if __name__ == "__main__":
    main()

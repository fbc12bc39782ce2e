#!/usr/bin/env python3
"""Compare two graft bench artifacts: totals, top-N, per-query movers.

Usage: tools/bench_delta.py OLD.json NEW.json [N]

Prints a markdown table of the new top-N with old medians and ratios,
then movers >1.5x either way (ignoring sub-150ms medians on both
sides, the Bench delta convention).
"""
import json, sys

old = json.load(open(sys.argv[1]))
new = json.load(open(sys.argv[2]))
n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
oq, nq = old['queries'], new['queries']

print(f"old total {old['value']:.1f} s (spread {old.get('spread_pct', 0):.1f}%, "
      f"noisy={old.get('noisy')}) -> new total {new['value']:.1f} s "
      f"(spread {new.get('spread_pct', 0):.1f}%, noisy={new.get('noisy')})")
common = [k for k in nq if k in oq]
print(f"common queries {len(common)}; sum old {sum(oq[k] for k in common):.1f} "
      f"new {sum(nq[k] for k in common):.1f}")

print(f"\n| new top-{n} | old (s) | new (s) | ratio |")
print("|---|---|---|---|")
for k, v in sorted(nq.items(), key=lambda kv: -kv[1])[:n]:
    o = oq.get(k)
    print(f"| {k} | {o if o is not None else '—'} | {v:.1f} | "
          f"{v / o:.2f}x |" if o else f"| {k} | — | {v:.1f} | — |")

movers = []
for k in common:
    o, v = oq[k], nq[k]
    if max(o, v) > 0.15 and o > 0 and (v / o > 1.5 or o / v > 1.5):
        movers.append((v / o, k, o, v))
movers.sort()
print("\nmovers >1.5x (ratio, old, new):")
for r, k, o, v in movers:
    print(f"  {k}: {o:.2f} -> {v:.2f}  ({r:.2f}x)")

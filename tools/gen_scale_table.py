#!/usr/bin/env python
"""Render SCALE.md's measured-scale-up section from a scale_bench JSON.

Usage: python tools/gen_scale_table.py SCALE_SWEEP_r07.json
Prints the distribution buckets table and the >3x named-cause rows
(with x1/x10/factor filled; causes must be written by hand) so the
SCALE.md refresh is mechanical per round.
"""
from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    d = json.load(open(sys.argv[1]))
    qs = {k: v for k, v in d["queries"].items()
          if "factor" in v and "@" not in k}
    variants = {k: v for k, v in d["queries"].items() if "@" in k}
    factors = {k: v["factor"] for k, v in qs.items()}
    med = statistics.median(factors.values())
    print(f"queries measured: {len(qs)}; median factor: {med:.2f}x")
    buckets = [("<= 1.0x (flat: floor/broadcast-dim bound)",
                lambda f: f <= 1.0),
               ("1.0-1.5x", lambda f: 1.0 < f <= 1.5),
               ("1.5-2.0x", lambda f: 1.5 < f <= 2.0),
               ("2.0-3.0x", lambda f: 2.0 < f <= 3.0),
               ("> 3.0x (named below)", lambda f: f > 3.0)]
    print("\n| 10x factor bucket | queries |")
    print("|---|---|")
    for label, pred in buckets:
        names = sorted(k.split("_")[0] for k, f in factors.items()
                       if pred(f))
        print(f"| {label} | {len(names)}: {', '.join(names)} |")
    print("\n| query | x1 | x10 | factor | cause |")
    print("|---|---|---|---|---|")
    for k in sorted(factors, key=lambda k: -factors[k]):
        if factors[k] > 3.0:
            v = qs[k]
            print(f"| {k} | {v['x1']} s | {v['x10']} s | "
                  f"{v['factor']}x | FILL_CAUSE |")
    if variants:
        print("\nvariants:")
        for k, v in sorted(variants.items()):
            print(f"  {k}: x1={v.get('x1')} x10={v.get('x10')} "
                  f"factor={v.get('factor')}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

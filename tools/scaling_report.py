#!/usr/bin/env python3
"""Scaling-curve report: compare two graft.Bench full-JSON outputs
(e.g. sf0.1 vs a GenSf-generated sf1) and print per-query runtime
ratios with scaling exponents.

With a data-size factor F between the runs, a query whose runtime grows
r× has scaling exponent log(r)/log(F): ~1 = linear, <1 = overhead
amortizing, >~1.2 = super-linear (named in SCALE.md with its cause).

Usage: python3 tools/scaling_report.py <bench_base.json> <bench_big.json> [factor]
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return d["queries"] if "queries" in d else d


def main():
    base, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for name, tb in sorted(base.items()):
        tg = big.get(name)
        if tg is None or tb <= 0 or tg <= 0:
            continue
        ratio = tg / tb
        # sub-0.3s base timings are overhead-dominated; exponent is noise
        exp = math.log(ratio) / math.log(factor) if tb >= 0.3 else float("nan")
        rows.append((name, tb, tg, ratio, exp))
    rows.sort(key=lambda r: -r[3])
    print(f"{'query':<34} {'base_s':>8} {'big_s':>8} {'ratio':>7} {'exp':>6}")
    for name, tb, tg, ratio, exp in rows:
        e = f"{exp:.2f}" if exp == exp else "-"
        print(f"{name:<34} {tb:>8.2f} {tg:>8.2f} {ratio:>7.2f} {e:>6}")
    tot_b = sum(r[1] for r in rows)
    tot_g = sum(r[2] for r in rows)
    print(f"\n{'TOTAL':<34} {tot_b:>8.1f} {tot_g:>8.1f} {tot_g/tot_b:>7.2f}")
    supra = [r for r in rows if r[4] == r[4] and r[4] > 1.2]
    print(f"\nsuper-linear (exp > 1.2, base >= 0.3s): {len(supra)}")
    for name, tb, tg, ratio, exp in supra:
        print(f"  {name}: {tb:.2f}s -> {tg:.2f}s (exp {exp:.2f})")


if __name__ == "__main__":
    main()

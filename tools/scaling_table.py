#!/usr/bin/env python3
"""Build the BENCH_NOTES sf0.1 -> sf1 scaling table from Bench JSON files.

Usage: python3 tools/scaling_table.py SF01_JSON... -- SF1_JSON...

Each side takes one or more BENCH_LOCAL.json files (min-of-N per query).
Prints a markdown table sorted by scaling ratio (worst first), flagging
queries whose ratio exceeds the data-growth factor (10x) — the
super-linear suspects — and a summary line.
"""
import json
import sys


def load_min(paths):
    per = {}
    for p in paths:
        with open(p) as f:
            d = json.load(f)
        for q, t in d["queries"].items():
            if t <= 0:
                continue
            per[q] = min(per.get(q, float("inf")), t)
    return per


def main():
    argv = sys.argv[1:]
    cut = argv.index("--")
    a, b = load_min(argv[:cut]), load_min(argv[cut + 1:])
    rows = []
    for q in sorted(set(a) & set(b)):
        # floor tiny sf0.1 times at 100ms: fixed per-query overhead (job
        # scheduling, plan compile) dominates below that and turns a
        # constant-cost query into a fake "10x regression"
        ratio = b[q] / max(a[q], 0.1)
        rows.append((ratio, q, a[q], b[q]))
    rows.sort(reverse=True)
    print("| query | sf0.1 s | sf1 s | ratio | note |")
    print("|---|---|---|---|---|")
    for ratio, q, ta, tb in rows:
        note = "**super-linear**" if ratio > 10.0 else ""
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {ratio:.1f}x | {note} |")
    tot_a, tot_b = sum(a[q] for _, q, *_ in rows), sum(b[q] for _, q, *_ in rows)
    over = sum(1 for r in rows if r[0] > 10.0)
    print(f"\nTotals: sf0.1 {tot_a:.1f} s -> sf1 {tot_b:.1f} s "
          f"({tot_b / tot_a:.2f}x for 10x data); {over} quer{'y' if over == 1 else 'ies'} over 10x.")


if __name__ == "__main__":
    main()

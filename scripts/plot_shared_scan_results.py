#!/usr/bin/env python3
"""Shared-scan sweep plots.

Port of the reference's scripts/plot_shared_scan_results.py:24-93 — four
figures from the sweep CSV:
  1. absolute ms vs k
  2. ms per predicate vs k
  3. % improvement of the fused shared scan over the sequential baseline
  4. GB/s vs k (replaces the reference's ms-vs-data-size figure with the
     roofline-relevant view)

Usage: python scripts/plot_shared_scan_results.py [in.csv] [out_prefix]
"""
from __future__ import annotations

import csv
import sys
from collections import defaultdict


def load(path: str):
    by_variant = defaultdict(list)  # name -> [(k, avg_ms, gb_per_s)]
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            by_variant[row["name"]].append(
                (int(row["k"]), float(row["avg_ms"]),
                 float(row["gb_per_s"]) if row.get("gb_per_s") else None)
            )
    for v in by_variant.values():
        v.sort()
    return by_variant


def main(argv: list[str]) -> int:
    path = argv[0] if argv else "shared_scan_results.csv"
    prefix = argv[1] if len(argv) > 1 else "shared_scan"
    data = load(path)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def fig(fname, title, ylab, series, logy=False):
        plt.figure(figsize=(7, 4.5))
        for name, pts in series.items():
            ks = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            plt.plot(ks, ys, marker="o", label=name)
        plt.xscale("log", base=2)
        if logy:
            plt.yscale("log")
        plt.xlabel("predicate count k")
        plt.ylabel(ylab)
        plt.title(title)
        plt.legend(fontsize=7)
        plt.tight_layout()
        plt.savefig(f"{prefix}_{fname}.png", dpi=120)
        plt.close()

    fig("abs_ms", "Shared scan runtime", "ms",
        {n: [(k, ms) for k, ms, _ in pts] for n, pts in data.items()}, logy=True)
    fig("ms_per_predicate", "Runtime per predicate", "ms / predicate",
        {n: [(k, ms / k) for k, ms, _ in pts] for n, pts in data.items()},
        logy=True)

    seq = next((n for n in data if "oracle" in n or "sequential" in n), None)
    fused = next((n for n in data if "pallas shared" in n), None)
    if seq and fused:
        seq_ms = {k: ms for k, ms, _ in data[seq]}
        imp = [
            (k, 100.0 * (seq_ms[k] - ms) / seq_ms[k])
            for k, ms, _ in data[fused] if k in seq_ms
        ]
        fig("improvement", f"Improvement vs {seq}", "% faster",
            {fused: imp})

    gbs = {
        n: [(k, g) for k, _, g in pts if g is not None]
        for n, pts in data.items()
    }
    gbs = {n: pts for n, pts in gbs.items() if pts}
    if gbs:
        fig("gb_per_s", "Throughput", "GB/s (total HBM traffic)", gbs)

    print(f"wrote {prefix}_*.png")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

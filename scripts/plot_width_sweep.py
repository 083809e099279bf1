#!/usr/bin/env python3
"""Width-sweep figure: GB/s vs bit width per op, from the committed CSV.

Usage: python scripts/plot_width_sweep.py [in.csv] [out.png]
"""
from __future__ import annotations

import csv
import sys
from collections import defaultdict


def main(argv: list[str]) -> int:
    path = argv[0] if argv else "bench_results/width_sweep_v5e_256m.csv"
    out = argv[1] if len(argv) > 1 else "bench_results/width_sweep_gb_per_s.png"

    series = defaultdict(list)
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            series[row["op"]].append((int(row["width"]), float(row["gb_per_s"])))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(7, 4.5))
    for name, pts in sorted(series.items()):
        pts.sort()
        plt.plot([p[0] for p in pts], [p[1] for p in pts], marker="o", label=name)
    plt.axhline(819, color="gray", ls="--", lw=0.8, label="nominal HBM roofline")
    plt.axhline(725, color="gray", ls=":", lw=0.8, label="measured copy")
    plt.xlabel("bit width")
    plt.ylabel("GB/s (total HBM traffic)")
    plt.title("Throughput vs bit width (v5e, 256 MiB packed)")
    plt.legend(fontsize=7)
    plt.tight_layout()
    plt.savefig(out, dpi=120)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

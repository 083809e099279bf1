#!/usr/bin/env python3
"""Windowed-vs-chunked shared-scan plot from run_windowed_sweep.py CSV.

One grouped-bar figure: GB/s per (width, k) clustered key set, windowed
tier vs the 32-key-chunked compare tier (the dispatch alternative).  Shows
where the windowed decomposition's cluster-dependent cost beats the
compare kernels' 3*k per-value cost.

Usage: python scripts/plot_windowed_sweep.py [in.csv] [out.png]
"""
from __future__ import annotations

import csv
import sys
from collections import defaultdict

# categorical slots 1-2 (validated adjacent-pair order, light surface)
C_WINDOWED = "#2a78d6"
C_CHUNKED = "#eb6834"
SURFACE = "#fcfcfb"
TEXT = "#0b0b0b"
TEXT2 = "#52514e"


def main(argv: list[str]) -> int:
    path = argv[0] if argv else "bench_results/windowed_sweep_v5e_64m.csv"
    out = argv[1] if len(argv) > 1 else "bench_results/windowed_sweep_gb_per_s.png"

    by_cfg = defaultdict(dict)  # (width, k) -> {variant: gb/s}
    with open(path, newline="") as f:
        for row in csv.DictReader(f):
            by_cfg[(int(row["width"]), int(row["k"]))][row["variant"]] = float(
                row["gb_per_s"]
            )
    cfgs = sorted(by_cfg)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 3.8), facecolor=SURFACE)
    ax.set_facecolor(SURFACE)
    xs = range(len(cfgs))
    bw = 0.38
    wvals = [by_cfg[c].get("windowed shared scan", 0.0) for c in cfgs]
    cvals = [by_cfg[c].get("chunked shared scan", 0.0) for c in cfgs]
    ax.bar([x - bw / 2 for x in xs], wvals, bw * 0.94, color=C_WINDOWED,
           label="windowed (clustered tier)", zorder=3)
    ax.bar([x + bw / 2 for x in xs], cvals, bw * 0.94, color=C_CHUNKED,
           label="chunked compare (general tier)", zorder=3)
    for x, v in zip(xs, wvals):
        ax.annotate(f"{v:.0f}", (x - bw / 2, v), ha="center", va="bottom",
                    fontsize=8, color=TEXT2)
    ax.set_xticks(list(xs))
    ax.set_xticklabels([f"w={w}\nk={k}" for w, k in cfgs], fontsize=9,
                       color=TEXT)
    ax.set_ylabel("GB/s (HBM traffic)", color=TEXT)
    ax.set_title(
        "Clustered concrete keys: windowed tier vs compare tier (v5e, 64 MiB)",
        fontsize=10, color=TEXT,
    )
    ax.tick_params(colors=TEXT2)
    ax.grid(axis="y", color="#e4e3df", zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#c9c8c2")
    ax.legend(frameon=False, fontsize=9, labelcolor=TEXT)
    fig.tight_layout()
    fig.savefig(out, dpi=160)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

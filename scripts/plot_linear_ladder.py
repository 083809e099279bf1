"""Linear-export ladder figure: ms per 512 MiB query vs k, one line per
formulation (fused consecutive / fused static spread / fused traced /
two-kernel / native comparator), from the committed linear CSVs.

Usage: python scripts/plot_linear_ladder.py [out.png]
"""
import csv
import glob
import sys


def main(argv):
    out = argv[0] if argv else "bench_results/linear_ladder_ms_vs_k.png"
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series: dict[str, dict[int, float]] = {}
    # sorted() so duplicate (path, k) precedence is deterministic across
    # filesystems (glob order is OS-dependent); later files
    # lexicographically win, which puts the k-specific and spread CSVs
    # after the base linear_v5e file
    for path in sorted(glob.glob("bench_results/linear*_v5e_512m.csv")):
        for r in csv.DictReader(open(path, newline="")):
            k = int(r["k"])
            p = r["path"]
            series.setdefault(p, {})[k] = float(r["ms"])
    for r in csv.DictReader(
        open("bench_results/static_linear_sweep_v5e_512m.csv", newline="")
    ):
        series.setdefault("linear-fused-static-s8", {})[int(r["k"])] = float(
            r["ms"]
        )

    label = {
        "linear-fused-s8": "fused single-pass (consecutive keys)",
        "linear-fused-static-s8": "fused static-DAG (spread concrete keys)",
        "linear-fused-traced": "fused bit-sliced (traced/runtime keys)",
        "linear-twokernel": "two-kernel: scan + MXU relayout",
        "linear-mxu-words": "two-kernel: scan + MXU relayout",
        "native-kW-comparator": "native (k, W) comparator (no relayout)",
    }
    style = {
        "fused single-pass (consecutive keys)": ("o-", "#1b7f3b"),
        "fused static-DAG (spread concrete keys)": ("s-", "#2b6cb0"),
        "fused bit-sliced (traced/runtime keys)": ("^-", "#805ad5"),
        "two-kernel: scan + MXU relayout": ("d--", "#b7791f"),
        "native (k, W) comparator (no relayout)": (".-", "#718096"),
    }
    merged: dict[str, dict[int, float]] = {}
    for p, pts in series.items():
        lab = label.get(p)
        if lab is None:
            continue
        merged.setdefault(lab, {}).update(pts)

    fig, ax = plt.subplots(figsize=(7.2, 4.6), dpi=160)
    for lab, pts in sorted(merged.items()):
        ks = sorted(pts)
        fmt, color = style[lab]
        ax.plot(ks, [pts[k] for k in ks], fmt, color=color, label=lab,
                linewidth=1.6, markersize=5)
    ax.set_xlabel("predicate count k")
    ax.set_ylabel("ms per 512 MiB query")
    ax.set_xscale("log", base=2)
    ax.set_yscale("log")
    ax.set_xticks(sorted({k for pts in merged.values() for k in pts}))
    ax.get_xaxis().set_major_formatter(plt.FormatStrFormatter("%d"))
    ax.grid(True, which="both", alpha=0.25, linewidth=0.5)
    ax.set_title("Linear (interleaved) export ladder — v5e, 512 MiB packed")
    ax.legend(fontsize=8, frameon=False)
    fig.tight_layout()
    fig.savefig(out)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

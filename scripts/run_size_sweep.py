#!/usr/bin/env python3
"""Shared-scan data-size sweep at fixed k -> CSV + plot.

The reference's fig 4 is ms vs data size at fixed k
(scripts/plot_shared_scan_results.py:76-93).  On this hardware the figure
matters even more: working sets under ~150 MB are served from on/near-chip
cache (measured ~3.6 TB/s for a 64 MiB copy), so throughput has a cliff
the k-sweep's single size cannot show.  This sweep runs the dispatch-path
shared scan and the measured sequential baseline across packed sizes.

Usage: python scripts/run_size_sweep.py [out.csv] [--k=8] [--width=9]
           [--reps=3] [--sizes=16m,32m,64m,128m,256m,512m] [--plot=prefix]
"""
from __future__ import annotations

import csv
import functools
import sys

sys.path.insert(0, ".")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402


def main(argv):
    out_path, k, width, reps = "size_sweep_results.csv", 8, 9, 3
    sizes_s, plot_prefix = "16m,32m,64m,128m,256m,512m", None
    for a in argv:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--width="):
            width = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--sizes="):
            sizes_s = a.split("=", 1)[1]
        elif a.startswith("--plot="):
            plot_prefix = a.split("=", 1)[1]
        else:
            out_path = a
    from shared_simd_scan_tpu.bench.cli import _parse_size

    rows = []
    for size_s in sizes_s.split(","):
        size = _parse_size(size_s.strip())
        n = harness.values_for(size, width)
        vals = harness.synth_modk(n, k, width)
        dev = unpack_ops.pack_device_kernel(vals, width)
        packed = layout.packed_nbytes(width, n)
        traffic = packed + k * layout.bitvector_words(n) * 4
        seq_traffic = k * (packed + layout.bitvector_words(n) * 4)

        variants = [
            ("pallas shared scan",
             functools.partial(harness.chain_interval_scan,
                               width=width, n=n, tb=None, kk=k),
             (dev.tiles,), traffic, traffic / 600e9),
            ("sequential shared scan (measured)",
             functools.partial(harness.chain_sequential_shared_scan,
                               width=width, n=n, tb=None, kk=k),
             (dev.tiles,), seq_traffic, seq_traffic / 650e9),
        ]
        for name, fn, args, t, est in variants:
            try:
                m = measure_loop(fn, args, trials=reps, est_iter_s=est)
            except Exception as e:
                print(f"size={size_s} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
                continue
            gbs = t / m.seconds / 1e9
            rows.append({"size_mib": size // (1024 * 1024), "k": k, "name": name,
                         "avg_ms": round(m.millis, 6), "gb_per_s": round(gbs, 1)})
            print(f"size={size_s:>5} {name}: {m.millis:.3f} ms  {gbs:.0f} GB/s",
                  flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["size_mib", "k", "name", "avg_ms",
                                          "gb_per_s"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {len(rows)} rows to {out_path}")

    if plot_prefix:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from collections import defaultdict

        for field, ylab, fname, logy in (
            ("avg_ms", "ms", "ms_vs_size", True),
            ("gb_per_s", "GB/s (total HBM traffic)", "gbs_vs_size", False),
        ):
            series = defaultdict(list)
            for r in rows:
                series[r["name"]].append((r["size_mib"], r[field]))
            plt.figure(figsize=(7, 4.5))
            for name, pts in series.items():
                pts.sort()
                plt.plot([p[0] for p in pts], [p[1] for p in pts],
                         marker="o", label=name)
            plt.xscale("log", base=2)
            if logy:
                plt.yscale("log")
            plt.xlabel("packed data size (MiB)")
            plt.ylabel(ylab)
            plt.title(f"Shared scan vs data size (k={k}, width={width})")
            plt.legend(fontsize=7)
            plt.tight_layout()
            plt.savefig(f"{plot_prefix}_{fname}.png", dpi=120)
            plt.close()
        print(f"wrote {plot_prefix}_*.png")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

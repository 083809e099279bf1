#!/usr/bin/env python3
"""Static cost model report per kernel configuration.

The TPU analog of the reference's callgrind cost extraction
(scripts/callgrind_tools.py — SURVEY.md §2.3 S4): instead of profiling
instruction counts after the fact, derive them from the kernel structure
(every kernel is a statically scheduled sequence of vector ops), print
ops/value and bytes/value, classify each configuration as HBM- or
VPU-bound on a chosen chip, and predict the throughput ceiling.

Usage: python scripts/kernel_cost_report.py [--width=9] [--k=1,8,32]
           [--hbm-gbps=819] [--vpu-tops=4.6]

The default VPU throughput (4.6 Tops/s effective for this op mix on v5e)
was fitted from measured kernels; see docs/DESIGN.md §4.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

from shared_simd_scan_tpu.layout import unpack_schedule


def unpack_ops_per_value(width: int) -> float:
    """shift + (or+shift when straddling) + and, per value."""
    total = 0
    for _, _, straddles in unpack_schedule(width):
        total += 2 + (2 if straddles else 0)
    return total / 32


def report(width: int, ks: list[int], hbm: float, vpu: float) -> None:
    u = unpack_ops_per_value(width)
    rows = []
    rows.append(("unpack", u + 1, width / 8 + 4.0))
    rows.append(("pack", u + 1, 4.0 + width / 8))  # symmetric schedule
    for k in ks:
        general = u + 3.0 * k + 0.15
        interval = u + 5.0 + 2.0 + 3.25 * ((k + 7) // 8) + 0.44 * k
        io_bytes = width / 8 + k / 8.0
        rows.append((f"shared scan k={k} (general keys)", general, io_bytes))
        if k <= 32:
            rows.append((f"shared scan k={k} (consecutive keys)", interval, io_bytes))
        rows.append((f"range scan k={k}", u + 4.0 * k + 0.15, io_bytes))

    print(f"# width={width}; chip model: HBM {hbm:.0f} GB/s, "
          f"VPU {vpu:.1f} Tops/s (effective)")
    print(f"{'kernel':44s} {'ops/val':>8s} {'B/val':>6s} "
          f"{'VPU Gv/s':>9s} {'HBM Gv/s':>9s} {'bound':>5s} {'ceil GB/s':>10s}")
    for name, ops, bpv in rows:
        vpu_gvs = vpu * 1e3 / ops      # Gvalue/s
        hbm_gvs = hbm / bpv
        bound = "VPU" if vpu_gvs < hbm_gvs else "HBM"
        ceil = min(vpu_gvs, hbm_gvs) * bpv
        print(f"{name:44s} {ops:8.1f} {bpv:6.2f} {vpu_gvs:9.0f} "
              f"{hbm_gvs:9.0f} {bound:>5s} {ceil:10.0f}")


def main(argv: list[str]) -> int:
    width, ks, hbm, vpu = 9, [1, 8, 32], 819.0, 4.6
    for a in argv:
        if a.startswith("--width="):
            width = int(a.split("=", 1)[1])
        elif a.startswith("--k="):
            ks = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--hbm-gbps="):
            hbm = float(a.split("=", 1)[1])
        elif a.startswith("--vpu-tops="):
            vpu = float(a.split("=", 1)[1])
    report(width, ks, hbm, vpu)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

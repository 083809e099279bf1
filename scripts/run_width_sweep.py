#!/usr/bin/env python3
"""Bit-width sweep: unpack + shared-scan throughput across widths -> CSV.

The reference hardcodes width 9 (BITS_NEEDED, simd_scan.hpp:12); this
framework supports widths 1..31 as runtime jit specializations, and this
sweep pins down the performance claim across the range (the cost model
says unpack stays HBM-bound at every width; shared scans shift with
traffic per value).

Usage: python scripts/run_width_sweep.py [out.csv] [--data-size=64m]
           [--widths=3,5,9,13,17,25,31] [--k=8] [--reps=2]
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

import jax.numpy as jnp  # noqa: E402

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.cli import _parse_size  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402


def main(argv):
    out_path, data_size, widths, k, reps = (
        "width_sweep_results.csv", "64m", [3, 5, 9, 13, 17, 25, 31], 8, 2,
    )
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--widths="):
            widths = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            out_path = a

    size = _parse_size(data_size)
    rows = []
    for width in widths:
        n = harness.values_for(size, width)
        vals = harness.synth_modk(n, k, width)
        dev = unpack_ops.pack_device_kernel(vals, width)
        del vals  # narrow widths: the raw column is ~4x the packed size
        packed = layout.packed_nbytes(width, n)

        tr_u = packed + 4 * n
        m = measure_loop(
            functools.partial(harness.chain_unpack, width=width, tb=128),
            (dev.tiles,), trials=reps, est_iter_s=tr_u / 600e9,
        )
        rows.append({"width": width, "op": "unpack",
                     "avg_ms": round(m.millis, 6),
                     "gb_per_s": round(tr_u / m.seconds / 1e9, 1)})
        print(f"w={width:2d} unpack: {m.millis:.3f} ms "
              f"{tr_u / m.seconds / 1e9:.0f} GB/s", flush=True)

        tr_s = packed + k * layout.bitvector_words(n) * 4
        m = measure_loop(
            functools.partial(harness.chain_interval_scan, width=width,
                              n=n, tb=None, kk=k),
            (dev.tiles,), trials=reps, est_iter_s=tr_s / 450e9,
        )
        rows.append({"width": width, "op": f"shared scan k={k} (interval)",
                     "avg_ms": round(m.millis, 6),
                     "gb_per_s": round(tr_s / m.seconds / 1e9, 1)})
        print(f"w={width:2d} shared k={k}: {m.millis:.3f} ms "
              f"{tr_s / m.seconds / 1e9:.0f} GB/s", flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["width", "op", "avg_ms", "gb_per_s"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {len(rows)} rows to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

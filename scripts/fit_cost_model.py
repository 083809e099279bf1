#!/usr/bin/env python3
"""Fit the cost model's effective VPU rate from measured sweep CSVs.

Closes the loop VERDICT r1 asked for: kernel_cost_report.py's ops/value
are COUNTED from kernel jaxprs (utils/costmodel.py); this script combines
them with a measured k-sweep CSV (scripts/run_k_sweep.py output) and
derives the one free parameter — the effective VPU throughput for this op
mix — as the median implied rate over rows that are not HBM-saturated.
Writes bench_results/cost_model_fit.json, which kernel_cost_report.py
picks up automatically, plus a per-row residual table.

Usage: python scripts/fit_cost_model.py [k_sweep.csv] [--width=9]
           [--copy-gbps=725] [--out=bench_results/cost_model_fit.json]
"""
from __future__ import annotations

import csv
import json
import os
import sys

sys.path.insert(0, ".")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.utils.costmodel import count_vector_ops  # noqa: E402


def _tiny_tiles(width: int):
    vals = np.arange(8 * 128 * 32, dtype=np.uint32) & ((1 << width) - 1)
    return layout.pack_device(jnp.asarray(vals), width).tiles


def ops_per_value(name: str, k: int, width: int, cache: dict) -> float | None:
    key = (name, k)
    if key in cache:
        return cache[key]
    t = _tiny_tiles(width)
    n = t.shape[1] * 128 * 32
    keys = jnp.arange(k, dtype=jnp.uint32)
    if name == "pallas shared scan":
        if k == 1:
            c = count_vector_ops(
                lambda x, kk: scan_ops.shared_scan_tiles(x, kk, width, n), t, keys)
            ops = c["per_value"]
        else:
            krows = scan_ops._interval_krows(k)
            nchunks = (k + krows - 1) // krows
            c = count_vector_ops(
                lambda x: scan_ops.interval_scan_tiles(x, 0, k, width, n), t)
            ops = c["per_value"] * nchunks
    elif name == "pallas general-key shared scan":
        if k <= 32:
            c = count_vector_ops(
                lambda x, kk: scan_ops.shared_scan_tiles(x, kk, width, n), t, keys)
            ops = c["per_value"]
        else:
            krows = scan_ops._interval_krows(k)
            nchunks = (k + krows - 1) // krows
            c = count_vector_ops(
                lambda x, kk: scan_ops.shared_scan_chunked_tiles(
                    x, kk, width, n), t, keys)
            ops = c["per_value"] * nchunks
    else:
        return None  # sequential / dynamic rows: not modeled
    cache[key] = ops
    return ops


def main(argv: list[str]) -> int:
    csv_path = "bench_results/k_sweep_v5e_64m.csv"
    width, copy_gbps = 9, 725.0
    out_path = "bench_results/cost_model_fit.json"
    for a in argv:
        if a.startswith("--width="):
            width = int(a.split("=", 1)[1])
        elif a.startswith("--copy-gbps="):
            copy_gbps = float(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        else:
            csv_path = a

    cache: dict = {}
    rows_out, implied = [], []
    with open(csv_path, newline="") as f:
        for row in csv.DictReader(f):
            name, k = row["name"], int(row["k"])
            if not row.get("gb_per_s"):
                continue
            gbs = float(row["gb_per_s"])
            ops = ops_per_value(name, k, width, cache)
            if ops is None:
                continue
            bpv = width / 8 + k / 8.0
            gvalues = gbs / bpv  # Gvalues/s
            tops = gvalues * ops / 1e3  # implied effective Tops
            hbm_bound = gbs >= 0.85 * copy_gbps
            rows_out.append({
                "name": name, "k": k, "gb_per_s": gbs,
                "ops_per_value": round(ops, 2),
                "implied_vpu_tops": round(tops, 3),
                "hbm_saturated": hbm_bound,
            })
            if not hbm_bound:
                implied.append(tops)

    if not implied:
        print("no VPU-bound rows found; nothing to fit")
        return 1
    fit = float(np.median(implied))
    result = {
        "vpu_tops_effective": round(fit, 3),
        "fit_rows": len(implied),
        "copy_roofline_gbps": copy_gbps,
        "source_csv": csv_path,
        "rows": rows_out,
    }
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"fitted effective VPU rate: {fit:.3f} Tops/s "
          f"(median over {len(implied)} non-saturated rows)")
    for r in rows_out:
        tag = "HBM-sat" if r["hbm_saturated"] else "  fit  "
        print(f"  [{tag}] {r['name']:36s} k={r['k']:4d} {r['gb_per_s']:7.1f} GB/s"
              f"  ops/val={r['ops_per_value']:8.2f}"
              f"  implied={r['implied_vpu_tops']:6.3f} Tops")
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

#!/usr/bin/env python3
"""Kernel cost report: structurally COUNTED ops/value per configuration.

The TPU analog of the reference's callgrind cost extraction
(scripts/callgrind_tools.py — SURVEY.md §2.3 S4).  Round 1 used hand-fitted
constants; this version traces every kernel and counts its vector ALU ops
via ``shared_simd_scan_tpu.utils.costmodel`` — the numbers are derived from
the code that actually runs.  The effective VPU rate comes from
``bench_results/cost_model_fit.json`` (written by scripts/fit_cost_model.py
from measured sweep CSVs) when present.

Usage: python scripts/kernel_cost_report.py [--width=9] [--k=1,8,32,512]
           [--hbm-gbps=819] [--vpu-tops=override]
"""
from __future__ import annotations

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
from shared_simd_scan_tpu.ops import aggregate as agg_ops  # noqa: E402
from shared_simd_scan_tpu.ops import member as member_ops  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402
from shared_simd_scan_tpu.utils.costmodel import count_vector_ops  # noqa: E402

DEFAULT_VPU_TOPS = 4.2  # fallback when no fit file exists


def _tiny_tiles(width: int):
    vals = np.arange(8 * 128 * 32, dtype=np.uint32) & ((1 << width) - 1)
    return layout.pack_device(jnp.asarray(vals), width).tiles


def load_fitted_vpu() -> float | None:
    path = os.path.join("bench_results", "cost_model_fit.json")
    if os.path.exists(path):
        with open(path) as f:
            return float(json.load(f)["vpu_tops_effective"])
    return None


def configs(width: int, ks: list[int]):
    t = _tiny_tiles(width)
    n = t.shape[1] * 128 * 32
    yield ("unpack", width / 8 + 4.0, 1,
           lambda: count_vector_ops(
               lambda x: unpack_ops.unpack_tiles(x, width), t))
    # executed (not just traced) on CPU -> interpret mode
    vals = unpack_ops.unpack_tiles(t, width, interpret=True)
    yield ("pack", 4.0 + width / 8, 1,
           lambda: count_vector_ops(
               lambda v: unpack_ops.pack_tiles(v, width), vals))
    for k in ks:
        io = width / 8 + k / 8.0
        keys = jnp.arange(k, dtype=jnp.uint32)
        if k <= 32:
            yield (f"shared scan k={k} (general keys)", io, 1,
                   lambda keys=keys: count_vector_ops(
                       lambda x, kk: scan_ops.shared_scan_tiles(
                           x, kk, width, n), t, keys))
        else:
            nchunks = (k + scan_ops._interval_krows(k) - 1) // scan_ops._interval_krows(k)
            yield (f"shared scan k={k} (chunked general keys)", io, nchunks,
                   lambda keys=keys: count_vector_ops(
                       lambda x, kk: scan_ops.shared_scan_chunked_tiles(
                           x, kk, width, n), t, keys))
        nchunks = ((k + scan_ops._interval_krows(k) - 1)
                   // scan_ops._interval_krows(k)) if k > 32 else 1
        yield (f"shared scan k={k} (bit-sliced keys)", io, nchunks,
               lambda keys=keys: count_vector_ops(
                   lambda x, kk: scan_ops.shared_scan_bitsliced_tiles(
                       x, kk, width, n), t, keys))
        yield (f"shared scan k={k} (interval keys)", io, nchunks,
               lambda k=k: count_vector_ops(
                   lambda x: scan_ops.interval_scan_tiles(
                       x, 0, k, width, n), t))
        if k <= 32:
            lows = jnp.zeros(k, jnp.uint32)
            highs = jnp.full(k, 5, jnp.uint32)
            yield (f"range scan k={k}", io, 1,
                   lambda lows=lows, highs=highs: count_vector_ops(
                       lambda x, lo, hi: scan_ops.range_scan_tiles(
                           x, lo, hi, width, n), t, lows, highs))

        # round-3 concrete-key tiers: priced by the SAME counted-DAG
        # dispatch models the library dispatches with (quarter-ops/value)
        spread = np.sort(np.unique(
            (np.arange(k, dtype=np.uint64) * 2654435761 % (1 << width))
            .astype(np.uint32)
        ))
        # label with the DEDUPLICATED key count: near/above 2^width the
        # spread generator collides and a k-label would under-state cost
        ks_u = int(spread.shape[0])
        yield (f"shared scan k={ks_u} (static AND-DAG spread)",
               width / 8 + ks_u / 8.0, 1,
               lambda spread=spread: {
                   "per_value": scan_ops.bitsliced_static_cost(
                       width, spread) / 4.0})
        yield (f"member IN-list k={ks_u} (OR-tree spread)",
               width / 8 + 1 / 8.0, 1,
               lambda spread=spread: {
                   "per_value": member_ops.member_ortree_cost(
                       width, spread) / 4.0})

        # fused GROUP-BY aggregates (predicate width x 16-bit measure)
        if k <= 32:
            mt = _tiny_tiles(16)
            yield (f"aggregate SUM/COUNT k={k} (wm=16)",
                   width / 8 + 2.0, 1,
                   lambda keys=keys, mt=mt: count_vector_ops(
                       lambda p, m, kk: agg_ops.aggregate_scan_tiles(
                           p, m, kk, width, 16, n), t, mt, keys))
            yield (f"minmax MIN/MAX k={k} (wm=16)",
                   width / 8 + 2.0, 1,
                   lambda keys=keys, mt=mt: count_vector_ops(
                       lambda p, m, kk: agg_ops.minmax_scan_tiles(
                           p, m, kk, width, 16, n), t, mt, keys))
    mt = _tiny_tiles(16)
    bits = jnp.zeros((t.shape[1], 128), jnp.uint32)
    yield ("masked aggregate (wm=16, any bitvector)", 2.0 + 1 / 8.0, 1,
           lambda mt=mt, bits=bits: count_vector_ops(
               lambda m, b: agg_ops.masked_aggregate_tiles(
                   m, b, 16, n), mt, bits))


def main(argv: list[str]) -> int:
    width, ks, hbm, vpu = 9, [1, 8, 32, 512], 819.0, None
    for a in argv:
        if a.startswith("--width="):
            width = int(a.split("=", 1)[1])
        elif a.startswith("--k="):
            ks = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--hbm-gbps="):
            hbm = float(a.split("=", 1)[1])
        elif a.startswith("--vpu-tops="):
            vpu = float(a.split("=", 1)[1])
    if vpu is None:
        vpu = load_fitted_vpu() or DEFAULT_VPU_TOPS

    print(f"# width={width}; chip model: HBM {hbm:.0f} GB/s, "
          f"VPU {vpu:.2f} Tops/s effective "
          f"({'fitted' if load_fitted_vpu() else 'default'}); "
          f"ops COUNTED from kernel jaxprs (see utils/costmodel.py)")
    print(f"{'kernel':44s} {'ops/val':>8s} {'B/val':>6s} "
          f"{'VPU Gv/s':>9s} {'HBM Gv/s':>9s} {'bound':>5s} {'ceil GB/s':>10s}")
    for name, bpv, steps_per_block, counter in configs(width, ks):
        c = counter()
        ops = c["per_value"] * steps_per_block
        vpu_gvs = vpu * 1e3 / max(ops, 1e-9)
        hbm_gvs = hbm / bpv
        bound = "VPU" if vpu_gvs < hbm_gvs else "HBM"
        ceil = min(vpu_gvs, hbm_gvs) * bpv
        print(f"{name:44s} {ops:8.1f} {bpv:6.2f} {vpu_gvs:9.0f} "
              f"{hbm_gvs:9.0f} {bound:>5s} {ceil:10.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

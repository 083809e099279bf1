#!/usr/bin/env python3
"""Bit-width sweep: unpack + shared-scan throughput across widths -> CSV.

The reference hardcodes width 9 (BITS_NEEDED, simd_scan.hpp:12); this
framework supports widths 1..31 as runtime jit specializations, and this
sweep pins down the performance claim across the range (the cost model
says unpack stays HBM-bound at every width; shared scans shift with
traffic per value).

Every width row is VERIFIED after timing (counts over the full column
vs a direct jnp compare; bitvector bytes vs the gather oracle on a
2M-value prefix).  The default width list includes the even widths
(2, 4, 8, 16, 24) whose mask-period family the reference's generic mask
generators get wrong (SURVEY.md §5 "do not replicate"), plus width 1.

Usage: python scripts/run_width_sweep.py [out.csv] [--data-size=64m]
           [--widths=1,2,3,4,5,8,9,13,16,17,24,25,31] [--k=8] [--reps=2]
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


def _synth_packed_sliced(n, k, width, nslices=8):
    """synth_modk(n, k, width) packed in B1 slices (now shared infra:
    harness.synth_modk_packed_sliced)."""
    return harness.synth_modk_packed_sliced(n, k, width, nslices)


def main(argv):
    out_path, data_size, widths, k, reps = (
        "width_sweep_results.csv", "64m",
        [1, 2, 3, 4, 5, 8, 9, 13, 16, 17, 24, 25, 31], 8, 2,
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
    # Narrow widths explode the RAW side (width 1 at 256 MiB packed is an
    # 8.6 GB uint32 column): cap the value count so synth + pack + unpack
    # buffers fit HBM, and record the actual packed size per row.  The cap
    # sits just under 2^31 (XLA's int32 indexing boundary) — width 1 at
    # the cap packs to 256.0 MiB, so every width can reach the HBM-bound
    # regime (>= 256 MiB packed; below ~150 MiB on-chip caching inflates
    # results — measured up to 3.6 TB/s on 64 MiB copies).
    max_values = (1 << 31) - 4096
    rows = []
    for width in widths:
        n = min(harness.values_for(size, width), max_values)
        # synth + pack in B1 slices, each fused under ONE jit: evaluated
        # eagerly the synth's arange/mod chain materializes ~3 raw copies
        # (25 GB at the width-1 cap), and even fused, the pack path's
        # block reshape picks a 4x-padded layout at n ~ 2^31 (32 GB —
        # both measured OOMs).  Slices bound the raw side to ~1 GB each.
        dev = _synth_packed_sliced(n, k, width)
        packed = layout.packed_nbytes(width, n)

        tr_u = packed + 4 * n
        m = measure_loop(
            functools.partial(harness.chain_unpack, width=width, tb=128),
            (dev.tiles,), trials=reps, est_iter_s=tr_u / 600e9,
        )
        rows.append({"width": width, "op": "unpack",
                     "packed_mib": round(packed / 2**20, 1),
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
                     "packed_mib": round(packed / 2**20, 1),
                     "avg_ms": round(m.millis, 6),
                     "gb_per_s": round(tr_s / m.seconds / 1e9, 1)})
        print(f"w={width:2d} shared k={k}: {m.millis:.3f} ms "
              f"{tr_s / m.seconds / 1e9:.0f} GB/s", flush=True)

        # post-timing verification (reference pattern, benchmark.cpp:70):
        # counts over the FULL column + bitvector bytes vs the gather
        # oracle on a 2M-value prefix
        from shared_simd_scan_tpu.ops import oracle, scan as scan_ops

        kk_v = min(k, 1 << width)
        bits, counts = scan_ops.interval_scan_device(dev, 0, kk_v)
        # fused per-key count passes: an eager synth or a (kk_v, n)
        # broadcast would each need 8-17 GB at the width-1 cap (n ~ 2^31).
        # j is a traced operand so ONE program compiles per width (a
        # baked-constant lambda per key forced kk_v full-column compiles
        # at 30s-5min each through the relay)
        count_j = jax.jit(
            lambda j: jnp.sum(
                harness.synth_modk(n, k, width) == j, dtype=jnp.uint32
            )
        )
        expect = jnp.stack([count_j(jnp.uint32(j)) for j in range(kk_v)])
        ok = bool(jnp.all(counts == expect))
        if ok:
            n_chk = min(n, 2_000_000)
            vals = harness.synth_modk(n_chk, k, width)  # prefix: i%k%m
            col_chk = layout.pack(vals[:n_chk], width)
            obits, _ = oracle.shared_scan_words(
                col_chk.words, jnp.arange(kk_v, dtype=jnp.uint32), width, n_chk)
            w_chk = layout.bitvector_words(n_chk)
            gb = bits[:, :w_chk]
            if n_chk % 32:
                tail = jnp.uint32((1 << (n_chk % 32)) - 1)
                gb = gb.at[:, -1].multiply(0).at[:, -1].add(
                    bits[:, w_chk - 1] & tail)
            ok = bool(jnp.all(gb == obits))
            del vals
        rows[-1]["verified"] = "ok" if ok else "FAILED"
        print(f"w={width:2d} verify: {'ok' if ok else 'FAILED'}", flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(
            f, fieldnames=["width", "op", "packed_mib", "avg_ms", "gb_per_s",
                           "verified"]
        )
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {len(rows)} rows to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

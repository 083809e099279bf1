#!/usr/bin/env python3
"""Single-process shared-scan k-sweep on the current backend -> CSV.

The reference's headline experiment (scripts/prepare_shared_scan_results.py
runs the binary per k; we keep everything in one process so device data and
compiled kernels are reused).  Benches, per k:

  - the library dispatch path for consecutive predicates 0..k-1
    (interval kernel for k<=32, general static kernel for k=1)
  - the general arbitrary-key kernel (static for k<=32, dynamic above)
  - per-predicate cost and "improvement vs k sequential single scans"
    (the reference's figure: k predicates for ~1 pass of bandwidth)

Usage: python scripts/run_k_sweep.py [out.csv] [--data-size=64m]
           [--max-k=512] [--reps=3] [--width=9]
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
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb"))
def chain_dynamic(tiles, keys, salt, k, *, width, n, tb):
    def body(i, acc):
        kv = keys + ((salt + jnp.uint32(i)) << 16)
        _, cnt = scan_ops.shared_scan_dynamic_tiles(tiles, kv, width, n, tb=tb)
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.int32(0))


def main(argv):
    out_path, data_size, max_k, reps, width = "k_sweep_results.csv", "64m", 512, 3, 9
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--max-k="):
            max_k = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--width="):
            width = int(a.split("=", 1)[1])
        else:
            out_path = a
    from shared_simd_scan_tpu.bench.cli import _parse_size

    size = _parse_size(data_size)
    n = harness.values_for(size, width)
    vals = harness.synth_modk(n, 8, width)
    dev = unpack_ops.pack_device_kernel(vals, width)
    packed = layout.packed_nbytes(width, n)
    keys_full = jnp.arange(max(max_k, 1), dtype=jnp.uint32)

    rows = []
    seq_ms = {}  # per-k cost of k sequential single-predicate scans

    k = 1
    while k <= max_k:
        traffic = packed + k * layout.bitvector_words(n) * 4
        est = traffic / 500e9

        variants = []
        if k == 1:
            variants.append(("pallas shared scan",
                             functools.partial(harness.chain_shared_scan,
                                               width=width, n=n, tb=None),
                             (dev.tiles, keys_full[:k])))
        elif k <= 32:
            variants.append(("pallas shared scan",
                             functools.partial(harness.chain_interval_scan,
                                               width=width, n=n, tb=None, kk=k),
                             (dev.tiles,)))
            variants.append(("pallas general-key shared scan",
                             functools.partial(harness.chain_shared_scan,
                                               width=width, n=n, tb=None),
                             (dev.tiles, keys_full[:k])))
        else:
            variants.append(("pallas shared scan",
                             functools.partial(harness.chain_interval_scan,
                                               width=width, n=n, tb=None, kk=k),
                             (dev.tiles,)))
            variants.append(("pallas general-key shared scan",
                             functools.partial(chain_dynamic,
                                               width=width, n=n, tb=None),
                             (dev.tiles, keys_full[:k])))

        for name, fn, args in variants:
            try:
                m = measure_loop(fn, args, trials=reps, est_iter_s=est)
            except Exception as e:  # keep sweeping past one bad configuration
                print(f"k={k:4d} {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                continue
            gbs = traffic / m.seconds / 1e9
            rows.append({"k": k, "name": name, "avg_ms": round(m.millis, 6),
                         "gb_per_s": round(gbs, 1)})
            print(f"k={k:4d} {name}: {m.millis:.3f} ms  {gbs:.0f} GB/s",
                  flush=True)
            if k == 1 and name == "pallas shared scan":
                seq_ms[1] = m.millis
        k *= 2

    # sequential baseline: k x the single-scan time (the reference's
    # shared_scan_128_sequential is exactly k repeated single scans)
    if 1 in seq_ms:
        for kk in sorted({row["k"] for row in rows}):
            rows.append({"k": kk, "name": "sequential baseline (k x single scan)",
                         "avg_ms": round(seq_ms[1] * kk, 6),
                         "gb_per_s": ""})

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["k", "name", "avg_ms", "gb_per_s"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {len(rows)} rows to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

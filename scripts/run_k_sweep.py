#!/usr/bin/env python3
"""Single-process shared-scan k-sweep on the current backend -> CSV.

The reference's headline experiment (scripts/prepare_shared_scan_results.py
runs the binary per k; we keep everything in one process so device data and
compiled kernels are reused).  Benches, per k:

  - "pallas shared scan": the library dispatch path for consecutive
    predicates 0..k-1 (general kernel at k=1, interval kernel for k>=2 —
    matching scan._consecutive_lo's threshold)
  - "pallas general-key shared scan": the arbitrary-key tier (static
    unrolled kernel k<=32, 32-key-chunked static kernel above)
  - "pallas dynamic-key shared scan": the non-unrolled fallback for
    traced key arrays (powers of two only — it is not a dispatch path)
  - "sequential shared scan (measured)": k separate single-predicate
    passes, ACTUALLY TIMED (the analog of shared_scan_128_sequential,
    src/benchmark.cpp:288-296) — not extrapolated from the k=1 time.

k grid: every k in 1..8, then steps of 4 to 40 (the dispatch-boundary
band), then a power-of-two-ish ladder to max-k — finer than round 1's
powers-of-two, bounded by remote-compile cost per distinct k.

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
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402


def sweep_ks(max_k: int) -> list[int]:
    ks = list(range(1, 9)) + list(range(12, 41, 4)) + [48, 64, 96, 128, 192,
                                                       256, 384, 512, 768, 1024]
    return [k for k in ks if k <= max_k]


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
    for k in sweep_ks(max_k):
        traffic = packed + k * layout.bitvector_words(n) * 4
        est = traffic / 550e9

        variants = []
        if k == 1:
            variants.append(("pallas shared scan",
                             functools.partial(harness.chain_shared_scan,
                                               width=width, n=n, tb=None),
                             (dev.tiles, keys_full[:k]), est))
        else:
            variants.append(("pallas shared scan",
                             functools.partial(harness.chain_interval_scan,
                                               width=width, n=n, tb=None, kk=k),
                             (dev.tiles,), est))
            # the dispatch tier for spread/traced arbitrary keys:
            # bit-sliced past the cost crossover, static compare below
            from shared_simd_scan_tpu.ops.scan import _bitsliced_wins

            if _bitsliced_wins(width, k):
                variants.append(("pallas general-key shared scan",
                                 functools.partial(
                                     harness.chain_bitsliced_shared_scan,
                                     width=width, n=n, tb=None),
                                 (dev.tiles, keys_full[:k]), est))
            elif k <= 32:
                variants.append(("pallas general-key shared scan",
                                 functools.partial(harness.chain_shared_scan,
                                                   width=width, n=n, tb=None),
                                 (dev.tiles, keys_full[:k]), est))
            else:
                variants.append(("pallas general-key shared scan",
                                 functools.partial(harness.chain_chunked_shared_scan,
                                                   width=width, n=n, tb=None),
                                 (dev.tiles, keys_full[:k]), est))
                if k & (k - 1) == 0:  # powers of two only: not a dispatch path
                    variants.append(("pallas dynamic-key shared scan",
                                     functools.partial(
                                         harness.chain_dynamic_shared_scan,
                                         width=width, n=n, tb=None),
                                     (dev.tiles, keys_full[:k]), traffic / 150e9))
        # measured sequential baseline: k full single-predicate passes
        seq_traffic = k * (packed + layout.bitvector_words(n) * 4)
        variants.append(("sequential shared scan (measured)",
                         functools.partial(harness.chain_sequential_shared_scan,
                                           width=width, n=n, tb=None, kk=k),
                         (dev.tiles,), seq_traffic / 650e9))

        for name, fn, args, est_i in variants:
            try:
                m = measure_loop(fn, args, trials=reps, est_iter_s=est_i)
            except Exception as e:  # keep sweeping past one bad configuration
                print(f"k={k:4d} {name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                      flush=True)
                continue
            t = seq_traffic if name.startswith("sequential") else traffic
            gbs = t / m.seconds / 1e9
            rows.append({"k": k, "name": name, "avg_ms": round(m.millis, 6),
                         "gb_per_s": round(gbs, 1)})
            print(f"k={k:4d} {name}: {m.millis:.3f} ms  {gbs:.0f} GB/s",
                  flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["k", "name", "avg_ms", "gb_per_s"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    print(f"wrote {len(rows)} rows to {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

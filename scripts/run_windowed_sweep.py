#!/usr/bin/env python3
"""Clustered-key shared-scan sweep: windowed tier vs chunked compare tier.

The windowed kernel (scan.windowed_scan_tiles) decomposes an arbitrary
CONCRETE key set into 32-aligned value-domain windows — one variable-shift
mask per (value, window) + one SWAPMOVE transpose per populated 8-key
sub-window — so its cost scales with how much the keys CLUSTER, not with k.
This sweep measures both tiers on the same clustered key sets (clusters of
8 consecutive keys at random 8-aligned bases, sorted caller order) so the
dispatch cost rule (scan.windowed_cost < 12k) can be checked against
hardware numbers.

Every row is verified before timing via harness.check_shared_scan (counts
vs jnp compare + full-size bitvector vs the XLA tier + oracle prefix).

Usage: python scripts/run_windowed_sweep.py [out.csv] [--data-size=64m]
           [--reps=3]
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
import numpy as np  # noqa: E402

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.cli import parse_size  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

# (width, k) grid: width 9 up to half its 512-value domain; width 16 for
# the large-k rows so clusters stay sparse in the domain.
GRID = [(9, 16), (9, 64), (9, 128), (9, 256), (16, 256), (16, 512)]
CLUSTER = 8


def clustered_keys(width: int, k: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    nclusters = (k + CLUSTER - 1) // CLUSTER
    dom = 1 << width
    bases = rng.choice(np.arange(0, dom - CLUSTER, CLUSTER),
                       size=nclusters, replace=False)
    keys = (bases[:, None] + np.arange(CLUSTER, dtype=np.uint32)).reshape(-1)
    return np.sort(keys[:k]).astype(np.uint32)


def main(argv):
    out_path, data_size, reps = "windowed_sweep_results.csv", "64m", 3
    grid = GRID
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a.startswith("--grid="):
            # e.g. --grid=9:64,16:256  (width:k pairs)
            grid = [
                (int(p.split(":")[0]), int(p.split(":")[1]))
                for p in a.split("=", 1)[1].split(",")
            ]
        else:
            out_path = a
    size = parse_size(data_size)

    rows = []
    for width, k in grid:
        n = harness.values_for(size, width)
        # ramp corpus: covers the full domain so w=16 keys also have hits
        # (synth_modk caps values at 512, benchmark.cpp:277)
        vals = harness.synth_ramp(n, width)
        dev = unpack_ops.pack_device_kernel(vals, width)
        packed = layout.packed_nbytes(width, n)
        traffic = packed + k * layout.bitvector_words(n) * 4
        keys = clustered_keys(width, k, seed=width * 1000 + k)
        cost = scan_ops.windowed_cost(keys)
        assert cost < 12 * k, (width, k, cost)

        ok = harness.check_shared_scan(dev, jnp.asarray(keys), vals)
        print(f"w={width} k={k}: verify {'ok' if ok else 'FAILED'} "
              f"(windowed_cost={cost} vs compare {12 * k})")
        if not ok:
            raise SystemExit(1)

        variants = [
            ("windowed shared scan", functools.partial(
                harness.chain_windowed_shared_scan, width=width, n=n,
                tb=None, keys_tuple=tuple(int(x) for x in keys)),
             (dev.tiles,), traffic / 550e9),
            ("chunked shared scan", functools.partial(
                harness.chain_chunked_shared_scan, width=width, n=n, tb=None),
             (dev.tiles, jnp.asarray(keys)), traffic / 150e9),
        ]
        for name, fn, args, est in variants:
            # fresh salt range per run: the relay caches identical
            # executions, so a re-run with the default salt0=0 would replay
            # cached results and report fake times
            import random

            m = measure_loop(fn, args, trials=reps, est_iter_s=est,
                             salt0=random.randrange(1 << 20) << 10)
            gbs = traffic / m.seconds / 1e9
            print(f"  {name}: {m.millis:.3f} ms  {gbs:.0f} GB/s")
            rows.append({
                "width": width, "k": k, "variant": name,
                "ms": round(m.millis, 4), "gb_per_s": round(gbs, 1),
                "windowed_cost": cost, "n": n, "traffic_bytes": traffic,
            })

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")


if __name__ == "__main__":
    main(sys.argv[1:])

"""Measured fused filter+aggregate rows -> CSV.

Times ``aggregate_scan_tiles`` (per-key SUM/COUNT over a measure column,
one pass over two packed columns) on the real chip, with full-count and
spot sum verification against numpy before timing.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_aggregate_bench.py \
      [out.csv] [--data-size=512m] [--reps=4]

Counted traffic is the two packed columns (the partial-sum outputs are
noise).  HBM note: the synthesized uint32 value arrays are freed after
packing — keeping them alive alongside two 512 MiB columns exhausted
device memory through the relay.
"""
import csv
import functools
import sys

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.cli import parse_size  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import aggregate as agg_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

WP = 9
# (measure width, k, tier): compare = select-accumulate kernel; bitplane
# = per-plane popcount tier (static AND-DAG match words; the dispatch
# winner past the counted-cost crossover, see aggregate.pick_aggregate_tier)
CASES = [
    (9, 8, "compare"), (16, 8, "compare"), (16, 32, "compare"),
    (16, 8, "bitplane"), (16, 32, "bitplane"), (9, 8, "bitplane"),
]


def main(argv):
    out_path, data_size, reps = "aggregate_bench_results.csv", "512m", 4
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            out_path = a
    size = parse_size(data_size)

    n = harness.values_for(size, WP)
    pvals = harness.synth_modk(n, 8, WP)
    pdev = unpack_ops.pack_device_kernel(pvals, WP)
    pv = np.asarray(pvals)
    del pvals

    rows = []
    for wm, kk, tier in CASES:
        mvals = (
            jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
        ) & jnp.uint32((1 << wm) - 1)
        mdev = unpack_ops.pack_device_kernel(mvals, wm)
        mv = np.asarray(mvals).astype(np.uint64)
        del mvals

        keys = np.arange(kk, dtype=np.uint32)
        if tier == "bitplane":
            counts, slo, shi = agg_ops.aggregate_bitplane_static_tiles(
                pdev.tiles, mdev.tiles, keys, WP, wm, n
            )
            sums = agg_ops.finalize_sums(slo, shi)
        else:
            counts, slo, shi = agg_ops.aggregate_scan_tiles(
                pdev.tiles, mdev.tiles, jnp.asarray(keys), WP, wm, n
            )
            sums = agg_ops.finalize_sums(slo, shi)
        counts = np.asarray(counts)
        ok = all(int(counts[j]) == int((pv == j).sum()) for j in range(kk))
        ok = ok and all(
            int(sums[j]) == int(mv[pv == j].sum()) for j in range(min(kk, 4))
        )

        traffic = layout.packed_nbytes(WP, n) + layout.packed_nbytes(wm, n)
        if tier == "bitplane":
            fn = functools.partial(
                harness.chain_aggregate_bitplane_static, wp=WP, wm=wm, n=n,
                tb=None, keys_tuple=tuple(int(x) for x in keys),
            )
        else:
            fn = functools.partial(
                harness.chain_aggregate_scan, wp=WP, wm=wm, n=n, tb=None,
                kk=kk,
            )
        # time-varying salt: byte-identical submissions would be replayed
        # from the relay's execution cache instead of measured fresh
        import time as _time

        meas = measure_loop(
            fn, (pdev.tiles, mdev.tiles), trials=reps,
            est_iter_s=traffic / 400e9,
            salt0=(wm * 100 + kk + int(_time.time())) % 1_000_000,
        )
        gbs = traffic / meas.seconds / 1e9
        rows.append({
            "wp": WP, "wm": wm, "k": kk, "tier": tier,
            "ms_per_query": round(meas.millis, 4),
            "gb_per_s_read": round(gbs, 1),
            "verified": ok, "n": n, "traffic_bytes": traffic,
        })
        print(f"wp={WP} wm={wm} k={kk} {tier}: {gbs:.1f} GB/s read, "
              f"{meas.millis:.3f} ms/query verify={'ok' if ok else 'FAIL'}",
              flush=True)
        del mdev, mv

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

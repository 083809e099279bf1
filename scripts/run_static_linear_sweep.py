"""Fused static-DAG linear export k-sweep (SPREAD concrete keys) -> CSV.

One 512 MiB column, spread key sets of k in 4..64 through the
dispatched fused tiers (direct k <= 16, hierarchical above), each row
verified on a device prefix against numpy.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_static_linear_sweep.py \
      [out.csv] [--data-size=512m] [--reps=3]
"""
import csv
import functools
import sys
import time

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
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

WIDTH = 9


def main(argv):
    out_path = "bench_results/static_linear_sweep_v5e_512m.csv"
    data_size, reps = "512m", 3
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            out_path = a
    size = parse_size(data_size)
    n = harness.values_for(size, WIDTH)
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << WIDTH, n, dtype=np.uint32)
    dev = unpack_ops.pack_device_kernel(jnp.asarray(vals), WIDTH)
    vhost = vals[: 64 * 1024]
    nbytes = (n + 7) // 8
    pbytes = layout.packed_nbytes(WIDTH, n)

    rows = []
    for k in (4, 8, 12, 16, 24, 32, 40, 48, 64):
        keys = rng.permutation(1 << WIDTH)[:k].astype(np.uint32)
        # prefix verification through the dispatcher (one jit program)
        pw = (vhost.size // 8) * k // 4
        got = np.asarray(jax.device_get(jax.jit(
            lambda t, keys=keys, pw=pw: scan_ops.shared_scan_linear_words_device(
                layout.DeviceColumn(width=WIDTH, n=n, tiles=t), keys
            )[:pw]
        )(dev.tiles))).view(np.uint8)
        eb = np.zeros((k, vhost.size), np.uint8)
        for j, key in enumerate(keys):
            eb[j] = vhost == key
        exp = np.packbits(
            eb.reshape(k, -1, 8), axis=-1, bitorder="little"
        ).reshape(k, -1).T.reshape(-1)[: pw * 4]
        ok = bool((got == exp).all())

        traffic = pbytes + nbytes * k  # logical floor (hier re-reads extra)
        m = measure_loop(
            functools.partial(
                harness.chain_static_linear_shared_scan, width=WIDTH, n=n,
                tb=None, keys_tuple=tuple(int(x) for x in keys),
            ),
            (dev.tiles,), trials=reps,
            est_iter_s=traffic / 150e9,
            salt0=(abs(hash(("ssw", k))) + int(time.time())) % 1_000_000,
        )
        tier = "fused-static" if k <= 16 else "fused-static-hier"
        rows.append({
            "width": WIDTH, "k": k, "tier": tier,
            "ms": round(m.millis, 4),
            "gb_per_s_counted": round(traffic / m.seconds / 1e9, 1),
            "verified": ok, "n": n, "traffic_bytes": traffic,
        })
        print(f"k={k} ({tier}): {m.millis:.3f} ms "
              f"verify={'ok' if ok else 'FAIL'}", flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

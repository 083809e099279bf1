"""tb sweep for the single-pass histogram span kernel (k=512 sits at
1.25x its fitted bound at the auto tb; k=32 sits at 1.02x — if the gap
is VMEM-pressure scheduling, a different tile shows it).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_histspan_tb_probe.py
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402

WIDTH = 9


def main(argv):
    k = 512
    size = 512 * 2**20
    tbs = [None, 64, 128, 256]
    for a in argv:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--tb="):
            tbs = [int(x) for x in a.split("=", 1)[1].split(",")]
    n = size * 8 // WIDTH
    n = min(n, layout.MAX_VALUES)
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << WIDTH, n, dtype=np.uint32)
    dev = layout.to_device(layout.pack(vals, WIDTH))
    exp = np.bincount(vals, minlength=1 << WIDTH)[:k]
    del vals

    for tb in tbs:
        def chain(tiles, salt, reps, tb=tb):
            def body(i, carry):
                t, acc = carry
                t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
                c = scan_ops.histogram_dag_tiles(
                    t, 0, k, WIDTH, n, tb=tb, single_pass=True
                )
                return t, acc + jnp.sum(c)
            _, acc = jax.lax.fori_loop(0, reps, body, (tiles, jnp.uint32(0)))
            return acc

        cj = jax.jit(chain, static_argnames=("reps",))
        m = measure_loop(
            cj, (dev.tiles,), trials=3, est_iter_s=0.008,
            salt0=(7919 * (tb or 1) + int(time.time())) % 1_000_000,
        )
        # verification (untouched tiles)
        got = np.asarray(
            scan_ops.histogram_dag_tiles(dev.tiles, 0, k, WIDTH, n, tb=tb,
                                         single_pass=True)
        )
        ok = bool(np.array_equal(got, exp))
        print(f"span k={k} tb={tb}: {m.millis:.4f} ms verified={ok}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

"""tb sweep for the static AND-DAG spread-key scan (VERDICT r4 item 2
contingency): if the op-fit shows spread k=8 well above its fitted
bound, the first suspect is the auto-tb; sweep it at 512 MiB.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_bitsliced_tb_probe.py \
      [--k=8] [--tb=None,64,128,256]
"""
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
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

WIDTH = 9


def main(argv):
    k = 8
    size = 512 * 2**20
    tbs = [None, 64, 96, 128, 192, 256]
    for a in argv:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--tb="):
            tbs = [
                None if x == "None" else int(x)
                for x in a.split("=", 1)[1].split(",")
            ]
    n = harness.values_for(size, WIDTH)
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << WIDTH, n, dtype=np.uint32)
    dev = unpack_ops.pack_device_kernel(jnp.asarray(vals), WIDTH)
    keys = rng.permutation(1 << WIDTH)[:k].astype(np.uint32)
    kt = tuple(int(x) for x in keys)
    exp = np.array([(vals == kk).sum() for kk in keys], np.uint32)
    del vals
    traffic = layout.packed_nbytes(WIDTH, n) + k * layout.bitvector_words(n) * 4

    from shared_simd_scan_tpu.ops import scan as scan_ops

    _, cnt = scan_ops.shared_scan_bitsliced_static_tiles(
        dev.tiles, keys, WIDTH, n
    )
    ok = bool((np.asarray(cnt) == exp).all())
    print(f"verify (auto tb): {'ok' if ok else 'FAIL'}", flush=True)

    for tb in tbs:
        m = measure_loop(
            functools.partial(
                harness.chain_bitsliced_static_shared_scan, width=WIDTH,
                n=n, tb=tb, keys_tuple=kt,
            ),
            (dev.tiles,), trials=3, est_iter_s=traffic / 550e9,
            salt0=(7919 * ((tb or 1) + k) + int(time.time())) % 1_000_000,
        )
        gbs = traffic / m.seconds / 1e9
        print(f"k={k} tb={tb or 'auto'}: {m.millis:.3f} ms {gbs:.1f} GB/s",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

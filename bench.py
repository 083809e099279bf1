"""Headline benchmark: 9-bit column, 8-predicate shared scan, 1 chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value     = total HBM traffic (packed column read + k bitvectors written)
            per second on one chip for the fused Pallas shared-scan kernel.
vs_baseline = value / (0.90 * nominal HBM peak), i.e. 1.0 == the
            BASELINE.md target ">=90% of HBM-bandwidth roofline".
"""
import functools
import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench import harness
from shared_simd_scan_tpu.bench.timing import measure_loop
from shared_simd_scan_tpu.ops import unpack as unpack_ops

WIDTH = 9
K = 8
DATA_SIZE = 512 * 1024 * 1024  # packed payload bytes


def _wait_for_backend(budget_s: float = 2400.0) -> bool:
    """The axon relay occasionally returns UNAVAILABLE for a stretch (a
    failed init can itself block ~25 min inside jaxlib); retry within a
    budget instead of zeroing the round on a transient outage."""
    import time

    deadline = time.monotonic() + budget_s
    while True:
        try:
            jax.devices()
            return True
        except RuntimeError as e:
            remaining = deadline - time.monotonic()
            print(f"# backend unavailable ({e}); {remaining:.0f}s budget left",
                  file=sys.stderr)
            if remaining <= 60:
                return False
            time.sleep(60)


def main() -> int:
    if not _wait_for_backend():
        print(json.dumps({"metric": "shared_scan_9bit_k8_hbm_bytes_per_s",
                          "value": 0, "unit": "bytes/s/chip",
                          "vs_baseline": 0.0,
                          "error": "TPU backend unavailable"}))
        return 1
    n = harness.values_for(DATA_SIZE, WIDTH)
    vals = harness.synth_modk(n, K, WIDTH)
    dev = unpack_ops.pack_device_kernel(vals, WIDTH)
    keys = jnp.arange(K, dtype=jnp.uint32)

    # correctness gate before timing
    if not harness.check_shared_scan(dev, keys, vals):
        print(json.dumps({"metric": "shared_scan_9bit_k8_hbm_bytes_per_s",
                          "value": 0, "unit": "bytes/s/chip",
                          "vs_baseline": 0.0, "error": "verification failed"}))
        return 1

    traffic = layout.packed_nbytes(WIDTH, n) + K * layout.bitvector_words(n) * 4
    best = None
    # the benchmark predicate set (0..k-1) is consecutive, so the library
    # dispatches it to the interval kernel (shared_scan_device); measure
    # that path and the general arbitrary-key kernel, report the best
    candidates = [
        functools.partial(harness.chain_interval_scan, width=WIDTH, n=n, tb=256, kk=K),
        functools.partial(harness.chain_interval_scan, width=WIDTH, n=n, tb=128, kk=K),
        functools.partial(harness.chain_shared_scan, width=WIDTH, n=n, tb=128),
    ]
    args_list = [(dev.tiles,), (dev.tiles,), (dev.tiles, keys)]
    for fn, args in zip(candidates, args_list):
        m = measure_loop(fn, args, trials=4, est_iter_s=traffic / 500e9)
        bps = traffic / m.seconds
        if best is None or bps > best:
            best = bps

    roof = harness.hbm_peak_bytes_per_s() or 819e9
    print(json.dumps({
        "metric": "shared_scan_9bit_k8_hbm_bytes_per_s",
        "value": round(best),
        "unit": "bytes/s/chip",
        "vs_baseline": round(best / (0.9 * roof), 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

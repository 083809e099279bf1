"""Headline benchmark: 9-bit column, 8-predicate shared scan, 1 chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "measured_copy_bytes_per_s": N, "vs_measured_copy": N}

value     = total HBM traffic (packed column read + k bitvectors written)
            per second on one chip for the fused Pallas shared-scan kernel.
vs_baseline = value / (0.90 * nominal HBM peak), i.e. 1.0 == the
            BASELINE.md target ">=90% of HBM-bandwidth roofline" taken
            against the 819 GB/s v5e spec sheet number.
vs_measured_copy = value / (device copy bandwidth measured in the SAME
            run at the same footprint) — the reference's own protocol
            (its scans normalize against a measured memcpy,
            benchmark_misc.cpp:36-52), and the defensible roofline: the
            spec number is not attainable by any kernel on this part
            (a pure device copy reaches ~725 GB/s at >= 256 MiB; see
            bench_results/copy_roofline_v5e.csv).
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

    # measured copy comparator at the same footprint (512 MiB buffer,
    # read + write = 1 GiB traffic/iteration) — the defensible roofline
    import time as _time

    copy_buf = jnp.zeros(DATA_SIZE // 4, jnp.uint32)
    copy_m = measure_loop(
        harness.chain_copy, (copy_buf,), trials=4,
        est_iter_s=2 * DATA_SIZE / 700e9,
        salt0=int(_time.time()) % 1_000_000,
    )
    copy_bps = 2 * DATA_SIZE / copy_m.seconds

    roof = harness.hbm_peak_bytes_per_s() or 819e9
    print(json.dumps({
        "metric": "shared_scan_9bit_k8_hbm_bytes_per_s",
        "value": round(best),
        "unit": "bytes/s/chip",
        "vs_baseline": round(best / (0.9 * roof), 4),
        "measured_copy_bytes_per_s": round(copy_bps),
        "vs_measured_copy": round(best / copy_bps, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

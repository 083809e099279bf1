"""Committed copy-roofline artifact -> CSV (VERDICT r2 item 1).

The headline claim normalizes against the MEASURED device copy bandwidth
(the reference's own protocol: memcpy as roofline proxy,
benchmark_misc.cpp:36-52 / SURVEY.md section 6).  This script makes that
comparator a first-class, reproducible artifact: chained data-dependent
full-buffer copies (read + write = 2x buffer traffic per iteration) at
256 / 512 / 1024 MiB buffers, >= 5 trials each, with per-trial samples
and variance in the CSV.

Working sets under ~150 MB sit in/near on-chip cache and report multi-
TB/s (measured up to 3.6 TB/s at 64 MiB); the 128 MiB row is INCLUDED,
clearly labelled, precisely to demonstrate that regime boundary — only
rows with buffer >= 256 MiB are HBM-bound comparators.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_copy_roofline.py \
      [out.csv] [--trials=5]
"""
import csv
import statistics
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402

SIZES_MIB = (128, 256, 512, 1024)


def main(argv):
    out_path, trials = "bench_results/copy_roofline_v5e.csv", 5
    for a in argv:
        if a.startswith("--trials="):
            trials = int(a.split("=", 1)[1])
        else:
            out_path = a

    dev = jax.devices()[0]
    nominal = harness.hbm_peak_bytes_per_s()
    rows = []
    for mib in SIZES_MIB:
        size = mib << 20
        x = jnp.zeros(size // 4, jnp.uint32)
        traffic = 2 * size  # read + write per chained iteration
        meas = measure_loop(
            harness.chain_copy, (x,), trials=trials,
            est_iter_s=traffic / 700e9,
            salt0=int(time.time()) % 1_000_000,
        )
        per_gbs = [traffic / s / 1e9 for s in meas.per_trial]
        gbs = traffic / meas.seconds / 1e9
        rows.append({
            "device": dev.device_kind,
            "buffer_mib": mib,
            "traffic_bytes": traffic,
            "trials": trials,
            "median_gb_per_s": round(gbs, 1),
            "mean_gb_per_s": round(statistics.mean(per_gbs), 1),
            "stdev_gb_per_s": (
                round(statistics.stdev(per_gbs), 2)
                if len(per_gbs) > 1 else ""
            ),
            "min_gb_per_s": round(min(per_gbs), 1),
            "max_gb_per_s": round(max(per_gbs), 1),
            "pct_of_nominal": round(100 * gbs * 1e9 / nominal, 1) if nominal else "",
            "regime": "cache" if mib < 256 else "hbm",
            "per_trial_gb_per_s": ";".join(f"{g:.1f}" for g in per_gbs),
        })
        print(f"{mib:5d} MiB: {gbs:7.1f} GB/s median "
              f"(mean {rows[-1]['mean_gb_per_s']}, "
              f"sd {rows[-1]['stdev_gb_per_s']}, {rows[-1]['regime']})",
              flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

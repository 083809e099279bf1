"""Scaling-protocol demonstration run -> CSV (VERDICT r2 item 4).

Runs the weak-scaling sharded shared-scan bench (bench/scaling.py) on
the virtual 8-device CPU mesh and commits the protocol's output shape.
The NUMBERS are interpret-mode CPU and meaningless as bandwidth; the
artifact demonstrates that the protocol (mesh construction, block-axis
sharding, psum count reduction, per-mesh-size weak-scaling rows,
efficiency column) runs end-to-end.  On real pod hardware the same
driver is `python -m shared_simd_scan_tpu.bench scaling <k> <size>`
after `dist.initialize()` — see docs/pod_runbook.md.

Usage:
  python scripts/run_scaling_demo.py [out.csv]
"""
import csv
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main(argv):
    out_path = argv[0] if argv else "bench_results/scaling_virtual8_cpu.csv"
    from shared_simd_scan_tpu.bench.scaling import bench_scaling

    # tiny per-device shards: this is a protocol run on interpret-mode
    # CPU Pallas, not a performance measurement
    results = bench_scaling(per_device_data_size=1 << 20, reps=2)
    with open(out_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([
            "devices", "aggregate_bytes_per_s", "efficiency_vs_1dev",
            "platform", "note",
        ])
        for nd, bps, eff in results:
            w.writerow([
                nd, round(bps), round(eff, 4), "cpu-virtual-8",
                "protocol demonstration; interpret-mode numbers are not bandwidth",
            ])
    print(f"wrote {out_path} ({len(results)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

"""Linear (interleaved) shared-scan row -> CSV (VERDICT r2 item 8).

shared_scan_linear_device (the C10 parity surface,
simd_scan_shared_linear.cpp:9-82) is parity-tested but was never timed.
Times the full linear path (kernel + XLA relayout to out[group*k + key]
uint8 order + full-output consume) against a comparator running the
SAME kernel and consume over the native (k, W) layout — the delta is
the interleave cost.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_linear_bench.py \
      [out.csv] [--data-size=512m] [--k=8] [--reps=3]
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

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.cli import parse_size  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

WIDTH = 9


def main(argv):
    out_path, data_size, k, reps = "bench_results/linear_v5e_512m.csv", "512m", 8, 3
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            out_path = a
    size = parse_size(data_size)

    n = harness.values_for(size, WIDTH)
    vals = harness.synth_modk(n, k, WIDTH)
    dev = unpack_ops.pack_device_kernel(vals, WIDTH)
    # keys 0..k-1 (the reference linear bench's own shape)
    keys = np.arange(k, dtype=np.uint32)

    # correctness: byte parity vs the oracle interleave on a small prefix
    # (fetch ONLY the prefix: device_get of the full 477 MB uint8 output
    # exhausts the relay transfer path — measured)
    vhost = np.asarray(jax.device_get(vals[: 8 * 1024]))
    exp = np.zeros(((vhost.size + 7) // 8) * k, np.uint8)
    for j, key in enumerate(keys):
        m = np.packbits(vhost == key, bitorder="little")
        exp[j::k] = m
    # one jit around call+slice: eager slicing a 477 MB uint8 output would
    # compile the slice standalone and materialize every intermediate
    prefix = jax.jit(
        lambda t: scan_ops.shared_scan_linear_device(
            layout.DeviceColumn(width=WIDTH, n=n, tiles=t), keys
        )[: exp.size]
    )(dev.tiles)
    out = np.asarray(jax.device_get(prefix))
    ok = bool((out == exp).all())

    traffic = layout.packed_nbytes(WIDTH, n) + k * layout.bitvector_words(n) * 4
    rows = []
    for name, chain in (
        ("linear-interleaved", harness.chain_linear_shared_scan),
        ("native-kW-comparator", harness.chain_linear_baseline_shared_scan),
    ):
        m = measure_loop(
            functools.partial(chain, width=WIDTH, n=n, tb=None, kk=k),
            (dev.tiles,), trials=reps, est_iter_s=traffic / 300e9,
            salt0=(abs(hash(name)) + int(time.time())) % 1_000_000,
        )
        gbs = traffic / m.seconds / 1e9
        rows.append({
            "width": WIDTH, "k": k, "path": name,
            "ms": round(m.millis, 4), "gb_per_s_counted": round(gbs, 1),
            "verified": ok, "n": n, "traffic_bytes": traffic,
            "note": "both rows include a full-output consume pass",
        })
        print(f"{name}: {gbs:.1f} GB/s counted ({m.millis:.3f} ms) "
              f"verify={'ok' if ok else 'FAIL'}", flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

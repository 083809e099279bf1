"""Decompose the 8-virtual-device scaling drop (VERDICT r4 item 3).

scaling_virtual8_cpu_xla.csv shows throughput_vs_1dev = 0.63 at 8
devices vs 0.94-0.96 at 2-4, which contradicts the "sharding+psum
overhead ~0" note.  This script measures, in one session on the same
virtual mesh, the candidate overhead sources at every mesh size:

- full:     the production sharded chain (psum + bits + counts)
- nopsum:   identical shard_map, cnt returned shard-local (no
            collective) — isolates the psum fan-in + the replication
            sync each fori_loop iteration forces
- copyonly: a trivial shard_map full-buffer copy over the same sharded
            operand — isolates per-device program dispatch/scheduling
            cost (no scan work at all)

All weak-scaling (per-device bytes constant).  Emits
bench_results/scaling_decompose_cpu.csv with throughput_vs_1dev per
variant; the analysis paragraph goes to DESIGN.md from the numbers.

Usage: python scripts/run_scaling_decompose.py [out.csv] [--per-device=8m]
"""
import csv
import functools
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
if "xla_cpu_multi_thread_eigen" not in flags:
    flags += " --xla_cpu_multi_thread_eigen=false"
os.environ["XLA_FLAGS"] = flags.strip()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.sharding import PartitionSpec as P  # noqa: E402

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402
from shared_simd_scan_tpu.ops import xla_kernels  # noqa: E402
from shared_simd_scan_tpu.parallel import dist  # noqa: E402

WIDTH = 9
K = 8
LANES = layout.LANES


@functools.partial(jax.jit, static_argnames=("k", "mesh", "width", "n"))
def chain_nopsum(tiles, keys, salt, k, *, mesh, width, n):
    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l, keys_l):
        off = jax.lax.axis_index(dist.DATA_AXIS) * (local_b1 * LANES)
        bits, cnt = xla_kernels.shared_scan_tiles_xla(
            tiles_l, keys_l, width, n, block_offset=off
        )
        return bits, cnt  # shard-local counts: NO collective

    def body(i, acc):
        kv = keys + ((salt + jnp.uint32(i)) << 16)
        _, cnt = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, dist.DATA_AXIS, None), P()),
            out_specs=(P(None, dist.DATA_AXIS, None), P(dist.DATA_AXIS)),
            check_vma=False,
        )(tiles, kv)
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "mesh"))
def chain_copyonly(tiles, keys, salt, k, *, mesh):
    del keys

    def local(tiles_l):
        return tiles_l + jnp.uint32(1)

    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        t = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(None, dist.DATA_AXIS, None),),
            out_specs=P(None, dist.DATA_AXIS, None),
            check_vma=False,
        )(t)
        return t, acc + t[0, 0, 0]

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


def main(argv):
    out_path = "bench_results/scaling_decompose_cpu.csv"
    per_device = 8 * 1024 * 1024
    for a in argv:
        if a.startswith("--per-device="):
            from shared_simd_scan_tpu.bench.cli import parse_size

            per_device = parse_size(a.split("=", 1)[1])
        else:
            out_path = a

    devices = jax.devices()
    variants = {}
    rows = []
    for nd in (1, 2, 4, 8):
        if nd > len(devices):
            break
        mesh = dist.make_mesh(devices[:nd])
        n = harness.values_for(per_device * nd, WIDTH)
        vals = harness.synth_modk(n, K, WIDTH)
        dev = unpack_ops.pack_device_kernel(vals, WIDTH, interpret=True)
        sdev = dist.shard_column(dev, mesh)
        keys = jnp.arange(K, dtype=jnp.uint32)
        traffic = (
            layout.packed_nbytes(WIDTH, n) + K * layout.bitvector_words(n) * 4
        )
        copy_traffic = 2 * sdev.tiles.size * 4
        for name, chain, tr in (
            ("full",
             functools.partial(
                 # the committed scaling row's chain, verbatim
                 __import__(
                     "shared_simd_scan_tpu.bench.scaling",
                     fromlist=["_chain_sharded_xla"],
                 )._chain_sharded_xla,
                 mesh=mesh, width=WIDTH, n=n,
             ), traffic),
            ("nopsum",
             functools.partial(chain_nopsum, mesh=mesh, width=WIDTH, n=n),
             traffic),
            ("copyonly",
             functools.partial(chain_copyonly, mesh=mesh), copy_traffic),
        ):
            meas = measure_loop(
                chain, (sdev.tiles, keys), trials=3,
                k_lo=4, k_hi=20,
            )
            bps = tr / meas.seconds
            base = variants.setdefault(name, bps)
            tput = bps / base
            rows.append({
                "devices": nd, "variant": name,
                "bytes_per_s": int(bps),
                "throughput_vs_1dev": round(tput, 4),
                "ms": round(meas.millis, 3),
            })
            print(f"nd={nd} {name}: {bps / 1e9:.2f} GB/s "
                  f"tput_vs_1dev={tput:.3f} ({meas.millis:.2f} ms)",
                  flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

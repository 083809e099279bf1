"""Bit-sliced shared-scan rows -> CSV: the spread-key dispatch tier.

Times shared_scan_bitsliced_tiles on uniformly SPREAD random key sets
(the shape the windowed/interval tiers cannot take) with full on-device
count verification vs numpy, and for context the chunked compare tier at
the same k.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_bitsliced_bench.py \
      [out.csv] [--data-size=512m] [--k=8,16,32,64,128,256,512] [--reps=3]
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
    out_path, data_size, reps = "bitsliced_bench_results.csv", "512m", 3
    ks = [8, 16, 32, 64, 128, 256, 512]
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--k="):
            ks = [int(x) for x in a.split("=", 1)[1].split(",")]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            out_path = a
    size = parse_size(data_size)

    rng = np.random.default_rng(5)
    # k bitvector rows live in HBM during the run: cap the column so the
    # bits output stays under ~4 GB (k=256 at 512 MiB packed would need
    # 15 GB of bitvectors and OOM the 16 GB chip — measured).
    BITS_BUDGET = 4 << 30
    cols: dict[int, tuple] = {}

    def col_for(k):
        nk = min(harness.values_for(size, WIDTH), BITS_BUDGET * 8 // k)
        nk = max(1 << 20, nk // 4096 * 4096)
        if nk not in cols:
            v = rng.integers(0, 1 << WIDTH, nk, dtype=np.uint32)
            cols[nk] = (v, unpack_ops.pack_device_kernel(jnp.asarray(v), WIDTH))
        return nk, *cols[nk]

    rows = []
    for k in ks:
        n, vals_np, dev = col_for(k)
        keys = rng.permutation(1 << WIDTH)[: min(k, 1 << WIDTH)].astype(
            np.uint32
        )
        if k > (1 << WIDTH):
            keys = np.concatenate(
                [keys, rng.integers(0, 1 << WIDTH, k - keys.size, np.uint32)]
            )
        keysj = jnp.asarray(keys)
        traffic = layout.packed_nbytes(WIDTH, n) + k * layout.bitvector_words(n) * 4

        exp = np.array([(vals_np == kk).sum() for kk in keys], np.uint32)

        for tier, chain, fn in (
            ("bitsliced-static", None,
             scan_ops.shared_scan_bitsliced_static_tiles),
            ("bitsliced", harness.chain_bitsliced_shared_scan,
             scan_ops.shared_scan_bitsliced_tiles),
            ("chunked-compare", harness.chain_chunked_shared_scan,
             scan_ops.shared_scan_chunked_tiles),
        ):
            # on-device verification of THIS tier before timing it
            # jit the verify and keep only counts: the multi-group static
            # tier (k > 256) concatenates its bits parts, and EAGER
            # execution through the relay materializes both the parts and
            # the concat (~2x the bitvector footprint -> OOM at k=300;
            # measured).  Under jit the concat is DCE'd.
            kv = keys if tier == "bitsliced-static" else keysj
            cnt = jax.jit(
                lambda t, fn=fn, kv=kv: fn(t, kv, WIDTH, n)[1]
            )(dev.tiles)
            ok = bool((np.asarray(jax.device_get(cnt)) == exp).all())
            if tier == "bitsliced-static":
                timed = functools.partial(
                    harness.chain_bitsliced_static_shared_scan,
                    width=WIDTH, n=n, tb=None,
                    keys_tuple=tuple(int(x) for x in keys),
                )
                args = (dev.tiles,)
            else:
                timed = functools.partial(chain, width=WIDTH, n=n, tb=None)
                args = (dev.tiles, keysj)
            m = measure_loop(
                timed,
                args,
                trials=reps,
                est_iter_s=traffic / (600e9 if "bitsliced" in tier else 150e9),
                salt0=(abs(hash((tier, k))) + int(time.time())) % 1_000_000,
            )
            gbs = traffic / m.seconds / 1e9
            rows.append({
                "width": WIDTH, "k": k, "tier": tier,
                "ms": round(m.millis, 4), "gb_per_s": round(gbs, 1),
                "verified": ok, "n": n, "traffic_bytes": traffic,
            })
            print(f"k={k:4d} {tier}: {gbs:7.1f} GB/s "
                  f"({m.millis:.3f} ms) verify={'ok' if ok else 'FAIL'}",
                  flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

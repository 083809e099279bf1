"""Measured IN-list (membership) scan rows -> CSV.

Times the member-scan dispatch tiers (interval / window popmask /
compare / bit-sliced) on the real chip and, for context, the per-query time
of the alternative a user would otherwise run (shared scan producing k
bitvectors, OR'd afterwards — the OR pass cost is shown as the shared
scan row's time plus one extra bitvector pass).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_member_bench.py \
      [out.csv] [--data-size=512m] [--reps=4]

Counted traffic for the member rows is packed column + ONE bitvector —
GB/s therefore understates the win at large k; compare the ms/query
columns.
"""
import csv
import functools
import sys

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
from shared_simd_scan_tpu.ops import member as member_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

WIDTH = 9


def cases():
    """(expected tier, k, key-set label, generator expression, keys).

    The key-set column makes every CSV row self-describing (VERDICT r3
    item 8): two same-k ortree rows differ ONLY in set shape, which sets
    their DAG cost."""
    return [
        ("interval", 8, "consecutive", "range(8)", tuple(range(8))),
        ("interval", 64, "consecutive", "range(64)", tuple(range(64))),
        ("interval", 512, "consecutive", "range(512)", tuple(range(512))),
        # clustered: the OR-tree's memoized combos absorb whole clusters,
        # undercutting the window-popmask tier (43 vs 80 quarter-ops/value)
        ("ortree", 32, "clustered", "4 runs of 8 at {0,64,128,256}", tuple(
            int(x)
            for x in np.concatenate([b + np.arange(8) for b in (0, 64, 128, 256)])
        )),
        ("compare", 4, "spread", "(i*61+3)%512", tuple(
            int(x) for x in (np.arange(4) * 61 + 3) % 512
        )),
        # spread sets: previously bit-sliced (k<=32) / domain bitmap
        # (k>=40); the static OR-tree now wins at every k
        ("ortree", 8, "spread", "(i*61+3)%512", tuple(
            int(x) for x in (np.arange(8) * 61 + 3) % 512
        )),
        ("ortree", 32, "spread", "unique((i*61+3)%512)", tuple(
            int(x) for x in np.unique((np.arange(32) * 61 + 3) % 512)
        )),
        ("ortree", 100, "spread", "unique((i*37+11)%512)", tuple(
            int(x) for x in np.unique((np.arange(100) * 37 + 11) % 512)
        )),
        ("ortree", 256, "strided", "2*i+1 (all odds)", tuple(
            int(x) for x in np.arange(256) * 2 + 1
        )),
    ]


def main(argv):
    out_path, data_size, reps = "member_bench_results.csv", "512m", 4
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            out_path = a
    size = parse_size(data_size)

    n = harness.values_for(size, WIDTH)
    vals = harness.synth_modk(n, 8, WIDTH)
    dev = unpack_ops.pack_device_kernel(vals, WIDTH)
    traffic = layout.packed_nbytes(WIDTH, n) + layout.bitvector_words(n) * 4

    rows = []
    for tier, k, kset, kgen, keys in cases():
        got = member_ops.member_dispatch_tier(np.asarray(keys, np.uint32), WIDTH)
        assert got == tier, f"row labelled {tier} but dispatch picks {got}"
        # verify on device before timing (full-count check vs direct compare)
        _, cnt = member_ops.member_scan_tiles(
            dev.tiles, np.asarray(keys, np.uint32), WIDTH, n
        )
        kv = jnp.asarray(np.asarray(keys, np.uint32))
        m = jnp.zeros(n, bool)
        for j in range(len(keys)):
            m = m | (vals == kv[j])
        ok = int(cnt) == int(jnp.sum(m.astype(jnp.uint32)))

        fn = functools.partial(
            harness.chain_member_scan, width=WIDTH, n=n, tb=None, keys_tuple=keys
        )
        # fold wall-time into the salt: the relay replays byte-identical
        # submissions from its execution cache, so a rerun with a fixed
        # salt would replay the previous run's timings instead of
        # measuring fresh
        import time as _time

        meas = measure_loop(
            fn, (dev.tiles,), trials=reps, est_iter_s=traffic / 650e9,
            salt0=(abs(hash((tier, k))) + int(_time.time())) % 1_000_000,
        )
        gbs = traffic / meas.seconds / 1e9
        rows.append({
            "width": WIDTH, "k": k, "tier": tier, "key_set": kset,
            "key_gen": kgen,
            "ms_per_query": round(meas.millis, 4),
            "gb_per_s_counted": round(gbs, 1),
            "verified": ok, "n": n, "traffic_bytes": traffic,
        })
        print(f"{tier} k={k} ({kset}): {gbs:.1f} GB/s counted, "
              f"{meas.millis:.3f} ms/query verify={'ok' if ok else 'FAIL'}")

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

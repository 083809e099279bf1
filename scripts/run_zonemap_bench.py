"""Zone-map scan-skipping rows -> CSV.

A sorted 512 MiB packed 9-bit column (the zone map's target workload —
time-ordered / clustered fact tables), point and narrow-range queries:
the pruned span touches O(1) zones where the full-column kernel reads
every byte.  Every row verified (count + a 2M-word canonical-bit
prefix covering the span placement) vs the full-column kernel before
timing.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_zonemap_bench.py \
      [out.csv] [--data-size=512m] [--reps=3]
"""
import csv
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from shared_simd_scan_tpu import layout, zonemap  # noqa: E402
from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.cli import parse_size  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

WIDTH = 9


def main(argv):
    out_path, data_size, reps = "bench_results/zonemap_v5e_512m.csv", "512m", 3
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            out_path = a
    size = parse_size(data_size)
    n = harness.values_for(size, WIDTH)

    # sorted column, synthesized ON DEVICE (the host sort of 477M values
    # is pointless — i // (n/512) IS sorted and covers the domain).
    # NO uint64: x64 is disabled, i*512 would silently wrap in uint32.
    step = max(1, n // 512)

    @jax.jit
    def synth():
        i = jnp.arange(n, dtype=jnp.uint32)
        return jnp.minimum(i // jnp.uint32(step), jnp.uint32(511))

    vals = synth()
    dev = unpack_ops.pack_device_kernel(vals, WIDTH)
    del vals

    t0 = time.perf_counter()
    # chunk_zones=8: 4096 B1-rows per build chunk (~67 MB unpacked)
    zmap = zonemap.build_zonemap(dev, zone_b1=512, chunk_zones=8)
    build_s = time.perf_counter() - t0
    print(f"zonemap build (one decompress pass, {zmap.nzones} zones): "
          f"{build_s:.1f}s wall incl transfers", flush=True)

    rows = []
    for name, lo, hi in (
        ("point key=259", 259, 260),
        ("narrow range [100,104)", 100, 104),
        ("decile range [0,52)", 0, 52),
    ):
        sp = zonemap.prune_span(zmap, lo, hi)
        assert sp is not None
        start, span = sp
        # verify pruned vs full kernel: counts AND the canonical-bit
        # placement (a 2M-word prefix slice fetched under one jit — the
        # prefix covers the pruned span's start offset path)
        WCHK = 2_000_000
        bits_p, cnt_p = zonemap.pruned_range_scan(dev, zmap, lo, hi,
                                                  full_bits=True)
        bits_f, cnt_f = scan_ops.range_scan_tiles(
            dev.tiles, jnp.asarray([lo], jnp.uint32),
            jnp.asarray([hi], jnp.uint32), WIDTH, n)
        cbits_f = scan_ops.bits_to_canonical(bits_f, n)[0]
        pre_p = np.asarray(jax.device_get(
            jax.jit(lambda b: b[:WCHK])(bits_p)))
        pre_f = np.asarray(jax.device_get(
            jax.jit(lambda b: b[:WCHK])(cbits_f)))
        ok = (
            int(jax.device_get(cnt_p)) == int(jax.device_get(cnt_f[0]))
            and bool((pre_p == pre_f).all())
        )

        lows = jnp.asarray([lo], jnp.uint32)
        highs = jnp.asarray([hi], jnp.uint32)

        def chain_pruned(tiles, salt, k, *, span=span, start=start):
            def body(i, acc):
                lo2 = lows + ((salt + jnp.uint32(i)) & jnp.uint32(0)) # shape-stable
                # vary the span start by the salt parity to defeat the
                # replay cache without changing the workload size
                st = jnp.int32(start) + jnp.int32((salt + jnp.uint32(i)) % 2) * 8
                _, c = zonemap._pruned_range_tiles(
                    tiles, st, lo2, highs, span=span, width=WIDTH, n=n,
                    tb=None, interpret=False)
                return acc + c[0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        def chain_full(tiles, salt, k):
            def body(i, acc):
                lo2 = lows + ((salt + jnp.uint32(i)) << 9)  # vary keys
                hi2 = highs + ((salt + jnp.uint32(i)) << 9)
                _, c = scan_ops.range_scan_tiles(
                    tiles, lo2, hi2, WIDTH, n, tb=None)
                return acc + c[0]
            return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

        span_bytes = layout.packed_nbytes(WIDTH, span * 128 * 32)
        full_bytes = layout.packed_nbytes(WIDTH, n)
        mp = measure_loop(
            jax.jit(chain_pruned, static_argnames=("k",)), (dev.tiles,),
            trials=reps, est_iter_s=max(span_bytes / 400e9, 3e-5),
            salt0=(abs(hash(name)) + int(time.time())) % 1_000_000,
        )
        mf = measure_loop(
            jax.jit(chain_full, static_argnames=("k",)), (dev.tiles,),
            trials=reps, est_iter_s=full_bytes / 500e9,
            salt0=(abs(hash(name)) + int(time.time()) + 7) % 1_000_000,
        )
        speedup = mf.seconds / mp.seconds
        rows.append({
            "query": name, "span_b1": span, "of_b1": zmap.b1,
            "pruned_ms": round(mp.millis, 4), "full_ms": round(mf.millis, 4),
            "speedup": round(speedup, 1), "verified": ok, "n": n,
        })
        print(f"{name}: pruned {mp.millis:.3f} ms (span {span}/{zmap.b1} "
              f"B1-rows) vs full {mf.millis:.3f} ms -> {speedup:.1f}x "
              f"verify={'ok' if ok else 'FAIL'}", flush=True)

    # ----- clustered-but-UNSORTED column: the shape single-span pruning
    # cannot skip (matching zones scattered through the file force a
    # near-full span) but per-block gating can (VERDICT r3 item 5).
    # Key-7 clusters sit in 4 zones spread across the column, base data
    # never matches.
    del dev
    zone_vals = 512 * 128 * 32  # values per zone_b1=512 zone (device layout)
    CLUSTERS = (0, 57, 131, 227)  # zone ids (zone_b1=512 -> 228 zones)

    @jax.jit
    def synth_clustered():
        i = jnp.arange(n, dtype=jnp.uint32)
        base = (i % jnp.uint32(100)) + jnp.uint32(100)
        z = i // jnp.uint32(zone_vals)
        hit = jnp.zeros(n, bool)
        for c in CLUSTERS:
            hit = hit | (z == jnp.uint32(c))
        return jnp.where(hit, jnp.uint32(7), base)

    vals = synth_clustered()
    cdev = unpack_ops.pack_device_kernel(vals, WIDTH)
    del vals
    czmap = zonemap.build_zonemap(cdev, zone_b1=512, chunk_zones=8)
    # the single-span pruner must degrade here (clusters at both ends)
    s0, span0 = zonemap.prune_span(czmap, 7, 8)
    assert span0 >= czmap.b1 // 2, "test column should defeat single-span"
    tbz = 256
    live = zonemap.zone_step_mask(czmap, 7, 8, tbz)
    nlive = int(live.sum())
    print(f"clustered-unsorted: single-span would cover {span0}/{czmap.b1} "
          f"rows; gather grid touches {nlive}/{live.shape[0]} steps",
          flush=True)

    # verify zoned vs full kernel (count + canonical prefix)
    WCHK = 2_000_000
    bits_z, cnt_z = zonemap.zoned_range_scan(cdev, czmap, 7, 8, tb=tbz)
    bits_f, cnt_f = scan_ops.range_scan_tiles(
        cdev.tiles, jnp.asarray([7], jnp.uint32),
        jnp.asarray([8], jnp.uint32), WIDTH, n)
    cbits_f = scan_ops.bits_to_canonical(bits_f, n)[0]
    pre_z = np.asarray(jax.device_get(jax.jit(lambda b: b[:WCHK])(bits_z)))
    pre_f = np.asarray(jax.device_get(jax.jit(lambda b: b[:WCHK])(cbits_f)))
    ok = (
        int(jax.device_get(cnt_z)) == int(jax.device_get(cnt_f[0]))
        and bool((pre_z == pre_f).all())
    )

    ids = np.nonzero(live)[0].astype(np.int32)
    g = 1
    while g < nlive:
        g *= 2
    idx0 = np.concatenate([ids, np.full(g - nlive, ids[-1], np.int32)])
    flag0 = np.concatenate(
        [np.ones(nlive, np.int32), np.zeros(g - nlive, np.int32)]
    )
    idxj = jnp.asarray(idx0)
    flagj = jnp.asarray(flag0)
    lows = jnp.asarray([7], jnp.uint32)
    highs = jnp.asarray([8], jnp.uint32)

    def chain_zoned(tiles, salt, k):
        def body(i, acc):
            # salt the PREDICATE, not the routing: the first version
            # shifted idx by salt parity, but with the last step live the
            # shift clamps to 0, the body goes loop-invariant, and XLA
            # hoists it (measured: a 0.0004 ms "2724x" artifact — the
            # round-3 lesson again).  A salted out-of-domain range costs
            # identically (compares are data-independent).
            lo2 = lows + ((salt + jnp.uint32(i)) << 9)
            hi2 = highs + ((salt + jnp.uint32(i)) << 9)
            _, c = zonemap._zoned_range_tiles(
                tiles, idxj, flagj, lo2, hi2,
                g=g, width=WIDTH, n=n, tb=tbz, interpret=False)
            return acc + c[0]
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    def chain_full_c(tiles, salt, k):
        def body(i, acc):
            lo2 = lows + ((salt + jnp.uint32(i)) << 9)
            hi2 = highs + ((salt + jnp.uint32(i)) << 9)
            _, c = scan_ops.range_scan_tiles(tiles, lo2, hi2, WIDTH, n, tb=None)
            return acc + c[0]
        return jax.lax.fori_loop(0, k, body, jnp.uint32(0))

    touched = layout.packed_nbytes(WIDTH, g * tbz * 128 * 32)
    mp = measure_loop(
        jax.jit(chain_zoned, static_argnames=("k",)), (cdev.tiles,),
        trials=reps, est_iter_s=max(touched / 400e9, 3e-5),
        salt0=(abs(hash("zoned")) + int(time.time())) % 1_000_000,
    )
    mf = measure_loop(
        jax.jit(chain_full_c, static_argnames=("k",)), (cdev.tiles,),
        trials=reps, est_iter_s=layout.packed_nbytes(WIDTH, n) / 500e9,
        salt0=(abs(hash("zoned")) + int(time.time()) + 7) % 1_000_000,
    )
    speedup = mf.seconds / mp.seconds
    rows.append({
        "query": f"clustered-unsorted key=7 ({len(CLUSTERS)} scattered "
                 f"zones; per-block gather grid)",
        "span_b1": nlive * tbz, "of_b1": czmap.b1,
        "pruned_ms": round(mp.millis, 4), "full_ms": round(mf.millis, 4),
        "speedup": round(speedup, 1), "verified": ok, "n": n,
    })
    print(f"clustered-unsorted: zoned {mp.millis:.3f} ms vs full "
          f"{mf.millis:.3f} ms -> {speedup:.1f}x "
          f"verify={'ok' if ok else 'FAIL'}", flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

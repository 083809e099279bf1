"""Linear (interleaved) shared-scan formulation table -> CSV.

shared_scan_linear_device (the C10 parity surface,
simd_scan_shared_linear.cpp:9-82): every relayout formulation measured
side by side (VERDICT r3 item 2) — the dispatched MXU permutation
kernel (ops/linear.py), the chunked XLA stack fallback, the native
(k, W) comparator (same kernel + consume, no relayout), and the host
AVX2 interleave floor (csrc sss_interleave).

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

import jax.numpy as jnp  # noqa: E402

from shared_simd_scan_tpu import layout  # noqa: E402
from shared_simd_scan_tpu.bench import harness  # noqa: E402
from shared_simd_scan_tpu.bench.cli import parse_size  # noqa: E402
from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402

WIDTH = 9


def _t(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main(argv):
    out_path, data_size, k, reps = "bench_results/linear_v5e_512m.csv", "512m", 8, 3
    skip = []
    spread = False
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        elif a == "--spread":
            # SPREAD concrete keys: the fused static-DAG export tier
            # (consecutive-only rows are skipped; values drawn uniform
            # over the domain so matches exist)
            spread = True
        elif a.startswith("--skip="):
            # e.g. --skip=stack,host — the k=32 full-size stack chain
            # crashed the TPU worker (padded-intermediate blowup class);
            # its floor is probe-measured instead (run_interleave_probe
            # --variant=stack: 5-6 GB/s FLAT in k at a capped working set)
            skip = [s for s in a.split("=", 1)[1].split(",") if s]
        else:
            out_path = a
    size = parse_size(data_size)

    n = harness.values_for(size, WIDTH)
    if spread:
        rng = np.random.default_rng(7)
        vals = jnp.asarray(
            rng.integers(0, 1 << WIDTH, n, dtype=np.uint32)
        )
        keys = rng.permutation(1 << WIDTH)[:k].astype(np.uint32)
    else:
        vals = harness.synth_modk(n, k, WIDTH)
        # keys 0..k-1 (the reference linear bench's own shape)
        keys = np.arange(k, dtype=np.uint32)
    dev = unpack_ops.pack_device_kernel(vals, WIDTH)

    # correctness: byte parity vs the oracle interleave on a small prefix
    # (fetch ONLY the prefix: device_get of the full 477 MB uint8 output
    # exhausts the relay transfer path — measured)
    vhost = np.asarray(jax.device_get(vals[: 8 * 1024]))
    del vals  # 1.9 GB on-device; keeping it live OOM'd the MXU chain
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
    # each tier's verified flag must come from ITS OWN device-vs-numpy
    # check (repo rule) — the dispatcher check above exercises only the
    # concrete fused tier.  Traced tier: keys as a jit ARGUMENT.
    tprefix = jax.jit(
        lambda t, kv: scan_ops.shared_scan_linear_device(
            layout.DeviceColumn(width=WIDTH, n=n, tiles=t), kv
        )[: exp.size]
    )(dev.tiles, jnp.asarray(keys))
    ok_traced = bool((np.asarray(jax.device_get(tprefix)) == exp).all())
    # two-kernel comparator path: explicit scan -> MXU relayout
    from shared_simd_scan_tpu.ops.linear import (
        _mxu_large_supported as _lsup_v,
        _mxu_supported as _sup_v,
        interleave_mxu_words as _imw_v,
        interleave_mxu_words_large as _imwl_v,
    )

    if _sup_v(k) or _lsup_v(k):
        def _twok(t, kv):
            bits, _ = scan_ops.shared_scan_device(
                layout.DeviceColumn(width=WIDTH, n=n, tiles=t), kv
            )
            w = (
                _imw_v(bits, (n + 7) // 8 * k // 4)
                if _sup_v(k)
                else _imwl_v(bits, (n + 7) // 8)
            )
            return jax.lax.bitcast_convert_type(
                w, jnp.uint8
            ).reshape(-1)[: exp.size]

        twoprefix = jax.jit(_twok)(dev.tiles, jnp.asarray(keys))
        ok_twok = bool((np.asarray(jax.device_get(twoprefix)) == exp).all())
    else:
        ok_twok = ok
    ok_by_row = {
        "linear-fused-traced": ok_traced,
        "linear-twokernel": ok_twok,
    }

    traffic = layout.packed_nbytes(WIDTH, n) + k * layout.bitvector_words(n) * 4
    rows = []
    from shared_simd_scan_tpu.ops.linear import _mxu_supported

    from shared_simd_scan_tpu.ops.linear import _mxu_large_supported

    mxu_any = _mxu_supported(k) or _mxu_large_supported(k)
    variants = ([
        ("linear-fused-static-s8", harness.chain_static_linear_shared_scan,
         {"keys_tuple": tuple(int(x) for x in keys)},
         "fused single-pass static-DAG scan+interleave (ARBITRARY "
         "concrete keys), int8 MXU dots"
         if _mxu_supported(k) else
         "fused-hierarchical static-DAG scan+interleave (arbitrary "
         "concrete keys, no bits round-trip)"),
    ] if spread and mxu_any else []) + ([
        ("linear-fused-s8", harness.chain_linear_shared_scan,
         {"relayout": "fused", "kk": k},
         "fused single-pass scan+interleave, int8 MXU dots (consecutive keys)"
         if _mxu_supported(k) else
         "fused-hierarchical scan+interleave (consecutive keys, no bits round-trip)"),
    ] if not spread and mxu_any else []) + ([
        ("linear-fused-traced", harness.chain_linear_shared_scan,
         {"relayout": "words"},
         "dispatcher, TRACED keys: fused bit-sliced scan+interleave "
         "(round 5 - one compiled program for any runtime key values)"),
        ("linear-twokernel", harness.chain_linear_shared_scan,
         {"relayout": "twokernel"},
         "two-kernel comparator: traced-keys scan + s8 MXU relayout"
         + ("; hierarchical 2-level interleave"
            if _mxu_large_supported(k) and not _mxu_supported(k) else "")),
    ] if mxu_any else [
        ("linear-mxu-words", harness.chain_linear_shared_scan,
         {"relayout": "words"},
         "two-kernel export via the words dispatcher (stack relayout; "
         "k outside every MXU tier)"),
    ]) + [
        ("linear-mxu-u8view", harness.chain_linear_shared_scan,
         {"relayout": "dispatch"},
         "adds the u8 device view: 16.5x-padded bitcast materialization"),
        ("linear-xla-stack", harness.chain_linear_shared_scan,
         {"relayout": "stack"},
         "device rows include a full-output consume pass"),
        ("native-kW-comparator", harness.chain_linear_baseline_shared_scan, {},
         "device rows include a full-output consume pass"),
    ]
    variants = [v for v in variants if not any(s in v[0] for s in skip)]
    for name, chain, extra, note in variants:
        if "keys_tuple" not in extra and "kk" not in extra:
            extra = {**extra, "kk": k}
        m = measure_loop(
            functools.partial(chain, width=WIDTH, n=n, tb=None, **extra),
            (dev.tiles,), trials=reps,
            est_iter_s=traffic / (6e9 if name == "linear-xla-stack" else 300e9),
            salt0=(abs(hash(name)) + int(time.time())) % 1_000_000,
        )
        gbs = traffic / m.seconds / 1e9
        row_ok = ok_by_row.get(name, ok)
        rows.append({
            "width": WIDTH, "k": k, "path": name,
            "ms": round(m.millis, 4), "gb_per_s_counted": round(gbs, 1),
            "verified": row_ok, "n": n, "traffic_bytes": traffic,
            "note": note,
        })
        print(f"{name}: {gbs:.1f} GB/s counted ({m.millis:.3f} ms) "
              f"verify={'ok' if row_ok else 'FAIL'}", flush=True)

    # host AVX2 interleave floor at the same byte volume (csrc
    # sss_interleave).  Interleave-only: the device->host fetch of the
    # native (k, W) words is NOT included (the relay transfer path cannot
    # sustain a 477 MB device_get — measured round 3) and would be paid
    # by ANY export format equally.
    from shared_simd_scan_tpu import host as host_lib

    if host_lib.available():
        stride = (n + 7) // 8
        rnd = np.random.default_rng(0).integers(
            0, 256, size=(k, stride), dtype=np.uint8
        )
        host_lib.interleave_bytes(rnd, stride)  # warm pages / threads
        best = min(
            _t(lambda: host_lib.interleave_bytes(rnd, stride))
            for _ in range(reps)
        )
        hgbs = 2 * k * stride / best / 1e9
        rows.append({
            "width": WIDTH, "k": k, "path": "host-avx2-interleave",
            "ms": round(best * 1e3, 4), "gb_per_s_counted": round(hgbs, 1),
            "verified": True, "n": n, "traffic_bytes": 2 * k * stride,
            "note": "host-side relayout only; device->host fetch excluded",
        })
        print(f"host-avx2-interleave: {hgbs:.1f} GB/s ({best * 1e3:.3f} ms)",
              flush=True)

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

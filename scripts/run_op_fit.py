"""Cost-model fit rows for the NON-SCAN production ops (VERDICT r3
items 3-4 and Missing #3).

The fit protocol (scripts/fit_cost_model.py) proves scan kernels are at
their counted bound; histogram / aggregate / member had no entries, so
their gaps to roofline were unexplained.  This script measures them all
in ONE session (same-day chip state) together with two calibration rows
— a copy (HBM) and a VPU-bound shared scan — and emits every model
input per row: counted ops/value, HBM bytes (packed + count partials),
and grid-step count (the k=512 histogram runs tens of thousands of grid
steps; at the ~0.7-1 us/step overhead the round-3 CLAUDE.md documents,
step count is a first-class cost term, not noise).  fit_op_costs.py
then solves for (vpu_tops, step_overhead) and reports measured/predicted
per row.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_op_fit.py \
      [out.csv] [--data-size=512m] [--reps=3]
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
from shared_simd_scan_tpu.ops import aggregate as agg_ops  # noqa: E402
from shared_simd_scan_tpu.ops import member as member_ops  # noqa: E402
from shared_simd_scan_tpu.ops import scan as scan_ops  # noqa: E402
from shared_simd_scan_tpu.ops import unpack as unpack_ops  # noqa: E402
from shared_simd_scan_tpu.utils.costmodel import count_vector_ops  # noqa: E402

WIDTH = 9
WM = 16
LANES = layout.LANES


def _tiny(width):
    vals = np.arange(8 * 128 * 32, dtype=np.uint32) & ((1 << width) - 1)
    return layout.pack_device(jnp.asarray(vals), width).tiles


def _hist_plain_model(b1, k):
    t = _tiny(WIDTH)
    nt = t.shape[1] * 128 * 32
    tb, nchunks, kpad = scan_ops._histogram_plan(b1, WIDTH, k, None)
    c = count_vector_ops(
        lambda x, lo: scan_ops.histogram_tiles(x, lo, k, WIDTH, nt),
        t, jnp.uint32(0),
    )
    # one body per (tile, chunk) grid step: the counted body covers one
    # chunk, so ops/value scales by nchunks (interval-kernel convention)
    ops = c["per_value"] * nchunks
    steps = (b1 // tb) * nchunks
    partials = scan_ops.histogram_partials_nbytes(b1, WIDTH, k)
    return ops, steps, partials


def _hist_dag_model(b1, k, tb=None, single_pass=None):
    t = _tiny(WIDTH)
    nt = t.shape[1] * 128 * 32
    if single_pass is None:
        single_pass = k > 48
    if single_pass:
        c = count_vector_ops(
            lambda x: scan_ops._histogram_span_tiles_impl(
                x, 0, k, WIDTH, nt, tb, False, 0
            ),
            t,
        )
        live = scan_ops._static_dag_liveness(WIDTH, tuple(range(k)))
        per_tb = 512 * (2 * WIDTH + WIDTH + 40 + live + 64)
        tb_auto = min(256, max(8, (12_000_000 // per_tb) // 8 * 8))
        tbg = unpack_ops._pick_tb(b1, tb if tb is not None else tb_auto)
        partials = scan_ops.histogram_span_partials_nbytes(b1, WIDTH, k, tb)
        return c["per_value"], b1 // tbg, partials
    ops = 0.0
    steps = 0
    g0 = 0
    for g in scan_ops._static_group_sizes(k):
        keys = tuple(range(g0, g0 + g))
        g0 += g
        # the DAG kernel unrolls its chunks as pl.when branches, so the
        # counted body already SUMS fill + every chunk — exact per tile
        c = count_vector_ops(
            lambda x, keys=keys: scan_ops._histogram_dag_tiles_impl(
                x, keys, WIDTH, nt, tb, False, 0
            ),
            t,
        )
        ops += c["per_value"]
        krows = scan_ops._static_krows(g)
        nchunks = -(-g // krows)
        live = max(
            scan_ops._static_dag_liveness(WIDTH, keys[c0 : c0 + krows])
            for c0 in range(0, g, krows)
        )
        per_tb = 512 * (2 * WIDTH + krows + WIDTH + 32 + live + 64)
        tb_auto = min(256, max(8, (12_000_000 // per_tb) // 8 * 8))
        tbg = unpack_ops._pick_tb(b1, tb if tb is not None else tb_auto)
        steps += (b1 // tbg) * nchunks
    partials = scan_ops.histogram_dag_partials_nbytes(b1, WIDTH, k, tb)
    return ops, steps, partials


def _bitsliced_static_model(b1, keys):
    """Counted cost of the static AND-DAG scan tier for THIS key set:
    ops/value from the traced impl (unpack + pruned transpose + DAG +
    stores — the FULL body, not just the DAG ops), grid steps from the
    impl's own tb rule, count-partial bytes.  The bits output bytes are
    returned separately (they include the zero-pad rows the kernel
    really writes)."""
    t = _tiny(WIDTH)
    nt = t.shape[1] * 128 * 32
    arr = np.asarray(keys, np.uint32)
    ops = 0.0
    steps = 0
    partials = 0
    bits_bytes = 0
    g0 = 0
    for g in scan_ops._static_group_sizes(len(arr)):
        sub = tuple(int(x) for x in arr[g0 : g0 + g])
        g0 += g
        c = count_vector_ops(
            lambda x, sub=sub: scan_ops._bitsliced_static_tiles_impl(
                x, sub, WIDTH, nt, None, False, 0
            ),
            t,
        )
        ops += c["per_value"]
        krows = scan_ops._static_krows(g)
        nchunks = -(-g // krows)
        live = max(
            scan_ops._static_dag_liveness(WIDTH, sub[c0 : c0 + krows])
            for c0 in range(0, g, krows)
        )
        per_tb = 512 * (2 * WIDTH + 2 * krows + WIDTH + 32 + live + 64)
        tb_auto = min(256, max(8, (12_000_000 // per_tb) // 8 * 8))
        tbg = unpack_ops._pick_tb(b1, tb_auto)
        steps += (b1 // tbg) * nchunks
        kpad = nchunks * krows
        partials += (b1 // tbg) * kpad * LANES * 4
        bits_bytes += kpad * b1 * LANES * 4
    return ops, steps, partials, bits_bytes


def _agg_models(b1, k, kind):
    t, mt = _tiny(WIDTH), _tiny(WM)
    nt = t.shape[1] * 128 * 32
    keys = jnp.arange(k, dtype=jnp.uint32)
    if kind == "compare":
        tb = agg_ops._agg_tb(WIDTH, WM, k, b1, None)
        c = count_vector_ops(
            lambda p, m, kk: agg_ops.aggregate_scan_tiles(
                p, m, kk, WIDTH, WM, nt
            ),
            t, mt, keys,
        )
    else:
        kt = tuple(range(1, 1 + 2 * k, 2))  # spread odd keys
        live = scan_ops._static_dag_liveness(WIDTH, kt)
        tb = agg_ops._agg_bitplane_tb(WIDTH, WM, live, b1, None)
        c = count_vector_ops(
            lambda p, m, kt=kt: agg_ops.aggregate_bitplane_static_tiles(
                p, m, kt, WIDTH, WM, nt
            ),
            t, mt,
        )
    steps = b1 // tb
    partials = 3 * steps * k * LANES * 4
    return c["per_value"], steps, partials


def main(argv):
    out_path, data_size, reps = "bench_results/op_fit_v5e.csv", "512m", 3
    for a in argv:
        if a.startswith("--data-size="):
            data_size = a.split("=", 1)[1]
        elif a.startswith("--reps="):
            reps = int(a.split("=", 1)[1])
        else:
            out_path = a
    size = parse_size(data_size)

    n = harness.values_for(size, WIDTH)
    rng = np.random.default_rng(17)
    pvals = rng.integers(0, 1 << WIDTH, n, dtype=np.uint32)
    mvals = rng.integers(0, 1 << WM, n, dtype=np.uint32)
    pdev = unpack_ops.pack_device_kernel(jnp.asarray(pvals), WIDTH)
    mdev = unpack_ops.pack_device_kernel(jnp.asarray(mvals), WM)
    b1 = pdev.tiles.shape[1]
    pbytes = layout.packed_nbytes(WIDTH, n)
    hist_full = np.bincount(pvals, minlength=1 << WIDTH).astype(np.uint64)

    rows = []

    def emit(op, k, tb, meas, ops, steps, partials, extra_bytes, ok,
             mxu_macs=0):
        rows.append({
            "op": op, "k": k, "tb": tb if tb else "auto",
            "ms": round(meas.millis, 4),
            "ops_per_value": round(ops, 2) if ops is not None else "",
            "hbm_bytes": pbytes + partials + extra_bytes,
            "grid_steps": steps, "n": n, "verified": ok,
            "mxu_macs": int(mxu_macs),
        })
        print(f"{op} k={k} tb={tb or 'auto'}: {meas.millis:.3f} ms "
              f"ops/val={ops if ops is not None else '-'} steps={steps} "
              f"verify={'ok' if ok else 'FAIL'}", flush=True)

    def salt0(tag):
        return (abs(hash(tag)) + int(time.time())) % 1_000_000

    # --- calibration: copy (HBM) ------------------------------------------
    buf = jnp.asarray(
        rng.integers(0, 1 << 31, size=(size // 4,), dtype=np.uint32)
    )
    m = measure_loop(
        harness.chain_copy, (buf,), trials=reps,
        est_iter_s=2 * size / 700e9, salt0=salt0("copy"),
    )
    emit("copy", 0, None, m, None, 0, 0, size, True)  # 2*size total, pbytes~excluded
    rows[-1]["hbm_bytes"] = 2 * size

    # --- calibration: VPU-bound shared scan k=16 (traced keys) -----------
    k = 16
    keys = jnp.arange(k, dtype=jnp.uint32)
    _, cnt = scan_ops.shared_scan_tiles(pdev.tiles, keys, WIDTH, n)
    ok = bool(
        (np.asarray(cnt) == hist_full[:k].astype(np.uint32)).all()
    )
    t = _tiny(WIDTH)
    c = count_vector_ops(
        lambda x, kk: scan_ops.shared_scan_tiles(
            x, kk, WIDTH, t.shape[1] * 128 * 32
        ), t, keys,
    )
    tbs = unpack_ops._pick_tb(b1, scan_ops.default_scan_tb(k))
    m = measure_loop(
        functools.partial(harness.chain_shared_scan, width=WIDTH, n=n, tb=None),
        (pdev.tiles, keys), trials=reps,
        est_iter_s=(pbytes + k * n / 8) / 650e9, salt0=salt0("scan16"),
    )
    emit("shared-scan-compare", k, None, m, c["per_value"], b1 // tbs,
         0, k * (n // 8), ok)

    # --- bitsliced-static spread flagship (VERDICT r4 item 2) -------------
    # the single most load-bearing non-headline number (567 GB/s at k=8):
    # put it under the same fitted-bound protocol as every other tier
    perm = np.random.default_rng(7).permutation(1 << WIDTH)
    for kk in (8, 32):
        skeys = perm[:kk].astype(np.uint32)
        kt = tuple(int(x) for x in skeys)
        _, cnt = scan_ops.shared_scan_bitsliced_static_tiles(
            pdev.tiles, skeys, WIDTH, n
        )
        ok = bool(
            (np.asarray(cnt) == hist_full[skeys].astype(np.uint32)).all()
        )
        ops, steps, partials, bits_bytes = _bitsliced_static_model(b1, skeys)
        m = measure_loop(
            functools.partial(
                harness.chain_bitsliced_static_shared_scan, width=WIDTH,
                n=n, tb=None, keys_tuple=kt,
            ),
            (pdev.tiles,), trials=reps,
            est_iter_s=(pbytes + bits_bytes) / 550e9,
            salt0=salt0(("bsstatic", kk)),
        )
        emit("bitsliced-static-spread", kk, None, m, ops, steps, partials,
             bits_bytes, ok)

    # --- histograms -------------------------------------------------------
    for op, kk, sp in (
        ("histogram-window", 512, None),
        ("histogram-dag-span", 512, True),
        ("histogram-dag-chunked", 512, False),
        ("histogram-dag-span", 32, True),
        ("histogram-dag-chunked", 32, False),
    ):
        got = (
            scan_ops.histogram_tiles(pdev.tiles, jnp.uint32(0), kk, WIDTH, n)
            if op == "histogram-window"
            else scan_ops.histogram_dag_tiles(
                pdev.tiles, 0, kk, WIDTH, n, single_pass=sp
            )
        )
        ok = bool((np.asarray(got) == hist_full[:kk].astype(np.uint32)).all())
        if op == "histogram-window":
            ops, steps, partials = _hist_plain_model(b1, kk)
            chain = functools.partial(
                harness.chain_histogram, width=WIDTH, n=n, tb=None, kk=kk
            )
        else:
            ops, steps, partials = _hist_dag_model(b1, kk, single_pass=sp)
            chain = functools.partial(
                harness.chain_histogram_dag, width=WIDTH, n=n, tb=None,
                kk=kk, sp=sp,
            )
        m = measure_loop(
            chain,
            (pdev.tiles,), trials=reps,
            est_iter_s=(pbytes + partials) / 300e9, salt0=salt0((op, kk, sp)),
        )
        emit(op, kk, None, m, ops, steps, partials, 0, ok)

    # --- aggregates (wm=16) ----------------------------------------------
    esum = np.bincount(pvals, weights=mvals.astype(np.float64),
                       minlength=1 << WIDTH)
    for kind, kk in (("compare", 8), ("compare", 32),
                     ("bitplane", 8), ("bitplane", 32)):
        if kind == "compare":
            keysj = jnp.arange(kk, dtype=jnp.uint32)
            cnts, slo, shi = agg_ops.aggregate_scan_tiles(
                pdev.tiles, mdev.tiles, keysj, WIDTH, WM, n
            )
            exp_c = hist_full[:kk].astype(np.uint32)
            exp_s = esum[:kk].astype(np.uint64)
        else:
            kt = tuple(range(1, 1 + 2 * kk, 2))
            cnts, slo, shi = agg_ops.aggregate_bitplane_static_tiles(
                pdev.tiles, mdev.tiles, kt, WIDTH, WM, n
            )
            exp_c = hist_full[list(kt)].astype(np.uint32)
            exp_s = esum[list(kt)].astype(np.uint64)
        sums = agg_ops.finalize_sums(slo, shi)
        ok = bool((np.asarray(cnts) == exp_c).all() and (sums == exp_s).all())
        ops, steps, partials = _agg_models(b1, kk, kind)
        mbytes = layout.packed_nbytes(WM, n)
        if kind == "compare":
            chain = functools.partial(
                harness.chain_aggregate_scan, wp=WIDTH, wm=WM, n=n, tb=None,
                kk=kk,
            )
        else:
            chain = functools.partial(
                harness.chain_aggregate_bitplane_static, wp=WIDTH, wm=WM,
                n=n, tb=None, keys_tuple=tuple(range(1, 1 + 2 * kk, 2)),
            )
        m = measure_loop(
            chain, (pdev.tiles, mdev.tiles), trials=reps,
            est_iter_s=(pbytes + mbytes) / 200e9, salt0=salt0((kind, kk)),
        )
        emit(f"aggregate-{kind}", kk, None, m, ops, steps, partials, mbytes, ok)

    # --- member OR-tree ----------------------------------------------------
    for kk in (100, 256):
        keys = np.unique((np.arange(kk) * 37 + 11) % 512).astype(np.uint32)
        kt = tuple(int(x) for x in keys)
        _, cnt = member_ops.member_scan_tiles(pdev.tiles, keys, WIDTH, n)
        ok = int(cnt) == int(hist_full[keys].sum())
        ops = member_ops.member_ortree_cost(WIDTH, keys) / 4.0
        tbm = unpack_ops._pick_tb(b1, 128)
        m = measure_loop(
            functools.partial(
                harness.chain_member_scan, width=WIDTH, n=n, tb=None,
                keys_tuple=kt,
            ),
            (pdev.tiles,), trials=reps,
            est_iter_s=(pbytes + n / 8) / 400e9, salt0=salt0(("member", kk)),
        )
        emit("member-ortree", len(kt), None, m, ops, b1 // tbm, 0, n // 8, ok)

    # --- linear export (MXU permutation dots; round-4 flagship) -----------
    from shared_simd_scan_tpu.ops import linear as linear_ops

    nbytes = (n + 7) // 8
    W = layout.bitvector_words(n)
    for kk in (8, 16):
        # fused single-pass kernel: value-grid convention, so the plain
        # per_value count applies; MACs = 4 planes x (b1*128k out elems
        # per row-tile ... ) = 4 * b1 * 128k * 128k / (tiles) -> closed
        # form 4 * b1 * 16384 * kk^2 (output rows = b1)
        t = _tiny(WIDTH)
        nt = t.shape[1] * 128 * 32
        c = count_vector_ops(
            lambda x: scan_ops._interval_linear_tiles_impl(
                x, 0, kk, WIDTH, nt, None, False, True, "s8", 0
            ),
            t,
        )
        tbf = scan_ops._interval_linear_tb(b1, WIDTH, kk, "s8")
        macs = 4 * b1 * 16384 * kk * kk
        # flat=False: the counts are the verification target and the
        # default flat slice would EAGERLY materialize the ~GB output
        # (the documented relay trap)
        wv, cnt = scan_ops.interval_scan_linear_words_tiles(
            pdev.tiles, 0, kk, WIDTH, n, flat=False
        )
        ok = bool((np.asarray(cnt) == hist_full[:kk].astype(np.uint32)).all())
        del wv
        m = measure_loop(
            functools.partial(
                harness.chain_linear_shared_scan, width=WIDTH, n=n, tb=None,
                kk=kk, relayout="fused",
            ),
            (pdev.tiles,), trials=reps,
            est_iter_s=(pbytes + nbytes * kk) / 150e9,
            salt0=salt0(("linfused", kk)),
        )
        emit("linear-fused-s8", kk, None, m, c["per_value"], b1 // tbf,
             nbytes * kk + (b1 // tbf) * kk * LANES * 4, 0, ok, macs)

    # the TRACED-keys fused export (round 5): same MACs, plane-fold body
    kk = 8
    t = _tiny(WIDTH)
    nt = t.shape[1] * 128 * 32
    c = count_vector_ops(
        lambda x, kj: scan_ops._bitsliced_linear_tiles_impl(
            x, kj, kk, WIDTH, nt, None, False, "s8", 0
        ),
        t, jnp.arange(kk, dtype=jnp.uint32),
    )
    tbf = scan_ops._bitsliced_linear_tb(b1, WIDTH, kk, "s8")
    macs = 4 * b1 * 16384 * kk * kk
    wv, cnt = scan_ops.bitsliced_scan_linear_words_tiles(
        pdev.tiles, jnp.arange(kk, dtype=jnp.uint32), WIDTH, n, flat=False
    )
    ok = bool((np.asarray(cnt) == hist_full[:kk].astype(np.uint32)).all())
    del wv
    m = measure_loop(
        functools.partial(
            harness.chain_linear_shared_scan, width=WIDTH, n=n, tb=None,
            kk=kk, relayout="words",
        ),
        (pdev.tiles,), trials=reps,
        est_iter_s=(pbytes + nbytes * kk) / 150e9,
        salt0=salt0(("lintraced", kk)),
    )
    emit("linear-fused-traced", kk, None, m, c["per_value"], b1 // tbf,
         nbytes * kk + (b1 // tbf) * kk * LANES * 4, 0, ok, macs)

    # hierarchical relayout on pre-made bits (k=32): word-grid kernels, so
    # convert static eqn counts to per-VALUE via total element-ops / n
    kk = 32
    mH = kk // 8
    bitsj = jnp.asarray(
        rng.integers(0, 1 << 31, size=(kk, W), dtype=np.uint32)
    )
    tinyb = jnp.zeros((8, 8 * 128), jnp.uint32)
    cb = count_vector_ops(
        lambda x: linear_ops.interleave_mxu_words(x, 8 * 128 * 8), tinyb
    )
    tinys = jnp.zeros((mH, 8 * 128), jnp.uint32)
    cs = count_vector_ops(
        lambda x: linear_ops.interleave_streams_mxu_words(
            x, 2, mH * 8 * 128
        ),
        tinys,
    )
    nwords_g = nbytes * 2
    tw1 = 128  # interleave_mxu_words default for k=8
    rows1 = -(-(-(-W // 128)) // tw1) * tw1
    steps1 = mH * (rows1 // tw1)
    tw2 = 256
    rows2 = -(-(-(-nwords_g // 128)) // tw2) * tw2
    steps2 = rows2 // tw2
    # per_block IS the static eqn count; each eqn touches one (tw, 128)
    # tile per grid step
    elem_ops = (
        cb["per_block"] * steps1 * tw1 * 128
        + cs["per_block"] * steps2 * tw2 * 128
    )
    macs = (
        4 * mH * rows1 * 128 * 8 * 128 * 8
        + 4 * rows2 * 128 * mH * 128 * mH
    )
    hbm = 4 * W * kk * 4  # bits read + streams w+r + out write

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain_hier(b, salt, k):
        def body(i, carry):
            bb, acc = carry
            bb = bb.at[0, 0].set(salt + jnp.uint32(i))
            out = linear_ops.interleave_mxu_words_large(bb, nbytes)
            return bb, acc + jnp.sum(out)
        _, acc = jax.lax.fori_loop(0, k, body, (b, jnp.uint32(0)))
        return acc

    # real in-run verification: device prefix (jit call+slice as ONE
    # program) vs the numpy byte-interleave of the same bits prefix
    pw = 8192
    bits_prefix = np.asarray(jax.device_get(bitsj[:, : pw]))
    devp = np.asarray(
        jax.jit(
            lambda b: linear_ops.interleave_mxu_words_large(b, nbytes)[:pw]
        )(bitsj)
    )
    qg = pw // (kk // 8 * 2) * 2  # stream words fully covered by pw
    expp = (
        np.ascontiguousarray(bits_prefix[:, :qg])
        .view(np.uint8)
        .reshape(kk, -1)
        .T.reshape(-1)
        .view(np.uint32)[:pw]
    )
    okh = bool(np.array_equal(devp[: len(expp)], expp[: len(devp)]))
    m = measure_loop(
        chain_hier, (bitsj,), trials=reps,
        est_iter_s=hbm / 60e9, salt0=salt0("linhier"),
    )
    emit("linear-hier-relayout-s8", kk, None, m, elem_ops / n,
         steps1 + steps2, hbm - pbytes, 0, okh, macs)
    del bitsj

    # --- narrow widths (VERDICT r4 item 5): interval scan w=1/2/4 ---------
    # total-traffic accounting: at w=1, k=8 the bitvector output is 8x
    # the packed input — these rows prove whether the narrow width sweep
    # numbers are AT their write-dominated bound or leaving VPU headroom
    del pdev, mdev  # free the 512 MiB column before the 2^31-value ones
    narrow_size = min(size, 256 * 2**20)
    for wnarrow in (1, 2, 4):
        kk = 8
        nn = min(
            harness.values_for(narrow_size, wnarrow), layout.MAX_VALUES
        )
        ndev = harness.synth_modk_packed_sliced(nn, kk, wnarrow)
        nb1 = ndev.tiles.shape[1]
        npacked = layout.packed_nbytes(wnarrow, nn)
        # synth values are i % 8 % 2^w: counts analytic, no host bincount
        dom = 1 << wnarrow
        exp_c = np.array(
            [
                sum(
                    (nn - r + 7) // 8
                    for r in range(8)
                    if r % dom == j
                )
                for j in range(min(kk, dom))
            ]
            + [0] * max(0, kk - dom),
            np.uint32,
        )
        _, cnt = scan_ops.interval_scan_tiles(
            ndev.tiles, jnp.uint32(0), kk, wnarrow, nn
        )
        ok = bool((np.asarray(cnt) == exp_c).all())
        t = _tiny(wnarrow)
        nt = t.shape[1] * 128 * 32
        c = count_vector_ops(
            lambda x, lo, wn=wnarrow: scan_ops.interval_scan_tiles(
                x, lo, kk, wn, nt
            ),
            t, jnp.uint32(0),
        )
        tbi = unpack_ops._pick_tb(
            nb1, scan_ops.default_interval_tb(wnarrow, kk)
        )
        steps = nb1 // tbi
        bits_bytes = kk * nb1 * LANES * 4  # padded bits rows, really written
        partials = steps * kk * LANES * 4
        m = measure_loop(
            functools.partial(
                harness.chain_interval_scan, width=wnarrow, n=nn, tb=None,
                kk=kk,
            ),
            (ndev.tiles,), trials=reps,
            est_iter_s=(npacked + bits_bytes) / 600e9,
            salt0=salt0(("narrow", wnarrow)),
        )
        rows.append({
            "op": f"interval-scan-w{wnarrow}", "k": kk, "tb": "auto",
            "ms": round(m.millis, 4),
            "ops_per_value": round(c["per_value"], 2),
            "hbm_bytes": npacked + partials + bits_bytes,
            "grid_steps": steps, "n": nn, "verified": ok,
            "mxu_macs": 0,
        })
        print(f"interval-scan-w{wnarrow} k={kk}: {m.millis:.3f} ms "
              f"ops/val={c['per_value']:.2f} steps={steps} "
              f"verify={'ok' if ok else 'FAIL'}", flush=True)
        del ndev

    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_path} ({len(rows)} rows)")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

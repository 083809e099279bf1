"""Pallas TPU fused scan kernels: single-predicate and shared (k-predicate).

TPU-native re-design of the reference's scan family:
  - ``scan_128`` / ``scan_256`` (src/simd_scan.cpp:102-307): unpack fused
    with one equality compare, LSB-first match bitvector + hit count.
  - ``shared_scan_128_standard`` and friends (src/simd_scan_shared.cpp):
    k predicates evaluated in ONE pass — decompress each block once, then
    an inner compare loop over the predicate table (the "horizontal" shared
    scan, simd_scan_shared.cpp:49-86).  The vertical/parallel, sequential,
    threaded, and unrolled reference variants are all expressions of the
    same semantics under different CPU resource constraints; on TPU they
    collapse into this single kernel (SURVEY.md §2.4): values ride the
    lane axis, the predicate loop is unrolled at trace time (k is a static
    jit specialization — the analog of the reference's
    ``shared_scan_128_linear_static<NUM>`` template, simd_scan.hpp:122-236).

Key layout win: one 32-value block contributes exactly one uint32 word of
the match bitvector, so the kernel emits ``bits[k, B1, 128]`` with NO
cross-lane traffic — the movemask packing (simd_scan.cpp:132,145) becomes
``acc |= (v_r == key) << r`` per unrolled r.  Canonical LSB-first order is a
reshape, byte-identical to the reference.

Hit counts are accumulated in-kernel (per-lane partials, reduced at the
end) so the bitvector is never re-read from HBM — the count is free,
matching the reference's in-loop POPCNT accumulation (simd_scan.cpp:153).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shared_simd_scan_tpu.layout import (
    BLOCK_VALUES,
    LANES,
    DeviceColumn,
    bitvector_words,
)
from shared_simd_scan_tpu.ops.unpack import _pick_tb, _unpack_block_values


def _vmem_tb_cap(width: int, k: int, extra: int = 8,
                 budget: int = 12_000_000) -> int:
    """Largest sublane tile whose VMEM working set fits the ~16 MB budget
    (with headroom): double-buffered input blocks (2*width words/block),
    bits output (+double buffer) and live accumulators per block are all
    proportional to tb * 512 B."""
    per_tb = 512 * (2 * width + 3 * k + extra)
    return max(8, (budget // per_tb) // 8 * 8)


def default_scan_tb(k: int, width: int = 9) -> int:
    """Default blocks-sublane tile for the scan kernel.

    Measured on v5e at 512 MiB: per-grid-step overhead dominates small
    tiles (tb=32 left k=1 at ~20% of roofline), while VMEM pressure caps
    large ones as k and width grow.  tb=512 puts k=1 at ~95% of the HBM
    roofline; k=8 peaks around tb=128."""
    return min(512, max(32, 1024 // max(k, 1)), _vmem_tb_cap(width, k))


def _shared_scan_kernel(off_ref, keys_ref, in_ref, bits_ref, cnt_ref, *, width, k, tb, n):
    """One grid step: blocks tile (width, TB, 128) -> bits (k, TB, 128)
    plus this step's partial hit counts (1, k, LANES).

    Counts are written to a distinct block per grid step and reduced by the
    caller: accumulating into one revisited VMEM block instead creates a
    cross-step dependency that stalls the grid pipeline (measured ~20%
    on the k=1 scan)."""
    i = pl.program_id(0)

    # Validity mask per block word: zero bits at value index >= n
    # (reference scalar-oracle semantics, simd_scan.cpp:93-97; its SIMD
    # kernels write garbage into padding instead — not replicated).
    # off_ref holds this shard's global block offset (0 when unsharded) so
    # the same kernel serves the shard_map'd data-parallel path (dist.py).
    full, rem = n // BLOCK_VALUES, n % BLOCK_VALUES
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 1)
    g = off_ref[0, 0] + (i * tb + row) * LANES + lane  # global block id
    valid = jnp.where(
        g < full,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(g == full, jnp.uint32((1 << rem) - 1 if rem else 0), jnp.uint32(0)),
    )

    accs = [jnp.zeros((tb, LANES), jnp.uint32) for _ in range(k)]
    for r, v in _unpack_block_values(in_ref, width):
        bit = jnp.uint32(1 << r)
        for j in range(k):
            key = keys_ref[j, 0]
            accs[j] = accs[j] | jnp.where(v == key, bit, jnp.uint32(0))

    for j in range(k):
        word = accs[j] & valid
        bits_ref[j] = word
        cnt_ref[0, j] = jnp.sum(
            jax.lax.population_count(word).astype(jnp.int32), axis=0
        )


@functools.partial(jax.jit, static_argnames=("width", "n", "tb", "interpret"))
def shared_scan_tiles(
    tiles: jax.Array,
    keys: jax.Array,
    width: int,
    n: int,
    tb: int | None = None,
    interpret: bool = False,
    block_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array]:
    """tiles uint32[width, B1, 128], keys uint32[k] ->
    (bits uint32[k, B1, 128], counts int32[k]).

    ``bits[j].reshape(-1)[:bitvector_words(n)]`` is the canonical LSB-first
    bitvector for predicate j (byte-parity with the reference).

    ``block_offset`` is the global index of this tile array's first block —
    nonzero only on the shard_map'd path (dist.py), where ``n`` is the
    GLOBAL value count and each shard masks its own tail region.
    """
    _, b1, lanes = tiles.shape
    assert lanes == LANES
    k = int(keys.shape[0])
    tb = _pick_tb(b1, tb if tb is not None else default_scan_tb(k, width))
    grid = (b1 // tb,)
    keys2 = keys.astype(jnp.uint32).reshape(k, 1)
    off = jnp.asarray(block_offset, jnp.int32).reshape(1, 1)
    bits, cnt = pl.pallas_call(
        functools.partial(_shared_scan_kernel, width=width, k=k, tb=tb, n=n),
        out_shape=(
            jax.ShapeDtypeStruct((k, b1, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((b1 // tb, k, LANES), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (width, tb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (k, tb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, k, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(off, keys2, tiles)
    return bits, jnp.sum(cnt, axis=(0, 2))


def bits_to_canonical(bits: jax.Array, n: int) -> jax.Array:
    """Device bits layout [..., B1, 128] -> canonical uint32 words [..., W]."""
    lead = bits.shape[:-2]
    return bits.reshape(*lead, -1)[..., : bitvector_words(n)]


def _consecutive_lo(keys) -> int | None:
    """lo if keys are the concrete consecutive run lo..lo+k-1.

    Threshold k >= 4: below that the general static kernel measures
    faster than the interval kernel's fixed transpose cost (v5e sweep
    after the gateless-mask optimization)."""
    import numpy as np

    if isinstance(keys, jax.core.Tracer):
        return None
    arr = np.asarray(keys)
    k = arr.shape[0]
    if not (4 <= k <= 1024):
        return None
    lo = int(arr[0])
    return lo if (arr == lo + np.arange(k, dtype=arr.dtype)).all() else None


def shared_scan_device(
    dev: DeviceColumn, keys, tb: int | None = None, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Shared scan on a DeviceColumn -> ((k, W) canonical bitvectors, (k,) counts).

    Concrete consecutive predicate sets (lo..lo+k-1, the reference
    benchmark's own shape and the per-key decomposition of a range
    predicate) dispatch to the O(1)-in-k interval kernel; arbitrary key
    sets use the general per-key-compare kernel."""
    keys = jnp.asarray(keys, jnp.uint32)
    lo = _consecutive_lo(keys)
    if lo is not None:
        bits, counts = interval_scan_tiles(
            dev.tiles, lo, int(keys.shape[0]), dev.width, dev.n,
            tb=tb, interpret=interpret,
        )
    elif int(keys.shape[0]) > 32:
        # large arbitrary key sets: non-unrolled kernel (compile time of
        # the static kernel grows with 32*k unrolled vector ops)
        bits, counts = shared_scan_dynamic_tiles(
            dev.tiles, keys, dev.width, dev.n, tb=tb, interpret=interpret
        )
    else:
        bits, counts = shared_scan_tiles(
            dev.tiles, keys, dev.width, dev.n, tb=tb, interpret=interpret
        )
    return bits_to_canonical(bits, dev.n), counts


def scan_device(
    dev: DeviceColumn, predicate_key, tb: int | None = None, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Single-predicate scan (counterpart of scan_128, simd_scan.cpp:103-158):
    -> ((W,) canonical bitvector words, scalar hit count)."""
    keys = jnp.asarray(predicate_key, jnp.uint32).reshape(1)
    bits, counts = shared_scan_device(dev, keys, tb=tb, interpret=interpret)
    return bits[0], counts[0]


def shared_scan_linear_device(
    dev: DeviceColumn, keys, tb: int | None = None, interpret: bool = False
) -> jax.Array:
    """Linear (interleaved) shared scan -> uint8[ceil(n/8) * k].

    Byte layout ``out[group*k + key_id]`` for 8-value groups — parity with
    shared_scan_128_linear_standard (simd_scan_shared_linear.cpp:57).  On
    TPU the (k, W) layout is the native efficient one; the interleave is a
    single XLA relayout of the kernel output (the reference needed a
    separate kernel only because its outputs stream straight to DRAM).
    """
    keys = jnp.asarray(keys, jnp.uint32)
    bits, _ = shared_scan_device(dev, keys, tb=tb, interpret=interpret)  # (k, W)
    k = bits.shape[0]
    nbytes = (dev.n + 7) // 8
    shifts = jnp.uint32(8) * jnp.arange(4, dtype=jnp.uint32)
    b = ((bits[:, :, None] >> shifts[None, None, :]) & 0xFF).astype(jnp.uint8)
    return b.reshape(k, -1)[:, :nbytes].T.reshape(-1)


def popcount_bits(bits: jax.Array) -> jax.Array:
    """Hit counts from canonical bitvector words (axis -1)."""
    return jnp.sum(jax.lax.population_count(bits).astype(jnp.int32), axis=-1)


__all__ = [
    "shared_scan_tiles",
    "shared_scan_device",
    "scan_device",
    "shared_scan_linear_device",
    "bits_to_canonical",
    "popcount_bits",
]


# ---------------------------------------------------------------------------
# Interval shared scan: k consecutive equality predicates lo, lo+1, .., lo+k-1
# ---------------------------------------------------------------------------
#
# The reference's shared-scan benchmark (predicates 0..k-1,
# src/benchmark.cpp:205-209) and the common DB decomposition of a range
# predicate both use consecutive keys.  For that case the per-value match
# mask against ALL k keys is ONE variable shift — ``1 << (v - lo)`` gated on
# ``v - lo < k`` — instead of k compares, and the per-key bitvectors fall
# out of an 8x8 bit-matrix transpose (Hacker's Delight 7-3, decomposed into
# uint32 pairs since TPU has no uint64).  Measured ops/value ~16 vs ~27 for
# the general kernel at k=8, and O(1) vs O(k) in the mask phase, so the
# advantage grows with k.


def _t8_step(x, sh, m):
    t = (x ^ (x >> jnp.uint32(sh))) & jnp.uint32(m)
    return x ^ t ^ (t << jnp.uint32(sh))


def _transpose8_pair(a, b):
    """Bit-transpose an 8x8 matrix: input byte i of (a:rows 0-3, b:rows 4-7)
    is row i (LSB-first); output byte j of (c, d) is column j."""
    a = _t8_step(a, 7, 0x00AA00AA)
    b = _t8_step(b, 7, 0x00AA00AA)
    a = _t8_step(a, 14, 0x0000CCCC)
    b = _t8_step(b, 14, 0x0000CCCC)
    t = (a ^ ((a >> jnp.uint32(28)) | (b << jnp.uint32(4)))) & jnp.uint32(0xF0F0F0F0)
    return a ^ t, b ^ (t >> jnp.uint32(4))


def _interval_scan_kernel(off_ref, lo_ref, in_ref, bits_ref, cnt_ref, *, width, k, tb, n):
    i = pl.program_id(0)
    full, rem = n // BLOCK_VALUES, n % BLOCK_VALUES
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 1)
    g = off_ref[0, 0] + (i * tb + row) * LANES + lane
    valid = jnp.where(
        g < full,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(g == full, jnp.uint32((1 << rem) - 1 if rem else 0), jnp.uint32(0)),
    )

    lo = lo_ref[0, 0]
    multi_chunk = k > 32
    if multi_chunk:
        # keys processed in 32-key chunks: retain the unpacked values
        # (tb is small at large k so the live set stays modest)
        vs = [v for _, v in _unpack_block_values(in_ref, width)]

    for c0 in range(0, k, 32):
        kc = min(32, k - c0)  # keys in this chunk: lo+c0 .. lo+c0+kc-1
        lo_c = lo + jnp.uint32(c0)
        # Per-value kc-bit match mask in ONE variable shift, no gate:
        # XLA/Mosaic shift-left saturates to 0 for amounts >= 32 (verified
        # on both TPU hardware and the CPU interpreter), so out-of-chunk
        # values — including v < lo_c via unsigned wraparound — produce 0,
        # and mask bits in [kc, 32) of a partial chunk are never read by
        # the distribute loop below.
        if multi_chunk:
            ms = [jnp.uint32(1) << (v - lo_c) for v in vs]
        else:
            ms = [
                jnp.uint32(1) << (v - lo_c)
                for _, v in _unpack_block_values(in_ref, width)
            ]

        nbytes_c = (kc + 7) // 8
        words = [None] * kc
        for c in range(nbytes_c):
            for grp in range(4):  # 8 values per group
                rows8 = [ms[8 * grp + t] for t in range(8)]
                # byte-select (and clear the gateless mask's bits >= 8,
                # which would otherwise alias into neighbouring rows)
                if nbytes_c > 1:
                    rows8 = [(x >> jnp.uint32(8 * c)) & jnp.uint32(0xFF) for x in rows8]
                else:
                    rows8 = [x & jnp.uint32(0xFF) for x in rows8]
                a = rows8[0] | (rows8[1] << 8) | (rows8[2] << 16) | (rows8[3] << 24)
                b = rows8[4] | (rows8[5] << 8) | (rows8[6] << 16) | (rows8[7] << 24)
                ct, dt = _transpose8_pair(a, b)
                for j in range(min(8, kc - 8 * c)):
                    src = ct if j < 4 else dt
                    byte = (src >> jnp.uint32(8 * (j % 4))) & jnp.uint32(0xFF)
                    contrib = byte << jnp.uint32(8 * grp)
                    kj = 8 * c + j
                    words[kj] = contrib if words[kj] is None else words[kj] | contrib

        for j in range(kc):
            w = words[j] & valid
            bits_ref[c0 + j] = w
            cnt_ref[0, c0 + j] = jnp.sum(
                jax.lax.population_count(w).astype(jnp.int32), axis=0
            )


@functools.partial(jax.jit, static_argnames=("width", "n", "k", "tb", "interpret"))
def interval_scan_tiles(
    tiles: jax.Array,
    lo: jax.Array,
    k: int,
    width: int,
    n: int,
    tb: int | None = None,
    interpret: bool = False,
    block_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Shared scan against the k consecutive keys lo..lo+k-1 (k <= 1024;
    keys handled in 32-wide chunks above k=32).

    Same output contract as :func:`shared_scan_tiles` with
    keys = [lo, lo+1, ..., lo+k-1]."""
    _, b1, lanes = tiles.shape
    assert lanes == LANES
    if not (1 <= k <= 1024):
        raise ValueError(f"interval scan supports 1 <= k <= 1024, got {k}")
    # measured on v5e at 512 MiB: k=8 best at tb=256 (516 GB/s), k=32 at
    # tb=128 (545 GB/s).  Capped by the VMEM working set: 32 live per-r
    # masks + double-buffered input blocks (width-dependent) + the
    # (k, tb, 128) bits output block.
    if tb is None:
        tb = min(256, max(8, 4096 // k), _vmem_tb_cap(width, k, extra=36))
    tb = _pick_tb(b1, tb)
    grid = (b1 // tb,)
    lo2 = jnp.asarray(lo, jnp.uint32).reshape(1, 1)
    off = jnp.asarray(block_offset, jnp.int32).reshape(1, 1)
    bits, cnt = pl.pallas_call(
        functools.partial(_interval_scan_kernel, width=width, k=k, tb=tb, n=n),
        out_shape=(
            jax.ShapeDtypeStruct((k, b1, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((b1 // tb, k, LANES), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (width, tb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (k, tb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, k, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(off, lo2, tiles)
    return bits, jnp.sum(cnt, axis=(0, 2))


def interval_scan_device(
    dev: DeviceColumn, lo, k: int, tb: int | None = None, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """Shared scan for consecutive keys lo..lo+k-1 -> ((k, W) bitvectors,
    (k,) counts) — the fast path for the reference benchmark's predicate
    set (0..k-1) and for range predicates decomposed per key."""
    bits, counts = interval_scan_tiles(
        dev.tiles, lo, k, dev.width, dev.n, tb=tb, interpret=interpret
    )
    return bits_to_canonical(bits, dev.n), counts


# ---------------------------------------------------------------------------
# Range-predicate shared scan: k predicates lo_j <= v < hi_j
# ---------------------------------------------------------------------------


def _range_scan_kernel(off_ref, lohi_ref, in_ref, bits_ref, cnt_ref, *, width, k, tb, n):
    i = pl.program_id(0)
    full, rem = n // BLOCK_VALUES, n % BLOCK_VALUES
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 1)
    g = off_ref[0, 0] + (i * tb + row) * LANES + lane
    valid = jnp.where(
        g < full,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(g == full, jnp.uint32((1 << rem) - 1 if rem else 0), jnp.uint32(0)),
    )

    accs = [jnp.zeros((tb, LANES), jnp.uint32) for _ in range(k)]
    for r, v in _unpack_block_values(in_ref, width):
        bit = jnp.uint32(1 << r)
        for j in range(k):
            # half-open interval via the unsigned subtract trick: one
            # compare per predicate instead of two
            inside = (v - lohi_ref[j, 0]) < (lohi_ref[j, 1] - lohi_ref[j, 0])
            accs[j] = accs[j] | jnp.where(inside, bit, jnp.uint32(0))

    for j in range(k):
        w = accs[j] & valid
        bits_ref[j] = w
        cnt_ref[0, j] = jnp.sum(
            jax.lax.population_count(w).astype(jnp.int32), axis=0
        )


@functools.partial(jax.jit, static_argnames=("width", "n", "tb", "interpret"))
def range_scan_tiles(
    tiles: jax.Array,
    lows: jax.Array,
    highs: jax.Array,
    width: int,
    n: int,
    tb: int | None = None,
    interpret: bool = False,
    block_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array]:
    """k half-open range predicates [lo_j, hi_j) in one fused pass.

    The capability extension over the reference (equality-only shared
    scans): one compare per predicate via the unsigned-subtract interval
    trick, same bitvector/count contract as shared_scan_tiles."""
    _, b1, lanes = tiles.shape
    assert lanes == LANES
    k = int(lows.shape[0])
    tb = _pick_tb(b1, tb if tb is not None else default_scan_tb(k))
    grid = (b1 // tb,)
    lohi = jnp.stack(
        [lows.astype(jnp.uint32), highs.astype(jnp.uint32)], axis=1
    )  # (k, 2)
    off = jnp.asarray(block_offset, jnp.int32).reshape(1, 1)
    bits, cnt = pl.pallas_call(
        functools.partial(_range_scan_kernel, width=width, k=k, tb=tb, n=n),
        out_shape=(
            jax.ShapeDtypeStruct((k, b1, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((b1 // tb, k, LANES), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (width, tb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (k, tb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, k, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(off, lohi, tiles)
    return bits, jnp.sum(cnt, axis=(0, 2))


def range_scan_device(
    dev: DeviceColumn, lows, highs, tb: int | None = None, interpret: bool = False
) -> tuple[jax.Array, jax.Array]:
    """k range predicates on a DeviceColumn -> ((k, W) bitvectors, counts)."""
    lows = jnp.asarray(lows, jnp.uint32)
    highs = jnp.asarray(highs, jnp.uint32)
    bits, counts = range_scan_tiles(
        dev.tiles, lows, highs, dev.width, dev.n, tb=tb, interpret=interpret
    )
    return bits_to_canonical(bits, dev.n), counts


# ---------------------------------------------------------------------------
# Dynamic-k shared scan: non-unrolled predicate loop for large k
# ---------------------------------------------------------------------------
#
# The static kernel unrolls 32*k vector ops at trace time — ideal for small
# k (the analog of the reference's compile-time template
# shared_scan_128_linear_static<NUM>, simd_scan.hpp:122-236) but code size
# and compile time grow linearly with k.  This variant is the analog of the
# reference's dynamic-k path (shared_scan_128_linear_standard,
# simd_scan_shared_linear.cpp:9-62): values are unpacked ONCE into a VMEM
# scratch, then a lax.fori_loop walks the predicate table with dynamic SMEM
# key reads and dynamic VMEM output indexing — O(1) code size for any k.


def _shared_scan_dynamic_kernel(
    off_ref, keys_ref, in_ref, bits_ref, cnt_ref, scratch, *, width, k, tb, n
):
    i = pl.program_id(0)
    full, rem = n // BLOCK_VALUES, n % BLOCK_VALUES
    row = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tb, LANES), 1)
    g = off_ref[0, 0] + (i * tb + row) * LANES + lane
    valid = jnp.where(
        g < full,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(g == full, jnp.uint32((1 << rem) - 1 if rem else 0), jnp.uint32(0)),
    )

    # unpack once into VMEM scratch (unrolled: 32 static steps)
    for r, v in _unpack_block_values(in_ref, width):
        scratch[r] = v

    def key_body(j, _):
        key = keys_ref[j, 0]

        # r-loop unrolled (static scratch reads, constant shifts) — only
        # the key loop is dynamic; a doubly-dynamic version ran ~2x slower
        word = jnp.zeros((tb, LANES), jnp.uint32)
        for r in range(BLOCK_VALUES):
            word = word | jnp.where(
                scratch[r] == key, jnp.uint32(1 << r), jnp.uint32(0)
            )
        word = word & valid
        bits_ref[j] = word
        cnt_ref[0, j] = jnp.sum(
            jax.lax.population_count(word).astype(jnp.int32), axis=0
        )
        return 0

    jax.lax.fori_loop(0, k, key_body, 0)


@functools.partial(jax.jit, static_argnames=("width", "n", "tb", "interpret"))
def shared_scan_dynamic_tiles(
    tiles: jax.Array,
    keys: jax.Array,
    width: int,
    n: int,
    tb: int | None = None,
    interpret: bool = False,
    block_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Same contract as shared_scan_tiles; key loop not unrolled —
    use for large k where the static kernel's compile time explodes."""
    _, b1, lanes = tiles.shape
    assert lanes == LANES
    k = int(keys.shape[0])
    # scratch (32 rows) + double-buffered input + (k, tb, 128) bits block
    tb_auto = min(64, _vmem_tb_cap(width, k, extra=36))
    tb = _pick_tb(b1, tb if tb is not None else tb_auto)
    grid = (b1 // tb,)
    keys2 = keys.astype(jnp.uint32).reshape(k, 1)
    off = jnp.asarray(block_offset, jnp.int32).reshape(1, 1)
    bits, cnt = pl.pallas_call(
        functools.partial(_shared_scan_dynamic_kernel, width=width, k=k, tb=tb, n=n),
        out_shape=(
            jax.ShapeDtypeStruct((k, b1, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((b1 // tb, k, LANES), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((k, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (width, tb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (k, tb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, k, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((BLOCK_VALUES, tb, LANES), jnp.uint32)],
        interpret=interpret,
    )(off, keys2, tiles)
    return bits, jnp.sum(cnt, axis=(0, 2))

"""Benchmark drivers: data synthesis, chained timing kernels, verification.

TPU-native counterpart of the reference benchmark harness:
  - result printer ``* name: avg ms; [..] ms``  (src/benchmark.cpp:14-36)
  - verifiers run after timing                   (src/benchmark.cpp:38-140)
  - decompression / scan / shared-scan drivers   (src/benchmark.cpp:51-306)
  - raw memory-bandwidth comparator              (src/benchmark_misc.cpp:9-52)

plus what the reference lacks: bytes/s and %-of-HBM-roofline columns
(SURVEY.md §5.5).  All timing uses the chained-loop methodology in
``bench.timing`` (host stopwatches are meaningless on this hardware path).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from shared_simd_scan_tpu import layout
from shared_simd_scan_tpu.bench.timing import Measurement, measure_loop
from shared_simd_scan_tpu.layout import packed_nbytes
from shared_simd_scan_tpu.ops import oracle
from shared_simd_scan_tpu.ops import scan as scan_ops
from shared_simd_scan_tpu.ops import unpack as unpack_ops
from shared_simd_scan_tpu.ops import xla_kernels

# Default workload: 500 MiB packed payload, shared scan at 1/8 of that —
# mirrors the reference defaults (src/benchmark.hpp:4-5, src/main.cpp:98).
DEFAULT_DATA_SIZE = 500 * 1024 * 1024
DEFAULT_REPETITIONS = 5
DEFAULT_WIDTH = 9

# Nominal peak HBM bandwidth per chip by device kind (bytes/s).
_HBM_PEAK = (
    ("v5 lite", 819e9),   # v5e
    ("v5e", 819e9),
    ("v6 lite", 1640e9),  # v6e / Trillium
    ("v6e", 1640e9),
    ("v5p", 2765e9),
    ("v4", 1228e9),
    ("v3", 900e9),
)


def hbm_peak_bytes_per_s() -> float | None:
    kind = jax.devices()[0].device_kind.lower()
    for sub, bw in _HBM_PEAK:
        if sub in kind:
            return bw
    return None


# ---------------------------------------------------------------------------
# Result printer (B1)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class BenchResult:
    name: str
    meas: Measurement
    bytes_moved: int  # total HBM traffic per iteration (read + write)

    @property
    def bytes_per_s(self) -> float:
        return self.bytes_moved / self.meas.seconds


def print_result(res: BenchResult, roofline: float | None = None) -> None:
    """Stable machine-parsable line format, identical shape to the
    reference's (src/benchmark.cpp:14-36) so the sweep scripts parse both."""
    reps = ", ".join(f"{t * 1e3:.6f}" for t in res.meas.per_trial)
    print(f"* {res.name}: {res.meas.millis:.6f} ms; [{reps}] ms")
    gbs = res.bytes_per_s / 1e9
    if roofline:
        pct = 100.0 * res.bytes_per_s / roofline
        print(f"    {gbs:.1f} GB/s ({pct:.1f}% of {roofline / 1e9:.0f} GB/s HBM roofline)")
    else:
        print(f"    {gbs:.1f} GB/s")


# ---------------------------------------------------------------------------
# Data synthesis (reference corpora, src/benchmark.cpp:79-82, 170-174, 274-278)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n", "width"))
def synth_ramp(n: int, width: int) -> jax.Array:
    """Decompression corpus: ``i & ((1<<width)-1)`` (benchmark.cpp:79-82)."""
    return jnp.arange(n, dtype=jnp.uint32) & jnp.uint32((1 << width) - 1)


@functools.partial(jax.jit, static_argnames=("n",))
def synth_mod5(n: int) -> jax.Array:
    """Scan corpus: ``i % 5``, predicate key 3 (benchmark.cpp:150, 174)."""
    return jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(5)


@functools.partial(jax.jit, static_argnames=("n", "k", "width"))
def synth_modk(n: int, k: int, width: int) -> jax.Array:
    """Shared-scan corpus: ``i % k % (1<<width adjusted)``
    (benchmark.cpp:277 uses ``i % k % 512``)."""
    m = min(512, 1 << width)
    return jnp.arange(n, dtype=jnp.uint32) % jnp.uint32(k) % jnp.uint32(m)


def values_for(data_size: int, width: int) -> int:
    """Value count whose packed payload is ~data_size bytes."""
    return max((data_size * 8) // width, layout.BLOCK_VALUES)


def synth_modk_packed_sliced(n, k, width, nslices=8):
    """synth_modk(n, k, width) packed to a DeviceColumn in B1 slices —
    narrow widths at >= 256 MiB packed mean n ~ 2^31 values, and the
    one-shot synth+pack materializes a 8.6 GB uint32 intermediate; the
    sliced form never holds more than one slice's values (the round-3
    narrow-width OOM fix, shared by run_width_sweep and run_op_fit)."""
    from shared_simd_scan_tpu.layout import LANES, padded_blocks
    from shared_simd_scan_tpu.ops import unpack as unpack_ops

    b1 = padded_blocks(n) // LANES
    s1 = -(-b1 // nslices)
    s1 = max(512, -(-s1 // 512) * 512)  # keep slice B1 divisor-friendly
    m = min(512, 1 << width)  # synth_modk's modulus
    # start is a traced operand and only cnt (the output shape) is static,
    # so all full slices share ONE compiled program (a baked-constant
    # closure per slice forced nslices relay compiles)
    @functools.partial(jax.jit, static_argnames=("cnt",))
    def make(start, cnt):
        i = start + jnp.arange(cnt, dtype=jnp.uint32)
        v = jnp.where(
            i < jnp.uint32(n),
            i % jnp.uint32(k) % jnp.uint32(m),
            jnp.uint32(0),
        )
        return unpack_ops.pack_device_kernel(v, width).tiles

    parts = []
    done = 0
    while done < b1:
        rows = min(s1, b1 - done)
        t = make(jnp.uint32(done * LANES * 32), rows * LANES * 32)
        assert t.shape[1] == rows, (t.shape, rows)
        parts.append(t)
        done += rows
    tiles = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    return layout.DeviceColumn(width=width, n=n, tiles=tiles)


# ---------------------------------------------------------------------------
# Chained timing kernels (see bench.timing for why)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k",))
def chain_copy(x, salt, k):
    """Raw bandwidth comparator: k data-dependent full-buffer copies."""
    x = x.at[0].set(salt.astype(x.dtype))  # consume salt: distinct submission
    one = jnp.ones((), x.dtype)
    y = jax.lax.fori_loop(0, k, lambda i, a: a + one, x)
    # sum-consume: scalar for any element rank (the 8-byte granularity
    # row is a (nelem, 2) uint32 array — complex64 is UNIMPLEMENTED on
    # this TPU backend, measured)
    return jnp.sum(y[0] + y[-1]).astype(jnp.uint32)


def _memcpy_kernel(i_ref, o_ref):
    o_ref[...] = i_ref[...]


@functools.partial(jax.jit, static_argnames=("k",))
def chain_memcpy(x, salt, k):
    """Explicit-copy comparator (benchmark_misc.cpp:36-52's memcpy row):
    each iteration is one full-buffer Pallas copy kernel — pure block
    DMA, no ALU op in the body, input_output_aliases so the stream is
    read+write of every byte with no extra buffer.  Without the alias,
    every loop-carried formulation tried (jnp.roll at any shift, fresh-
    output pallas copy, per-iteration salt) measured exactly HALF the
    streaming rate: the un-donated output forces a second full
    materialization per iteration."""
    from jax.experimental import pallas as pl

    n = x.shape[0]
    rows = n // 1024
    tb = 512 if rows % 512 == 0 else 8
    assert rows % tb == 0 and n % 1024 == 0, "memcpy row wants 4 KB-divisible sizes"
    copy = pl.pallas_call(
        _memcpy_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, 1024), x.dtype),
        grid=(rows // tb,),
        in_specs=[pl.BlockSpec((tb, 1024), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tb, 1024), lambda i: (i, 0)),
        input_output_aliases={0: 0},
    )
    xb = x.reshape(rows, 1024).at[0, 0].set(salt.astype(x.dtype))
    y = jax.lax.fori_loop(0, k, lambda i, a: copy(a), xb)
    return (y[0, 0] + y[-1, -1]).astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("k", "width", "tb"))
def chain_unpack(tiles, salt, k, *, width, tb):
    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        vals = unpack_ops.unpack_tiles(t, width, tb=tb)
        return t, acc + vals[0, 0, 0]

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("k", "width", "tb"))
def chain_pack(vals, salt, k, *, width, tb):
    def body(i, carry):
        v, acc = carry
        v = v.at[0, 0, 0].set((salt + jnp.uint32(i)) & jnp.uint32((1 << width) - 1))
        tiles = unpack_ops.pack_tiles(v, width, tb=tb)
        return v, acc + tiles[0, 0, 0]

    _, acc = jax.lax.fori_loop(0, k, body, (vals, jnp.uint32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb"))
def chain_shared_scan(tiles, keys, salt, k, *, width, n, tb):
    def body(i, acc):
        kv = keys + ((salt + jnp.uint32(i)) << 16)  # vary keys, same workload
        _, cnt = scan_ops.shared_scan_tiles(tiles, kv, width, n, tb=tb)
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb", "kk"))
def chain_sequential_shared_scan(tiles, salt, k, *, width, n, tb, kk):
    """The MEASURED sequential shared-scan baseline: kk separate
    single-predicate passes over the column per iteration — the actual
    timed analog of shared_scan_128_sequential (src/simd_scan_shared.cpp:
    9-23, timed at src/benchmark.cpp:288-296), not a k x single-scan
    extrapolation.  Keys vary per iteration via the salt."""
    def body(i, acc):
        def key_body(j, a):
            kv = (((salt + jnp.uint32(i)) << jnp.uint32(8))
                  + j.astype(jnp.uint32)).reshape(1)
            _, cnt = scan_ops.shared_scan_tiles(tiles, kv, width, n, tb=tb)
            return a + cnt[0]

        return jax.lax.fori_loop(0, kk, key_body, acc)

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb"))
def chain_chunked_shared_scan(tiles, keys, salt, k, *, width, n, tb):
    def body(i, acc):
        kv = keys + ((salt + jnp.uint32(i)) << 16)
        _, cnt = scan_ops.shared_scan_chunked_tiles(tiles, kv, width, n, tb=tb)
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb"))
def chain_bitsliced_shared_scan(tiles, keys, salt, k, *, width, n, tb):
    def body(i, acc):
        kv = keys + ((salt + jnp.uint32(i)) << 16)
        _, cnt = scan_ops.shared_scan_bitsliced_tiles(tiles, kv, width, n, tb=tb)
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "widths", "n", "tb"))
def chain_conj_range_scan(tiles, lows, highs, salt, k, *, widths, n, tb):
    """Fused multi-column conjunction chain (ops/conj.py).  The predicate
    bounds shift with the salt (span preserved) so every iteration is a
    distinct relay submission."""
    from shared_simd_scan_tpu.ops import conj as conj_ops

    def body(i, acc):
        d = (salt + jnp.uint32(i)) & jnp.uint32(7)
        _, cnt = conj_ops.conj_range_scan_tiles(
            tiles, lows + d, highs + d, widths, n, tb=tb
        )
        return acc + cnt

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb"))
def chain_dynamic_shared_scan(tiles, keys, salt, k, *, width, n, tb):
    def body(i, acc):
        kv = keys + ((salt + jnp.uint32(i)) << 16)
        _, cnt = scan_ops.shared_scan_dynamic_tiles(tiles, kv, width, n, tb=tb)
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(
    jax.jit, static_argnames=("k", "width", "n", "tb", "keys_tuple")
)
def chain_windowed_shared_scan(tiles, salt, k, *, width, n, tb, keys_tuple):
    """Windowed-kernel chain.  The window/store plan must be static, so the
    keys are a compile-time tuple; distinct submissions come from salting
    the input data instead (data-dependent via the count).  The carry must
    consume EVERY key row's count: at k > 256 the kernel runs as several
    pallas_calls (8-chunk groups) and a carry touching only cnt[0] lets
    XLA dead-code-eliminate every group but the first (measured: a 2-group
    k=512 chain reported 1149 GB/s — above the copy roofline — before
    this sum)."""
    import numpy as np

    keys = np.asarray(keys_tuple, np.uint32)

    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        _, cnt = scan_ops.windowed_scan_tiles(t, keys, width, n, tb=tb)
        return t, acc + jnp.sum(cnt)

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


@functools.partial(
    jax.jit, static_argnames=("k", "width", "n", "tb", "kk", "relayout")
)
def chain_linear_shared_scan(
    tiles, salt, k, *, width, n, tb, kk, relayout="dispatch"
):
    """Linear (interleaved byte) shared-scan chain: the kernel pass plus
    the relayout to ``out[group*k + key]`` uint8 order
    (shared_scan_linear_device — MXU permutation kernel when dispatched).
    ``relayout``: "dispatch" (production path), "stack" (force the
    chunked XLA stack formulation), "mxu" (force the MXU kernel).  The
    full output is consumed (sum) so the relayout cannot be narrowed
    away; pair with chain_linear_baseline_shared_scan (same consume over
    the native (k, W) layout) to isolate the interleave cost."""
    from shared_simd_scan_tpu.layout import DeviceColumn
    from shared_simd_scan_tpu.ops import linear as linear_ops

    keys0 = jnp.arange(kk, dtype=jnp.uint32)

    def body(i, acc):
        kv = keys0 + ((salt + jnp.uint32(i)) << 16)
        dev = DeviceColumn(width=width, n=n, tiles=tiles)
        if relayout == "fused":
            # single-pass fused scan+interleave (traced lo, same salt
            # convention); consume BOTH outputs (multi-output DCE lesson).
            # Gate on the REAL tier predicates: kk in 17..23 or kk % 8
            # != 0 above 16 would otherwise fail an assert deep in the
            # kernel (review finding)
            from shared_simd_scan_tpu.ops.linear import (
                _mxu_large_supported,
                _mxu_supported,
            )

            if _mxu_supported(kk):
                fn = scan_ops.interval_scan_linear_words_tiles
            elif _mxu_large_supported(kk):
                fn = scan_ops.interval_scan_linear_words_large
            else:
                raise ValueError(
                    f"relayout='fused' needs k in 4/8/12/16, k % 8 == 0 in"
                    f" 24..128, or k % 4 == 0 in 20..64, got {kk}"
                )
            out, cnt = fn(
                tiles, (salt + jnp.uint32(i)) << 16, kk, width, n, tb=tb
            )
            return acc + jnp.sum(out) + jnp.sum(cnt)
        if relayout == "words":
            # dispatcher with traced keys — since round 5 this is the
            # FUSED traced-keys tier, not the two-kernel path
            out = scan_ops.shared_scan_linear_words_device(dev, kv, tb=tb)
        elif relayout == "twokernel":
            # the explicit scan -> MXU-relayout comparator (what the
            # traced dispatch used to do before the fused traced tier).
            # Gate on the REAL tier predicates like the 'fused' branch:
            # interleave_mxu_words_large dies on a bare assert otherwise
            from shared_simd_scan_tpu.ops.linear import (
                _mxu_large_supported as _lsup,
                _mxu_supported as _sup,
                interleave_mxu_words,
                interleave_mxu_words_large,
            )

            if not (_sup(kk) or _lsup(kk)):
                raise ValueError(
                    f"relayout='twokernel' needs k in 4/8/12/16, k % 8 =="
                    f" 0 in 24..128, or k % 4 == 0 in 20..64, got {kk}"
                )
            bits, _ = scan_ops.shared_scan_device(dev, kv, tb=tb)
            out = (
                interleave_mxu_words(bits, (n + 7) // 8 * kk // 4)
                if _sup(kk)
                else interleave_mxu_words_large(bits, (n + 7) // 8)
            )
        elif relayout == "dispatch":
            out = scan_ops.shared_scan_linear_device(dev, kv, tb=tb)
        else:
            bits, _ = scan_ops.shared_scan_device(dev, kv, tb=tb)
            fn = (
                linear_ops.interleave_mxu_tiles
                if relayout == "mxu"
                else linear_ops.interleave_xla_stack
            )
            out = fn(bits, (n + 7) // 8)
        # no astype before the sum: the uint8->uint32 convert must stay
        # inside the reduction lowering — materialized it is a 4x-sized
        # buffer that OOM'd the chip at 512 MiB (measured)
        return acc + jnp.sum(out)

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(
    jax.jit, static_argnames=("k", "width", "n", "tb", "keys_tuple")
)
def chain_static_linear_shared_scan(
    tiles, salt, k, *, width, n, tb, keys_tuple
):
    """Fused static-DAG linear export chain (ARBITRARY concrete keys).
    Keys are compile-time (the DAG is built from them), so distinct
    submissions come from salting the input tile (the
    chain_bitsliced_static convention); BOTH outputs are consumed
    (multi-output DCE lesson)."""
    import numpy as np

    from shared_simd_scan_tpu.ops.linear import (
        _mxu_large_supported,
        _mxu_supported,
    )

    keys = np.asarray(keys_tuple, np.uint32)
    kk = int(keys.shape[0])
    if _mxu_supported(kk):
        fn = scan_ops.static_scan_linear_words_tiles
    elif _mxu_large_supported(kk):
        fn = scan_ops.static_scan_linear_words_large
    else:
        raise ValueError(
            f"fused static linear needs k in 4/8/12/16, k % 8 == 0 in"
            f" 24..128, or k % 4 == 0 in 20..64, got {kk}"
        )

    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        out, cnt = fn(t, keys, width, n, tb=tb)
        return t, acc + jnp.sum(out) + jnp.sum(cnt)

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb", "kk"))
def chain_linear_baseline_shared_scan(tiles, salt, k, *, width, n, tb, kk):
    """Comparator for chain_linear_shared_scan: identical kernel pass and
    full-output consume, but over the native (k, W) word layout — the
    delta between the two rows is the interleave relayout."""
    from shared_simd_scan_tpu.layout import DeviceColumn

    keys0 = jnp.arange(kk, dtype=jnp.uint32)

    def body(i, acc):
        kv = keys0 + ((salt + jnp.uint32(i)) << 16)
        dev = DeviceColumn(width=width, n=n, tiles=tiles)
        bits, _ = scan_ops.shared_scan_device(dev, kv, tb=tb)
        return acc + jnp.sum(bits)

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(
    jax.jit, static_argnames=("k", "width", "n", "tb", "keys_tuple")
)
def chain_bitsliced_static_shared_scan(
    tiles, salt, k, *, width, n, tb, keys_tuple
):
    """Static AND-DAG bit-sliced chain.  The DAG is built from the
    compile-time key tuple; distinct submissions come from salting the
    input.  The carry sums EVERY key row's count — at k > 256 the kernel
    runs as several pallas_calls and a cnt[0]-only carry lets XLA DCE all
    but the first group (same lesson as chain_windowed_shared_scan)."""
    import numpy as np

    keys = np.asarray(keys_tuple, np.uint32)

    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        _, cnt = scan_ops.shared_scan_bitsliced_static_tiles(
            t, keys, width, n, tb=tb
        )
        return t, acc + jnp.sum(cnt)

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


@functools.partial(
    jax.jit, static_argnames=("k", "width", "n", "tb", "keys_tuple")
)
def chain_member_scan(tiles, salt, k, *, width, n, tb, keys_tuple):
    """IN-list membership chain.  Concrete keys (static tuple) so the
    interval/window tiers dispatch; distinct submissions come from salting
    the input (data-dependent via the count)."""
    import numpy as np

    from shared_simd_scan_tpu.ops import member as member_ops

    keys = np.asarray(keys_tuple, np.uint32)

    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        _, cnt = member_ops.member_scan_tiles(t, keys, width, n, tb=tb)
        return t, acc + cnt

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("k", "wp", "wm", "n", "tb", "kk"))
def chain_aggregate_scan(ptiles, mtiles, salt, k, *, wp, wm, n, tb, kk):
    """Fused filter+aggregate chain: per-key SUM/COUNT over a measure
    column.  Keys vary per iteration via the salt (k static = kk)."""
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    keys0 = jnp.arange(kk, dtype=jnp.uint32)

    def body(i, acc):
        kv = keys0 + ((salt + jnp.uint32(i)) << 16)  # same workload, new bytes
        counts, slo, shi = agg_ops.aggregate_scan_tiles(
            ptiles, mtiles, kv, wp, wm, n, tb=tb
        )
        return acc + jnp.sum(counts)

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "wp", "wm", "n", "tb", "kk"))
def chain_aggregate_bitplane(ptiles, mtiles, salt, k, *, wp, wm, n, tb, kk):
    """Bit-plane aggregate chain, traced keys (XOR-fold match words)."""
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    keys0 = jnp.arange(kk, dtype=jnp.uint32)

    def body(i, acc):
        kv = keys0 + ((salt + jnp.uint32(i)) << 16)
        counts, slo, shi = agg_ops.aggregate_bitplane_tiles(
            ptiles, mtiles, kv, wp, wm, n, tb=tb
        )
        return acc + jnp.sum(counts) + jnp.sum(slo[0, 0].astype(jnp.uint32))

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(
    jax.jit, static_argnames=("k", "wp", "wm", "n", "tb", "keys_tuple")
)
def chain_aggregate_bitplane_static(
    ptiles, mtiles, salt, k, *, wp, wm, n, tb, keys_tuple
):
    """Static (AND-DAG) bit-plane aggregate chain: keys are compile-time;
    distinct submissions come from salting the predicate input."""
    import numpy as np

    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    keys = np.asarray(keys_tuple, np.uint32)

    def body(i, carry):
        p, acc = carry
        p = p.at[0, 0, 0].set(salt + jnp.uint32(i))
        counts, slo, shi = agg_ops.aggregate_bitplane_static_tiles(
            p, mtiles, keys, wp, wm, n, tb=tb
        )
        return p, acc + jnp.sum(counts) + jnp.sum(slo[0, 0].astype(jnp.uint32))

    _, acc = jax.lax.fori_loop(0, k, body, (ptiles, jnp.uint32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb", "kk"))
def chain_histogram(tiles, salt, k, *, width, n, tb, kk):
    """Counts-only histogram chain (kk keys from lo=0, full domain when
    kk = 2^width).  Input-salted so every submission differs."""
    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        counts = scan_ops.histogram_tiles(t, jnp.uint32(0), kk, width, n, tb=tb)
        return t, acc + jnp.sum(counts)

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


@functools.partial(
    jax.jit, static_argnames=("k", "width", "n", "tb", "kk", "sp")
)
def chain_histogram_dag(tiles, salt, k, *, width, n, tb, kk, sp=None):
    """Shared-AND-DAG histogram chain (the concrete-lo dispatch path);
    sp forces single-pass (True) / chunked (False) for the fit rows."""
    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        counts = scan_ops.histogram_dag_tiles(
            t, 0, kk, width, n, tb=tb, single_pass=sp
        )
        return t, acc + jnp.sum(counts)

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("k", "width", "n", "tb", "kk"))
def chain_interval_scan(tiles, salt, k, *, width, n, tb, kk):
    def body(i, acc):
        lo = (salt + jnp.uint32(i)) & jnp.uint32((1 << width) - 1)
        _, cnt = scan_ops.interval_scan_tiles(tiles, lo, kk, width, n, tb=tb)
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "width", "n"))
def chain_xla_shared_scan(tiles, keys, salt, k, *, width, n):
    # optimization_barrier forces the XLA tier to fully materialize its
    # outputs like the Pallas kernels must — without it XLA dead-code
    # eliminates the unused bitvectors and the comparison is meaningless
    def body(i, acc):
        kv = keys + ((salt + jnp.uint32(i)) << 16)
        bits, cnt = jax.lax.optimization_barrier(
            xla_kernels.shared_scan_tiles_xla(tiles, kv, width, n)
        )
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "width"))
def chain_xla_unpack(tiles, salt, k, *, width):
    def body(i, carry):
        t, acc = carry
        t = t.at[0, 0, 0].set(salt + jnp.uint32(i))
        vals = jax.lax.optimization_barrier(xla_kernels.unpack_tiles_xla(t, width))
        return t, acc + vals[0, 0, 0]

    _, acc = jax.lax.fori_loop(0, k, body, (tiles, jnp.uint32(0)))
    return acc


@functools.partial(jax.jit, static_argnames=("k", "width", "n"))
def chain_oracle_shared_scan(words, keys, salt, k, *, width, n):
    def body(i, acc):
        kv = keys + ((salt + jnp.uint32(i)) << 16)
        _, cnt = oracle.shared_scan_words(words, kv, width, n)
        return acc + cnt[0]

    return jax.lax.fori_loop(0, k, body, jnp.uint32(0))


@functools.partial(jax.jit, static_argnames=("k", "width", "n"))
def chain_oracle_unpack(words, salt, k, *, width, n):
    def body(i, carry):
        w, acc = carry
        w = w.at[0].set(salt + jnp.uint32(i))
        vals = oracle.unpack_words(w, width, n)
        return w, acc + vals[0]

    _, acc = jax.lax.fori_loop(0, k, body, (words, jnp.uint32(0)))
    return acc


# ---------------------------------------------------------------------------
# Verifiers (B2: src/benchmark.cpp:38-140) — run after timing
# ---------------------------------------------------------------------------


def check_decompression(dev: layout.DeviceColumn, expect: jax.Array) -> bool:
    got = unpack_ops.unpack_device(dev)
    ok = bool(jnp.all(got == expect))
    if not ok:
        idx = int(jnp.argmax(got != expect))
        print(f"    VERIFY FAILED: first mismatch at index {idx}")
    return ok


def check_member_scan(
    dev: layout.DeviceColumn, keys: jax.Array, vals: jax.Array
) -> bool:
    """Membership verification: count vs a direct jnp compare, full-size
    bitvector vs the OR of the XLA tier's per-key rows."""
    from shared_simd_scan_tpu.ops import member as member_ops

    bits, count = member_ops.member_scan_tiles(
        dev.tiles, np.asarray(keys, np.uint32), dev.width, dev.n
    )
    match = jnp.zeros(dev.n, bool)
    for j in range(int(keys.shape[0])):
        match = match | (vals == keys[j].astype(jnp.uint32))
    ok = int(count) == int(jnp.sum(match.astype(jnp.uint32)))
    if ok:
        xbits, _ = xla_kernels.shared_scan_device_xla(dev, keys)
        xrow = xbits[0]
        for j in range(1, int(keys.shape[0])):
            xrow = xrow | xbits[j]
        ok = bool(jnp.all(scan_ops.bits_to_canonical(bits, dev.n) == xrow))
    if not ok:
        print("    VERIFY FAILED: member scan mismatch")
    return ok


def check_shared_scan(
    dev: layout.DeviceColumn, keys: jax.Array, vals: jax.Array
) -> bool:
    """Three-way verification, all over the FULL column:
    counts vs a direct jnp compare; every bitvector byte vs the XLA tier
    (independent codegen, bit-exact by unit test); plus bitvector bytes vs
    the gather oracle on a 2M-value prefix (third implementation)."""
    bits, counts = scan_ops.shared_scan_device(dev, keys)
    # key-chunked so the (k, n) compare never materializes more than ~256M
    # elements at once (k=256 over a 64 MiB column would otherwise be 15 GB)
    kchunk = max(1, (1 << 28) // max(dev.n, 1))
    expect_parts = []
    for j0 in range(0, int(keys.shape[0]), kchunk):
        match = vals[None, :] == keys[j0 : j0 + kchunk, None].astype(jnp.uint32)
        expect_parts.append(jnp.sum(match, axis=1, dtype=jnp.uint32))
    expect_counts = jnp.concatenate(expect_parts)
    ok = bool(jnp.all(counts == expect_counts))
    if ok:
        # full-size bitvector cross-check against the XLA-compiled tier,
        # 32 keys at a time (bounds the tier's k unrolled accumulators and
        # reuses one compiled shape across chunks at large k)
        for j0 in range(0, int(keys.shape[0]), 32):
            xbits, xcounts = xla_kernels.shared_scan_device_xla(
                dev, keys[j0 : j0 + 32]
            )
            ok = ok and bool(jnp.all(bits[j0 : j0 + 32] == xbits))
            ok = ok and bool(jnp.all(counts[j0 : j0 + 32] == xcounts))
            if not ok:
                break
    if ok:
        n_chk = min(dev.n, 2_000_000)
        w_chk = layout.bitvector_words(n_chk)
        col_chk = layout.pack(vals[:n_chk], dev.width)
        obits, _ = oracle.shared_scan_words(col_chk.words, keys, dev.width, n_chk)
        gbits = bits[:, : w_chk]
        if n_chk % 32:
            tail = jnp.uint32((1 << (n_chk % 32)) - 1)
            gbits = gbits.at[:, -1].multiply(0).at[:, -1].add(bits[:, w_chk - 1] & tail)
        ok = bool(jnp.all(gbits == obits))
    if not ok:
        print("    VERIFY FAILED: shared scan mismatch vs oracle")
    return ok


# ---------------------------------------------------------------------------
# Benchmark drivers (B3-B6)
# ---------------------------------------------------------------------------


def bench_memory(data_size: int = DEFAULT_DATA_SIZE, reps: int = DEFAULT_REPETITIONS):
    """Raw copy bandwidth at 1/2/4/8-byte granularity plus an explicit
    memcpy row — the reference's five comparator rows
    (benchmark_misc.cpp:9-52).

    On TPU every granularity is the same HBM stream (the 8-byte row is a
    (nelem, 2) uint32 layout — an 8-byte element unit; complex64 is
    UNIMPLEMENTED on this TPU backend, measured); the uint32 row is the
    roofline comparator used by the scan benches, and the memcpy row is
    a pure copy with no ALU work in the loop body.
    """
    from shared_simd_scan_tpu.bench.timing import timer_resolution_ns

    print(f"host timer resolution: ~{timer_resolution_ns():.0f} ns "
          "(device kernels are timed with chained loops, not this clock)")
    roof = hbm_peak_bytes_per_s()
    results = []
    for dtype, label, shape2 in (
        (jnp.uint8, "1 byte", None), (jnp.uint16, "2 bytes", None),
        (jnp.uint32, "4 bytes", None), (jnp.uint32, "8 bytes", 2),
    ):
        nelem = data_size // jnp.dtype(dtype).itemsize
        x = jnp.zeros(
            (nelem,) if shape2 is None else (nelem // shape2, shape2), dtype
        )
        meas = measure_loop(
            chain_copy, (x,), trials=reps, est_iter_s=2 * data_size / 700e9
        )
        res = BenchResult(f"memory copy ({label} at a time)", meas, 2 * data_size)
        print_result(res, roof)
        results.append(res)
    x = jnp.zeros(data_size // 4, jnp.uint32)
    meas = measure_loop(
        chain_memcpy, (x,), trials=reps, est_iter_s=2 * data_size / 700e9
    )
    res = BenchResult("memory copy (memcpy)", meas, 2 * data_size)
    print_result(res, roof)
    results.append(res)
    return results


def _bench_variants(variants, roof, verify, reps=DEFAULT_REPETITIONS):
    results = []
    for name, chain, args, static, traffic, *extra in variants:
        tkw = extra[0] if extra else {}
        # Size the timed span from known traffic at a plausible bandwidth —
        # avoids a pilot probe (each extra loop count is a multi-minute
        # remote compile).
        tkw.setdefault("est_iter_s", traffic / 400e9)
        meas = measure_loop(
            functools.partial(chain, **static), args, trials=max(2, reps), **tkw
        )
        res = BenchResult(name, meas, traffic)
        print_result(res, roof)
        results.append(res)
    if verify is not None:
        print("    verification:", "ok" if verify() else "FAILED")
    return results


# The jnp oracle path gathers per-value (words[i*width//32]) — orders of
# magnitude slower than the Pallas kernel, like the reference's scalar
# ``*_unvectorized`` baselines. It is benchmarked on a capped slice so the
# suite stays fast.
ORACLE_CAP = 8 * 1024 * 1024


def bench_decompression(
    data_size: int = DEFAULT_DATA_SIZE,
    reps: int = DEFAULT_REPETITIONS,
    width: int = DEFAULT_WIDTH,
):
    """Unpack kernel variants (B3: src/benchmark.cpp:51-108).

    The reference's 9 SSE/AVX variants collapse to the single Pallas kernel
    at different grid tile sizes, plus the XLA-compiled oracle (the analog
    of its scalar ``decompress_unvectorized``).
    """
    n = values_for(data_size, width)
    vals = synth_ramp(n, width)
    dev = unpack_ops.pack_device_kernel(vals, width)
    roof = hbm_peak_bytes_per_s()
    traffic = packed_nbytes(width, n) + 4 * n
    variants = [
        (
            f"pallas unpack tb={tb}",
            chain_unpack,
            (dev.tiles,),
            dict(width=width, tb=tb),
            traffic,
        )
        for tb in (64, 128)
    ]
    variants.append(
        ("xla fused unpack", chain_xla_unpack, (dev.tiles,), dict(width=width), traffic)
    )
    n_o = values_for(min(data_size, ORACLE_CAP), width)
    col_o = layout.pack(synth_ramp(n_o, width), width)
    variants.append(
        (
            f"xla oracle unpack ({n_o} values)",
            chain_oracle_unpack,
            (col_o.words,),
            dict(width=width, n=n_o),
            packed_nbytes(width, n_o) + 4 * n_o,
            dict(k_lo=1, k_hi=3),
        )
    )
    return _bench_variants(
        variants, roof, verify=lambda: check_decompression(dev, vals), reps=reps
    )


def bench_scan(
    data_size: int = DEFAULT_DATA_SIZE,
    reps: int = DEFAULT_REPETITIONS,
    width: int = DEFAULT_WIDTH,
):
    """Single-predicate scan (B4: src/benchmark.cpp:142-194): corpus i%5,
    key 3."""
    n = values_for(data_size, width)
    vals = synth_mod5(n)
    dev = unpack_ops.pack_device_kernel(vals, width)
    keys = jnp.array([3], jnp.uint32)
    roof = hbm_peak_bytes_per_s()
    traffic = packed_nbytes(width, n) + layout.bitvector_words(n) * 4
    variants = [
        (
            f"pallas scan tb={tb}",
            chain_shared_scan,
            (dev.tiles, keys),
            dict(width=width, n=n, tb=tb),
            traffic,
        )
        for tb in (256, 512)
    ]
    n_o = values_for(min(data_size, ORACLE_CAP), width)
    col_o = layout.pack(synth_mod5(n_o), width)
    variants.append(
        (
            f"xla oracle scan ({n_o} values)",
            chain_oracle_shared_scan,
            (col_o.words, keys),
            dict(width=width, n=n_o),
            packed_nbytes(width, n_o) + layout.bitvector_words(n_o) * 4,
            dict(k_lo=1, k_hi=3),
        )
    )
    return _bench_variants(
        variants, roof, verify=lambda: check_shared_scan(dev, keys, vals), reps=reps
    )


def bench_shared_scan(
    data_size: int = DEFAULT_DATA_SIZE // 8,
    reps: int = DEFAULT_REPETITIONS,
    k: int = 8,
    width: int = DEFAULT_WIDTH,
):
    """Shared scan, k predicates in one pass (B5: src/benchmark.cpp:196-306):
    corpus i%k%512, predicates 0..k-1."""
    n = values_for(data_size, width)
    vals = synth_modk(n, k, width)
    dev = unpack_ops.pack_device_kernel(vals, width)
    keys = jnp.arange(k, dtype=jnp.uint32)
    roof = hbm_peak_bytes_per_s()
    traffic = packed_nbytes(width, n) + k * layout.bitvector_words(n) * 4
    # static unrolled kernel up to k=32; 32-key-chunked static kernel
    # above (the dynamic non-unrolled kernel is benched as a labeled
    # fallback, not a dispatch path) — mirrors the library dispatch
    if k <= 32:
        variants = [
            (
                f"pallas shared scan k={k} tb={tb}",
                chain_shared_scan,
                (dev.tiles, keys),
                dict(width=width, n=n, tb=tb),
                traffic,
            )
            for tb in (128, 256)
        ]
    else:
        variants = [
            (
                f"pallas chunked shared scan k={k}",
                chain_chunked_shared_scan,
                (dev.tiles, keys),
                dict(width=width, n=n, tb=None),
                traffic,
            ),
            (
                f"pallas dynamic shared scan k={k} (traced-keys fallback)",
                chain_dynamic_shared_scan,
                (dev.tiles, keys),
                dict(width=width, n=n, tb=None),
                traffic,
            ),
        ]
    variants.append(
        (
            f"pallas bit-sliced shared scan k={k} (spread/traced-keys tier)",
            chain_bitsliced_shared_scan,
            (dev.tiles, keys),
            dict(width=width, n=n, tb=None),
            traffic,
        )
    )
    if k <= 1024:
        variants.append(
            (
                f"pallas interval scan k={k} (keys lo..lo+k-1)",
                chain_interval_scan,
                (dev.tiles,),
                dict(width=width, n=n, tb=None, kk=k),
                traffic,
            )
        )
    # measured sequential baseline (B5's shared_scan_128_sequential,
    # src/benchmark.cpp:288-296): k actual single-predicate passes
    seq_traffic = k * (packed_nbytes(width, n) + layout.bitvector_words(n) * 4)
    variants.append(
        (
            f"sequential shared scan k={k} ({k} single passes)",
            chain_sequential_shared_scan,
            (dev.tiles,),
            dict(width=width, n=n, tb=None, kk=k),
            seq_traffic,
            dict(est_iter_s=seq_traffic / 650e9),
        )
    )
    # IN-list membership (capability extension): same key set, ONE fused
    # bitvector — write traffic drops from k rows to 1
    member_traffic = packed_nbytes(width, n) + layout.bitvector_words(n) * 4
    variants.append(
        (
            f"pallas IN-list member scan k={k} (one bitvector)",
            chain_member_scan,
            (dev.tiles,),
            dict(width=width, n=n, tb=None, keys_tuple=tuple(range(k))),
            member_traffic,
        )
    )
    variants.append(
        (
            f"xla fused shared scan k={k}",
            chain_xla_shared_scan,
            (dev.tiles, keys),
            dict(width=width, n=n),
            traffic,
        )
    )
    n_o = values_for(min(data_size, ORACLE_CAP), width)
    col_o = layout.pack(synth_modk(n_o, k, width), width)
    variants.append(
        (
            f"xla oracle shared scan k={k} ({n_o} values)",
            chain_oracle_shared_scan,
            (col_o.words, keys),
            dict(width=width, n=n_o),
            packed_nbytes(width, n_o) + k * layout.bitvector_words(n_o) * 4,
            dict(k_lo=1, k_hi=3),
        )
    )
    return _bench_variants(
        variants,
        roof,
        verify=lambda: (
            check_shared_scan(dev, keys, vals) and check_member_scan(dev, keys, vals)
        ),
        reps=reps,
    )


def check_linear_scan(dev: layout.DeviceColumn, k: int) -> bool:
    """Byte parity of the linear (interleaved) output vs numpy packbits
    on an 8K-value prefix.  The call + prefix slice run under ONE jit:
    eager slicing would compile the slice standalone and a full-output
    host fetch exhausts the relay transfer path (both measured at
    512 MiB)."""
    keys = np.arange(k, dtype=np.uint32)
    nv = min(dev.n, 8 * 1024)
    # decode ONLY the prefix's block rows (a full-column unpack would
    # materialize 4n bytes to verify 8 KB)
    pre = layout.DeviceColumn(
        width=dev.width, n=nv, tiles=dev.tiles[:, :8, :]
    )
    vhost = np.asarray(jax.device_get(unpack_ops.unpack_device(pre)[:nv]))
    exp = np.zeros(((nv + 7) // 8) * k, np.uint8)
    for j, key in enumerate(keys):
        m = np.packbits(vhost == key, bitorder="little")
        exp[j::k] = m
    n = dev.n
    width = dev.width
    prefix = jax.jit(
        lambda t: scan_ops.shared_scan_linear_device(
            layout.DeviceColumn(width=width, n=n, tiles=t), keys
        )[: exp.size]
    )(dev.tiles)
    return bool((np.asarray(jax.device_get(prefix)) == exp).all())


def bench_linear(
    data_size: int = DEFAULT_DATA_SIZE // 8,
    reps: int = DEFAULT_REPETITIONS,
    k: int = 8,
    width: int = DEFAULT_WIDTH,
):
    """Linear (interleaved byte) shared-scan driver (C10 parity surface,
    simd_scan_shared_linear.cpp:9-82): the fused single-pass
    scan+MXU-interleave kernel (int8 permutation dots — DESIGN §3), the
    two-kernel u8-view path, and a comparator running the same kernel
    pass + full-output consume over the native (k, W) layout — the
    delta to the comparator is the true export cost."""
    n = values_for(data_size, width)
    vals = synth_modk(n, k, width)
    dev = unpack_ops.pack_device_kernel(vals, width)
    roof = hbm_peak_bytes_per_s()
    traffic = packed_nbytes(width, n) + k * layout.bitvector_words(n) * 4
    from shared_simd_scan_tpu.ops.linear import _mxu_supported

    fused_rows = [
        (
            f"pallas fused linear shared scan k={k} (s8 MXU interleave)",
            chain_linear_shared_scan,
            (dev.tiles,),
            dict(width=width, n=n, tb=None, kk=k, relayout="fused"),
            traffic,
            dict(est_iter_s=traffic / 150e9),
        ),
    ] if _mxu_supported(k) else []
    variants = fused_rows + [
        (
            f"pallas linear shared scan k={k} (traced-keys dispatch, u8 view)",
            chain_linear_shared_scan,
            (dev.tiles,),
            dict(width=width, n=n, tb=None, kk=k),
            traffic,
            dict(est_iter_s=traffic / 6e9),
        ),
        (
            f"native (k, W) comparator k={k} (same kernel + consume)",
            chain_linear_baseline_shared_scan,
            (dev.tiles,),
            dict(width=width, n=n, tb=None, kk=k),
            traffic,
            dict(est_iter_s=traffic / 300e9),
        ),
    ]
    return _bench_variants(
        variants, roof, verify=lambda: check_linear_scan(dev, k), reps=reps
    )


def bench_aggregate(
    data_size: int = DEFAULT_DATA_SIZE // 8,
    reps: int = DEFAULT_REPETITIONS,
    k: int = 8,
    width: int = DEFAULT_WIDTH,
    measure_width: int = 16,
):
    """Fused filter+aggregate driver (capability extension): per-key
    SUM/COUNT over a measure column, one pass over two packed columns.

    The synthesized value arrays are dropped after packing — two live
    512 MiB columns plus their uint32 expansions exhaust device memory
    through the relay."""
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    n = values_for(data_size, width)
    pvals = synth_modk(n, k, width)
    pdev = unpack_ops.pack_device_kernel(pvals, width)
    pv = np.asarray(pvals)
    del pvals
    mvals = (
        jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435761)
    ) & jnp.uint32((1 << measure_width) - 1)
    mdev = unpack_ops.pack_device_kernel(mvals, measure_width)
    mv = np.asarray(mvals).astype(np.uint64)
    del mvals

    roof = hbm_peak_bytes_per_s()
    traffic = packed_nbytes(width, n) + packed_nbytes(measure_width, n)
    res = _bench_variants(
        [(
            f"pallas aggregate scan k={k} (SUM+COUNT, wm={measure_width})",
            chain_aggregate_scan,
            (pdev.tiles, mdev.tiles),
            dict(wp=width, wm=measure_width, n=n, tb=None, kk=k),
            traffic,
        )],
        roof,
        verify=None,
        reps=reps,
    )
    keys = np.arange(k, dtype=np.uint32)
    sums, counts = agg_ops.aggregate_scan_device(pdev, mdev, keys)
    counts = np.asarray(counts)
    ok = all(int(counts[j]) == int((pv == j).sum()) for j in range(k))
    ok = ok and all(
        int(sums[j]) == int(mv[pv == j].sum()) for j in range(min(k, 4))
    )
    print("    verification:", "ok" if ok else "FAILED")
    return res


def bench_histogram(
    data_size: int = DEFAULT_DATA_SIZE // 8,
    reps: int = DEFAULT_REPETITIONS,
    k: int | None = None,
    width: int = DEFAULT_WIDTH,
):
    """Counts-only value histogram (capability extension): the interval
    kernel's mask+transpose with in-register popcount, no bitvector output.
    Default k = full domain (2^width, capped at 4096).

    Traffic counts the packed reads plus the per-step count partials —
    at large k the partials are the dominant write stream, so excluding
    them would overstate the roofline fraction."""
    n = values_for(data_size, width)
    vals = synth_ramp(n, width)  # uniform coverage of the whole domain
    dev = unpack_ops.pack_device_kernel(vals, width)
    if k is None:
        k = min(1 << width, 4096)
    roof = hbm_peak_bytes_per_s()
    b1 = dev.tiles.shape[1]
    traffic = packed_nbytes(width, n) + scan_ops.histogram_partials_nbytes(
        b1, width, k
    )
    dag_traffic = (
        packed_nbytes(width, n) * len(scan_ops._static_group_sizes(k))
        + scan_ops.histogram_dag_partials_nbytes(b1, width, k)
    )
    res = _bench_variants(
        [(
            f"pallas histogram k={k} (shared AND-DAG, dispatch path)",
            chain_histogram_dag,
            (dev.tiles,),
            dict(width=width, n=n, tb=None, kk=k),
            dag_traffic,
        ), (
            f"pallas histogram k={k} (mask-window kernel, traced-lo tier)",
            chain_histogram,
            (dev.tiles,),
            dict(width=width, n=n, tb=None, kk=k),
            traffic,
        )],
        roof,
        verify=None,
        reps=reps,
    )
    counts = np.asarray(scan_ops.histogram_device(dev, k=k))
    expect = np.bincount(
        np.asarray(vals) % (1 << width), minlength=1 << width
    )[:k].astype(np.uint32)
    ok = bool((counts == expect).all())
    print("    verification:", "ok" if ok else "FAILED")
    return res


def bench_member(
    data_size: int = DEFAULT_DATA_SIZE // 8,
    reps: int = DEFAULT_REPETITIONS,
    k: int = 8,
    width: int = DEFAULT_WIDTH,
):
    """IN-list membership (capability extension): one fused bitvector per
    key set, three key shapes exercising the dispatch tiers — consecutive
    (range tier), clusters-of-8 (window popmask), spread (compare or
    bit-sliced past the cost crossover)."""
    n = values_for(data_size, width)
    vals = synth_modk(n, k, width)
    dev = unpack_ops.pack_device_kernel(vals, width)
    roof = hbm_peak_bytes_per_s()
    traffic = packed_nbytes(width, n) + layout.bitvector_words(n) * 4
    dom = 1 << width
    shapes = [("consecutive", tuple(i % dom for i in range(k)))]
    if k >= 4:
        # at least 2 clusters so the shape is NOT a consecutive run (a
        # single cluster would duplicate the interval row and the window
        # tier would never be measured)
        csize = max(2, min(8, k // 2))
        nclust = (k + csize - 1) // csize
        stride = max(32, dom // nclust)
        clustered = tuple(
            (c * stride + j) % dom
            for c in range(nclust)
            for j in range(csize)
        )[:k]
        shapes.append(("clustered", clustered))
    shapes.append(("spread", tuple(int(x) for x in (np.arange(k) * 61 + 3) % dom)))
    variants = [
        (
            f"pallas member scan k={k} ({name} keys)",
            chain_member_scan,
            (dev.tiles,),
            dict(width=width, n=n, tb=None, keys_tuple=keys),
            traffic,
        )
        for name, keys in shapes
    ]
    return _bench_variants(
        variants,
        roof,
        verify=lambda: all(
            check_member_scan(dev, jnp.asarray(np.asarray(keys, np.uint32)), vals)
            for _, keys in shapes
        ),
        reps=reps,
    )


def bench_conj(
    data_size: int = DEFAULT_DATA_SIZE // 8,
    reps: int = DEFAULT_REPETITIONS,
    m: int = 2,
    width: int = DEFAULT_WIDTH,
):
    """Multi-column conjunctive scan (capability extension): AND of m
    per-column range predicates in one fused pass.  ``data_size`` is the
    per-column packed payload; traffic counts all m columns + one
    bitvector.  Verified against an independent XLA evaluation of the
    same WHERE clause."""
    from shared_simd_scan_tpu.ops import conj as conj_ops

    n = values_for(data_size, width)
    devs = [
        unpack_ops.pack_device_kernel(synth_modk(n, 8 + 3 * c, width), width)
        for c in range(m)
    ]
    dom = 1 << width
    lows = jnp.asarray([dom // 8] * m, jnp.uint32)
    highs = jnp.asarray([dom - dom // 8] * m, jnp.uint32)
    roof = hbm_peak_bytes_per_s()
    traffic = m * packed_nbytes(width, n) + layout.bitvector_words(n) * 4
    tiles = tuple(d.tiles for d in devs)
    widths = tuple(d.width for d in devs)

    def verify() -> bool:
        bits, count = conj_ops.conj_range_scan_tiles(
            tiles, lows, highs, widths, n
        )
        match = jnp.ones(n, bool)
        for c in range(m):
            v = unpack_ops.values_to_flat(
                unpack_ops.unpack_tiles(devs[c].tiles, width), n
            )
            match = match & ((v >= lows[c]) & (v < highs[c]))
        ok = int(count) == int(jnp.sum(match.astype(jnp.uint32)))
        if ok:
            from shared_simd_scan_tpu import bitvector

            ok = bool(
                jnp.all(
                    scan_ops.bits_to_canonical(bits, n)
                    == bitvector.from_bool(match)
                )
            )
        if not ok:
            print("    VERIFY FAILED: conjunction mismatch")
        return ok

    variants = [
        (
            f"pallas conj range scan m={m}",
            chain_conj_range_scan,
            (tiles, lows, highs),
            dict(widths=widths, n=n, tb=None),
            traffic,
        )
    ]
    return _bench_variants(variants, roof, verify=verify, reps=reps)


def bench_pack(
    data_size: int = DEFAULT_DATA_SIZE,
    reps: int = DEFAULT_REPETITIONS,
    width: int = DEFAULT_WIDTH,
):
    """Device-side compression round-trip half (C2 analog)."""
    n = values_for(data_size, width)
    vals_flat = synth_ramp(n, width)
    dev = unpack_ops.pack_device_kernel(vals_flat, width)
    vals = unpack_ops.unpack_tiles(dev.tiles, width)  # device value layout
    roof = hbm_peak_bytes_per_s()
    traffic = 4 * n + packed_nbytes(width, n)
    variants = [
        (
            f"pallas pack tb={tb}",
            chain_pack,
            (vals,),
            dict(width=width, tb=tb),
            traffic,
        )
        for tb in (64, 128)
    ]
    return _bench_variants(variants, roof, verify=None, reps=reps)

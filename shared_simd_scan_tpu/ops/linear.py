"""Linear (interleaved) output relayout formulations.

The linear layout stores, for every 8-value group g, the k match bytes
contiguously: out byte ``g*k + j`` = byte g of key j's bitvector (parity
with the reference's shared_scan_128_linear_standard,
simd_scan_shared_linear.cpp:9-82).  On TPU the native kernel output is
(k, W) uint32 words, and the interleave is a word-level perfect shuffle
(out word m = t*k + c picks stream c = s*(k/4)+h word t) whose
16-lane -> stride-k lane spread is NOT expressible in Mosaic vector ops
(three hard-crash modes documented, see scan.shared_scan_linear_device).

This module holds the formulations that ARE expressible, measured
side-by-side in bench_results/linear_v5e_512m.csv:

1. :func:`interleave_mxu_words` (+ its uint8 view
   :func:`interleave_mxu_tiles`) — a Pallas kernel that does the byte
   mixing with SWAPMOVE quads (VPU) and the word permutation on the
   **MXU**: out tile (tw, 128k) = dot(byte-plane concat, P) where
   P[c*128+e, e*k+c] = 1 is a 0/1 permutation matrix passed as a
   constant-index operand.  Byte planes are <= 255 so bf16 products are
   exact and every f32 output element receives exactly one nonzero
   product — bit-exact by construction.  All intermediates stay in
   VMEM: HBM traffic is the read + write floor.  This is a
   *fundamentally different* MXU shape from the rejected
   quadratic-equality matmul (contraction dim 128k, not a tiny
   loop-carried dim).
2. :func:`interleave_xla_mxu` — the same algorithm with XLA emitting
   the matmul (diagnostic twin; measured equivalent, kept for the
   bisection story).
3. :func:`interleave_xla_stack` — the pure-XLA relayout
   (scan._interleave_linear): SWAPMOVE quads + minor-axis stack, chunked
   to bound the padded intermediates.  The k-minor stack pads 16x on
   the lane axis; kept as the general-k fallback.
4. Host AVX2 ``sss_interleave`` (csrc/sss_host.cpp) for callers that
   want the bytes on the host anyway — see host.interleave_bytes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from shared_simd_scan_tpu.layout import LANES


def _mxu_supported(k: int) -> bool:
    """MXU relayout needs byte quads (k % 4 == 0) and a VMEM-sane output
    tile (tw, 128k); FLOPs grow as k^2 so past k=16 the XLA stack path
    wins on compute anyway."""
    return k % 4 == 0 and 4 <= k <= 16


def _plane_dot_interleave(zs, perm, dot: str):
    """THE plane-dot loop shared by every MXU interleave body: split the
    uint32 vectors ``zs`` into exact planes, dot each against the 0/1
    permutation, recombine.  Formats: "bf16" four u8 planes (exact
    <= 255), "s8" four biased s8 planes through int8 dots (every output
    column of P has exactly one 1, so d = v_perm - 128 exactly and the
    bias adds straight back in int32; 2x the bf16 MXU rate on v5e),
    "f32" two u16 planes — at Precision.HIGHEST, because the default
    MXU f32 path truncates operands through bf16 passes and 16-bit
    plane values would corrupt (the round-2 'f32 HIGHEST' lesson)."""
    nplanes, pbits, mask = (2, 16, 0xFFFF) if dot == "f32" else (4, 8, 0xFF)
    acc = None
    for p in range(nplanes):
        if dot == "s8":
            planes = [
                (
                    ((z >> jnp.uint32(pbits * p)) & jnp.uint32(mask))
                    .astype(jnp.int32)
                    - 128
                ).astype(jnp.int8)
                for z in zs
            ]
        else:
            planes = [
                ((z >> jnp.uint32(pbits * p)) & jnp.uint32(mask))
                .astype(jnp.int32)
                .astype(perm.dtype)
                for z in zs
            ]
        z2 = jnp.concatenate(planes, axis=1)  # (tw, 128m), 128-aligned
        d = jax.lax.dot_general(
            z2, perm, (((1,), (0,)), ((), ())),
            preferred_element_type=(
                jnp.int32 if dot == "s8" else jnp.float32
            ),
            precision=(
                jax.lax.Precision.HIGHEST if dot == "f32" else None
            ),
        )
        if dot == "s8":
            part = (d + 128).astype(jnp.uint32) << jnp.uint32(pbits * p)
        else:
            # f32 -> i32 -> u32 (no f32<->u32 casts in Mosaic), then
            # shift into plane position p
            part = d.astype(jnp.int32).astype(jnp.uint32) << jnp.uint32(
                pbits * p
            )
        acc = part if acc is None else acc | part
    return acc


def _mxu_interleave_rows(rows, perm, k: int, dot: str):
    """Shared MXU interleave body: k per-key (tw, 128) uint32 word tiles
    -> (tw, 128k) uint32 linear words via byte-quad SWAPMOVE mixing +
    one 0/1-permutation dot per plane.  Used by the standalone relayout
    kernel below AND the fused interval-scan+linear kernel
    (ops/scan.py), which builds ``rows`` in-register and skips the
    (k, W) bits round-trip through HBM entirely."""
    from shared_simd_scan_tpu.ops.scan import _byte_transpose_quad

    zs: list = [None] * k
    for h in range(k // 4):
        q = _byte_transpose_quad(
            rows[4 * h], rows[4 * h + 1], rows[4 * h + 2], rows[4 * h + 3]
        )
        for s in range(4):
            zs[s * (k // 4) + h] = q[s]
    return _plane_dot_interleave(zs, perm, dot)


def _perm_matrix(k: int, dot: str) -> jax.Array:
    """The (128k, 128k) 0/1 permutation P[c*128+e, e*k+c] = 1 in the
    dot format's operand dtype — built in XLA, passed as a constant-
    index operand (building it in-kernel from iota was measured 15x the
    dot cost)."""
    e = jnp.arange(LANES, dtype=jnp.int32)
    c = jnp.arange(k, dtype=jnp.int32)
    f = jnp.arange(LANES * k, dtype=jnp.int32)
    pdt = {"bf16": jnp.bfloat16, "f32": jnp.float32, "s8": jnp.int8}[dot]
    return (
        f[None, None, :] == (e[None, :, None] * k + c[:, None, None])
    ).astype(pdt).reshape(LANES * k, LANES * k)


def _word_perm_matrix(m: int, g: int, dot: str) -> jax.Array:
    """0/1 permutation for interleaving m word streams at g-word
    granularity: out word w' = q*(m*g) + s*g + r takes stream s word
    q*g + r.  P[s*128+e, f] = 1 iff s == (f % (m*g)) // g and
    e == (f // (m*g))*g + (f % (m*g)) % g.  Requires g | 128 (the
    (tw, 128m) output tile is then self-contained in the (m, tw, 128)
    input tile).  g=1, m=k reduces to the byte-mix case's word map."""
    assert 128 % g == 0
    s = jnp.arange(m, dtype=jnp.int32)
    e = jnp.arange(LANES, dtype=jnp.int32)
    f = jnp.arange(LANES * m, dtype=jnp.int32)
    fs = (f % (m * g)) // g
    fe = (f // (m * g)) * g + (f % (m * g)) % g
    pdt = {"bf16": jnp.bfloat16, "f32": jnp.float32, "s8": jnp.int8}[dot]
    return (
        (fs[None, None, :] == s[:, None, None])
        & (fe[None, None, :] == e[None, :, None])
    ).astype(pdt).reshape(LANES * m, LANES * m)


def _interleave_streams_kernel(perm_ref, in_ref, out_ref, *, m, dot):
    """One grid step: (m, tw, 128) u32 word streams -> (tw, 128m)
    interleaved words via the plane dots alone (no byte quads — the
    streams are already byte-correct; only their WORDS interleave)."""
    rows = [in_ref[j] for j in range(m)]
    out_ref[...] = _plane_dot_interleave(rows, perm_ref[...], dot)


@functools.partial(
    jax.jit, static_argnames=("g", "nwords", "tw", "interpret", "dot")
)
def interleave_streams_mxu_words(
    streams: jax.Array, g: int, nwords: int, tw: int | None = None,
    interpret: bool = False, dot: str = "s8",
) -> jax.Array:
    """(m, M) uint32 word streams -> uint32[nwords]: out word
    q*(m*g) + s*g + r = stream s word q*g + r (g-word granularity
    round-robin).  The level-2 pass of the HIERARCHICAL large-k linear
    interleave: k keys split into groups of 8, each group interleaved by
    the byte-level kernel (its output holds bytes b*8+c), then the group
    streams interleave at g=2 words (8 bytes per group per 8-value
    block).  MACs per output word are 128m vs the direct formulation's
    128k — 2.7x (k=32) / 4x (k=64) fewer total, and the per-dot perm
    stays VMEM-resident ((128m)^2 <= 1 MB s8 at m=8 where direct k=64
    would need 16 MB)."""
    m, M = streams.shape
    assert 128 % g == 0
    # VMEM: resident perm (128m)^2 + double-buffered (m, tw, 128) in and
    # (tw, 128m) out + z2/d/acc transients (~3.2 KB x m per sublane row)
    # — shrink the tile as m grows (m=16's set at tw=256 would exceed
    # the 16 MB scoped limit; review finding)
    tw = tw or (256 if m <= 8 else 128)
    m128 = -(-M // 128)
    rows = -(-m128 // tw) * tw
    pad = rows * 128 - M
    if pad:
        streams = jnp.concatenate(
            [streams, jnp.zeros((m, pad), jnp.uint32)], axis=1
        )
    inb = streams.reshape(m, rows, 128)
    perm = _word_perm_matrix(m, g, dot)
    out = pl.pallas_call(
        functools.partial(_interleave_streams_kernel, m=m, dot=dot),
        out_shape=jax.ShapeDtypeStruct((rows, 128 * m), jnp.uint32),
        grid=(rows // tw,),
        in_specs=[
            pl.BlockSpec(
                (LANES * m, LANES * m), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (m, tw, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tw, 128 * m), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(perm, inb)
    return out.reshape(-1)[:nwords]


def _hier_group(k: int) -> int:
    """Level-1 key-group size of the hierarchical interleave: 8 (g=2
    word streams) when k % 8 == 0, else 4 (g=1) for the k = 4m (m odd)
    column the groups-of-8 form cannot cover (k = 20, 28, ... used to
    fall through to the ~5-6 GB/s stack path — review finding)."""
    return 8 if k % 8 == 0 else 4


def _mxu_large_supported(k: int) -> bool:
    """Hierarchical interleave: key groups of 8 (byte-level kernel) +
    one g=2-word stream interleave — m = k/8 streams; the stream perm is
    (128m)^2 <= 4 MB s8 at k=128 where the DIRECT formulation's would
    be 256 MB.  k % 4 == 0 (but not % 8) rides groups of 4 at g=1,
    capped at k <= 64 so m = k/4 <= 16 keeps the stream perm <= 4 MB."""
    if k % 8 == 0:
        return 24 <= k <= 128
    return k % 4 == 0 and 20 <= k <= 64


@functools.partial(
    jax.jit, static_argnames=("nbytes", "interpret", "dot")
)
def interleave_mxu_words_large(
    bits: jax.Array, nbytes: int, interpret: bool = False, dot: str = "s8"
) -> jax.Array:
    """(k, W) bitvectors -> uint32[nbytes*k/4] linear words for large k
    via the two-level hierarchy (see interleave_streams_mxu_words):
    128k MACs/word direct becomes 1024 + 128m — 2.7x (k=32) to 6.4x
    (k=128) fewer, and every perm stays small.  Measured floors in
    bench_results/linear_v5e_512m.csv."""
    k, w = bits.shape
    assert _mxu_large_supported(k)
    gs = _hier_group(k)
    m = k // gs
    # keep the level-1 outputs PADDED (rows1*128*gs words each): slicing
    # them to nbytes*gs/4 and re-padding inside the stream kernel cost
    # two extra full-size HBM copies (measured in the op-fit gap);
    # padded words are zero and the final slice drops them
    groups = [
        _interleave_mxu_call(
            bits[gs * G : gs * G + gs], None, dot, interpret
        ).reshape(-1)
        for G in range(m)
    ]
    streams = jnp.stack(groups)
    # rows1 is a multiple of 128, so the stream length rows1*128*gs is
    # tile-aligned at either default tw and the level-2 call pads
    # nothing; the tw default must stay with the stream kernel (it
    # shrinks past m=8 for scoped VMEM — review finding x2)
    return interleave_streams_mxu_words(
        streams, gs // 4, nbytes * k // 4, interpret=interpret, dot=dot
    )


def _interleave_mxu_kernel(
    perm_ref, in_ref, out_ref, *, k: int, tw: int, dot: str = "bf16"
):
    """One grid step: (k, tw, 128) bits words -> (tw, 128k) interleaved
    words (out word f of row R = stream f%k, t = R*128 + f//k).

    ``perm_ref`` is the (128k, 128k) 0/1 bf16 permutation matrix
    P[c*128+e, e*k+c] = 1, built ONCE outside the kernel and fetched
    once (constant block index -> no per-step DMA).  Building it
    in-kernel from iota was measured 15x slower than the dots it feeds
    (~16k VPU vreg-ops per grid step vs ~1k MXU cycles)."""
    # byte mixing: stream c = s*(k/4) + h word t carries bytes
    # (group 4t+s, keys 4h..4h+3) — same quad order as the XLA path
    rows = [in_ref[j] for j in range(k)]
    out_ref[...] = _mxu_interleave_rows(rows, perm_ref[...], k, dot)


@functools.partial(
    jax.jit, static_argnames=("nwords", "tw", "interpret", "dot")
)
def interleave_mxu_words(
    bits: jax.Array, nwords: int, tw: int | None = None,
    interpret: bool = False, dot: str = "s8",
) -> jax.Array:
    """(k, W) uint32 bitvectors -> uint32[nwords] of the linear layout.

    The linear BYTE stream viewed 4 bytes at a time (little-endian) —
    byte-identical HBM contents to the uint8 contract, and the form every
    large consumer should use: materializing the uint8 VIEW on device
    costs ~100 ms at 512 MiB because the (rows, 1024, 4) u8 bitcast
    intermediate takes a 16.5x-padded layout (measured OOM + the 113 ms
    "slow kernel" that was actually this bitcast).  Requires
    _mxu_supported(k).

    ``dot`` selects the MXU number format: "s8" (default: four biased
    s8 planes through int8 dots — measured 7.7 vs 10.2 ms per 512 MiB
    relayout vs bf16 on v5e, bit-exact on hardware), "bf16" (four u8
    planes, exact <= 255), "f32" (two u16 planes, exact <= 2^16 —
    measured equal to bf16: half the planes at half the rate)."""
    return _interleave_mxu_call(
        bits, tw, dot, interpret
    ).reshape(-1)[:nwords]


def _interleave_mxu_call(bits, tw, dot, interpret):
    """The raw byte-level relayout call: (k, W) bits -> (rows, 128k)
    PADDED output (padded input words are zero, so padded output words
    are zero).  interleave_mxu_words slices it flat; the hierarchical
    driver keeps it padded to avoid a per-group slice copy."""
    k, w = bits.shape
    assert _mxu_supported(k)
    assert dot in ("bf16", "f32", "s8")
    # VMEM: perm is (128k)^2 bf16 (2 MB at k=8, 8 MB at k=16) resident
    # alongside double-buffered in/out blocks — shrink the tile as k grows
    tw = tw or (128 if k <= 8 else 32)
    w128 = -(-w // 128)
    # round the row count so tw divides it; padded rows are sliced off
    rows = -(-w128 // tw) * tw
    pad = rows * 128 - w
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((k, pad), jnp.uint32)], axis=1)
    inb = bits.reshape(k, rows, 128)
    perm = _perm_matrix(k, dot)
    return pl.pallas_call(
        functools.partial(_interleave_mxu_kernel, k=k, tw=tw, dot=dot),
        out_shape=jax.ShapeDtypeStruct((rows, 128 * k), jnp.uint32),
        grid=(rows // tw,),
        in_specs=[
            pl.BlockSpec(
                (LANES * k, LANES * k), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, tw, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tw, 128 * k), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(perm, inb)


@functools.partial(
    jax.jit, static_argnames=("nbytes", "tw", "interpret", "dot")
)
def interleave_mxu_tiles(
    bits: jax.Array, nbytes: int, tw: int | None = None,
    interpret: bool = False, dot: str = "s8",
) -> jax.Array:
    """uint8 view of :func:`interleave_mxu_words` (byte-parity API; use
    the words form for large device-side consumers — see its docstring
    for the measured padded-bitcast cost)."""
    k = int(bits.shape[0])
    total = nbytes * k
    words = interleave_mxu_words(
        bits, -(-total // 4), tw=tw, interpret=interpret, dot=dot
    )
    return jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1)[:total]


@functools.partial(jax.jit, static_argnames=("nwords",))
def interleave_xla_mxu_words(bits: jax.Array, nwords: int) -> jax.Array:
    """Words-level XLA twin of :func:`interleave_mxu_words` (no u8
    bitcast anywhere — same HBM bytes, see the words docstring)."""
    from shared_simd_scan_tpu.ops.scan import _byte_transpose_quad

    k, w = bits.shape
    assert k % 4 == 0
    rows = -(-w // 128)
    pad = rows * 128 - w
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((k, pad), jnp.uint32)], axis=1)
    zs = [None] * k
    for h in range(k // 4):
        q = _byte_transpose_quad(bits[4 * h], bits[4 * h + 1],
                                 bits[4 * h + 2], bits[4 * h + 3])
        for s in range(4):
            zs[s * (k // 4) + h] = q[s]
    in2 = (
        jnp.stack(zs)
        .reshape(k, rows, 128)
        .transpose(1, 0, 2)
        .reshape(rows, 128 * k)
    )
    perm = _perm_matrix(k, "bf16")
    acc = None
    for p in range(4):
        plane = ((in2 >> jnp.uint32(8 * p)) & jnp.uint32(0xFF)).astype(
            jnp.bfloat16
        )
        d = jax.lax.dot_general(
            plane, perm, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        part = d.astype(jnp.uint32) << jnp.uint32(8 * p)
        acc = part if acc is None else acc | part
    return acc.reshape(-1)[:nwords]


@functools.partial(jax.jit, static_argnames=("nbytes",))
def interleave_xla_mxu(bits: jax.Array, nbytes: int) -> jax.Array:
    """uint8 view of :func:`interleave_xla_mxu_words` (diagnostic twin
    of the Pallas MXU kernel — if XLA's matmul is fast where the Pallas
    dot is slow, Mosaic is not placing the in-kernel dot on the MXU).
    The final u8 bitcast fuses into the consumer — a lax.map-chunked
    first version forced the bitcast to materialize as u8[rows,1024,4]
    with a 16x-padded layout and OOM'd the chip at 512 MiB (measured)."""
    k = int(bits.shape[0])
    total = nbytes * k
    words = interleave_xla_mxu_words(bits, -(-total // 4))
    return jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1)[:total]


def interleave_xla_stack(bits: jax.Array, nbytes: int) -> jax.Array:
    """The pure-XLA relayout (scan._interleave_linear) — general-k
    fallback and the measurement-table baseline."""
    from shared_simd_scan_tpu.ops.scan import _interleave_linear

    return _interleave_linear(bits, nbytes)


@functools.partial(jax.jit, static_argnames=("nbytes", "interpret"))
def interleave_device(
    bits: jax.Array, nbytes: int, interpret: bool = False
) -> jax.Array:
    """Dispatch: MXU permutation kernel where legal (k % 4 == 0,
    4 <= k <= 16), hierarchical MXU for k % 8 == 0 up to 128 or k % 4
    == 0 up to 64 (groups of 4 at g=1), XLA stack otherwise.  Jitted as
    ONE program: eager bitcast/slice over ~GB buffers materializes
    every intermediate through the relay (the CLAUDE.md eager-op trap;
    review finding)."""
    k = int(bits.shape[0])
    if _mxu_supported(k):
        return interleave_mxu_tiles(bits, nbytes, interpret=interpret)
    if _mxu_large_supported(k):
        words = interleave_mxu_words_large(bits, nbytes, interpret=interpret)
        return jax.lax.bitcast_convert_type(words, jnp.uint8).reshape(-1)[
            : nbytes * k
        ]
    return interleave_xla_stack(bits, nbytes)


__all__ = [
    "interleave_mxu_words",
    "interleave_mxu_tiles",
    "interleave_mxu_words_large",
    "interleave_streams_mxu_words",
    "interleave_xla_mxu",
    "interleave_xla_stack",
    "interleave_device",
]

"""Data-parallel column sharding across a TPU device mesh.

The reference tops out at OpenMP threads over the *predicate* axis on one
CPU (src/simd_scan_shared.cpp:27-32; SURVEY.md §2.4 "Distributed (absent)").
The TPU rebuild makes multi-chip/multi-host scale a first-class component
(BASELINE.md north star): the packed column is sharded **along the block
axis** over a 1-D ``('data',)`` mesh, the predicate table is replicated,
every chip runs the same Pallas shared-scan kernel on its local shard, and
per-shard hit counts are reduced with ``jax.lax.psum`` over ICI.  Bitvector
outputs stay sharded (gather only on demand).

Sharding safety: the reference's packed stream cannot be cut at arbitrary
points because values straddle word boundaries
(simd_scan_compression.cpp:82-99 — SURVEY.md §7 "sharding the packed
stream").  Our device layout dissolves the problem: one block = 32 values =
``width`` whole uint32 words, so ANY block-aligned cut is self-contained.
We shard at (sublane-tile × lane)-aligned block boundaries, padding with
zero blocks that the kernel's validity mask ignores.

Multi-host: under ``jax.distributed.initialize`` the same code runs
unchanged — ``jax.make_mesh`` spans all processes' devices, XLA routes the
``psum`` over ICI within a slice and DCN across slices.  Tested on a forced
multi-device CPU platform (tests/conftest.py), the standard JAX substitute
for a real pod slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shared_simd_scan_tpu.layout import (
    BLOCK_VALUES,
    LANES,
    SUBLANES,
    DeviceColumn,
)
from shared_simd_scan_tpu.ops import scan as scan_ops
from shared_simd_scan_tpu.ops import unpack as unpack_ops

DATA_AXIS = "data"


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host process-group setup (wraps jax.distributed.initialize).

    Call once per host before any device use; afterwards ``make_mesh()``
    spans every process's devices and the sharded scans run unchanged —
    psum rides ICI within a slice, DCN across slices.  No-args form reads
    the standard cluster environment (TPU pod metadata / JAX_COORDINATOR).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def fetch_global(x) -> np.ndarray:
    """Host numpy view of a jax.Array that may span other processes.

    Shard-local partials (sum limbs, min/max grids) keep a
    P(DATA_AXIS, ...) sharding; on a multi-process mesh the remote shards
    are not addressable and a plain ``np.asarray`` raises.  The partial
    grids are tiny (steps x k x LANES), so an allgather is the right
    tool — every process finalizes identically (collective: every
    process must call this)."""
    if all(
        d.process_index == jax.process_index() for d in x.sharding.device_set
    ):
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def _pad_b1(tiles: jax.Array, multiple: int) -> jax.Array:
    b1 = tiles.shape[1]
    target = ((b1 + multiple - 1) // multiple) * multiple
    if target == b1:
        return tiles
    pad = [(0, 0), (0, target - b1), (0, 0)]
    return jnp.pad(tiles, pad)


def shard_column(dev: DeviceColumn, mesh: Mesh) -> DeviceColumn:
    """Place a DeviceColumn's tiles data-parallel along the block axis.

    Pads B1 to a multiple of (mesh size × SUBLANES) so every shard is a
    legal kernel operand, then applies NamedSharding (None, 'data', None).

    On a multi-process mesh (``dist.initialize`` across hosts) the host
    array cannot be device_put to non-addressable devices; every process
    is assumed to hold the same host copy (replicated build, the demo /
    test path — production loads per-shard from io.load_table) and only
    the locally-addressable shards are materialized.
    """
    nd = mesh.devices.size
    tiles = _pad_b1(dev.tiles, nd * SUBLANES)
    sharding = NamedSharding(mesh, P(None, DATA_AXIS, None))
    if all(
        d.process_index == jax.process_index() for d in mesh.devices.flat
    ):
        tiles = jax.device_put(tiles, sharding)
    else:
        host = np.asarray(tiles)
        tiles = jax.make_array_from_callback(
            host.shape, sharding, lambda idx: host[idx]
        )
    return DeviceColumn(width=dev.width, n=dev.n, tiles=tiles)


@functools.partial(
    jax.jit, static_argnames=("mesh", "width", "n", "tb", "interpret")
)
def _sharded_shared_scan_tiles(
    tiles, keys, *, mesh, width, n, tb, interpret
) -> tuple[jax.Array, jax.Array]:
    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l, keys_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        # same tiering as shared_scan_device: bit-sliced kernel past the
        # cost crossover (works with the traced keys shard_map provides)
        fn = (
            scan_ops.shared_scan_bitsliced_tiles
            if scan_ops._bitsliced_wins(width, int(keys_l.shape[0]))
            else scan_ops.shared_scan_tiles
        )
        bits, cnt = fn(
            tiles_l, keys_l, width, n, tb=tb, interpret=interpret,
            block_offset=off,
        )
        return bits, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P()),
        out_specs=(P(None, DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles, keys)


@functools.partial(jax.jit, static_argnames=("mesh", "width", "n"))
def _sharded_shared_scan_tiles_xla(
    tiles, keys, *, mesh, width, n
) -> tuple[jax.Array, jax.Array]:
    """XLA-tier sharded shared scan (no Pallas): the portable compiled
    path for any backend, and the tier the CPU scaling artifact times —
    interpret-mode Pallas throughput says nothing about the collective
    pattern, compiled XLA does (bench/scaling.py, VERDICT r3 item 6)."""
    from shared_simd_scan_tpu.ops import xla_kernels

    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l, keys_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        bits, cnt = xla_kernels.shared_scan_tiles_xla(
            tiles_l, keys_l, width, n, block_offset=off
        )
        return bits, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P()),
        out_specs=(P(None, DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles, keys)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "keys_tuple", "width", "n", "tb", "interpret"),
)
def _sharded_windowed_scan_tiles(
    tiles, *, mesh, keys_tuple, width, n, tb, interpret
):
    local_b1 = tiles.shape[1] // mesh.devices.size
    keys = np.asarray(keys_tuple, np.uint32)

    def local(tiles_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        bits, cnt = scan_ops.windowed_scan_tiles(
            tiles_l, keys, width, n, tb=tb, interpret=interpret,
            block_offset=off,
        )
        return bits, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, DATA_AXIS, None),
        out_specs=(P(None, DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "keys_tuple", "width", "n", "tb", "interpret"),
)
def _sharded_bitsliced_static_scan_tiles(
    tiles, *, mesh, keys_tuple, width, n, tb, interpret
):
    local_b1 = tiles.shape[1] // mesh.devices.size
    keys = np.asarray(keys_tuple, np.uint32)

    def local(tiles_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        bits, cnt = scan_ops.shared_scan_bitsliced_static_tiles(
            tiles_l, keys, width, n, tb=tb, interpret=interpret,
            block_offset=off,
        )
        return bits, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, DATA_AXIS, None),
        out_specs=(P(None, DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles)


def sharded_shared_scan(
    dev: DeviceColumn, keys, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """k-predicate shared scan over a sharded column.

    Returns (bits uint32[k, B1, 128] sharded along B1, counts int32[k]
    replicated via psum).  Use :func:`scan_ops.bits_to_canonical` to gather
    a canonical bitvector when needed.

    Same static dispatch as the single-chip :func:`scan_ops.
    shared_scan_device` when the keys are concrete: a consecutive run goes
    to the interval kernel, a clustered set to the windowed kernel (cost
    rule), everything else to the compare kernels.

    Keys are inspected BEFORE any jnp conversion — inside a jit trace
    ``jnp.asarray`` stages even numpy constants into Tracers, which would
    demote concrete keys to the traced compare tier.
    """
    if not isinstance(keys, jax.core.Tracer):
        keys = np.asarray(keys, dtype=np.uint32)
        k = int(keys.shape[0])
        # single home of the cost rule: scan_ops.pick_concrete_tier
        tier, lo = scan_ops.pick_concrete_tier(dev.width, keys)
        if tier == "interval":
            return _sharded_interval_scan_tiles(
                dev.tiles, jnp.uint32(lo), mesh=mesh, k=k, width=dev.width,
                n=dev.n, tb=tb, interpret=interpret,
            )
        if tier == "windowed":
            return _sharded_windowed_scan_tiles(
                dev.tiles, mesh=mesh,
                keys_tuple=tuple(int(x) for x in np.asarray(keys)),
                width=dev.width, n=dev.n, tb=tb, interpret=interpret,
            )
        if tier == "bitsliced_static":
            return _sharded_bitsliced_static_scan_tiles(
                dev.tiles, mesh=mesh,
                keys_tuple=tuple(int(x) for x in np.asarray(keys)),
                width=dev.width, n=dev.n, tb=tb, interpret=interpret,
            )
    return _sharded_shared_scan_tiles(
        dev.tiles, keys, mesh=mesh, width=dev.width, n=dev.n, tb=tb,
        interpret=interpret,
    )


def sharded_scan(
    dev: DeviceColumn, predicate_key, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Single-predicate sharded scan -> (bits[1, B1, 128] sharded, count)."""
    keys = jnp.asarray(predicate_key, jnp.uint32).reshape(1)
    bits, counts = sharded_shared_scan(dev, keys, mesh, tb=tb, interpret=interpret)
    return bits[0], counts[0]


@functools.partial(jax.jit, static_argnames=("mesh", "width", "tb", "interpret"))
def _sharded_unpack_tiles(tiles, *, mesh, width, tb, interpret):
    def local(tiles_l):
        return unpack_ops.unpack_tiles(tiles_l, width, tb=tb, interpret=interpret)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, DATA_AXIS, None),
        out_specs=P(None, DATA_AXIS, None),
        check_vma=False,
    )(tiles)


def sharded_unpack(
    dev: DeviceColumn, mesh: Mesh, tb: int | None = None, interpret: bool = False
) -> jax.Array:
    """Decompress a sharded column -> values uint32[32, B1, 128], sharded
    along the block axis (no collective needed — embarrassingly parallel)."""
    return _sharded_unpack_tiles(
        dev.tiles, mesh=mesh, width=dev.width, tb=tb, interpret=interpret
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "width", "n", "tb", "interpret")
)
def _sharded_interval_scan_tiles(tiles, lo, *, mesh, k, width, n, tb, interpret):
    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l, lo_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        bits, cnt = scan_ops.interval_scan_tiles(
            tiles_l, lo_l, k, width, n, tb=tb, interpret=interpret,
            block_offset=off,
        )
        return bits, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P()),
        out_specs=(P(None, DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles, lo)


def sharded_interval_scan(
    dev: DeviceColumn, lo, k: int, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Sharded shared scan for consecutive keys lo..lo+k-1 (see
    scan_ops.interval_scan_tiles): bits sharded along the block axis,
    counts psum-reduced."""
    lo = jnp.asarray(lo, jnp.uint32)
    return _sharded_interval_scan_tiles(
        dev.tiles, lo, mesh=mesh, k=k, width=dev.width, n=dev.n, tb=tb,
        interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "width", "n", "tb", "interpret")
)
def _sharded_linear_scan_tiles(
    tiles, lo, *, mesh, k, width, n, tb, interpret
):
    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l, lo_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        out, cnt = scan_ops.interval_scan_linear_words_tiles(
            tiles_l, lo_l, k, width, n, tb=tb, interpret=interpret,
            block_offset=off, flat=False,
        )
        return out, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P()),
        out_specs=(P(DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles, lo)


def sharded_linear_scan(
    dev: DeviceColumn, lo, k: int, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Sharded FUSED linear export (interval keys lo..lo+k-1): each
    shard runs the single-pass scan+MXU-interleave kernel on its block
    range (scan_ops.interval_scan_linear_words_tiles) and the linear
    word stream comes out block-sharded along the row axis — shard s
    holds the linear bytes of value groups [s*local_blocks*32*4, ...),
    a CONTIGUOUS span of the global linear stream, so per-shard host
    export needs no collective at all.  Counts are psum-reduced.
    Returns (uint32[nbytes*k/4] linear words, (k,) uint32 counts)."""
    lo = jnp.asarray(lo, jnp.uint32)
    out, counts = _sharded_linear_scan_tiles(
        dev.tiles, lo, mesh=mesh, k=k, width=dev.width, n=dev.n, tb=tb,
        interpret=interpret,
    )
    nwords = ((dev.n + 7) // 8) * k // 4
    return out.reshape(-1)[:nwords], counts


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "keys_tuple", "width", "n", "tb", "interpret"),
)
def _sharded_static_linear_scan_tiles(
    tiles, *, mesh, keys_tuple, width, n, tb, interpret
):
    local_b1 = tiles.shape[1] // mesh.devices.size
    keys = np.asarray(keys_tuple, np.uint32)

    def local(tiles_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        out, cnt = scan_ops.static_scan_linear_words_tiles(
            tiles_l, keys, width, n, tb=tb, interpret=interpret,
            block_offset=off, flat=False,
        )
        return out, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None),),
        out_specs=(P(DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles)


def sharded_static_linear_scan(
    dev: DeviceColumn, keys, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Sharded FUSED linear export for ANY concrete key set (the
    static-AND-DAG sibling of :func:`sharded_linear_scan`; k must
    satisfy linear._mxu_supported).  Same block-sharded contiguous
    output contract; counts psum-reduced."""
    arr = np.asarray(keys, dtype=np.uint32)
    out, counts = _sharded_static_linear_scan_tiles(
        dev.tiles, mesh=mesh, keys_tuple=tuple(int(v) for v in arr),
        width=dev.width, n=dev.n, tb=tb, interpret=interpret,
    )
    nwords = ((dev.n + 7) // 8) * arr.shape[0] // 4
    return out.reshape(-1)[:nwords], counts


@functools.partial(
    jax.jit, static_argnames=("mesh", "width", "n", "tb", "interpret")
)
def _sharded_traced_linear_scan_tiles(
    tiles, keys, *, mesh, width, n, tb, interpret
):
    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l, keys_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        out, cnt = scan_ops.bitsliced_scan_linear_words_tiles(
            tiles_l, keys_l, width, n, tb=tb, interpret=interpret,
            block_offset=off, flat=False,
        )
        return out, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P()),
        out_specs=(P(DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles, keys)


def sharded_traced_linear_scan(
    dev: DeviceColumn, keys, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Sharded FUSED linear export for TRACED (runtime) keys — one
    compiled program per (k, width, n, mesh) for any key values, keys
    replicated to every shard (the round-5 traced tier's sharded form;
    k must satisfy linear._mxu_supported).  Same block-sharded
    contiguous output contract; counts psum-reduced."""
    keys = jnp.asarray(keys, jnp.uint32)
    out, counts = _sharded_traced_linear_scan_tiles(
        dev.tiles, keys, mesh=mesh, width=dev.width, n=dev.n, tb=tb,
        interpret=interpret,
    )
    nwords = ((dev.n + 7) // 8) * int(keys.shape[0]) // 4
    return out.reshape(-1)[:nwords], counts


@functools.partial(
    jax.jit, static_argnames=("mesh", "width", "n", "tb", "interpret")
)
def _sharded_range_scan_tiles(tiles, lows, highs, *, mesh, width, n, tb, interpret):
    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l, lows_l, highs_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        bits, cnt = scan_ops.range_scan_tiles(
            tiles_l, lows_l, highs_l, width, n, tb=tb, interpret=interpret,
            block_offset=off,
        )
        return bits, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P(), P()),
        out_specs=(P(None, DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles, lows, highs)


def sharded_range_scan(
    dev: DeviceColumn, lows, highs, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Sharded k-range-predicate scan (see scan_ops.range_scan_tiles)."""
    lows = jnp.asarray(lows, jnp.uint32)
    highs = jnp.asarray(highs, jnp.uint32)
    return _sharded_range_scan_tiles(
        dev.tiles, lows, highs, mesh=mesh, width=dev.width, n=dev.n, tb=tb,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "wp", "wm", "n", "tb", "interpret", "bitplane"),
)
def _sharded_aggregate_scan_tiles(
    ptiles, mtiles, keys, *, mesh, wp, wm, n, tb, interpret,
    bitplane: bool = False,
):
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    local_b1 = ptiles.shape[1] // mesh.devices.size
    fn = (
        agg_ops.aggregate_bitplane_tiles
        if bitplane
        else agg_ops.aggregate_scan_tiles
    )

    def local(ptiles_l, mtiles_l, keys_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        counts, slo, shi = fn(
            ptiles_l, mtiles_l, keys_l, wp, wm, n, tb=tb,
            interpret=interpret, block_offset=off,
        )
        return jax.lax.psum(counts, DATA_AXIS), slo, shi

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P(None, DATA_AXIS, None), P()),
        out_specs=(P(), P(DATA_AXIS, None, None), P(DATA_AXIS, None, None)),
        check_vma=False,
    )(ptiles, mtiles, keys)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "keys_tuple", "wp", "wm", "n", "tb", "interpret"),
)
def _sharded_aggregate_bitplane_tiles(
    ptiles, mtiles, *, mesh, keys_tuple, wp, wm, n, tb, interpret
):
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    local_b1 = ptiles.shape[1] // mesh.devices.size
    keys = np.asarray(keys_tuple, np.uint32)

    def local(ptiles_l, mtiles_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        counts, slo, shi = agg_ops.aggregate_bitplane_static_tiles(
            ptiles_l, mtiles_l, keys, wp, wm, n, tb=tb,
            interpret=interpret, block_offset=off,
        )
        return jax.lax.psum(counts, DATA_AXIS), slo, shi

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P(None, DATA_AXIS, None)),
        out_specs=(P(), P(DATA_AXIS, None, None), P(DATA_AXIS, None, None)),
        check_vma=False,
    )(ptiles, mtiles)


def sharded_aggregate_scan(
    pdev: DeviceColumn, mdev: DeviceColumn, keys, mesh: Mesh,
    tb: int | None = None, interpret: bool = False,
):
    """Fused filter+aggregate over sharded columns -> (sums uint64 numpy
    (k,), counts uint32 (k,) psum-reduced).

    Per-shard sum partials stay sharded along the step axis; the exact
    uint64 finalization gathers only the small partial grid to the host
    (see ops.aggregate for the overflow-headroom argument).  Same tier
    dispatch as the single-chip aggregate_scan_device (concrete keys past
    the counted-cost crossover run the bit-plane kernel); keys are
    inspected BEFORE any jnp conversion (the Tracer-demotion trap)."""
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    if pdev.n != mdev.n:
        raise ValueError(
            f"column lengths differ: predicate n={pdev.n}, measure n={mdev.n}"
        )
    traced = isinstance(keys, jax.core.Tracer)
    tier = agg_ops.pick_aggregate_tier(pdev.width, mdev.width, keys)
    if tier == "bitplane" and not traced:
        counts, slo, shi = _sharded_aggregate_bitplane_tiles(
            pdev.tiles, mdev.tiles, mesh=mesh,
            keys_tuple=tuple(int(x) for x in np.asarray(keys, np.uint32)),
            wp=pdev.width, wm=mdev.width, n=pdev.n, tb=tb,
            interpret=interpret,
        )
    else:
        keys = keys if traced else jnp.asarray(np.asarray(keys, np.uint32))
        counts, slo, shi = _sharded_aggregate_scan_tiles(
            pdev.tiles, mdev.tiles, keys, mesh=mesh, wp=pdev.width,
            wm=mdev.width, n=pdev.n, tb=tb, interpret=interpret,
            bitplane=tier == "bitplane",
        )
    return agg_ops.finalize_sums(fetch_global(slo), fetch_global(shi)), counts


@functools.partial(
    jax.jit, static_argnames=("mesh", "wp", "wm", "n", "tb", "interpret")
)
def _sharded_minmax_scan_tiles(
    ptiles, mtiles, keys, *, mesh, wp, wm, n, tb, interpret
):
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    local_b1 = ptiles.shape[1] // mesh.devices.size

    def local(ptiles_l, mtiles_l, keys_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        counts, mins, maxs = agg_ops.minmax_scan_tiles(
            ptiles_l, mtiles_l, keys_l, wp, wm, n, tb=tb,
            interpret=interpret, block_offset=off,
        )
        return jax.lax.psum(counts, DATA_AXIS), mins, maxs

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P(None, DATA_AXIS, None), P()),
        out_specs=(P(), P(DATA_AXIS, None, None), P(DATA_AXIS, None, None)),
        check_vma=False,
    )(ptiles, mtiles, keys)


def sharded_minmax_scan(
    pdev: DeviceColumn, mdev: DeviceColumn, keys, mesh: Mesh,
    tb: int | None = None, interpret: bool = False,
):
    """Fused per-key MIN/MAX over sharded columns -> (mins, maxs, counts)
    (host-finalized, empty groups report 2^wm / 0)."""
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    if pdev.n != mdev.n:
        raise ValueError(
            f"column lengths differ: predicate n={pdev.n}, measure n={mdev.n}"
        )
    keys = jnp.asarray(keys, jnp.uint32)
    counts, mins, maxs = _sharded_minmax_scan_tiles(
        pdev.tiles, mdev.tiles, keys, mesh=mesh, wp=pdev.width,
        wm=mdev.width, n=pdev.n, tb=tb, interpret=interpret,
    )
    mn, mx = agg_ops.finalize_minmax(
        fetch_global(mins), fetch_global(maxs), counts, mdev.width
    )
    return mn, mx, counts


@functools.partial(
    jax.jit, static_argnames=("mesh", "k", "width", "n", "tb", "interpret")
)
def _sharded_histogram_tiles(tiles, lo, *, mesh, k, width, n, tb, interpret):
    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l, lo_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        counts = scan_ops.histogram_tiles(
            tiles_l, lo_l, k, width, n, tb=tb, interpret=interpret,
            block_offset=off,
        )
        return jax.lax.psum(counts, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P()),
        out_specs=P(),
        check_vma=False,
    )(tiles, lo)


def sharded_histogram(
    dev: DeviceColumn, mesh: Mesh, lo=0, k: int | None = None,
    tb: int | None = None, interpret: bool = False,
) -> jax.Array:
    """Counts-only value histogram over a sharded column -> uint32 (k,)
    psum-reduced across the mesh (default the full domain, capped at 4096;
    see :func:`scan_ops.histogram_device`).  Concrete (non-jax) lo
    dispatches to the shared-AND-DAG kernel, like the single-chip path;
    pass a jax scalar to force the once-compiled mask kernel."""
    if k is None:
        k = min(1 << dev.width, 4096)
    if not isinstance(lo, (jax.Array, jax.core.Tracer)):
        return _sharded_histogram_dag_tiles(
            dev.tiles, mesh=mesh, lo=int(lo), k=k, width=dev.width,
            n=dev.n, tb=tb, interpret=interpret,
        )
    lo = jnp.asarray(lo, jnp.uint32)
    return _sharded_histogram_tiles(
        dev.tiles, lo, mesh=mesh, k=k, width=dev.width, n=dev.n, tb=tb,
        interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "lo", "k", "width", "n", "tb", "interpret"),
)
def _sharded_histogram_dag_tiles(
    tiles, *, mesh, lo, k, width, n, tb, interpret
):
    local_b1 = tiles.shape[1] // mesh.devices.size

    def local(tiles_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        counts = scan_ops.histogram_dag_tiles(
            tiles_l, lo, k, width, n, tb=tb, interpret=interpret,
            block_offset=off,
        )
        return jax.lax.psum(counts, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P(None, DATA_AXIS, None),
        out_specs=P(),
        check_vma=False,
    )(tiles)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "keys_tuple", "width", "n", "tb", "interpret"),
)
def _sharded_member_scan_tiles(
    tiles, keys, *, mesh, keys_tuple, width, n, tb, interpret
):
    from shared_simd_scan_tpu.ops import member as member_ops

    local_b1 = tiles.shape[1] // mesh.devices.size
    # concrete keys (needed for the interval/window tiers) travel as a
    # static tuple; traced keys as the ``keys`` operand (compare tiers)
    keys_static = (
        np.asarray(keys_tuple, np.uint32) if keys_tuple is not None else None
    )

    def local(tiles_l, keys_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        bits, cnt = member_ops.member_scan_tiles(
            tiles_l,
            keys_static if keys_static is not None else keys_l,
            width, n, tb=tb, interpret=interpret, block_offset=off,
        )
        return bits, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P()),
        out_specs=(P(DATA_AXIS, None), P()),
        check_vma=False,
    )(tiles, keys)


def sharded_member_scan(
    dev: DeviceColumn, keys, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """IN-list membership scan over a sharded column -> (bits uint32[B1, 128]
    sharded along the block axis, total count psum-reduced).

    Same tiering as the single-chip :func:`member_ops.member_scan_device`:
    concrete keys dispatch statically (interval / window popmask tiers);
    traced keys fall back to the compare tiers.  Keys are inspected
    BEFORE any jnp conversion (see :func:`sharded_shared_scan`)."""
    if isinstance(keys, jax.core.Tracer):
        keys_tuple = None
    else:
        keys_tuple = tuple(int(x) for x in np.asarray(keys))
        keys = jnp.asarray(np.asarray(keys, dtype=np.uint32))
    return _sharded_member_scan_tiles(
        dev.tiles, keys, mesh=mesh, keys_tuple=keys_tuple, width=dev.width,
        n=dev.n, tb=tb, interpret=interpret,
    )


@functools.partial(
    jax.jit, static_argnames=("mesh", "widths", "n", "tb", "interpret")
)
def _sharded_conj_range_scan_tiles(
    tiles, lows, highs, *, mesh, widths, n, tb, interpret
):
    from shared_simd_scan_tpu.ops import conj as conj_ops

    local_b1 = tiles[0].shape[1] // mesh.devices.size

    def local(lows_l, highs_l, *tiles_l):
        off = jax.lax.axis_index(DATA_AXIS) * (local_b1 * LANES)
        bits, cnt = conj_ops.conj_range_scan_tiles(
            tiles_l, lows_l, highs_l, widths, n, tb=tb, interpret=interpret,
            block_offset=off,
        )
        return bits, jax.lax.psum(cnt, DATA_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P()) + (P(None, DATA_AXIS, None),) * len(tiles),
        out_specs=(P(DATA_AXIS, None), P()),
        check_vma=False,
    )(lows, highs, *tiles)


@functools.partial(
    jax.jit, static_argnames=("mesh", "wm", "n", "tb", "interpret")
)
def _sharded_masked_aggregate_tiles(
    mtiles, bits, *, mesh, wm, n, tb, interpret
):
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    def local(mtiles_l, bits_l):
        count, slo, shi = agg_ops.masked_aggregate_tiles(
            mtiles_l, bits_l, wm, n, tb=tb, interpret=interpret
        )
        return jax.lax.psum(count, DATA_AXIS), slo, shi

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS, None), P(DATA_AXIS, None)),
        out_specs=(P(), P(DATA_AXIS, None, None), P(DATA_AXIS, None, None)),
        check_vma=False,
    )(mtiles, bits)


def sharded_masked_aggregate(
    mdev: DeviceColumn, bits, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
):
    """SUM + COUNT of a sharded measure column over a sharded device-layout
    match bitvector (e.g. from ``query.evaluate_sharded``): -> (sum uint64
    scalar numpy, count uint32).  Sum partials stay sharded until the
    exact host finalize."""
    from shared_simd_scan_tpu.ops import aggregate as agg_ops

    count, slo, shi = _sharded_masked_aggregate_tiles(
        mdev.tiles, bits, mesh=mesh, wm=mdev.width, n=mdev.n, tb=tb,
        interpret=interpret,
    )
    return (
        agg_ops.finalize_sums(fetch_global(slo), fetch_global(shi))[0],
        count,
    )


def sharded_conj_range_scan(
    devs, lows, highs, mesh: Mesh, tb: int | None = None,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused AND of per-column range predicates over identically sharded
    same-table columns -> (bits uint32[B1, 128] sharded along the block
    axis, total count psum-reduced).  See ops.conj for the kernel."""
    devs = list(devs)
    n = devs[0].n
    for d in devs:
        if d.n != n:
            raise ValueError(
                f"conjunction columns must share n, got {d.n} != {n}"
            )
    return _sharded_conj_range_scan_tiles(
        tuple(d.tiles for d in devs),
        jnp.asarray(lows, jnp.uint32),
        jnp.asarray(highs, jnp.uint32),
        mesh=mesh, widths=tuple(d.width for d in devs), n=n, tb=tb,
        interpret=interpret,
    )

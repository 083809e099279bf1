"""XLA-fused tier: the tiled unpack/scan algorithms as plain jnp programs.

Same static per-value schedule as the Pallas kernels (layout.unpack_schedule
over the DeviceColumn tile layout) expressed as XLA ops — no Pallas. Three
roles:

1. **Portable fast path**: runs compiled on any backend (CPU tests run it
   natively instead of the Pallas interpreter; a GPU would run it too).
2. **Compiler baseline**: the bench suite times it against the Pallas
   kernels — the analog of the reference benchmarking compiler-vectorized
   scalar code against hand-written intrinsics (SURVEY.md §2.1 C3/C6).
3. **Cross-check**: a fourth independent implementation (after the Pallas
   kernels, the jnp gather oracle, and the C++ host library) that must
   agree bit-for-bit.

Unlike ``ops.oracle`` (canonical-words gather per value — correct anywhere
but slow on TPU), these operate on the device tile layout with static
slices only, so XLA lowers them to pure vector code.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from shared_simd_scan_tpu.layout import (
    BLOCK_VALUES,
    LANES,
    DeviceColumn,
    bitvector_words,
    unpack_schedule,
)


def _unpack_rows(tiles: jax.Array, width: int) -> list[jax.Array]:
    """32 per-r value arrays of shape (B1, 128) from tiles (width, B1, 128)."""
    mask = jnp.uint32((1 << width) - 1)
    out = []
    for k, s, straddles in unpack_schedule(width):
        v = tiles[k] >> jnp.uint32(s)
        if straddles:
            v = v | (tiles[k + 1] << jnp.uint32(32 - s))
        out.append(v & mask)
    return out


@functools.partial(jax.jit, static_argnames=("width",))
def unpack_tiles_xla(tiles: jax.Array, width: int) -> jax.Array:
    """tiles uint32[width, B1, 128] -> values uint32[32, B1, 128]."""
    return jnp.stack(_unpack_rows(tiles, width))


@functools.partial(jax.jit, static_argnames=("width", "n"))
def shared_scan_tiles_xla(
    tiles: jax.Array, keys: jax.Array, width: int, n: int,
    block_offset: jax.Array | int = 0,
) -> tuple[jax.Array, jax.Array]:
    """tiles uint32[width, B1, 128], keys uint32[k] ->
    (bits uint32[k, B1, 128], counts int32[k]) — identical contract to
    ops.scan.shared_scan_tiles (block_offset: first global block id of
    this tile range, for sharded callers' validity masks)."""
    _, b1, lanes = tiles.shape
    assert lanes == LANES
    k = int(keys.shape[0])
    keys = keys.astype(jnp.uint32)

    full, rem = n // BLOCK_VALUES, n % BLOCK_VALUES
    g = jnp.asarray(block_offset, jnp.int32) + jnp.arange(
        b1 * LANES, dtype=jnp.int32
    ).reshape(b1, LANES)
    valid = jnp.where(
        g < full,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(g == full, jnp.uint32((1 << rem) - 1 if rem else 0), jnp.uint32(0)),
    )

    accs = [jnp.zeros((b1, LANES), jnp.uint32) for _ in range(k)]
    for r, v in enumerate(_unpack_rows(tiles, width)):
        bit = jnp.uint32(1 << r)
        for j in range(k):
            accs[j] = accs[j] | jnp.where(v == keys[j], bit, jnp.uint32(0))
    bits = jnp.stack([a & valid for a in accs])
    counts = jnp.sum(
        jax.lax.population_count(bits).astype(jnp.uint32), axis=(1, 2)
    )
    return bits, counts


def shared_scan_device_xla(dev: DeviceColumn, keys) -> tuple[jax.Array, jax.Array]:
    """-> ((k, W) canonical bitvectors, (k,) counts); see shared_scan_device."""
    keys = jnp.asarray(keys, jnp.uint32)
    bits, counts = shared_scan_tiles_xla(dev.tiles, keys, dev.width, dev.n)
    k = bits.shape[0]
    return bits.reshape(k, -1)[:, : bitvector_words(dev.n)], counts


def unpack_device_xla(dev: DeviceColumn) -> jax.Array:
    """-> (n,) uint32 values in canonical order."""
    vals = unpack_tiles_xla(dev.tiles, dev.width)
    return vals.transpose(1, 2, 0).reshape(-1)[: dev.n]

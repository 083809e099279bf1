"""Zone maps: per-block-range min/max statistics + pruned scans.

The classic columnar scan-skipping optimization (Netezza zone maps,
Parquet column-chunk statistics; the reference has no analog — its scans
always touch every byte): record min/max per fixed range of rows at pack
time, then answer a range/equality predicate by scanning ONLY the
contiguous block span whose zones can contain matches.  On a sorted or
time-clustered column a point query touches O(1) zones instead of the
whole column.

TPU-native design constraints shape the API:

- **Static shapes.** XLA cannot scan a data-dependent span, so the
  pruned span is bucketed to a power-of-two number of device-block rows
  (min 8) — a bounded set of jit specializations — and the span START is
  a traced operand (``dynamic_slice`` + the kernels' ``block_offset``),
  so moving the span never recompiles.
- **Soundness before tightness.** The span covers every zone whose
  [zmin, zmax] intersects the predicate; interior zones that cannot
  match are still scanned (contiguity is what the hardware wants).
  Padding positions are validity-masked out of the zone stats (the scan
  kernels mask them out of results the same way), so all-padding zones
  report (0xFFFFFFFF, 0) and prune unconditionally.
- **Fallback.** When the span exceeds half the column the pruned path
  would pay the slice copy for little gain; the plain full-column kernel
  runs instead.  Unsorted columns therefore lose nothing.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from shared_simd_scan_tpu.layout import BLOCK_VALUES, LANES, DeviceColumn
from shared_simd_scan_tpu.ops import scan as scan_ops
from shared_simd_scan_tpu.ops.unpack import unpack_tiles


@dataclasses.dataclass(frozen=True)
class ZoneMap:
    """Per-zone min/max over ``zone_b1`` device-block rows
    (= zone_b1 * 128 blocks = zone_b1 * 4096 values per zone)."""

    zone_b1: int
    b1: int
    zmin: np.ndarray  # (nz,) uint32; 0xFFFFFFFF for all-padding zones
    zmax: np.ndarray  # (nz,) uint32; 0 for all-padding zones

    @property
    def nzones(self) -> int:
        return self.zmin.shape[0]


def build_zonemap(
    dev: DeviceColumn,
    zone_b1: int = 64,
    tb: int | None = None,
    interpret: bool = False,
    chunk_zones: int = 64,
) -> ZoneMap:
    """One decompress pass -> ZoneMap.  Chunked over zones so the
    unpacked intermediate stays ~tens of MB (an eager full-column unpack
    materializes 4n bytes).  Invalid (padding) positions contribute
    0xFFFFFFFF to min and 0 to max, so all-padding zones prune away."""
    width, n = dev.width, dev.n
    _, b1, _ = dev.tiles.shape
    full, rem = n // BLOCK_VALUES, n % BLOCK_VALUES

    @functools.partial(jax.jit, static_argnames=("rows",))
    def zstats(sub, start_row, rows):
        vals = unpack_tiles(sub, width, tb=tb, interpret=interpret)
        r = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 0)
        row = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 2)
        blk = (start_row + row) * LANES + lane
        valid = (blk < full) | ((blk == full) & (r < rem))
        nzc = rows // zone_b1
        vmin = jnp.where(valid, vals, jnp.uint32(0xFFFFFFFF)).reshape(
            BLOCK_VALUES, nzc, zone_b1, LANES
        )
        vmax = jnp.where(valid, vals, jnp.uint32(0)).reshape(
            BLOCK_VALUES, nzc, zone_b1, LANES
        )
        return jnp.min(vmin, axis=(0, 2, 3)), jnp.max(vmax, axis=(0, 2, 3))

    if zone_b1 % 8 or b1 % zone_b1:
        raise ValueError(
            f"zone_b1={zone_b1} must be a multiple of 8 dividing the "
            f"padded block-row count {b1} (8/64 always work)"
        )
    mins, maxs = [], []
    step = chunk_zones * zone_b1
    for s in range(0, b1, step):
        rows = min(step, b1 - s)
        # start_row traced: every full chunk reuses ONE compiled program
        mn, mx = zstats(dev.tiles[:, s : s + rows, :], jnp.int32(s), rows)
        mins.append(np.asarray(jax.device_get(mn)))
        maxs.append(np.asarray(jax.device_get(mx)))
    return ZoneMap(
        zone_b1=zone_b1, b1=b1,
        zmin=np.concatenate(mins), zmax=np.concatenate(maxs),
    )


def build_zonemap_from_values(
    values: np.ndarray, b1: int, zone_b1: int = 64
) -> ZoneMap:
    """Ingest-time zone map: numpy min/max over the values BEFORE packing
    (free next to the pack itself — :func:`build_zonemap` exists for
    columns whose raw values are gone and costs a decompress pass).

    ``b1`` is the packed column's padded block-row count
    (``dev.tiles.shape[1]``); value index i lands in zone
    ``i // (zone_b1 * 4096)`` under the device layout, so plain
    contiguous reduction is exact."""
    if zone_b1 % 8 or b1 % zone_b1:
        raise ValueError(
            f"zone_b1={zone_b1} must be a multiple of 8 dividing the "
            f"padded block-row count {b1} (8/64 always work)"
        )
    values = np.asarray(values, dtype=np.uint32)
    per = zone_b1 * LANES * BLOCK_VALUES
    nz = b1 // zone_b1
    zmin = np.full(nz, 0xFFFFFFFF, np.uint32)
    zmax = np.zeros(nz, np.uint32)
    # padding positions never match any predicate (the kernels' validity
    # tail masks them), so zone stats cover REAL values only — identical
    # to build_zonemap's validity-masked reduction
    for z in range(0, (values.size + per - 1) // per):
        chunk = values[z * per : (z + 1) * per]
        zmin[z] = chunk.min()
        zmax[z] = chunk.max()
    return ZoneMap(zone_b1=zone_b1, b1=b1, zmin=zmin, zmax=zmax)


def prune_span(zmap: ZoneMap, lo: int, hi: int) -> tuple[int, int] | None:
    """Bucketed block-row span (start, span) covering every zone that can
    contain a value in [lo, hi); None when no zone can match.  start is
    8-aligned and span is a power of two >= 8 (clamped to the column)."""
    hit = (zmap.zmax.astype(np.uint64) >= lo) & (
        zmap.zmin.astype(np.uint64) < hi
    )
    if not bool(hit.any()):
        return None
    zf = int(np.argmax(hit))
    zl = int(len(hit) - 1 - np.argmax(hit[::-1]))
    s = (zf * zmap.zone_b1) // 8 * 8
    need = (zl + 1) * zmap.zone_b1 - s
    span = 8
    while span < need:
        span *= 2
    if span >= zmap.b1:
        return (0, zmap.b1)
    if s + span > zmap.b1:
        s = zmap.b1 - span
    return (s, span)


@functools.partial(
    jax.jit, static_argnames=("span", "width", "n", "tb", "interpret")
)
def _pruned_range_tiles(
    tiles, start, lows, highs, *, span, width, n, tb, interpret
):
    sub = jax.lax.dynamic_slice(
        tiles, (0, start, 0), (tiles.shape[0], span, LANES)
    )
    return scan_ops.range_scan_tiles(
        sub, lows, highs, width, n, tb=tb, interpret=interpret,
        block_offset=start * LANES,
    )


@functools.partial(
    jax.jit, static_argnames=("span", "width", "n", "tb", "interpret")
)
def _pruned_range_full(
    tiles, start, lows, highs, *, span, width, n, tb, interpret
):
    """Pruned kernel + full-length canonical assembly under ONE jit —
    eager composition would submit the zeros / dynamic_update_slice /
    canonical reshape as separate relay executions (40-60 ms overhead
    each) and materialize every intermediate."""
    bits, cnt = _pruned_range_tiles(
        tiles, start, lows, highs,
        span=span, width=width, n=n, tb=tb, interpret=interpret,
    )
    full = jax.lax.dynamic_update_slice(
        jnp.zeros((1, tiles.shape[1], LANES), jnp.uint32), bits,
        (0, start, 0),
    )
    return scan_ops.bits_to_canonical(full, n)[0], cnt[0]


@functools.partial(
    jax.jit, static_argnames=("width", "n", "tb", "interpret")
)
def _full_range_canonical(tiles, lows, highs, *, width, n, tb, interpret):
    bits, cnt = scan_ops.range_scan_tiles(
        tiles, lows, highs, width, n, tb=tb, interpret=interpret
    )
    return scan_ops.bits_to_canonical(bits, n)[0], cnt[0]


def pruned_range_scan(
    dev: DeviceColumn,
    zmap: ZoneMap,
    lo: int,
    hi: int,
    tb: int | None = None,
    interpret: bool = False,
    full_bits: bool = True,
):
    """Range scan [lo, hi) touching only the pruned span ->
    (canonical bitvector words (W,) when full_bits else None,
    count uint32 scalar).

    Dispatch: no overlapping zone -> constant empty result (no kernel
    runs at all); span > half the column -> the plain full-column range
    kernel (the slice copy would outweigh the skipping)."""
    _, b1, _ = dev.tiles.shape
    W = (dev.n + 31) // 32
    sp = prune_span(zmap, lo, hi)
    lows = jnp.asarray([lo], jnp.uint32)
    highs = jnp.asarray([hi], jnp.uint32)
    if sp is None:
        bits = jnp.zeros((W,), jnp.uint32) if full_bits else None
        return bits, jnp.uint32(0)
    start, span = sp
    if span * 2 > b1:
        if full_bits:
            cbits, cnt = _full_range_canonical(
                dev.tiles, lows, highs, width=dev.width, n=dev.n, tb=tb,
                interpret=interpret,
            )
            return cbits, cnt
        _, cnt = scan_ops.range_scan_tiles(
            dev.tiles, lows, highs, dev.width, dev.n, tb=tb,
            interpret=interpret,
        )
        return None, cnt[0]
    if full_bits:
        return _pruned_range_full(
            dev.tiles, jnp.int32(start), lows, highs,
            span=span, width=dev.width, n=dev.n, tb=tb, interpret=interpret,
        )
    _, cnt = _pruned_range_tiles(
        dev.tiles, jnp.int32(start), lows, highs,
        span=span, width=dev.width, n=dev.n, tb=tb, interpret=interpret,
    )
    return None, cnt[0]


def pruned_eq_scan(
    dev: DeviceColumn,
    zmap: ZoneMap,
    key: int,
    tb: int | None = None,
    interpret: bool = False,
    full_bits: bool = True,
):
    """Equality scan via the zone map: range [key, key+1)."""
    return pruned_range_scan(
        dev, zmap, int(key), int(key) + 1, tb=tb, interpret=interpret,
        full_bits=full_bits,
    )


__all__ = [
    "ZoneMap",
    "build_zonemap",
    "prune_span",
    "pruned_range_scan",
    "pruned_eq_scan",
]

"""Interval (consecutive-key) and range-predicate scan kernel tests."""
import numpy as np
import pytest

from shared_simd_scan_tpu import bitvector, layout
from shared_simd_scan_tpu.ops import oracle, scan as scan_ops


def _col(width, n, seed=0):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 1 << width, size=n, dtype=np.uint32)
    return vals, layout.pack(vals, width)


@pytest.mark.parametrize("k", [1, 2, 5, 8, 9, 16, 32])
def test_interval_scan_matches_shared_scan(k):
    width, n = 9, 40_000
    vals, col = _col(width, n, seed=k)
    dev = layout.to_device(col)
    lo = 100
    bits, counts = scan_ops.interval_scan_device(dev, lo, k, interpret=True)
    keys = np.arange(lo, lo + k, dtype=np.uint32)
    obits, ocounts = oracle.shared_scan(col, keys)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ocounts))
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(obits))


def test_interval_scan_wraparound_guard():
    # lo near the top of the domain: v < lo must not match (unsigned wrap)
    width, n, k = 9, 10_000, 8
    vals, col = _col(width, n, seed=77)
    dev = layout.to_device(col)
    lo = (1 << width) - 3  # only keys 509,510,511 are in-domain
    bits, counts = scan_ops.interval_scan_device(dev, lo, k, interpret=True)
    for j in range(k):
        assert int(counts[j]) == int((vals == lo + j).sum())


@pytest.mark.parametrize("k", [1, 3, 8])
def test_range_scan_parity_vs_numpy(k):
    width, n = 11, 30_000
    vals, col = _col(width, n, seed=k + 7)
    dev = layout.to_device(col)
    rng = np.random.default_rng(k)
    lows = rng.integers(0, 1 << width, k).astype(np.uint32)
    highs = (lows + rng.integers(0, 200, k)).astype(np.uint32)
    bits, counts = scan_ops.range_scan_device(dev, lows, highs, interpret=True)
    for j in range(k):
        expect = (vals >= lows[j]) & (vals < highs[j])
        assert int(counts[j]) == int(expect.sum()), j
        assert bitvector.to_bytes(bits[j], n) == np.packbits(
            expect, bitorder="little"
        ).tobytes(), j


def test_range_scan_empty_and_full_ranges():
    width, n = 9, 5_000
    vals, col = _col(width, n, seed=5)
    dev = layout.to_device(col)
    lows = np.array([0, 7, 500], np.uint32)
    highs = np.array([512, 7, 2], np.uint32)  # full, empty, inverted(empty)
    bits, counts = scan_ops.range_scan_device(dev, lows, highs, interpret=True)
    assert int(counts[0]) == n
    assert int(counts[1]) == 0
    # inverted range hi < lo: hi-lo wraps huge -> matches v >= lo (documented
    # half-open unsigned semantics); just check it equals the numpy model
    expect2 = (vals - np.uint32(500)) < np.uint32((2 - 500) & 0xFFFFFFFF)
    assert int(counts[2]) == int(expect2.sum())


@pytest.mark.parametrize("k", [36, 48, 64, 100])  # krows 8/16/32/8 strides
def test_interval_scan_large_k_chunked(k):
    width, n = 9, 6_000  # multi-chunk path (k > 32)
    vals, col = _col(width, n, seed=13)
    dev = layout.to_device(col)
    lo = 50
    bits, counts = scan_ops.interval_scan_device(dev, lo, k, interpret=True)
    keys = np.arange(lo, lo + k, dtype=np.uint32)
    obits, ocounts = oracle.shared_scan(col, keys)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(ocounts))
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(obits))


@pytest.mark.parametrize("width,k", [(25, 8), (31, 32), (9, 512), (31, 1024)])
def test_interval_default_tiles_fit_vmem_budget(width, k):
    # the default tile choice must keep the kernel's working set within
    # the documented VMEM budget (width-25 k-8 OOM'd before the cap)
    from shared_simd_scan_tpu.ops.scan import default_interval_tb

    tb = default_interval_tb(width, k)
    krows = min(k, 32)
    # independent accounting: double-buffered input + bits out, scratch
    # and masks when chunked/multi-round, X vectors + transients
    scratch = 32 if k > 32 else 0
    masks = 32 if krows > 8 else 8
    live = 512 * tb * (2 * width + 2 * krows + scratch + masks + 8)
    assert live <= 13_000_000
    assert tb % 8 == 0 and tb >= 8


def test_shift_saturation_canary_on_cpu():
    # the gateless interval mask depends on shl saturating to 0 for
    # amounts >= 32; the canary must confirm it on this backend (and be
    # cached: second call hits the dict)
    assert scan_ops.shift_saturates(interpret=True)
    assert scan_ops.shift_saturates(interpret=True)


@pytest.mark.parametrize("k", [5, 8, 40])
def test_interval_gated_fallback_matches_gateless(k):
    # the gated mask variant (used when the canary fails) must be
    # bit-identical to the gateless one
    width, n = 9, 20_000
    vals, col = _col(width, n, seed=k + 3)
    dev = layout.to_device(col)
    lo = 30
    b_gl, c_gl = scan_ops._interval_scan_tiles_impl(
        dev.tiles, lo, k, width, n, None, True, True, 0
    )
    b_gt, c_gt = scan_ops._interval_scan_tiles_impl(
        dev.tiles, lo, k, width, n, None, True, False, 0
    )
    np.testing.assert_array_equal(np.asarray(b_gl), np.asarray(b_gt))
    np.testing.assert_array_equal(np.asarray(c_gl), np.asarray(c_gt))


def test_interval_counts_are_uint32():
    # per-key counts can exceed int32 at narrow widths; the public dtype
    # is uint32 (wrap-correct to 2^32-1)
    width, n, k = 9, 4_096, 8
    vals, col = _col(width, n, seed=1)
    dev = layout.to_device(col)
    _, counts = scan_ops.interval_scan_device(dev, 0, k, interpret=True)
    assert np.asarray(counts).dtype == np.uint32
    _, counts2 = scan_ops.shared_scan_device(
        dev, np.arange(k, dtype=np.uint32) * 3 % 512, interpret=True
    )
    assert np.asarray(counts2).dtype == np.uint32

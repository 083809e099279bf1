"""Bitvector helper tests (analog of test/util_tests.cpp:15-36)."""
import numpy as np

from shared_simd_scan_tpu import bitvector


def test_get_bit_matches_reference_case():
    # reference: vec{5,5} as bytes -> bits (test/util_tests.cpp:17-35)
    bits = bitvector.from_bytes(bytes([5, 5]), 16)
    expect = [True, False, True] + [False] * 5 + [True, False, True] + [False] * 5
    got = list(np.asarray(bitvector.to_bool(bits, 16)))
    assert got == expect
    # spot-check the scalar accessor itself
    assert bool(bitvector.get_bit(bits, 0)) is True
    assert bool(bitvector.get_bit(bits, 1)) is False


def test_roundtrip_bool():
    rng = np.random.default_rng(0)
    for n in [1, 31, 32, 33, 100, 257]:
        mask = rng.integers(0, 2, size=n).astype(bool)
        bits = bitvector.from_bool(mask)
        np.testing.assert_array_equal(np.asarray(bitvector.to_bool(bits, n)), mask)
        assert int(bitvector.popcount(bits)) == int(mask.sum())


def test_bytes_roundtrip():
    rng = np.random.default_rng(1)
    n = 77
    mask = rng.integers(0, 2, size=n).astype(bool)
    bits = bitvector.from_bool(mask)
    data = bitvector.to_bytes(bits, n)
    assert len(data) == (n + 7) // 8
    bits2 = bitvector.from_bytes(data, n)
    np.testing.assert_array_equal(np.asarray(bits), np.asarray(bits2))

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


def test_match_indices():
    import jax.numpy as jnp

    mask = np.zeros(100, bool)
    mask[[3, 17, 64, 99]] = True
    bits = bitvector.from_bool(jnp.asarray(mask))
    idx, count = bitvector.match_indices(bits, 100, size=8)
    assert int(count) == 4
    assert list(np.asarray(idx[:4])) == [3, 17, 64, 99]
    assert all(int(i) == 100 for i in np.asarray(idx[4:]))


def test_match_indices_overflow_capacity():
    import jax.numpy as jnp

    mask = np.ones(50, bool)
    bits = bitvector.from_bool(jnp.asarray(mask))
    idx, count = bitvector.match_indices(bits, 50, size=10)
    assert int(count) == 50  # true count even when capacity is smaller
    assert list(np.asarray(idx)) == list(range(10))


def test_logical_compose():
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 197  # deliberately not a multiple of 32
    a = rng.random(n) < 0.4
    b = rng.random(n) < 0.4
    wa = bitvector.from_bool(jnp.asarray(a))
    wb = bitvector.from_bool(jnp.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(bitvector.to_bool(bitvector.logical_and(wa, wb), n)), a & b
    )
    np.testing.assert_array_equal(
        np.asarray(bitvector.to_bool(bitvector.logical_or(wa, wb), n)), a | b
    )
    np.testing.assert_array_equal(
        np.asarray(bitvector.to_bool(bitvector.logical_andnot(wa, wb), n)),
        a & ~b,
    )
    nb = bitvector.logical_not(wb, n)
    np.testing.assert_array_equal(np.asarray(bitvector.to_bool(nb, n)), ~b)
    # tail invariant: bits at i >= n stay zero after NOT
    assert int(np.asarray(nb)[-1] >> (n % 32)) == 0
    # popcount composes
    assert int(bitvector.popcount(bitvector.logical_or(wa, wb))) == int(
        (a | b).sum()
    )


def test_rank_matches_cumsum():
    import jax.numpy as jnp

    rng = np.random.default_rng(13)
    n = 300
    mask = rng.random(n) < 0.4
    bits = bitvector.from_bool(jnp.asarray(mask))
    cum = np.concatenate([[0], np.cumsum(mask)])
    for i in [0, 1, 31, 32, 33, 64, 100, 255, 299, n]:
        assert int(bitvector.rank(bits, i)) == int(cum[i]), i

"""Oracle (pure-jnp) semantics tests vs reference golden vectors."""
import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from shared_simd_scan_tpu import bitvector, layout
from shared_simd_scan_tpu.ops import oracle

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "reference_golden_9bit.json").read_text()
)
RAMP509 = np.arange(509, dtype=np.uint32)
TINY12 = np.array([1, 2, 3, 3, 2, 1, 1, 2, 3, 1, 2, 3], dtype=np.uint32)


def test_unpack_golden_ramp509():
    col = layout.pack(RAMP509, 9)
    vals = oracle.unpack(col)
    np.testing.assert_array_equal(np.asarray(vals), RAMP509)
    np.testing.assert_array_equal(
        np.asarray(vals[:16]), np.array(GOLDEN["ramp509_decompressed_first16"])
    )


def test_scan_golden_ramp509():
    col = layout.pack(RAMP509, 9)
    bits, hits = oracle.scan(col, 3)
    assert int(hits) == GOLDEN["ramp509_scan3_hits"]
    assert bitvector.to_bytes(bits, col.n) == bytes(GOLDEN["ramp509_scan3_bits"])


def test_scan_golden_tiny12():
    col = layout.pack(TINY12, 9)
    bits, hits = oracle.scan(col, 3)
    assert int(hits) == 4 == GOLDEN["tiny12_scan3_hits"]
    assert bitvector.to_bytes(bits, col.n) == bytes(GOLDEN["tiny12_scan3_bits"])
    for i in range(col.n):
        assert bool(bitvector.get_bit(bits, i)) == (TINY12[i] == 3)


def test_shared_scan_golden_tiny12():
    col = layout.pack(TINY12, 9)
    bits, counts = oracle.shared_scan(col, [1, 2, 3])
    for kid, key in enumerate([1, 2, 3]):
        assert bitvector.to_bytes(bits[kid], col.n) == bytes(
            GOLDEN[f"tiny12_shared_k{key}_bits"]
        )
        assert int(counts[kid]) == int(np.sum(TINY12 == key))


@pytest.mark.parametrize("width", list(range(1, 32)))
def test_unpack_roundtrip_all_widths(width):
    rng = np.random.default_rng(width + 300)
    n = 1021
    values = rng.integers(0, 1 << width, size=n, dtype=np.uint64).astype(np.uint32)
    col = layout.pack(values, width)
    np.testing.assert_array_equal(np.asarray(oracle.unpack(col)), values)


@pytest.mark.parametrize("width", [1, 4, 9, 13, 17, 31])
@pytest.mark.parametrize("n", [1, 7, 32, 33, 509, 4096])
def test_scan_matches_numpy(width, n):
    rng = np.random.default_rng(width * 1000 + n)
    values = rng.integers(0, min(1 << width, 16), size=n, dtype=np.uint64).astype(np.uint32)
    col = layout.pack(values, width)
    key = 3 % (1 << width)
    bits, hits = oracle.scan(col, key)
    expect = values == key
    assert int(hits) == int(expect.sum())
    np.testing.assert_array_equal(np.asarray(bitvector.to_bool(bits, n)), expect)
    # tail bits beyond n are zero (scalar-oracle semantics, SURVEY.md §5)
    if n % 32:
        tail = np.asarray(bits)[-1] >> (n % 32)
        assert tail == 0


def test_shared_scan_linear_interleaving():
    col = layout.pack(TINY12, 9)
    lin = oracle.shared_scan_linear(col, [2, 3])
    bits2, _ = oracle.scan(col, 2)
    bits3, _ = oracle.scan(col, 3)
    b2 = bitvector.to_bytes(bits2, col.n)
    b3 = bitvector.to_bytes(bits3, col.n)
    lin_np = np.asarray(lin)
    # stride-k de-interleave, as in the reference's checker (benchmark.cpp:123-140)
    np.testing.assert_array_equal(lin_np[0::2], np.frombuffer(b2, np.uint8))
    np.testing.assert_array_equal(lin_np[1::2], np.frombuffer(b3, np.uint8))


def test_scan_key_zero_tail_is_zero():
    # key == 0 must not match padding values beyond n
    values = np.zeros(37, np.uint32)
    col = layout.pack(values, 9)
    bits, hits = oracle.scan(col, 0)
    assert int(hits) == 37
    assert np.asarray(bits)[-1] >> (37 % 32) == 0

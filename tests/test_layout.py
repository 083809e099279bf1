"""Layout + packing tests, incl. byte-parity vs the C++ reference.

Golden vectors in tests/golden/reference_golden_9bit.json were produced by
compiling the reference (/root/reference) and dumping its buffers for the
two Catch2 corpora (test/simd_scan_tests.cpp:6-14, 47-48).
"""
import json
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

from shared_simd_scan_tpu import layout

GOLDEN = json.loads(
    (pathlib.Path(__file__).parent / "golden" / "reference_golden_9bit.json").read_text()
)

RAMP509 = np.arange(509, dtype=np.uint32)  # (1<<9)-3, exercises straddling
TINY12 = np.array([1, 2, 3, 3, 2, 1, 1, 2, 3, 1, 2, 3], dtype=np.uint32)


def _pack_bits_python(values, width):
    """Independent python-int bitstream packer (second oracle)."""
    big = 0
    for i, v in enumerate(values):
        big |= (int(v) & ((1 << width) - 1)) << (i * width)
    nbytes = (len(values) * width + 7) // 8
    return big.to_bytes(nbytes, "little")


def test_pack_golden_ramp509():
    col = layout.pack(RAMP509, 9)
    assert col.to_bytes() == bytes(GOLDEN["ramp509_packed"])


def test_pack_golden_tiny12():
    col = layout.pack(TINY12, 9)
    assert col.to_bytes() == bytes(GOLDEN["tiny12_packed"])


@pytest.mark.parametrize("width", list(range(1, 32)))
def test_pack_matches_python_oracle(width):
    rng = np.random.default_rng(width)
    n = 517  # not a multiple of 32 or 64 bits -> straddles + partial block
    values = rng.integers(0, 1 << width, size=n, dtype=np.uint64).astype(np.uint32)
    col = layout.pack(values, width)
    assert col.to_bytes() == _pack_bits_python(values, width)


@pytest.mark.parametrize("width", [1, 2, 3, 7, 8, 9, 15, 16, 17, 24, 31])
def test_from_bytes_roundtrip(width):
    rng = np.random.default_rng(width + 100)
    n = 259
    values = rng.integers(0, 1 << width, size=n, dtype=np.uint64).astype(np.uint32)
    col = layout.pack(values, width)
    col2 = layout.PackedColumn.from_bytes(col.to_bytes(), width, n)
    assert col.to_bytes() == col2.to_bytes()
    np.testing.assert_array_equal(np.asarray(col.words), np.asarray(col2.words))


@pytest.mark.parametrize("width", [1, 5, 9, 16, 23, 31])
def test_device_relayout_roundtrip(width):
    rng = np.random.default_rng(width + 200)
    n = 4097
    values = rng.integers(0, 1 << width, size=n, dtype=np.uint64).astype(np.uint32)
    col = layout.pack(values, width)
    dev = layout.to_device(col)
    assert dev.tiles.shape[0] == width
    assert dev.tiles.shape[2] == layout.LANES
    back = layout.to_canonical(dev)
    np.testing.assert_array_equal(np.asarray(col.words), np.asarray(back.words))
    # pack_device agrees with pack + to_device
    dev2 = layout.pack_device(values, width)
    np.testing.assert_array_equal(np.asarray(dev.tiles), np.asarray(dev2.tiles))


def test_unpack_schedule_invariants():
    for width in range(1, 32):
        sched = layout.unpack_schedule(width)
        assert len(sched) == 32
        for r, (k, s, straddles) in enumerate(sched):
            assert k * 32 + s == r * width
            assert straddles == (s + width > 32)
            if straddles:
                assert k + 1 <= width - 1  # blocks never read neighbours


def test_buffer_contracts():
    assert layout.packed_nbytes(9, 509) == (509 * 9 + 7) // 8
    assert layout.packed_words(9, 32) == 9
    assert layout.num_blocks(33) == 2
    assert layout.bitvector_words(32) == 1
    assert layout.bitvector_words(33) == 2


def test_bad_width_rejected():
    with pytest.raises(ValueError):
        layout.pack(TINY12, 0)
    with pytest.raises(ValueError):
        layout.pack(TINY12, 32)


def test_count_overflow_guard():
    # hit counts are uint32 end-to-end; columns are capped at 2^32 - 1
    # values at construction so a key can never match 2^32 rows and wrap
    # (the reference's POPCNT accumulation contract, simd_scan.cpp:153,
    # has the same silent limit — here it is loud)
    with pytest.raises(ValueError, match="MAX_VALUES"):
        layout.PackedColumn(width=1, n=1 << 32, words=jnp.zeros(1, jnp.uint32))
    with pytest.raises(ValueError, match="MAX_VALUES"):
        layout.DeviceColumn(
            width=1, n=1 << 32, tiles=jnp.zeros((1, 8, 128), jnp.uint32)
        )
    # the boundary value itself is allowed
    layout.DeviceColumn(
        width=1, n=(1 << 32) - 1, tiles=jnp.zeros((1, 8, 128), jnp.uint32)
    )

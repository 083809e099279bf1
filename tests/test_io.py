"""Column/bitvector persistence tests."""
import numpy as np

from shared_simd_scan_tpu import io, layout
from shared_simd_scan_tpu.ops import oracle


def test_column_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << 9, 10_007, dtype=np.uint32)
    col = layout.pack(vals, 9)
    p = tmp_path / "col.sss"
    io.save_column(col, p)
    col2 = io.load_column(p)
    assert (col2.width, col2.n) == (9, 10_007)
    assert col2.to_bytes() == col.to_bytes()
    np.testing.assert_array_equal(np.asarray(oracle.unpack(col2)), vals)


def test_bitvector_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 32, 5_001, dtype=np.uint32)
    col = layout.pack(vals, 5)
    bits, hits = oracle.scan(col, 7)
    p = tmp_path / "bits.sss"
    io.save_bitvector(bits, col.n, p)
    bits2, n2 = io.load_bitvector(p)
    assert n2 == col.n
    np.testing.assert_array_equal(np.asarray(bits2), np.asarray(bits))


def test_reject_wrong_kind(tmp_path):
    rng = np.random.default_rng(2)
    col = layout.pack(rng.integers(0, 4, 100, dtype=np.uint32), 2)
    p = tmp_path / "col.sss"
    io.save_column(col, p)
    import pytest

    with pytest.raises(ValueError):
        io.load_bitvector(p)


def test_load_truncated_column_raises(tmp_path):
    import pytest
    from shared_simd_scan_tpu import io as sss_io

    rng = np.random.default_rng(3)
    col = layout.pack(rng.integers(0, 512, 5_000, dtype=np.uint32), 9)
    p = tmp_path / "col.sss"
    sss_io.save_column(col, p)
    data = p.read_bytes()
    p.write_bytes(data[: len(data) - 100])  # truncate payload
    with pytest.raises(ValueError, match="truncated"):
        sss_io.load_column(p)


def test_load_truncated_bitvector_raises(tmp_path):
    import pytest
    from shared_simd_scan_tpu import bitvector as bv
    from shared_simd_scan_tpu import io as sss_io

    bits = bv.from_bool(np.arange(10_000) % 3 == 0)
    p = tmp_path / "bits.sss"
    sss_io.save_bitvector(bits, 10_000, p)
    data = p.read_bytes()
    p.write_bytes(data[: len(data) - 10])
    with pytest.raises(ValueError, match="truncated"):
        sss_io.load_bitvector(p)


def test_table_roundtrip(tmp_path):
    rng = np.random.default_rng(9)
    n = 5_000
    cols = {
        "price": layout.pack(rng.integers(0, 512, n, np.uint32), 9),
        "region": layout.pack(rng.integers(0, 32, n, np.uint32), 5),
    }
    io.save_table(cols, tmp_path / "t")
    loaded = io.load_table(tmp_path / "t")
    assert set(loaded) == {"price", "region"}
    for name in cols:
        assert loaded[name].to_bytes() == cols[name].to_bytes()
        assert loaded[name].width == cols[name].width


def test_table_mixed_n_rejected(tmp_path):
    import pytest as _pytest

    a = layout.pack(np.arange(100, dtype=np.uint32) % 8, 3)
    b = layout.pack(np.arange(200, dtype=np.uint32) % 8, 3)
    with _pytest.raises(ValueError, match="share n"):
        io.save_table({"a": a, "b": b}, tmp_path / "t2")


def test_table_manifest_mismatch_detected(tmp_path):
    a = layout.pack(np.arange(64, dtype=np.uint32) % 8, 3)
    io.save_table({"a": a}, tmp_path / "t3")
    # corrupt: overwrite the column with a different-width one
    io.save_column(layout.pack(np.arange(64, dtype=np.uint32) % 8, 4),
                   tmp_path / "t3" / "a.sss")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="disagrees"):
        io.load_table(tmp_path / "t3")


def test_load_table_rejects_escaping_manifest(tmp_path):
    import json
    import pytest as _pytest

    a = layout.pack(np.arange(64, dtype=np.uint32) % 8, 3)
    io.save_table({"a": a}, tmp_path / "t4")
    m = json.loads((tmp_path / "t4" / "MANIFEST.json").read_text())
    m["../escape"] = m.pop("a")
    (tmp_path / "t4" / "MANIFEST.json").write_text(json.dumps(m))
    with _pytest.raises(ValueError, match="bad column name"):
        io.load_table(tmp_path / "t4")

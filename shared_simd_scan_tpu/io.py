"""Column persistence: save/load packed columns and match bitvectors.

The reference persists nothing (SURVEY.md §5.4 — all data synthesized
per run); a production scan service needs durable compressed columns, so
this is a deliberate capability extension.  The on-disk payload is the
canonical LSB-first bitstream — byte-identical to the reference's in-memory
buffer — behind a small self-describing header, so files interoperate with
anything that speaks the reference layout.

Format (little-endian):
    magic   4s   b"SSS1"
    kind    u8   1 = packed column, 2 = bitvector
    width   u8   bit width (column) / 0 (bitvector)
    _pad    u16  zero
    n       u64  value count (column) / bit count (bitvector)
    payload ceil(n*width/8) bytes (column) / ceil(n/8) bytes (bitvector)
"""
from __future__ import annotations

import pathlib
import struct

import jax
import numpy as np

from shared_simd_scan_tpu import bitvector as bv
from shared_simd_scan_tpu.layout import PackedColumn, packed_nbytes

MAGIC = b"SSS1"
_HEADER = struct.Struct("<4sBBHQ")
KIND_COLUMN = 1
KIND_BITVECTOR = 2


def save_column(col: PackedColumn, path) -> None:
    payload = col.to_bytes()
    with open(path, "wb") as f:
        f.write(_HEADER.pack(MAGIC, KIND_COLUMN, col.width, 0, col.n))
        f.write(payload)


def load_column(path) -> PackedColumn:
    data = pathlib.Path(path).read_bytes()
    magic, kind, width, _, n = _HEADER.unpack_from(data)
    if magic != MAGIC or kind != KIND_COLUMN:
        raise ValueError(f"{path}: not a packed-column file")
    need = packed_nbytes(width, n)
    payload = data[_HEADER.size : _HEADER.size + need]
    if len(payload) < need:
        raise ValueError(
            f"{path}: truncated column payload ({len(payload)} of {need} bytes)"
        )
    return PackedColumn.from_bytes(payload, width, n)


def save_table(columns: dict, dirpath) -> None:
    """Persist a dict of named PackedColumns as a directory: one
    ``<name>.sss`` file per column plus a ``MANIFEST.json`` recording
    (name, width, n).  Columns must share n (one table)."""
    import json

    d = pathlib.Path(dirpath)
    d.mkdir(parents=True, exist_ok=True)
    ns = {c.n for c in columns.values()}
    if len(ns) > 1:
        raise ValueError(f"table columns must share n, got {sorted(ns)}")
    manifest = {}
    for name, col in columns.items():
        if "/" in name or name.startswith("."):
            raise ValueError(f"bad column name: {name!r}")
        save_column(col, d / f"{name}.sss")
        manifest[name] = {"width": col.width, "n": col.n}
    (d / "MANIFEST.json").write_text(json.dumps(manifest, indent=1))


def load_table(dirpath) -> dict:
    """Load a table directory -> dict of named PackedColumns (validated
    against the manifest)."""
    import json

    d = pathlib.Path(dirpath)
    manifest = json.loads((d / "MANIFEST.json").read_text())
    out = {}
    for name, meta in manifest.items():
        if "/" in name or "\\" in name or name.startswith("."):
            # same validation as save_table: a hand-edited manifest must
            # not escape the table directory
            raise ValueError(f"bad column name in manifest: {name!r}")
        col = load_column(d / f"{name}.sss")
        if col.width != meta["width"] or col.n != meta["n"]:
            raise ValueError(
                f"{name}: file disagrees with manifest "
                f"({col.width}/{col.n} vs {meta['width']}/{meta['n']})"
            )
        out[name] = col
    return out


def save_bitvector(bits: jax.Array, n: int, path) -> None:
    """bits: canonical uint32 bitvector words for n values."""
    with open(path, "wb") as f:
        f.write(_HEADER.pack(MAGIC, KIND_BITVECTOR, 0, 0, n))
        f.write(bv.to_bytes(bits, n))


def load_bitvector(path) -> tuple[jax.Array, int]:
    data = pathlib.Path(path).read_bytes()
    magic, kind, _, _, n = _HEADER.unpack_from(data)
    if magic != MAGIC or kind != KIND_BITVECTOR:
        raise ValueError(f"{path}: not a bitvector file")
    need = (n + 7) // 8
    payload = data[_HEADER.size : _HEADER.size + need]
    if len(payload) < need:
        raise ValueError(
            f"{path}: truncated bitvector payload ({len(payload)} of {need} bytes)"
        )
    return bv.from_bytes(payload, n), n

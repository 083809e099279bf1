"""Binary pretty-printers (U1: reference src/util.cpp:15-49).

``dump_byte`` / ``dump_memory`` render packed buffers bit-by-bit, LSB-first
within each byte — matching the storage order of the packed column and
match bitvectors so a printed dump reads as the value stream left-to-right.
"""
from __future__ import annotations

import jax
import numpy as np


def dump_byte(b: int) -> str:
    """One byte, LSB first (the stream order), e.g. 5 -> '10100000'."""
    return "".join("1" if (int(b) >> i) & 1 else "0" for i in range(8))


def dump_memory(buf, max_bytes: int = 64) -> str:
    """Hex-offset lines of LSB-first bit groups for any uint buffer
    (jax array, numpy array, or bytes)."""
    if isinstance(buf, (bytes, bytearray)):
        raw = np.frombuffer(bytes(buf), dtype=np.uint8)
    else:
        raw = np.asarray(jax.device_get(buf)).view(np.uint8).reshape(-1)
    raw = raw[:max_bytes]
    lines = []
    for off in range(0, len(raw), 8):
        row = " ".join(dump_byte(b) for b in raw[off : off + 8])
        lines.append(f"{off:#06x}  {row}")
    return "\n".join(lines)

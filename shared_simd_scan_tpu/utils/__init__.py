"""Utilities: profiling/timing and debug dumps (reference L2 support layer)."""

from shared_simd_scan_tpu.utils.profiling import (  # noqa: F401
    ProfileSample,
    clock_ns,
    get_sample,
    profile_block,
    reset_samples,
    trace,
)
from shared_simd_scan_tpu.utils.debug import dump_byte, dump_memory  # noqa: F401

"""Test configuration: force CPU with 8 virtual devices.

Multi-chip sharding logic is tested on a virtual CPU mesh (the standard JAX
trick; the reference never needed one — it is single-node CPU-only,
SURVEY.md §4).  Pallas kernels run in interpreter mode on CPU.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

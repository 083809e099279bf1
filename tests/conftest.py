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

# Persistent compilation cache: XLA CPU compiles dominate suite runtime;
# cache across runs (and across xdist workers) makes re-runs fast.
import jax  # noqa: E402

# The environment's sitecustomize may register a TPU plugin and force
# jax_platforms at import time; override it back — tests run on the
# virtual 8-device CPU platform regardless.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

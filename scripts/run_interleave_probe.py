"""Relayout-only formulation probe (diagnostic for the linear export).

Times JUST the (k, W) -> linear interleave on random bits at 512 MiB
scale, isolating the relayout from the scan: pallas-MXU kernel vs
XLA-native matmul twin vs the chunked XLA stack.  If the XLA matmul is
fast where the Pallas dot is slow, Mosaic is not placing the in-kernel
dot_general on the MXU.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/run_interleave_probe.py [--k=8]
"""
import functools
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp  # noqa: E402

from shared_simd_scan_tpu.bench.timing import measure_loop  # noqa: E402
from shared_simd_scan_tpu.ops import linear as linear_ops  # noqa: E402


def main(argv):
    k = 8
    W = 14_913_081  # bitvector words of the 512 MiB / w=9 column
    for a in argv:
        if a.startswith("--k="):
            k = int(a.split("=", 1)[1])
        elif a.startswith("--w="):
            W = int(a.split("=", 1)[1])
    # cap the (k, W) working set at ~1 GiB so large-k probes fit on-chip
    # (in + out + chain headroom); GB/s stays comparable, regime noted
    W = min(W, (1 << 28) // k)
    rng = np.random.default_rng(1)
    bits = jnp.asarray(
        rng.integers(0, 1 << 31, size=(k, W), dtype=np.uint32)
    )
    nbytes = W * 4

    nwords = W * k
    variants = [
        ("pallas-words-tw128",
         lambda b: linear_ops.interleave_mxu_words(b, nwords, tw=128)),
        ("pallas-words-tw256",
         lambda b: linear_ops.interleave_mxu_words(b, nwords, tw=256)),
        ("pallas-words-s8-tw256",
         lambda b: linear_ops.interleave_mxu_words(
             b, nwords, tw=256, dot="s8")),
        ("pallas-words-s8-tw128",
         lambda b: linear_ops.interleave_mxu_words(
             b, nwords, tw=128, dot="s8")),
        ("xla-mxu-words",
         lambda b: linear_ops.interleave_xla_mxu_words(b, nwords)),
        # the chunked XLA stack: its cost is the 128/k-x padded minor-dim
        # stack, which VANISHES as k approaches the 128-lane tile — probe
        # with --variant=stack at k=8/32/128 to map the large-k floor
        ("xla-stack",
         lambda b: linear_ops.interleave_xla_stack(b, nbytes)),
    ]
    want = None
    for a in argv:
        if a.startswith("--variant="):
            want = a.split("=", 1)[1]
    if want:
        variants = [v for v in variants if want in v[0]]
    for name, fn in variants:
        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(b, salt, k, fn=fn):
            def body(i, carry):
                bb, acc = carry
                bb = bb.at[0, 0].set(salt + jnp.uint32(i))
                out = fn(bb)
                return bb, acc + jnp.sum(out)

            _, acc = jax.lax.fori_loop(0, k, body, (b, jnp.uint32(0)))
            return acc

        m = measure_loop(
            chain, (bits,), trials=3,
            est_iter_s=2 * 4 * W * k / 100e9,
            salt0=(abs(hash(name)) + int(time.time())) % 1_000_000,
        )
        gbs = 2 * 4 * W * k / m.seconds / 1e9  # read + write
        print(f"{name}: {m.millis:.3f} ms ({gbs:.1f} GB/s r+w)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

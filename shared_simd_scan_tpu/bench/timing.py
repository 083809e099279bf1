"""Device-side kernel timing.

The reference times kernels with a host ns stopwatch around each call
(src/profiling.cpp:6-13 ``_clock``; src/benchmark.cpp:63-68).  That is
unusable on this TPU setup for two reasons measured empirically:

1. Host<->device round trips cost ~1-50 ms of noisy RPC latency (the chip
   may sit behind a relay), dwarfing sub-10ms kernels.
2. The execution path may *cache replays*: submitting the identical
   computation with identical inputs can return without re-executing, so
   repeat-timing the same call measures nothing.

Methodology here:
- Chain K data-dependent iterations of the kernel inside ONE jitted
  ``lax.fori_loop`` computation that reduces to a scalar, and fetch the
  scalar (a tiny sync transfer) to mark completion.
- Give every timed submission a fresh *salt* folded into the input so no
  two submissions are byte-identical.
- Run at two loop counts K_lo < K_hi; per-iteration time is
  ``(T_hi - T_lo) / (K_hi - K_lo)``, cancelling fixed submission/fetch
  overhead.  Repeat ``trials`` times and keep the median.

Each benchmark supplies a ``chain(x, salt, k) -> scalar`` function whose
loop body must consume the salt (or the loop index) so iterations are
data-dependent and XLA can neither hoist the kernel out of the loop nor
elide it.
"""
from __future__ import annotations

import dataclasses
import statistics
import time
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class Measurement:
    """Per-iteration kernel time plus the raw two-point samples."""

    seconds: float          # median per-iteration seconds
    per_trial: list[float]  # per-iteration seconds of each trial
    k_lo: int
    k_hi: int

    @property
    def millis(self) -> float:
        return self.seconds * 1e3


def timer_resolution_ns() -> float:
    """Median delta of back-to-back perf_counter_ns reads (the reference's
    ``test_timer`` probe, src/benchmark_misc.cpp:54-70)."""
    deltas = []
    for _ in range(1000):
        a = time.perf_counter_ns()
        b = time.perf_counter_ns()
        deltas.append(b - a)
    deltas.sort()
    return float(deltas[len(deltas) // 2])


def _fetch(x) -> float:
    """Synchronously materialize a scalar result on the host."""
    return float(jax.device_get(x))


def measure_loop(
    chain: Callable[..., jax.Array],
    args: tuple,
    k_lo: int = 8,
    k_hi: int | None = None,
    trials: int = 3,
    salt0: int = 0,
    target_s: float = 0.35,
    est_iter_s: float | None = None,
) -> Measurement:
    """Time ``chain(*args, salt, k)`` per iteration.

    ``chain`` must be jit-compatible with ``k`` static and return a scalar.
    Submission/fetch overhead is tens of ms with multi-ms jitter, so
    ``(k_hi - k_lo) * per_iter`` should comfortably exceed ~100 ms for a
    clean signal; when ``k_hi`` is None it is sized so the differenced span
    is ~``target_s`` seconds — from ``est_iter_s`` (an a-priori per-iteration
    estimate, e.g. traffic/plausible-bandwidth; preferred, saves a compile)
    or else from a pilot two-point probe.  Medians over ``trials``
    submissions of each loop count are differenced (more robust than
    differencing per-trial pairs).
    """
    salt = salt0
    # compile the low loop count (uncached first execution)
    _fetch(chain(*args, jnp.uint32(salt), k_lo)); salt += 1

    if k_hi is None and est_iter_s is not None:
        span = min(max(int(target_s / max(est_iter_s, 1e-6)), 64), 16384)
        k_hi = k_lo + ((span + 127) // 128) * 128

    if k_hi is None:
        k_probe = 4 * k_lo
        _fetch(chain(*args, jnp.uint32(salt), k_probe)); salt += 1  # compile
        t0 = time.perf_counter()
        _fetch(chain(*args, jnp.uint32(salt), k_lo)); salt += 1
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _fetch(chain(*args, jnp.uint32(salt), k_probe)); salt += 1
        t_pr = time.perf_counter() - t0
        per = max((t_pr - t_lo) / (k_probe - k_lo), 20e-6)
        span = min(max(int(target_s / per), 64), 16384)
        k_hi = k_lo + ((span + 127) // 128) * 128  # round: reuse compiles

    # compile the high loop count
    _fetch(chain(*args, jnp.uint32(salt), k_hi)); salt += 1

    lo, hi = [], []
    for _ in range(trials):
        t0 = time.perf_counter()
        _fetch(chain(*args, jnp.uint32(salt), k_lo)); salt += 1
        lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        _fetch(chain(*args, jnp.uint32(salt), k_hi)); salt += 1
        hi.append(time.perf_counter() - t0)
    per = [max(h - l, 1e-9) / (k_hi - k_lo) for h, l in zip(hi, lo)]
    sec = max(statistics.median(hi) - statistics.median(lo), 1e-9) / (k_hi - k_lo)
    return Measurement(seconds=sec, per_trial=per, k_lo=k_lo, k_hi=k_hi)

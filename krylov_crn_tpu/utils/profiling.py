"""Measurement utilities that survive asynchronous runtimes.

Hard-won methodology (see PERF.md): on this TPU's relayed PJRT transport,
``block_until_ready`` can acknowledge before device execution completes, so
naive dispatch loops report fantasy throughput. Reliable numbers require
(a) forcing a scalar host fetch of a value data-dependent on the work, and
(b) making repeated work iterations data-dependent so XLA's loop-invariant
code motion cannot hoist the body out of a timing scan.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["timed_scalar", "device_time_per_call", "roofline_fraction"]


def timed_scalar(fn: Callable, *args, reps: int = 3) -> float:
    """min wall time of fn(*args) where fn returns a scalar (fetched)."""
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def device_time_per_call(make_chained: Callable[[int], Callable], args,
                         k1: int = 1, k2: int = 17, reps: int = 3) -> float:
    """Per-call device time via chained-difference timing.

    ``make_chained(k)`` must return a jitted fn running k *data-dependent*
    iterations of the workload and returning a scalar. The difference
    (T(k2) - T(k1)) / (k2 - k1) cancels dispatch/transfer overheads.
    """
    t1 = timed_scalar(make_chained(k1), *args, reps=reps)
    t2 = timed_scalar(make_chained(k2), *args, reps=reps)
    return max((t2 - t1) / (k2 - k1), 0.0)


# nominal HBM bandwidth per chip, bytes/s (TPU v5e)
HBM_BYTES_PER_S = 819e9


def roofline_fraction(bytes_moved: float, seconds: float,
                      peak: float = HBM_BYTES_PER_S) -> float:
    """Fraction of the HBM roofline achieved by a bandwidth-bound op."""
    if seconds <= 0:
        return float("nan")
    return (bytes_moved / seconds) / peak

"""Global configuration: dtype policy and x64 handling.

The reference implementation is all-fp64 NumPy/SciPy. On TPU the fast path
is fp32 (gathers, segment sums, MXU GEMVs); fp64 exists but is emulated and
slow for bulk work. The policy here:

* bulk arrays (sparse values, iterates, Lanczos basis) — ``compute_dtype``
  (fp32 on TPU by default);
* scalar-critical math (Lanczos coefficients, the m x m tridiagonal
  eigenproblem, the secular-equation Newton iteration, loss reductions) —
  ``accum_dtype`` (fp64 when x64 is enabled, else fp32).

Tests run on CPU with x64 enabled and everything fp64, which reproduces the
reference numerics exactly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def enable_x64(enable: bool = True) -> None:
    """Enable 64-bit types in JAX (idempotent).

    Must be called before the first jitted computation for best results;
    JAX supports toggling later but recompiles everything.
    """
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


@dataclasses.dataclass(frozen=True)
class Precision:
    """Dtype policy threaded through kernels and solvers."""

    compute_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype | None = None  # None -> f64 if x64 else compute

    @property
    def accum(self):
        if self.accum_dtype is not None:
            return jnp.dtype(self.accum_dtype)
        if x64_enabled():
            return jnp.dtype(jnp.float64)
        return jnp.dtype(self.compute_dtype)

    @property
    def compute(self):
        return jnp.dtype(self.compute_dtype)


def enable_compilation_cache(path: str = "/root/.cache/jax_comp",
                             min_compile_secs: float = 2.0) -> None:
    """Persistent XLA compilation cache — compiles on this stack can cold-
    start in minutes (see PERF.md), so caching across processes matters."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass


def default_precision() -> Precision:
    """fp64 everywhere when x64 is on (CPU verification), else fp32+fp64."""
    if x64_enabled():
        return Precision(compute_dtype=jnp.float64)
    return Precision(compute_dtype=jnp.float32)

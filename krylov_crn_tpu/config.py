"""Global configuration: x64 handling and the XLA compilation cache.

The reference implementation is all-fp64 NumPy/SciPy. On TPU the fast path
is fp32 (MXU GEMVs, dense HBM streaming); fp64 exists but is emulated and
slow for bulk work. The dtype policy is threaded per-solver through the
``accum_dtype`` argument of the jitted step functions (fp64 when x64 is
enabled, else the compute dtype with two-float compensated reductions —
see ops/math.py). Tests run on CPU with x64 enabled and everything fp64,
which reproduces the reference numerics exactly.
"""

from __future__ import annotations

import jax


def enable_x64(enable: bool = True) -> None:
    """Enable 64-bit types in JAX (idempotent).

    Must be called before the first jitted computation for best results;
    JAX supports toggling later but recompiles everything.
    """
    jax.config.update("jax_enable_x64", enable)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


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

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


def pin_fp32_matmul_precision() -> None:
    """Make fp32 matrix-matrix products actually fp32 on TPU.

    Measured on the attached v5e (see PERF.md round-3): at the DEFAULT
    matmul precision, fp32 *matrix-matrix* products (both operands rank-2,
    any row count — even a 21x10 @ 10xn) lower to one bf16 MXU pass with
    ~2.4e-3 relative error, while matrix-vector products take the VPU
    reduction path and stay fp32-accurate (~1.3e-7) at every setting.
    A solver chasing 1e-8 suboptimality gaps cannot survive silent bf16
    in its fp32 algebra, so the package pins the global default to
    HIGHEST (6-pass bf16 decomposition, fp32-grade). Deliberately
    low-precision paths keep working: bf16 x bf16 inputs are native
    single-pass regardless of this setting.
    """
    jax.config.update("jax_default_matmul_precision", "highest")


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

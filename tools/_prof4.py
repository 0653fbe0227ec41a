"""End-to-end rcv1 race with the round-4 protocol (chunk=32, certify)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from krylov_crn_tpu.config import enable_compilation_cache
enable_compilation_cache()
from krylov_crn_tpu.data.synthetic import synthetic_logreg
from krylov_crn_tpu.models.logistic import LogisticRegression
from krylov_crn_tpu.solvers.krylov_gram import GramKrylov, gram_krylov_multistep
from krylov_crn_tpu.solvers.krylov_crn import _accum_dtype

t0 = time.perf_counter()
float(jnp.zeros(8)[0])
print(f"client init: {time.perf_counter()-t0:.2f}s", flush=True)

M, CHUNK, OUR_IT_MAX = 10, 32, 64
A, b = synthetic_logreg("rcv1-like", seed=0)
x0 = np.ones(A.shape[1]) * 0.5
dtype = np.float32
loss = LogisticRegression(A, b, dtype=dtype, want_dense=False)
alg = GramKrylov(loss=loss, reg_coef=1e-3, subspace_dim=M, tolerance=0,
                 tqdm=False, label="gram")

t0 = time.perf_counter()
alg.init_run(jnp.asarray(x0, dtype), 42)
alg.initialized = True
build_s = time.perf_counter() - t0
print(f"build_s (init_run): {build_s:.2f}s", flush=True)

kw = dict(m=M, l2=0.0, beta=0.5, solver_eps=1e-8, solver_it_max=100,
          ls_max=20, reorth_passes=1,
          accum_dtype=_accum_dtype(jnp.dtype(dtype)), reg_ceil=1e6)
t0 = time.perf_counter()
for lr in (True, False):
    st, _ = gram_krylov_multistep(alg.gd, alg.state, chunk=CHUNK,
                                  use_lr=lr, stack_reps=True, **kw)
    float(st.value)
print(f"warmup: {time.perf_counter()-t0:.2f}s", flush=True)
from krylov_crn_tpu.solvers.krylov_gram import _apply_correction, _checkpoint_of
npad = alg.gd.n_padded
_apply_correction(alg.state, jnp.zeros(5 * npad, dtype), npad)
_checkpoint_of(alg.gd, alg.state, _accum_dtype(jnp.dtype(dtype)))

t0 = time.perf_counter()
trace = alg.run_fused(x0, it_max=OUR_IT_MAX, chunk=CHUNK, certify=True)
run_s = time.perf_counter() - t0
print(f"run_fused total (incl. post-hoc certify): {run_s:.2f}s", flush=True)

ex_its = list(trace.metrics["exact_its"])
fs = np.asarray(trace.metrics["exact_fs"])
it_to_t = dict(zip(trace.its, trace.ts))
ts = np.asarray([it_to_t[i] for i in ex_its])
f_star_proxy = fs.min()
print(f"exact pts: {len(ex_its)} (full resolution: {ex_its[:3]}..{ex_its[-1]})")
print(f"f min: {f_star_proxy:.12f}")
# crossing vs the known r4 f* proxy (own min); report a few gap levels
for gap in (1e-6, 1e-8):
    idx = np.argmax(fs - f_star_proxy <= gap)
    print(f"gap<={gap:g}: it={ex_its[idx]} t={ts[idx]:.2f}s")
print("rollbacks:", trace.metrics.get("rollback_its"))
print(f"TOTAL (build + crossing@1e-8 proxy): "
      f"{build_s + ts[np.argmax(fs - f_star_proxy <= 1e-8)]:.2f}s")

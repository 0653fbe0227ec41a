"""A/B: bf16 head (current) vs fp32-from-start on the v4 rcv1 race."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from krylov_crn_tpu.config import enable_compilation_cache
enable_compilation_cache()
from krylov_crn_tpu.data.synthetic import synthetic_logreg
from krylov_crn_tpu.models.logistic import LogisticRegression
from krylov_crn_tpu.solvers.krylov_gram import GramKrylov

float(jnp.zeros(8)[0])
M, CHUNK = 10, 32
A, b = synthetic_logreg("rcv1-like", seed=0)
x0 = np.ones(A.shape[1]) * 0.5
loss = LogisticRegression(A, b, dtype=np.float32, want_dense=False)
FSTAR = 0.30928795630762923

for mode, use_lr in (("bf16-head", True), ("fp32-start", False)):
    alg = GramKrylov(loss=loss, reg_coef=1e-3, subspace_dim=M, tolerance=0,
                     tqdm=False, label="gram")
    t0 = time.perf_counter()
    alg.init_run(jnp.asarray(x0, np.float32), 42)
    alg.initialized = True
    build_s = time.perf_counter() - t0
    alg._use_lr = use_lr
    alg.warm_fused(chunk=CHUNK, certify=True)
    if not use_lr:
        alg._use_lr = False  # warm_fused doesn't mutate; keep explicit
    trace = alg.run_fused(x0, it_max=64, chunk=CHUNK, certify=True)
    ex_its = list(trace.metrics["exact_its"])
    fs = np.asarray(trace.metrics["exact_fs"])
    it_to_t = dict(zip(trace.its, trace.ts))
    ts = np.asarray([it_to_t[i] for i in ex_its])
    gaps = fs - FSTAR
    hit = (gaps <= 1e-8)
    idx = int(np.argmax(hit)) if hit.any() else None
    cross = f"it={ex_its[idx]} t={ts[idx]:.2f}" if idx is not None else "never"
    print(f"{mode}: build {build_s:.2f}s  cross {cross}  "
          f"final {gaps.min():.2e}  rollbacks={len(trace.metrics.get('rollback_its', []))}",
          flush=True)

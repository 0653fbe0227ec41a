"""v4 rcv1 race detail: per-chunk timings, rollbacks, crossing."""
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
alg = GramKrylov(loss=loss, reg_coef=1e-3, subspace_dim=M, tolerance=0,
                 tqdm=False, label="gram")
t0 = time.perf_counter()
alg.init_run(jnp.asarray(x0, np.float32), 42)
alg.initialized = True
build_s = time.perf_counter() - t0
alg.warm_fused(chunk=CHUNK, certify=True)
trace = alg.run_fused(x0, it_max=64, chunk=CHUNK, certify=True)
ex_its = list(trace.metrics["exact_its"])
fs = np.asarray(trace.metrics["exact_fs"])
it_to_t = dict(zip(trace.its, trace.ts))
ts = np.asarray([it_to_t[i] for i in ex_its])
fstar = 0.30928795630762923  # bench v4 shared f*
gaps = fs - fstar
for g in (1e-6, 1e-7, 1e-8):
    idx = np.argmax(gaps <= g) if (gaps <= g).any() else None
    print(f"gap<={g:g}: it={ex_its[idx] if idx is not None else None} "
          f"t={ts[idx]:.2f}" if idx is not None else f"gap<={g:g}: never")
print("build", round(build_s, 2), "final gap", gaps.min())
print("rollbacks:", trace.metrics.get("rollback_its"))
print("boundary ts:", [round(t,2) for i,t in zip(trace.its, trace.ts) if i % 32 == 0])
print("use_lr flips: gn series head:", [f"{g:.2e}" for g in trace.metrics["grad_norm"][:6]])

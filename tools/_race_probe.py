"""Quick rcv1 race probe with the bench protocol (warm_fused path)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from krylov_crn_tpu.config import enable_compilation_cache
enable_compilation_cache()
from krylov_crn_tpu.data.synthetic import synthetic_logreg
from krylov_crn_tpu.models.logistic import LogisticRegression
from krylov_crn_tpu.solvers.krylov_gram import GramKrylov

t0 = time.perf_counter(); float(jnp.zeros(8)[0])
print(f"client init: {time.perf_counter()-t0:.1f}s", flush=True)
name = sys.argv[1] if len(sys.argv) > 1 else "rcv1-like"
M, CHUNK = 10, 32
A, b = synthetic_logreg(name, seed=0)
x0 = np.ones(A.shape[1]) * 0.5
loss = LogisticRegression(A, b, dtype=np.float32, want_dense=False)
alg = GramKrylov(loss=loss, reg_coef=1e-3, subspace_dim=M, tolerance=0,
                 tqdm=False, label="gram")
t0 = time.perf_counter()
alg.init_run(jnp.asarray(x0, np.float32), 42)
alg.initialized = True
build_s = time.perf_counter() - t0
print(f"build_s: {build_s:.2f}s", flush=True)
t0 = time.perf_counter()
alg.warm_fused(chunk=CHUNK, certify=True)
print(f"warm_fused: {time.perf_counter()-t0:.2f}s", flush=True)
t0 = time.perf_counter()
trace = alg.run_fused(x0, it_max=64, chunk=CHUNK, certify=True)
print(f"run_fused: {time.perf_counter()-t0:.2f}s", flush=True)
ex_its = list(trace.metrics["exact_its"])
fs = np.asarray(trace.metrics["exact_fs"])
it_to_t = dict(zip(trace.its, trace.ts))
ts = np.asarray([it_to_t[i] for i in ex_its])
i = int(np.argmax(fs - fs.min() <= 1e-8))
print(f"crossing(own-min): it={ex_its[i]} t={ts[i]:.2f}s  "
      f"TOTAL={build_s + ts[i]:.2f}s")

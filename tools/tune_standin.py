"""Tune TOPIC_PARAMS so the Krylov floor reaches the true optimum.

Round-3 verdict item 5: on the stand-ins the CG-CRN optimum sits ~6e-7
BELOW every Krylov run's floor (ours fp32 AND the fp64 reference — a
low-curvature valley an m=10/20 Krylov space crawls along), where real
rcv1's Figure 2 shows CRN and Krylov agreeing at ~1e-9. This sweep
searches the topic-generator knobs for a problem whose

  * reference Krylov m=10 still crosses 1e-8 around iteration ~25-40
    (the real Figure-2 convergence profile — the stand-in must not get
    easier than the dataset it stands in for), and
  * benchmark Krylov m=20 at 5x budget floors <= 1e-9 above the TRUE
    optimum (computed independently with scipy Newton-CG in fp64).

Host-CPU only (numpy/scipy + the in-process reference implementation).

Usage: python tools/tune_standin.py [--dataset rcv1-like] [--quick]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def true_optimum(A, b01, f_hint=None):
    """fp64 logistic optimum via scipy trust-ncg with analytic HVP."""
    from scipy.optimize import minimize
    from scipy.special import expit

    n, d = A.shape

    def f(x):
        m = A.dot(x)
        ls = np.where(m < 0, m - np.log1p(np.exp(m)), -np.log1p(np.exp(-m)))
        return float(np.mean((1.0 - b01) * m - ls))

    def g(x):
        m = A.dot(x)
        return A.T.dot(expit(m) - b01) / n

    def hvp(x, v):
        m = A.dot(x)
        s = expit(m)
        return A.T.dot(s * (1.0 - s) * A.dot(v)) / n

    x0 = np.ones(d) * 0.5
    r = minimize(f, x0, jac=g, hessp=hvp, method="trust-ncg",
                 options={"maxiter": 300, "gtol": 1e-12})
    # polish: a second start from the result (trust-ncg can stop early)
    r2 = minimize(f, r.x, jac=g, hessp=hvp, method="trust-ncg",
                  options={"maxiter": 300, "gtol": 1e-13})
    return min(float(r.fun), float(r2.fun))


def run_reference_krylov(A, b, x0, m, it_max):
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")
        numba.njit = lambda f=None, **kw: (f if callable(f)
                                           else (lambda g: g))
        sys.modules["numba"] = numba
    sys.path.insert(0, "/root/reference")
    from optimizer.cubic import Cubic_Krylov_LS
    from optimizer.loss import LogisticRegression as RefLogReg

    loss = RefLogReg(A, b, l1=0, l2=0, store_mat_vec_prod=True)
    alg = Cubic_Krylov_LS(loss=loss, reg_coef=1e-3, subspace_dim=m,
                          tolerance=0, label=f"m{m}", tqdm=False)
    alg.run(x0=x0, it_max=it_max, t_max=600.0)
    alg.compute_loss_of_iterates()
    sys.path.remove("/root/reference")
    return [float(v) for v in alg.trace.loss_vals], float(loss.f_opt)


def eval_config(name, tp, quick=False):
    from krylov_crn_tpu.data.synthetic import synthetic_logreg

    t0 = time.perf_counter()
    A, b = synthetic_logreg(name, seed=0, topic_params=tp)
    b01 = (np.asarray(b) > 0).astype(np.float64)
    x0 = np.ones(A.shape[1]) * 0.5

    f_star = true_optimum(A, b01)
    fs10, best10 = run_reference_krylov(A, b, x0, 10, 64)
    it10 = next((i for i, v in enumerate(fs10) if v - f_star <= 1e-8), None)
    if quick:
        fs20, best20 = [], best10
    else:
        fs20, best20 = run_reference_krylov(A, b, x0, 20, 160)
    res = {
        "params": tp,
        "f_star_ncg": f_star,
        "m10_cross_1e-8_it": it10,
        "m10_floor_gap": min(fs10) - f_star,
        "m20_floor_gap": (min(fs20) - f_star) if fs20 else None,
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="rcv1-like")
    p.add_argument("--quick", action="store_true")
    p.add_argument("--configs", default=None,
                   help="JSON list of topic_params dicts")
    args = p.parse_args()

    if args.configs:
        configs = json.loads(args.configs)
    else:
        configs = [
            dict(R=300, n_clusters=20, own_frac=0.6, pop_exp=1.1),  # current
            dict(R=300, n_clusters=20, own_frac=0.6, pop_exp=0.7),
            dict(R=300, n_clusters=20, own_frac=0.6, pop_exp=0.4),
            dict(R=100, n_clusters=20, own_frac=0.6, pop_exp=0.7),
            dict(R=150, n_clusters=20, own_frac=0.6, pop_exp=0.9),
        ]
    for tp in configs:
        res = eval_config(args.dataset, tp, quick=args.quick)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()

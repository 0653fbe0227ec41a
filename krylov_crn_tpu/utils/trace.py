"""Trace: metric logging, plotting, persistence.

Mirrors the reference Trace (/root/reference/optimizer/opt_trace.py:19-120):
stores subsampled iterates with wall-clock stamps and iteration counters,
lazily evaluates losses over stored iterates, renders gap curves, pickles
(minus the loss handle). Additions for the TPU build: iterates live on
device until needed; ``solver_its`` is first-class; loss re-evaluation can
run in a higher-precision dtype than the solver (fp64 verification pass,
BASELINE.md convergence-parity row).
"""

from __future__ import annotations

import os
import pickle
import warnings
from pathlib import Path

import numpy as np

__all__ = ["Trace"]


class Trace:
    def __init__(self, loss=None, label=None):
        self.loss = loss
        self.label = label
        self.xs = []
        self.ts = []
        self.its = []
        self.loss_vals = []
        self.solver_its = None
        self.its_converted_to_epochs = False
        self.ls_its = None
        # solvers whose checkpoints are compact reps rather than explicit
        # iterates (the Gram solvers) install a rep -> x converter here
        self.materializer = None

    def _iterate(self, x):
        """Explicit iterate for a stored checkpoint (materializing a rep
        through the solver-installed converter when needed)."""
        mat = getattr(self, "materializer", None)
        if mat is not None and not hasattr(x, "shape"):
            return mat(x)
        return x

    def compute_loss_of_iterates(self):
        """Evaluate f at every stored iterate (fresh SpMV each — the
        post-run re-evaluation pass, opt_trace.py:39-43)."""
        if len(self.loss_vals) == 0:
            self.loss_vals = np.asarray(
                [self.loss.value(self._iterate(x)) for x in self.xs]
            )
        else:
            warnings.warn(
                "Loss values have already been computed. Set .loss_vals = []"
                " to recompute."
            )

    def convert_its_to_epochs(self, batch_size=1):
        if self.its_converted_to_epochs:
            warnings.warn(
                "The iteration count has already been converted to epochs."
            )
            return
        its_per_epoch = self.loss.n / batch_size
        self.its = np.asarray(self.its) / its_per_epoch
        self.its_converted_to_epochs = True

    def plot_losses(self, its=None, f_opt=None, label=None, markevery=None,
                    use_ls_its=True, time=False, *args, **kwargs):
        import matplotlib.pyplot as plt

        if label is None:
            label = self.label
        if its is None:
            if use_ls_its and self.ls_its is not None:
                print(f"Line search iteration counter is used for plotting "
                      f"{label}")
                its = self.ls_its
            elif time:
                its = self.ts
            else:
                its = self.its
        if len(self.loss_vals) == 0:
            self.compute_loss_of_iterates()
        if f_opt is None:
            f_opt = self.loss.f_opt
        if markevery is None:
            markevery = max(1, len(self.loss_vals) // 20)
        plt.plot(its, np.asarray(self.loss_vals) - f_opt, label=label,
                 markevery=markevery, *args, **kwargs)
        plt.ylabel(r"$f(x)-f^*$")

    def plot_distances(self, its=None, x_opt=None, label=None, markevery=None,
                       use_ls_its=True, time=False, *args, **kwargs):
        import matplotlib.pyplot as plt

        if its is None:
            if use_ls_its and self.ls_its is not None:
                its = self.ls_its
            elif time:
                its = self.ts
            else:
                its = self.its
        if x_opt is None:
            x_opt = (self._iterate(self.xs[-1])
                     if getattr(self.loss, "x_opt", None) is None
                     else self.loss.x_opt)
        if label is None:
            label = self.label
        if markevery is None:
            markevery = max(1, len(self.xs) // 20)
        dists = [float(np.linalg.norm(np.asarray(self._iterate(x))
                                      - np.asarray(x_opt)) ** 2)
                 for x in self.xs]
        plt.plot(its, dists, label=label, markevery=markevery, *args, **kwargs)
        plt.ylabel(r"$\Vert x-x^*\Vert^2$")

    @property
    def best_loss_value(self):
        if len(self.loss_vals) == 0:
            self.compute_loss_of_iterates()
        return np.min(self.loss_vals)

    def save(self, file_name, path="./results/"):
        """Pickle (iterates as numpy, loss handle dropped; opt_trace.py:102).

        Checkpoints may be plain iterates (arrays) or solver-specific
        pytrees (e.g. the Gram solvers' (gamma, zeta, Ax) reps) — each
        leaf is pulled to host numpy, preserving the structure."""
        import jax

        loss_ref = self.loss
        mat_ref = self.materializer
        self.loss = None
        # a materializer that carries its own loss handle (RepMaterializer)
        # is pickled with the handle nulled and re-attached by from_pickle;
        # anything else (e.g. a solver-bound method) is dropped
        if hasattr(mat_ref, "loss"):
            mat_ref.loss = None
        else:
            self.materializer = None
        xs_ref = self.xs
        self.xs = [jax.tree.map(np.asarray, x) for x in xs_ref]
        Path(path).mkdir(parents=True, exist_ok=True)
        with open(os.path.join(path, file_name), "wb") as f:
            pickle.dump(self, f)
        self.loss = loss_ref
        self.materializer = mat_ref
        if hasattr(mat_ref, "loss"):
            mat_ref.loss = loss_ref
        self.xs = xs_ref

    @classmethod
    def from_pickle(cls, path, loss=None):
        if not os.path.isfile(path):
            return None
        with open(path, "rb") as f:
            trace = pickle.load(f)
        trace.loss = loss
        mat = getattr(trace, "materializer", None)
        if mat is not None and hasattr(mat, "loss"):
            mat.loss = loss
        if loss is not None and len(trace.loss_vals):
            # note: fixes the reference's latent bug at opt_trace.py:119
            # (class-level attribute access instead of the loaded instance)
            loss.f_opt = min(trace.best_loss_value, loss.f_opt)
        return trace

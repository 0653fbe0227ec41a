"""Oracle and Regularizer base classes.

API-parity layer over the functional JAX core: mirrors the reference's
oracle surface (/root/reference/optimizer/loss.py:29-159) — running-best
(f_opt, x_opt) tracking inside ``value`` (loss.py:66-73, which the driver's
empirical f* protocol depends on), seeded RNG, and an l1/l2 regularizer
with proximal operators — while all numerical work happens in jitted
device functions.
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Oracle", "Regularizer"]


class Regularizer:
    """l1 + l2/2 regularizer with proximal operator (reference
    loss.py:116-159). Dense device arrays only — the sparse-iterate path of
    the reference is never exercised by its driver (SURVEY.md §2.1)."""

    def __init__(self, l1=0.0, l2=0.0, coef=None):
        self.l1 = float(l1)
        self.l2 = float(l2)
        self.coef = coef

    def __call__(self, x):
        return self.value(x)

    def value(self, x):
        x = jnp.asarray(x)
        v = 0.0
        if self.l1:
            v = v + self.l1 * jnp.sum(jnp.abs(x))
        if self.l2:
            v = v + self.l2 / 2.0 * jnp.vdot(x, x)
        return v

    def prox_l1(self, x, lr):
        x = jnp.asarray(x)
        a = jnp.abs(x)
        return jnp.sign(x) * (a - jnp.minimum(a, self.l1 * lr))

    def prox_l2(self, x, lr):
        return jnp.asarray(x) / (1.0 + lr * self.l2)

    def prox(self, x, lr):
        return self.prox_l2(self.prox_l1(x, lr), lr)


class Oracle:
    """Base objective. Subclasses provide value/gradient/hessian/HVP."""

    def __init__(self, l1=0.0, l2=0.0, l2_in_prox=False, regularizer=None,
                 seed=42):
        if l1 < 0.0:
            raise ValueError(f"Invalid value for l1 regularization: {l1}")
        if l2 < 0.0:
            raise ValueError(f"Invalid value for l2 regularization: {l2}")
        if l2 == 0.0 and l2_in_prox:
            warnings.warn(
                "The value of l2 is set to 0, so l2_in_prox is changed to "
                "False."
            )
            l2_in_prox = False
        self.l1 = float(l1)
        self.l2 = 0.0 if l2_in_prox else float(l2)
        self.l2_in_prox = l2_in_prox
        self.x_opt = None
        self.f_opt = np.inf
        self.regularizer = regularizer
        self.seed = seed
        if (l1 > 0 or l2_in_prox) and regularizer is None:
            l2_prox = l2 if l2_in_prox else 0.0
            self.regularizer = Regularizer(l1=l1, l2=l2_prox)
        self.rng = np.random.default_rng(seed)

        self._smoothness = None
        self._max_smoothness = None
        self._ave_smoothness = None
        self._hessian_lipschitz = None

    def set_seed(self, seed):
        self.seed = seed
        self.rng = np.random.default_rng(seed)

    def _value(self, x):  # pragma: no cover - abstract
        raise NotImplementedError

    def value(self, x):
        """Objective value with running-best tracking (loss.py:66-73)."""
        value = self._value(x)
        if self.regularizer is not None:
            value = value + self.regularizer(x)
        value = float(value)
        if value < self.f_opt:
            self.x_opt = jnp.asarray(x).copy()
            self.f_opt = value
        return value

    # --- static vector helpers (dense device arrays) -------------------
    @staticmethod
    def norm(x):
        return float(jnp.linalg.norm(jnp.asarray(x)))

    @staticmethod
    def inner_prod(x, y):
        return float(jnp.vdot(jnp.asarray(x), jnp.asarray(y)))

    @staticmethod
    def outer_prod(x, y):
        return jnp.outer(jnp.asarray(x), jnp.asarray(y))

    @staticmethod
    def is_equal(x, y):
        if x is None:
            return y is None
        if y is None:
            return False
        x, y = jnp.asarray(x), jnp.asarray(y)
        if x.shape != y.shape:
            return False
        return bool(jnp.array_equal(x, y))

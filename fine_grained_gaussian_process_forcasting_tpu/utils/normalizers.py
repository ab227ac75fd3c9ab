"""Normalizers and Lp loss (FNO-lineage utilities).

Re-designs of the reference's ``layers/utils_fed.py:196-391`` leftovers
(UnitGaussian/Gaussian/Range normalizers and LpLoss) — unused by the main
path there, kept for capability parity as plain jnp/numpy utilities.
"""

from __future__ import annotations

import jax.numpy as jnp


class UnitGaussianNormalizer:
    """Per-element z-score over the sample dim (``utils_fed.py:196-239``)."""

    def __init__(self, x: jnp.ndarray, eps: float = 1e-5):
        self.mean = jnp.mean(x, axis=0)
        self.std = jnp.std(x, axis=0)
        self.eps = eps

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x):
        return x * (self.std + self.eps) + self.mean


class GaussianNormalizer:
    """Global z-score (``utils_fed.py:242-269``)."""

    def __init__(self, x: jnp.ndarray, eps: float = 1e-5):
        self.mean = jnp.mean(x)
        self.std = jnp.std(x)
        self.eps = eps

    def encode(self, x):
        return (x - self.mean) / (self.std + self.eps)

    def decode(self, x):
        return x * (self.std + self.eps) + self.mean


class RangeNormalizer:
    """Affine map to [low, high] (``utils_fed.py:272-291``)."""

    def __init__(self, x: jnp.ndarray, low: float = 0.0, high: float = 1.0):
        mins = jnp.min(x.reshape(x.shape[0], -1), axis=0)
        maxs = jnp.max(x.reshape(x.shape[0], -1), axis=0)
        self.a = (high - low) / (maxs - mins)
        self.b = -self.a * maxs + high
        self._shape = x.shape[1:]

    def encode(self, x):
        s = x.shape
        return (self.a * x.reshape(s[0], -1) + self.b).reshape(s)

    def decode(self, x):
        s = x.shape
        return ((x.reshape(s[0], -1) - self.b) / self.a).reshape(s)


class LpLoss:
    """Relative/absolute Lp loss (``utils_fed.py:294-331``)."""

    def __init__(self, d: int = 2, p: int = 2, size_average: bool = True,
                 reduction: bool = True):
        assert d > 0 and p > 0
        self.d = d
        self.p = p
        self.size_average = size_average
        self.reduction = reduction

    def abs(self, x, y):
        num_examples = x.shape[0]
        h = 1.0 / (x.shape[1] - 1.0)
        norms = (h ** (self.d / self.p)) * jnp.linalg.norm(
            x.reshape(num_examples, -1) - y.reshape(num_examples, -1),
            ord=self.p, axis=1)
        if self.reduction:
            return jnp.mean(norms) if self.size_average else jnp.sum(norms)
        return norms

    def rel(self, x, y):
        num_examples = x.shape[0]
        diff = jnp.linalg.norm(
            x.reshape(num_examples, -1) - y.reshape(num_examples, -1),
            ord=self.p, axis=1)
        ynorm = jnp.linalg.norm(y.reshape(num_examples, -1), ord=self.p,
                                axis=1)
        out = diff / ynorm
        if self.reduction:
            return jnp.mean(out) if self.size_average else jnp.sum(out)
        return out

    def __call__(self, x, y):
        return self.rel(x, y)

"""Vector helpers, batch-first on the last axis."""

from __future__ import annotations

import jax.numpy as jnp


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False) -> jnp.ndarray:
    return jnp.linalg.norm(x, axis=axis, keepdims=keepdims)


def safe_norm(x: jnp.ndarray, axis: int = -1, keepdims: bool = False) -> jnp.ndarray:
    """Norm with a well-defined (zero) gradient at x == 0."""
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    is_zero = sq < 1e-24
    sq = jnp.where(is_zero, 1.0, sq)
    return jnp.where(is_zero, 0.0, jnp.sqrt(sq))


def normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """x / |x|, returning 0 for zero vectors."""
    n = safe_norm(x, axis=axis, keepdims=True)
    return jnp.where(n < 1e-12, jnp.zeros_like(x), x / jnp.where(n < 1e-12, 1.0, n))

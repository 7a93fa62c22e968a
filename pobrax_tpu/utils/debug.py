"""Debug guards: NaN/Inf checking and determinism probes.

The functional-JAX analog of the sanitizer/race-detection layer the survey
calls for (SURVEY.md §5): a pure step-fn wrapper that asserts finiteness of
every leaf (via jax.debug so it works under jit), and a determinism probe
that re-runs a rollout and compares bit-exactly (same seed => same
trajectory is this framework's RNG-threading contract).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def nan_guard(fn: Callable, name: str = "step") -> Callable:
    """Wrap a pure pytree fn so every non-finite floating output leaf raises
    (checkify-based; works under jit). The wrapper is jit-compatible but
    costs a functionalized error channel — enable behind your own debug
    flag, not on the hot path."""
    from jax.experimental import checkify

    def checked(*args, **kwargs):
        out = fn(*args, **kwargs)
        for path, leaf in jax.tree_util.tree_flatten_with_path(out)[0]:
            if isinstance(leaf, jnp.ndarray) and jnp.issubdtype(leaf.dtype, jnp.floating):
                checkify.check(
                    jnp.all(jnp.isfinite(leaf)),
                    f"{name}: non-finite values at {jax.tree_util.keystr(path)}")
        return out

    checked_fn = checkify.checkify(checked)

    def wrapped(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapped


def assert_deterministic(rollout_fn: Callable[[jnp.ndarray], Any],
                         seed: int = 0) -> None:
    """Run `rollout_fn(key)` twice with the same key and assert bit-exact
    equality of every leaf (the same-seed => same-trajectory contract)."""
    key = jax.random.PRNGKey(seed)
    a = jax.device_get(rollout_fn(key))
    b = jax.device_get(rollout_fn(key))
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

"""numpy/jax dual-dispatch ops (the reference's `more_jp` + jumpy surface).

Re-expression of /root/reference/po_brax/more_jp.py and the slice of
`brax.jumpy` the reference envs consume: each op runs on jax.numpy when
tracing or when any argument is a jax array, and on classic numpy otherwise,
so host-side build-time code and jitted device code share one vocabulary.

Dispatch here keys off `jax.core.Tracer` / jax array types directly instead
of peeking at jumpy internals (`_in_jit`, reference more_jp.py:4). Random
ops follow the jax convention (explicit PRNG key) in both modes — in numpy
mode the key seeds a Generator, keeping call sites identical.
"""

from __future__ import annotations

import builtins
from typing import Any, Callable, Sequence, Tuple, TypeVar

import jax
import jax.numpy as jnp
import numpy as onp

X = TypeVar("X")
Carry = TypeVar("Carry")

ndarray = Any  # either onp.ndarray or jnp.ndarray


def _is_jax(*args) -> bool:
    for a in jax.tree.leaves(args):
        if isinstance(a, jax.core.Tracer) or isinstance(a, jnp.ndarray):
            return True
    return False


def _np(*args):
    return jnp if _is_jax(*args) else onp


# ---- control flow ------------------------------------------------------------

def while_loop(cond_fun: Callable[[X], Any], body_fun: Callable[[X], X], init_val: X) -> X:
    """jax.lax.while_loop under trace; a Python loop on numpy values
    (reference more_jp.py:7-18)."""
    if _is_jax(init_val):
        return jax.lax.while_loop(cond_fun, body_fun, init_val)
    val = init_val
    while cond_fun(val):
        val = body_fun(val)
    return val


def fori_loop(lower: int, upper: int, body_fun: Callable[[int, X], X], init_val: X) -> X:
    """(reference more_jp.py:20-31)"""
    if _is_jax(init_val):
        return jax.lax.fori_loop(lower, upper, body_fun, init_val)
    val = init_val
    for i in range(lower, upper):
        val = body_fun(i, val)
    return val


def cond(pred, true_fun: Callable, false_fun: Callable, *operands):
    """(reference more_jp.py:95-104)"""
    if _is_jax(pred, *operands):
        return jax.lax.cond(pred, true_fun, false_fun, *operands)
    return true_fun(*operands) if pred else false_fun(*operands)


def scan(f, init, xs, length=None):
    """jax.lax.scan under trace; a Python loop otherwise."""
    if _is_jax(init, xs):
        return jax.lax.scan(f, init, xs, length=length)
    if xs is None:
        xs = [None] * length
    carry = init
    ys = []
    for x in xs:
        carry, y = f(carry, x)
        ys.append(y)
    return carry, onp.stack(ys) if ys and ys[0] is not None else None


# ---- indexed updates -----------------------------------------------------------

def index_add(x: ndarray, idx, y) -> ndarray:
    """Pure out-of-place scatter-add (reference more_jp.py:33-40)."""
    if _is_jax(x, idx, y):
        return jnp.asarray(x).at[idx].add(y)
    x = onp.array(x, copy=True)
    onp.add.at(x, idx, y)
    return x


def index_update(x: ndarray, idx, y) -> ndarray:
    """Pure out-of-place scatter-set; out-of-bounds indices DROP on the jax
    path (mode='drop', reference more_jp.py:42-49)."""
    if _is_jax(x, idx, y):
        return jnp.asarray(x).at[idx].set(y, mode="drop")
    x = onp.array(x, copy=True)
    x[idx] = y
    return x


def take(tree, i, axis: int = 0):
    """Gather along an axis, over a whole pytree (jumpy surface)."""
    np = _np(tree, i)
    return jax.tree.map(lambda x: np.take(x, i, axis=axis, mode="clip"), tree)


def where(pred, x, y):
    return _np(pred, x, y).where(pred, x, y)


# ---- elementwise / construction -------------------------------------------------

def meshgrid(*xi, copy: bool = True, sparse: bool = False, indexing: str = "xy"):
    """(reference more_jp.py:51-55; jnp ignores `copy`)"""
    if _is_jax(*xi):
        return jnp.meshgrid(*xi, sparse=sparse, indexing=indexing)
    return onp.meshgrid(*xi, copy=copy, sparse=sparse, indexing=indexing)


def maximum(x, y):
    """(reference more_jp.py:66-69)"""
    return _np(x, y).maximum(x, y)


def minimum(x, y):
    return _np(x, y).minimum(x, y)


def logical_or(x, y):
    """(reference more_jp.py:106-108)"""
    return _np(x, y).logical_or(x, y)


def logical_and(x, y):
    return _np(x, y).logical_and(x, y)


def atleast_1d(*arys):
    """(reference more_jp.py:80-92)"""
    return _np(*arys).atleast_1d(*arys)


def atleast_2d(*arys):
    return _np(*arys).atleast_2d(*arys)


def atleast_3d(*arys):
    return _np(*arys).atleast_3d(*arys)


def concatenate(x: Sequence[ndarray], axis: int = 0) -> ndarray:
    return _np(*x).concatenate(x, axis=axis)


def norm(x: ndarray, axis=None) -> ndarray:
    return _np(x).linalg.norm(x, axis=axis)


def safe_norm(x: ndarray, axis=None) -> ndarray:
    """Norm with a zero-safe gradient at 0 (jumpy surface)."""
    np = _np(x)
    if np is jnp:
        is_zero = jnp.allclose(x, 0.0)
        x = jnp.where(is_zero, jnp.ones_like(x), x)
        return jnp.where(is_zero, 0.0, jnp.linalg.norm(x, axis=axis))
    return onp.linalg.norm(x, axis=axis)


# ---- random (explicit key in both modes) ----------------------------------------

def random_prngkey(seed: int) -> ndarray:
    return jax.random.PRNGKey(seed)


def random_split(rng: ndarray, num: int = 2) -> ndarray:
    return jax.random.split(rng, num)


def _host_rng(rng) -> onp.random.Generator:
    return onp.random.default_rng(onp.asarray(rng, dtype=onp.uint32))


def random_uniform(rng, shape: Tuple[int, ...] = (), low=0.0, high=1.0) -> ndarray:
    if _is_jax(rng):
        return jax.random.uniform(rng, shape, minval=low, maxval=high)
    return _host_rng(rng).uniform(low, high, shape).astype(onp.float32)


def randint(rng, shape: Tuple[int, ...] = (), low=0, high=1) -> ndarray:
    """Random integers in [low, high) (reference more_jp.py:57-64)."""
    if _is_jax(rng):
        return jax.random.randint(rng, shape, low, high)
    return _host_rng(rng).integers(low, high, shape)


def choice(rng, a, shape: Tuple[int, ...] = (), replace: bool = True, p=None, axis: int = 0):
    """(reference more_jp.py:71-78)"""
    if _is_jax(rng, a):
        return jax.random.choice(rng, a, shape=shape, replace=replace, p=p, axis=axis)
    size = int(onp.prod(shape)) if shape else None
    out = _host_rng(rng).choice(onp.asarray(a), size=size, replace=replace, p=p, axis=axis)
    return out.reshape(shape) if shape else out


def amin(x, axis=None):
    return _np(x).amin(x, axis=axis)


def amax(x, axis=None):
    return _np(x).amax(x, axis=axis)


def sum(x, axis=None):  # noqa: A001 - jumpy-compatible name
    return _np(x).sum(x, axis=axis)


def abs(x):  # noqa: A001 - jumpy-compatible name
    return _np(x).abs(x)

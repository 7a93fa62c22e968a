"""brax.jumpy compatibility surface, backed by pobrax_tpu.ops.jp.

The slice of legacy brax's numpy/jax dual-dispatch shim that the reference's
env code and more_jp.py consume (/root/reference/po_brax/more_jp.py:4 imports
the internals `_in_jit`, `_which_np`, `onp`, `jnp`, `X`, `ndarray`, ...).
Array ops dispatch to jax.numpy when tracing or when any argument is a jax
array, and to classic numpy otherwise — same contract as the original, same
implementations as our ops/jp.py wherever the surface overlaps, so reference
code and pobrax_tpu code compute bit-identical graphs.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, TypeVar, Union

import jax
import jax.numpy as jnp
import numpy as onp

from pobrax_tpu.ops import jp as _jp
from pobrax_tpu.ops.jp import (  # noqa: F401  (re-exported jumpy surface)
    atleast_1d, atleast_2d, atleast_3d, choice, cond, fori_loop, index_add,
    logical_and, logical_or, maximum, meshgrid, minimum, norm, randint,
    random_prngkey, random_split, random_uniform, safe_norm, take, while_loop,
)

X = TypeVar("X")
ndarray = Union[onp.ndarray, jnp.ndarray]

pi = onp.pi
inf = onp.inf
float32 = jnp.float32
int32 = jnp.int32


def _in_jit() -> bool:
    """True when inside a jax trace (jit/vmap/grad). Legacy jumpy checked the
    trace stack; the modern equivalent is whether a data-independent creation
    op stages into a Tracer."""
    return isinstance(jnp.zeros(()), jax.core.Tracer)


def _which_np(*args):
    """jnp when any arg is a jax value or we are tracing, else numpy —
    the dispatch rule every op below keys on."""
    if _jp._is_jax(*args) or _in_jit():
        return jnp
    return onp


def index_update(x: ndarray, idx, y) -> ndarray:
    """Stock jumpy index_update (set WITHOUT drop-mode; the drop-mode variant
    is more_jp's override, reference more_jp.py:42-49)."""
    if _which_np(x, idx, y) is jnp:
        return jnp.asarray(x).at[idx].set(y)
    x = onp.array(x, copy=True)
    x[idx] = y
    return x


# ---- creation ----------------------------------------------------------------

def array(object: Any, dtype=None) -> ndarray:
    return _which_np(object).array(object, dtype)


def zeros(shape, dtype=float) -> ndarray:
    return _which_np().zeros(shape, dtype=dtype)


def zeros_like(a: ndarray) -> ndarray:
    return _which_np(a).zeros_like(a)


def ones(shape, dtype=float) -> ndarray:
    return _which_np().ones(shape, dtype=dtype)


def ones_like(a: ndarray) -> ndarray:
    return _which_np(a).ones_like(a)


def eye(n: int, dtype=float) -> ndarray:
    return _which_np().eye(n, dtype=dtype)


def arange(start, stop=None, step=None) -> ndarray:
    np = _which_np(start, stop)
    if stop is None:
        return np.arange(start)
    if step is None:
        return np.arange(start, stop)
    return np.arange(start, stop, step)


# ---- shape / combination -------------------------------------------------------

def concatenate(x: Sequence[ndarray], axis: int = 0) -> ndarray:
    return _which_np(*x).concatenate(x, axis=axis)


def stack(x: Sequence[ndarray], axis: int = 0) -> ndarray:
    return _which_np(*x).stack(x, axis=axis)


def reshape(a: ndarray, newshape) -> ndarray:
    return _which_np(a).reshape(a, newshape)


def transpose(a: ndarray, axes=None) -> ndarray:
    return _which_np(a).transpose(a, axes)


def expand_dims(a: ndarray, axis) -> ndarray:
    return _which_np(a).expand_dims(a, axis)


def ravel(a: ndarray) -> ndarray:
    return _which_np(a).ravel(a)


# ---- elementwise ----------------------------------------------------------------

def where(condition: ndarray, x: ndarray, y: ndarray) -> ndarray:
    """Keyword-compatible (the reference calls jp.where(c, x=..., y=...),
    ant_tag.py:111)."""
    return _which_np(condition, x, y).where(condition, x, y)


def clip(a: ndarray, a_min, a_max) -> ndarray:
    return _which_np(a, a_min, a_max).clip(a, a_min, a_max)


def multiply(x1: ndarray, x2: ndarray) -> ndarray:
    return _which_np(x1, x2).multiply(x1, x2)


def dot(x: ndarray, y: ndarray) -> ndarray:
    return _which_np(x, y).dot(x, y)


def matmul(x1: ndarray, x2: ndarray) -> ndarray:
    return _which_np(x1, x2).matmul(x1, x2)


def abs(a: ndarray) -> ndarray:  # noqa: A001 - jumpy-compatible name
    return _which_np(a).abs(a)


def sign(a: ndarray) -> ndarray:
    return _which_np(a).sign(a)


def sqrt(a: ndarray) -> ndarray:
    return _which_np(a).sqrt(a)


def square(a: ndarray) -> ndarray:
    return _which_np(a).square(a)


def exp(a: ndarray) -> ndarray:
    return _which_np(a).exp(a)


def sin(a: ndarray) -> ndarray:
    return _which_np(a).sin(a)


def cos(a: ndarray) -> ndarray:
    return _which_np(a).cos(a)


def arccos(a: ndarray) -> ndarray:
    return _which_np(a).arccos(a)


def arcsin(a: ndarray) -> ndarray:
    return _which_np(a).arcsin(a)


def arctan2(x1: ndarray, x2: ndarray) -> ndarray:
    return _which_np(x1, x2).arctan2(x1, x2)


def cross(x: ndarray, y: ndarray) -> ndarray:
    return _which_np(x, y).cross(x, y)


def sum(a: ndarray, axis=None) -> ndarray:  # noqa: A001
    return _which_np(a).sum(a, axis=axis)


def mean(a: ndarray, axis=None) -> ndarray:
    return _which_np(a).mean(a, axis=axis)


def amin(a: ndarray, axis=None) -> ndarray:
    return _which_np(a).amin(a, axis=axis)


def amax(a: ndarray, axis=None) -> ndarray:
    return _which_np(a).amax(a, axis=axis)


def any(a: ndarray, axis=None) -> ndarray:  # noqa: A001
    return _which_np(a).any(a, axis=axis)


def all(a: ndarray, axis=None) -> ndarray:  # noqa: A001
    return _which_np(a).all(a, axis=axis)

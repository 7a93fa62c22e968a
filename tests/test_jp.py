"""Tests for the numpy/jax dual-dispatch ops module (reference more_jp)."""

import jax
import jax.numpy as jnp
import numpy as onp
import pytest

from pobrax_tpu.ops import jp


def test_while_loop_both_modes():
    assert jp.while_loop(lambda v: v < 5, lambda v: v + 1, 0) == 5
    out = jax.jit(lambda x: jp.while_loop(lambda v: v[0] < 5,
                                          lambda v: (v[0] + 1, v[1]), x))((jnp.int32(0), jnp.ones(2)))
    assert int(out[0]) == 5


def test_fori_loop_both_modes():
    assert jp.fori_loop(0, 4, lambda i, v: v + i, 0) == 6
    assert int(jax.jit(lambda: jp.fori_loop(0, 4, lambda i, v: v + i, jnp.int32(0)))()) == 6


def test_index_add_numpy_accumulates_duplicates():
    x = onp.zeros(3)
    out = jp.index_add(x, onp.array([0, 0, 1]), 1.0)
    assert out.tolist() == [2.0, 1.0, 0.0]
    assert x.tolist() == [0.0, 0.0, 0.0]  # out-of-place


def test_index_update_jax_drops_out_of_bounds():
    # the reference's mode='drop' quirk (more_jp.py:46)
    out = jax.jit(lambda x: jp.index_update(x, 10, 1.0))(jnp.zeros(4))
    assert out.tolist() == [0.0, 0.0, 0.0, 0.0]


def test_cond_both_modes():
    assert jp.cond(True, lambda x: x + 1, lambda x: x - 1, 5) == 6
    out = jax.jit(lambda p, x: jp.cond(p, lambda v: v + 1, lambda v: v - 1, x))(
        jnp.bool_(False), jnp.float32(5))
    assert float(out) == 4.0


def test_choice_no_replacement():
    k = jax.random.PRNGKey(0)
    out = jp.choice(k, jnp.arange(5), (5,), replace=False)
    assert sorted(int(v) for v in out) == [0, 1, 2, 3, 4]
    out_np = jp.choice(onp.uint32([0, 1]), onp.arange(5), (5,), replace=False)
    assert sorted(int(v) for v in out_np) == [0, 1, 2, 3, 4]


def test_meshgrid_matches_numpy():
    a, b = jp.meshgrid(onp.arange(2), onp.arange(3))
    an, bn = onp.meshgrid(onp.arange(2), onp.arange(3))
    onp.testing.assert_array_equal(a, an)
    onp.testing.assert_array_equal(b, bn)


def test_randint_range():
    k = jax.random.PRNGKey(0)
    v = jp.randint(k, (100,), 2, 5)
    assert int(v.min()) >= 2 and int(v.max()) < 5


def test_atleast_and_logical():
    assert jp.atleast_1d(onp.float32(3)).shape == (1,)
    assert jp.atleast_2d(jnp.zeros(3)).shape == (1, 3)
    assert bool(jp.logical_or(onp.bool_(False), onp.bool_(True)))


def test_safe_norm_zero_gradient_safe():
    g = jax.grad(lambda x: jp.safe_norm(x))(jnp.zeros(3))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_take_pytree():
    tree = {"a": jnp.arange(6).reshape(3, 2)}
    out = jp.take(tree, jnp.array([2, 0]))
    assert out["a"].shape == (2, 2)
    assert out["a"][0, 0] == 4

"""Pallas whole-step kernel (physics/pallas_step.py) vs the generic path.

On CPU the kernel runs in Pallas interpret mode (identical program, no
Mosaic), which lets the single-kernel step be cross-validated without TPU
hardware. POBRAX_PALLAS=1 routes VMAPPED System.step calls through the
kernel via custom_vmap; unbatched calls keep the plain fused path — both
dispatch arms are checked here.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_fused import _mini_system


def _mini_pallas_system():
    os.environ["POBRAX_FUSED"] = "1"
    os.environ["POBRAX_PALLAS"] = "1"
    try:
        from tests.test_fused import _mini_system as mk
        # _mini_system sets/clears POBRAX_FUSED itself; PALLAS stays set
        return mk()
    finally:
        del os.environ["POBRAX_PALLAS"]
        os.environ.pop("POBRAX_FUSED", None)


def _batch_qp(sys_, B, seed=0):
    qp = sys_.default_qp()
    k = jax.random.PRNGKey(seed)
    ks = jax.random.split(k, 4)
    return qp.replace(
        pos=qp.pos + 0.01 * jax.random.normal(ks[0], (B,) + qp.pos.shape),
        rot=jnp.broadcast_to(qp.rot, (B,) + qp.rot.shape),
        vel=0.1 * jax.random.normal(ks[2], (B,) + qp.vel.shape),
        ang=0.1 * jax.random.normal(ks[3], (B,) + qp.ang.shape),
    )


def test_pallas_batched_matches_vmapped_fused():
    """Tight check: the kernel evaluates the SAME step_core trace as the
    vmapped fused path, so every output (state + all Info fields) must
    agree to f32 round-off even at randomly perturbed, contact-active
    states (where fused-vs-generic legitimately diverges at contact
    on/off discontinuities)."""
    sys_ = _mini_pallas_system()
    sys_plain = _mini_system()
    B = 8
    qps = _batch_qp(sys_, B)
    acts = jax.random.uniform(jax.random.PRNGKey(1), (B, sys_.action_size),
                              minval=-1.0, maxval=1.0)

    q1, i1 = jax.jit(jax.vmap(sys_plain._fused_step))(qps, acts)
    q2, i2 = jax.jit(jax.vmap(sys_.step))(qps, acts)  # -> pallas kernel
    for name in ("pos", "rot", "vel", "ang"):
        np.testing.assert_allclose(np.asarray(getattr(q1, name)),
                                   np.asarray(getattr(q2, name)), atol=1e-5)
    for part in ("contact", "joint", "actuator"):
        for f in ("vel", "ang"):
            np.testing.assert_allclose(
                np.asarray(getattr(getattr(i1, part), f)),
                np.asarray(getattr(getattr(i2, part), f)), atol=1e-5)


def test_pallas_batched_matches_generic():
    """Independent check against the readable vectorized path, at the
    gentle default state (same tolerance story as tests/test_fused.py)."""
    sys_ = _mini_pallas_system()
    B = 8
    qp = sys_.default_qp()
    qps = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), qp)
    acts = jnp.tile(jnp.array([[0.3, -0.5]]), (B, 1))

    q1, i1 = jax.jit(jax.vmap(sys_.step_generic))(qps, acts)
    q2, i2 = jax.jit(jax.vmap(sys_.step))(qps, acts)  # -> pallas kernel
    np.testing.assert_allclose(np.asarray(q1.pos), np.asarray(q2.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1.rot), np.asarray(q2.rot), atol=1e-5)
    np.testing.assert_allclose(np.asarray(q1.vel), np.asarray(q2.vel), atol=1e-3)
    np.testing.assert_allclose(np.asarray(q1.ang), np.asarray(q2.ang), atol=1e-3)
    np.testing.assert_allclose(np.asarray(i1.contact.vel),
                               np.asarray(i2.contact.vel), atol=1e-3)


def test_pallas_matches_plain_fused_bitwise_shape():
    """The kernel runs the SAME step_core trace as the vmapped fused path;
    only evaluation order/layout differs, so agreement should be at f32
    round-off over a short rollout."""
    sys_ = _mini_pallas_system()
    sys_plain = _mini_system()
    B = 4
    qps = _batch_qp(sys_, B, seed=7)
    acts = jnp.linspace(-1.0, 1.0, B * sys_.action_size).reshape(
        B, sys_.action_size)

    def roll(step_fn, qps):
        def body(q, t):
            q, _ = step_fn(q, acts * jnp.sin(0.3 * t))
            return q, q.pos
        return jax.lax.scan(body, qps, jnp.arange(10, dtype=jnp.float32))[1]

    pos_pallas = jax.jit(lambda q: roll(jax.vmap(sys_.step), q))(qps)
    pos_fused = jax.jit(lambda q: roll(jax.vmap(sys_plain._fused_step), q))(qps)
    np.testing.assert_allclose(np.asarray(pos_fused), np.asarray(pos_pallas),
                               atol=1e-5)


def test_pallas_unbatched_falls_back_to_fused():
    sys_ = _mini_pallas_system()
    qp = sys_.default_qp()
    act = jnp.array([0.3, -0.5])
    q1, _ = jax.jit(sys_.step)(qp, act)  # custom_vmap primal: plain fused
    q2, _ = jax.jit(sys_.step_generic)(qp, act)
    np.testing.assert_allclose(np.asarray(q1.pos), np.asarray(q2.pos), atol=1e-5)


def test_pallas_inside_env_scan():
    """The production shape: the kernel inside a jitted scan under the full
    wrapper stack (ant with ground contacts only, B=4)."""
    os.environ["POBRAX_FUSED"] = "1"
    os.environ["POBRAX_PALLAS"] = "1"
    try:
        from pobrax_tpu.envs import create
        env = create("inverted_pendulum", episode_length=20, batch_size=4,
                     auto_reset=True, randomized_autoreset=True)
        assert env.unwrapped.sys._fused_step is not None
    finally:
        del os.environ["POBRAX_PALLAS"]
        os.environ.pop("POBRAX_FUSED", None)

    def rollout(state, key):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (4, env.action_size),
                                   minval=-1.0, maxval=1.0)
            return (env.step(state, a), key), state.reward
        return jax.lax.scan(body, (state, key), None, length=8)

    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, 4))
    (state, _), rewards = jax.jit(rollout)(state, key)
    assert np.isfinite(np.asarray(state.obs)).all()
    assert np.isfinite(np.asarray(rewards)).all()

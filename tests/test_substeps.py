"""Opt-in substeps retune (Env.retune_substeps / create(substeps=)).

The fast preset: same dt, substeps=8 (h_sub 0.00625 — the measured
stability edge, tools/substeps_probe.py; +18% TPU step throughput,
docs/PERFORMANCE.md round 5). Default stays 10 for reference parity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu.envs import _envs, create


def test_retune_rebuilds_system():
    env = _envs["ant"]()
    assert env.sys.config.substeps == 10
    env.retune_substeps(8)
    assert env.sys.config.substeps == 8
    assert env._cfg.dt == pytest.approx(0.05)  # dt unchanged: larger h_sub
    with pytest.raises(ValueError):
        env.retune_substeps(0)


def test_create_substeps_kwarg_scales_with_action_repeat():
    """create(substeps=8) retunes BEFORE ActionRepeat, so rescale_time
    multiplies the retuned value (8 * repeat), preserving h_sub."""
    env = create("ant_tag", episode_length=64, action_repeat=6,
                 batch_size=2, auto_reset=True, randomized_autoreset=True,
                 substeps=8)
    core = env.unwrapped
    assert core.sys.config.substeps == 48  # 8 * 6
    assert core.sys.config.dt == pytest.approx(0.05 * 6)


def test_substeps8_rollout_stable():
    """100 random control steps at substeps=8: finite, torso z in the
    production band, not everything terminating (the substeps=5 failure
    mode was done_rate 1.0 from step one)."""
    env = create("ant", episode_length=1000, batch_size=8,
                 auto_reset=True, randomized_autoreset=True, substeps=8)
    torso = env.unwrapped.torso_idx

    def run(key):
        ks = jax.random.split(key, 8)
        state = env.reset(ks)

        def body(carry, k):
            state, dones = carry
            act = jax.random.uniform(k, (8, env.action_size),
                                     minval=-1.0, maxval=1.0)
            state = env.step(state, act)
            return (state, dones + state.done.sum()), state.qp.pos[:, torso, 2]

        (state, dones), zs = jax.lax.scan(
            body, (state, jnp.zeros(())), jax.random.split(key, 100))
        return state, dones, zs

    state, dones, zs = jax.jit(run)(jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert float(dones) < 80  # substeps=5 pathology would be 800
    z = np.asarray(zs)
    assert 0.15 < z.mean() < 0.8, z.mean()


def test_fused_generic_agree_at_substeps8():
    """The fused scalar-unrolled path and the generic vectorized path
    follow cfg.substeps identically — cross-validate at the retuned
    value. POBRAX_FUSED must be set BEFORE the System is (re)built:
    System reads it once at construction (physics/system.py:80)."""
    import os
    os.environ["POBRAX_FUSED"] = "1"
    try:
        env = _envs["ant"]()
        env.retune_substeps(8)
        assert env.sys._fused_step is not None  # fused path really armed
        qp = env.sys.default_qp()
        act = jnp.full((env.action_size,), 0.3)
        qp_f = qp
        for _ in range(5):
            qp_f, _ = env.sys.step(qp_f, act)
    finally:
        os.environ.pop("POBRAX_FUSED", None)
    qp_g = qp
    for _ in range(5):
        qp_g, _ = env.sys.step_generic(qp_g, act)
    np.testing.assert_allclose(np.asarray(qp_f.pos), np.asarray(qp_g.pos),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(qp_f.vel), np.asarray(qp_g.vel),
                               atol=1e-3)

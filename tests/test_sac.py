"""SAC learner + replay buffer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from pobrax_tpu.training import replay, sac


def test_replay_ring_semantics():
    sample = {"x": jnp.zeros((3,)), "r": jnp.zeros(())}
    st = replay.init(sample, capacity=4)
    for i in range(6):  # wrap around
        st = replay.insert(st, {"x": jnp.full((3,), i, jnp.float32),
                                "r": jnp.float32(i)})
    assert int(st.size) == 4
    assert int(st.insert_pos) == 2
    # slots hold the last 4 values {2,3,4,5} (0,1 overwritten)
    vals = sorted(float(v) for v in st.data["r"])
    assert vals == [2.0, 3.0, 4.0, 5.0]
    batch = replay.sample(st, jax.random.PRNGKey(0), 16)
    assert batch["x"].shape == (16, 3)
    assert set(np.asarray(batch["r"]).tolist()) <= {2.0, 3.0, 4.0, 5.0}


def test_replay_insert_is_scan_safe():
    sample = {"x": jnp.zeros((2,))}
    st = replay.init(sample, capacity=8)

    def body(st, i):
        return replay.insert(st, {"x": jnp.full((2,), i, jnp.float32)}), None

    st, _ = jax.lax.scan(body, st, jnp.arange(5, dtype=jnp.float32))
    assert int(st.size) == 5
    assert float(st.data["x"][4, 0]) == 4.0


def test_sac_trains_and_infers():
    from pobrax_tpu.envs.fast import Fast

    inf_fn, params, hist = sac.train(
        Fast(), num_timesteps=512, num_envs=4, episode_length=16,
        replay_capacity=64, batch_size=4, steps_per_epoch=8, min_replay=2,
        seed=0, progress_fn=lambda s, m: None)
    obs = jnp.zeros((3, 2))
    act = inf_fn(params, obs, jax.random.PRNGKey(0))
    assert act.shape == (3, 1)
    assert bool(jnp.all(jnp.abs(act) <= 1.0))
    det = inf_fn(params, obs, jax.random.PRNGKey(0), deterministic=True)
    det2 = inf_fn(params, obs, jax.random.PRNGKey(1), deterministic=True)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(det2))

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


def test_replay_sample_transitions_decorrelates():
    # storage (capacity, columns, feat): draws must mix slots AND columns
    sample = {"x": jnp.zeros((4, 2))}
    st = replay.init(sample, capacity=8)
    for i in range(8):
        st = replay.insert(
            st, {"x": jnp.arange(8, dtype=jnp.float32).reshape(4, 2) + 10 * i})
    batch = replay.sample_transitions(st, jax.random.PRNGKey(3), 64)
    assert batch["x"].shape == (64, 2)
    vals = np.asarray(batch["x"][:, 0])
    # values are 10*slot + 2*col: many distinct slots and both parities of col
    assert len(np.unique(vals // 10)) > 3
    assert len(np.unique(vals % 10)) > 1


def test_sac_transition_next_obs_is_pre_reset():
    # with episode_length 2, every 2nd step truncates: the stored next_obs
    # must be the pre-reset (nonzero for Fast) observation
    from pobrax_tpu.envs import wrappers
    from pobrax_tpu.envs.fast import Fast

    env = wrappers.EpisodeWrapper(Fast(), episode_length=2, action_repeat=1)
    env = wrappers.VmapWrapper(env, batch_size=2)
    env = wrappers.RandomizedAutoResetWrapperNaive(env)
    learner = sac.SACLearner(env, sac.SACConfig(
        num_envs=2, episode_length=2, replay_capacity=16, batch_size=2,
        steps_per_epoch=4, min_replay=1000))  # min_replay high: no grads
    key = jax.random.PRNGKey(0)
    env_state = jax.jit(env.reset)(jax.random.split(key, 2))
    ts = learner.init(key, env_state)
    epoch = jax.jit(learner.build_epoch_fn())
    ts, env_state, _ = epoch(ts, env_state, jax.random.PRNGKey(1))
    data = ts.buffer.data
    done = np.asarray(data["done"][:4])
    next_obs = np.asarray(data["next_obs"][:4])
    done_slots = np.where(done.any(axis=-1))[0]
    assert len(done_slots) > 0
    for s in done_slots:
        # pre-reset obs of Fast after 2 ±dt steps always has nonzero position
        # (a freshly reset obs would be exactly zero)
        assert np.all(np.abs(next_obs[s][:, 0]) > 0.0)


def test_sac_mesh_sharded_training_replicates_params():
    """shard_map SAC epoch: envs + replay columns sharded over the 8-device
    'data' mesh, learner replicated via gradient pmean — params identical
    on every device after training, losses finite."""
    from pobrax_tpu.envs.fast import Fast
    from pobrax_tpu.parallel import mesh as meshmod

    mesh = meshmod.make_mesh()
    hist = []
    inf_fn, params, _ = sac.train(
        Fast(), num_timesteps=1024, num_envs=16, episode_length=16,
        replay_capacity=64, batch_size=16, steps_per_epoch=8, min_replay=2,
        seed=0, mesh=mesh, progress_fn=lambda s, m: hist.append(m),
        watchdog_deadline_s=None)
    assert hist and np.isfinite(hist[-1]["q_loss"])
    leaf = jax.tree.leaves(params[1])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    act = inf_fn(params, jnp.zeros((3, 2)), jax.random.PRNGKey(0))
    assert act.shape == (3, 1)

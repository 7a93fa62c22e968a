"""Recurrent SAC (training/sac_rnn.py): structure + smoke training."""

import jax
import jax.numpy as jnp
import numpy as np

from pobrax_tpu.envs.pendulum import InvertedPendulum
from pobrax_tpu.training import sac_rnn


def _mini_cfg(**kw):
    base = dict(num_envs=4, episode_length=32, seq_len=8, burn_in=2,
                replay_capacity=16, batch_size=8, seqs_per_epoch=2,
                min_replay=1, encoder_sizes=(16,), hidden_size=8,
                head_sizes=(16,))
    base.update(kw)
    return sac_rnn.RSACConfig(**base)


def test_smoke_train_finite_losses():
    hist = []
    inference_fn, params_tuple, _ = sac_rnn.train(
        InvertedPendulum(), _mini_cfg(), num_timesteps=4 * 2 * 8 * 4,
        seed=0, progress_fn=lambda s, m: hist.append(m),
        watchdog_deadline_s=None)
    assert len(hist) >= 2
    for m in hist:
        assert np.isfinite(m["q_loss"]) and np.isfinite(m["actor_loss"])
        assert m["alpha"] > 0

    # recurrent inference contract: h threads through
    env = InvertedPendulum()
    h = jnp.zeros((1, 8))
    obs = jnp.zeros((1, env.observation_size))
    h2, act = inference_fn(params_tuple, h, obs, jax.random.PRNGKey(0))
    assert h2.shape == h.shape and act.shape == (1, env.action_size)
    assert np.abs(np.asarray(act)).max() <= 1.0


def test_sequence_buffer_roundtrip():
    from pobrax_tpu.envs import wrappers
    from pobrax_tpu.training import replay

    env = wrappers.RandomizedAutoResetWrapperNaive(wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(InvertedPendulum(), 32, 1), batch_size=4))
    cfg = _mini_cfg()
    learner = sac_rnn.RSACLearner(env, cfg)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, 4))
    ts = learner.init(key, state)
    # seq leaves shaped (capacity, L, B, ...) / h0 (capacity, B, H)
    assert ts.buffer.data["obs"].shape == (
        cfg.replay_capacity, cfg.seq_len, 4, env.observation_size)
    assert ts.buffer.data["h0"].shape == (
        cfg.replay_capacity, 4, cfg.hidden_size)
    seq = {
        "obs": jnp.ones((cfg.seq_len, 4, env.observation_size)),
        "action": jnp.ones((cfg.seq_len, 4, env.action_size)),
        "reward": jnp.ones((cfg.seq_len, 4)),
        "done": jnp.zeros((cfg.seq_len, 4)),
        "truncation": jnp.zeros((cfg.seq_len, 4)),
        "final_obs": jnp.ones((cfg.seq_len, 4, env.observation_size)),
        "h0": jnp.ones((4, cfg.hidden_size)),
    }
    buf = replay.insert(ts.buffer, seq)
    assert int(buf.size) == 1
    np.testing.assert_array_equal(np.asarray(buf.data["obs"][0]),
                                  np.ones((cfg.seq_len, 4,
                                           env.observation_size)))


def test_done_resets_hidden_in_rollouts():
    """With done=1 at every step, the actor GRU restarts from zero hidden
    each step, so identical observations must yield identical dist params
    at every timestep."""
    env = InvertedPendulum()
    cfg = _mini_cfg()
    from pobrax_tpu.envs import wrappers
    wrapped = wrappers.RandomizedAutoResetWrapperNaive(wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(env, 32, 1), batch_size=4))
    learner = sac_rnn.RSACLearner(wrapped, cfg)
    key = jax.random.PRNGKey(0)
    state = jax.jit(wrapped.reset)(jax.random.split(key, 4))
    ts = learner.init(key, state)

    T = 5
    obs_seq = jnp.tile(jnp.linspace(-1, 1, env.observation_size)[None, None],
                       (T, 4, 1))
    done_all = jnp.ones((T, 4))
    h0 = jnp.ones((4, cfg.hidden_size))  # non-zero start: step 0 differs
    _, dp = learner._actor_roll(ts.params.policy, jnp.zeros_like(h0),
                                obs_seq, done_all)
    dp = np.asarray(dp)
    for t in range(1, T):
        np.testing.assert_allclose(dp[t], dp[1], rtol=1e-6)

    # without dones the hidden evolves -> dist params change over time
    _, dp2 = learner._actor_roll(ts.params.policy, jnp.zeros_like(h0),
                                 obs_seq, jnp.zeros((T, 4)))
    assert np.abs(np.asarray(dp2)[1] - np.asarray(dp2)[4]).max() > 1e-6


def test_grads_flow_to_both_heads():
    from pobrax_tpu.envs import wrappers

    env = wrappers.RandomizedAutoResetWrapperNaive(wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(InvertedPendulum(), 32, 1), batch_size=4))
    cfg = _mini_cfg()
    learner = sac_rnn.RSACLearner(env, cfg)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, 4))
    ts = learner.init(key, state)
    L, B = cfg.seq_len, 3
    k = jax.random.PRNGKey(1)
    seq = {
        "obs": jax.random.normal(k, (L, B, learner.obs_size)),
        "action": jnp.clip(jax.random.normal(k, (L, B, learner.action_size)),
                           -0.9, 0.9),
        "reward": jax.random.normal(k, (L, B)),
        "done": jnp.zeros((L, B)),
        "truncation": jnp.zeros((L, B)),
        "final_obs": jax.random.normal(k, (L, B, learner.obs_size)),
        "h0": jnp.zeros((B, cfg.hidden_size)),
    }
    g_q = jax.grad(learner._critic_loss, has_aux=True)(
        ts.params.q, ts.params, ts.normalizer, seq, k)[0]
    assert any(np.abs(np.asarray(x)).max() > 0 for x in jax.tree.leaves(g_q))
    g_p = jax.grad(lambda p: learner._actor_loss(
        p, ts.params, ts.normalizer, seq, k)[0])(ts.params.policy)
    assert any(np.abs(np.asarray(x)).max() > 0 for x in jax.tree.leaves(g_p))


def test_prioritized_sampling_semantics():
    """replay.sample_prioritized: unwritten entries never drawn, high-|TD|
    entries dominate, importance weights are <=1 and smallest where the
    priority is highest; alpha=0 recovers uniform with w==1."""
    from pobrax_tpu.training import replay

    pri = replay.priorities_init(8, 4)
    # two written slots (rows 0-1), one entry much hotter than the rest
    pri = replay.priorities_on_insert(pri, jnp.int32(0))
    pri = replay.priorities_on_insert(pri, jnp.int32(1))
    pri = replay.priorities_update(pri, jnp.array([1]), jnp.array([2]),
                                   jnp.array([100.0]))
    slot, col, w = replay.sample_prioritized(
        pri, jax.random.PRNGKey(0), 512, alpha=1.0, beta=1.0)
    slot, col, w = np.asarray(slot), np.asarray(col), np.asarray(w)
    assert slot.max() <= 1  # rows 2+ were never written
    hot = (slot == 1) & (col == 2)
    assert hot.mean() > 0.8  # p=100 vs seven p=1 entries
    assert w.max() <= 1.0 + 1e-6
    # the hot entry is oversampled -> it carries the SMALLEST weight
    assert w[hot].max() < w[~hot].min()

    slot_u, col_u, w_u = replay.sample_prioritized(
        pri, jax.random.PRNGKey(1), 2048, alpha=0.0, beta=1.0)
    np.testing.assert_allclose(np.asarray(w_u), 1.0, rtol=1e-6)
    # uniform over the 8 written entries
    flat = np.asarray(slot_u) * 4 + np.asarray(col_u)
    counts = np.bincount(flat, minlength=8)
    assert counts.min() > 2048 / 8 * 0.6


def test_per_smoke_train_and_priorities_move():
    """End-to-end epoch with per_alpha>0: losses finite and the priority
    table departs from the insert-time max-priority plateau."""
    from pobrax_tpu.envs import wrappers

    env = wrappers.RandomizedAutoResetWrapperNaive(wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(InvertedPendulum(), 32, 1), batch_size=4))
    cfg = _mini_cfg(per_alpha=0.9, per_beta=0.4, batch_size=16)
    learner = sac_rnn.RSACLearner(env, cfg)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, 4))
    ts = learner.init(key, state)
    assert ts.priorities.shape == (cfg.replay_capacity, 4)
    epoch = jax.jit(learner.build_epoch_fn())
    h = learner.h0(4)
    for i in range(3):
        ts, state, h, metrics = epoch(ts, state, h, jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["q_loss"]))
    pri = np.asarray(ts.priorities)
    written = pri[pri > 0]
    assert written.size > 0 and np.unique(written).size > 1


def test_nstep_targets_semantics():
    """nstep_targets: n=1 is the plain TD target; n=3 accumulates rewards
    with done-cuts and boundary rows keep shorter horizons."""
    import numpy as np
    from pobrax_tpu.training.sac_rnn import nstep_targets

    L, B, g = 5, 1, 0.9
    r = jnp.asarray(np.arange(1.0, L + 1).reshape(L, B), jnp.float32)
    v = jnp.asarray(np.full((L, B), 10.0), jnp.float32)
    nt = jnp.ones((L, B))

    t1 = nstep_targets(r, nt, v, g, 1)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(r + g * v))

    t3 = nstep_targets(r, nt, v, g, 3)
    # interior row 0: r0 + g r1 + g^2 r2 + g^3 v2(=v_boot[2])
    want0 = 1.0 + g * 2.0 + g * g * 3.0 + g ** 3 * 10.0
    np.testing.assert_allclose(float(t3[0, 0]), want0, rtol=1e-6)
    # boundary row L-1 stays 1-step; row L-2 is 2-step
    np.testing.assert_allclose(float(t3[L - 1, 0]), 5.0 + g * 10.0, rtol=1e-6)
    np.testing.assert_allclose(float(t3[L - 2, 0]),
                               4.0 + g * (5.0 + g * 10.0), rtol=1e-6)

    # terminal at t=1 cuts the recursion: row 0 sees only r0 + g*v_boot[0]?
    # no — nt_0=1 so row 0 bootstraps THROUGH v_boot via the recursion, but
    # nt_1=0 makes G_1 = r_1 exactly, so row 0 = r0 + g * r1.
    nt2 = nt.at[1, 0].set(0.0)
    t3c = nstep_targets(r, nt2, v, g, 3)
    np.testing.assert_allclose(float(t3c[1, 0]), 2.0, rtol=1e-6)
    np.testing.assert_allclose(float(t3c[0, 0]), 1.0 + g * 2.0, rtol=1e-6)


def test_mesh_sharded_training_runs_and_replicates():
    """The shard_map epoch: envs/replay sharded over an 8-device 'data'
    mesh, learner replicated. Checks (a) training runs and losses are
    finite, (b) params/normalizer stay bit-identical across shards after
    several epochs (the pmean contract), (c) the buffer's env-column axis
    really is sharded, and (d) the PER variant runs too."""
    from pobrax_tpu.parallel import mesh as meshmod

    mesh = meshmod.make_mesh()
    n_dev = mesh.shape["data"]
    assert n_dev == 8  # conftest forces 8 virtual CPU devices

    hist = []
    inf, params_tuple, _ = sac_rnn.train(
        InvertedPendulum(), _mini_cfg(num_envs=16, batch_size=16),
        num_timesteps=16 * 2 * 8 * 3, seed=0, mesh=mesh,
        progress_fn=lambda s, m: hist.append(m), watchdog_deadline_s=None)
    assert len(hist) >= 2
    for m in hist:
        assert np.isfinite(m["q_loss"]) and np.isfinite(m["actor_loss"])

    # replication contract: every device holds identical params
    leaf = jax.tree.leaves(params_tuple[1])[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_mesh_buffer_column_axis_is_sharded():
    """The replay storage is placed with its env-column axis split over
    'data' (per-device slices, not replicas)."""
    from pobrax_tpu.envs import wrappers
    from pobrax_tpu.parallel import mesh as meshmod

    mesh = meshmod.make_mesh()
    cfg = _mini_cfg(num_envs=16, batch_size=16)
    env = wrappers.RandomizedAutoResetWrapperNaive(wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(InvertedPendulum(), 32, 1), batch_size=16))
    learner = sac_rnn.RSACLearner(env, cfg, mesh=mesh)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, 16))
    ts = learner.init(key, state)
    ts = jax.device_put(ts, learner.state_sharding())
    obs_buf = ts.buffer.data["obs"]  # (capacity, L, B, obs)
    shard_shapes = {s.data.shape for s in obs_buf.addressable_shards}
    assert shard_shapes == {(cfg.replay_capacity, cfg.seq_len,
                             16 // 8, obs_buf.shape[-1])}
    # one sharded epoch executes
    epoch = jax.jit(learner.build_epoch_fn())
    h = jax.device_put(learner.h0(16),
                       jax.sharding.NamedSharding(
                           mesh, jax.sharding.PartitionSpec("data")))
    state = jax.device_put(
        state, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data")))
    ts, state, h, metrics = epoch(ts, state, h, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["mean_reward"]))


def test_mesh_per_prioritized_sharded_smoke():
    from pobrax_tpu.parallel import mesh as meshmod

    mesh = meshmod.make_mesh()
    hist = []
    sac_rnn.train(
        InvertedPendulum(),
        _mini_cfg(num_envs=16, batch_size=16, per_alpha=0.9, per_beta=0.4),
        num_timesteps=16 * 2 * 8 * 3, seed=0, mesh=mesh,
        progress_fn=lambda s, m: hist.append(m), watchdog_deadline_s=None)
    assert hist and np.isfinite(hist[-1]["q_loss"])


def test_actor_freeze_epochs_gates_policy_updates():
    """actor_freeze_epochs: during the freeze window the policy params and
    temperature are bit-frozen while the critic still updates; after the
    window the actor moves."""
    from pobrax_tpu.envs import wrappers

    env = wrappers.RandomizedAutoResetWrapperNaive(wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(InvertedPendulum(), 32, 1), batch_size=4))
    cfg = _mini_cfg(actor_freeze_epochs=2)
    learner = sac_rnn.RSACLearner(env, cfg)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, 4))
    ts = learner.init(key, state)
    epoch = jax.jit(learner.build_epoch_fn(freeze_until=2))
    h = learner.h0(4)

    p0 = jax.tree.map(np.asarray, ts.params.policy)
    q0 = jax.tree.map(np.asarray, ts.params.q)
    for i in range(2):  # frozen epochs (ts.epochs = 0, 1)
        ts, state, h, _ = epoch(ts, state, h, jax.random.PRNGKey(i))
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(ts.params.policy)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert float(ts.params.log_alpha) == 0.0
    # the critic DID update during the freeze
    assert any(not np.array_equal(a, np.asarray(b)) for a, b in
               zip(jax.tree.leaves(q0), jax.tree.leaves(ts.params.q)))
    # after the window the actor moves
    ts, state, h, _ = epoch(ts, state, h, jax.random.PRNGKey(9))
    assert any(not np.array_equal(a, np.asarray(b)) for a, b in
               zip(jax.tree.leaves(p0), jax.tree.leaves(ts.params.policy)))


class _ObsShift:
    """Minimal core-env wrapper shifting observations by a constant —
    makes two otherwise-identical envs distinguishable in replay."""

    def __init__(self, env, shift):
        self._env = env
        self._shift = shift

    def __getattr__(self, name):
        return getattr(self._env, name)

    def reset(self, rng):
        state = self._env.reset(rng)
        return state.replace(obs=state.obs + self._shift)

    def step(self, state, action):
        state = self._env.step(state, action)
        return state.replace(obs=state.obs + self._shift)


def _stack(core, batch):
    from pobrax_tpu.envs import wrappers

    return wrappers.RandomizedAutoResetWrapperNaive(wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(core, 32, 1), batch_size=batch))


def test_carry_env_columns_collect_from_old_env():
    """With carry_env set, the first carry_envs replay columns hold
    old-env sequences and the rest hold training-env sequences."""
    cfg = _mini_cfg()
    env = _stack(InvertedPendulum(), 4)
    carry = _stack(_ObsShift(InvertedPendulum(), 100.0), 2)
    learner = sac_rnn.RSACLearner(env, cfg, carry_env=carry, carry_envs=2)
    key = jax.random.PRNGKey(0)
    s_old = jax.jit(carry.reset)(jax.random.split(key, 2))
    s_new = jax.jit(env.reset)(jax.random.split(key, 2))
    state = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), s_old, s_new)
    ts = learner.init(key, state)
    epoch = jax.jit(learner.build_epoch_fn())
    ts, state, h, metrics = epoch(ts, state, learner.h0(4),
                                  jax.random.PRNGKey(1))
    obs = np.asarray(ts.buffer.data["obs"])  # (capacity, L, B, obs)
    size = int(ts.buffer.size)
    assert size >= 1
    # shifted columns: every stored obs offset by ~100; plain columns small
    assert np.abs(obs[:size, :, :2]).min() > 50.0
    assert np.abs(obs[:size, :, 2:]).max() < 50.0
    assert np.isfinite(float(metrics["mean_reward"]))


def test_carry_env_train_smoke_and_mesh():
    """train(carry_env=...) runs end-to-end, single-device and sharded."""
    from pobrax_tpu.parallel import mesh as meshmod

    hist = []
    sac_rnn.train(
        InvertedPendulum(), _mini_cfg(), num_timesteps=4 * 2 * 8 * 3,
        seed=0, carry_env=_ObsShift(InvertedPendulum(), 100.0),
        carry_frac=0.5, progress_fn=lambda s, m: hist.append(m),
        watchdog_deadline_s=None)
    assert hist and np.isfinite(hist[-1]["q_loss"])

    mesh = meshmod.make_mesh()
    hist = []
    sac_rnn.train(
        InvertedPendulum(), _mini_cfg(num_envs=16, batch_size=16),
        num_timesteps=16 * 2 * 8 * 2, seed=0, mesh=mesh,
        carry_env=_ObsShift(InvertedPendulum(), 100.0), carry_frac=0.5,
        progress_fn=lambda s, m: hist.append(m), watchdog_deadline_s=None)
    assert hist and np.isfinite(hist[-1]["q_loss"])

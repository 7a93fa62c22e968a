"""Training-layer tests: networks, distribution, GAE, PPO epoch, sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu.models import networks
from pobrax_tpu.training import ppo, running_statistics
from pobrax_tpu.training.distribution import NormalTanhDistribution


def test_make_models_shapes():
    policy, value = networks.make_models(policy_params_size=16, obs_size=27)
    kp, kv = jax.random.split(jax.random.PRNGKey(0))
    pp = policy.init(kp)
    vp = value.init(kv)
    obs = jnp.zeros((5, 27))
    assert policy.apply(pp, obs).shape == (5, 16)
    assert value.apply(vp, obs).shape == (5, 1)
    # reference sizes: policy [32,32,32,32,P], value [256x5,1]
    assert pp["params"]["hidden_0"]["kernel"].shape == (27, 32)
    assert pp["params"]["hidden_4"]["kernel"].shape == (32, 16)
    assert vp["params"]["hidden_0"]["kernel"].shape == (27, 256)
    assert vp["params"]["hidden_5"]["kernel"].shape == (256, 1)


def test_snmlp_two_rng_streams():
    model = networks.make_model([8, 4], obs_size=6, spectral_norm=True)
    r1, r2 = jax.random.split(jax.random.PRNGKey(1))
    params = model.init(r1, r2)
    assert "sing_vec" in params
    obs = jnp.ones((3, 6))
    out, updated = model.apply(
        params, obs, mutable=["sing_vec"], rngs={"sing_vec": r2})
    assert out.shape == (3, 4)
    # spectral norm bounds the top singular value of each layer near 1
    kernel = params["params"]["hidden_0"]["kernel"]
    u = updated["sing_vec"]["hidden_0"]["u"]
    assert u.shape == (1, 8)


def test_distribution_roundtrip_and_logprob():
    dist = NormalTanhDistribution(event_size=4)
    params = jnp.concatenate([jnp.zeros((2, 4)), jnp.zeros((2, 4))], axis=-1)
    key = jax.random.PRNGKey(0)
    pre = dist.sample_no_postprocess(params, key)
    act = dist.postprocess(pre)
    assert act.shape == (2, 4)
    assert jnp.all(jnp.abs(act) <= 1.0)
    lp = dist.log_prob(params, pre)
    assert lp.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(lp)))
    # mode of a zero-loc distribution is 0
    np.testing.assert_allclose(dist.mode(params), jnp.zeros((2, 4)), atol=1e-7)


def test_running_statistics_matches_numpy():
    state = running_statistics.init_state(3)
    rng = np.random.RandomState(0)
    all_data = []
    for _ in range(4):
        batch = rng.randn(16, 3).astype(np.float32) * 2.0 + 1.0
        all_data.append(batch)
        state = running_statistics.update(state, jnp.asarray(batch))
    full = np.concatenate(all_data)
    np.testing.assert_allclose(state.mean, full.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(state.std, full.std(0), rtol=1e-3, atol=1e-4)
    normed = running_statistics.normalize(state, jnp.asarray(full))
    assert abs(float(normed.mean())) < 1e-3


def test_gae_no_termination_matches_closed_form():
    # constant reward 1, no dones, value 0 => advantage is a geometric series
    T, B = 5, 2
    rewards = jnp.ones((T, B))
    dones = jnp.zeros((T, B))
    trunc = jnp.zeros((T, B))
    values = jnp.zeros((T, B))
    bootstrap = jnp.zeros((B,))
    gamma, lam = 0.9, 0.8
    adv, ret = ppo.compute_gae(rewards, dones, trunc, values, bootstrap, gamma, lam)
    # delta_t = 1 everywhere; adv_t = sum_{k} (gamma*lam)^k
    expected_last = 1.0
    np.testing.assert_allclose(adv[-1], expected_last, rtol=1e-6)
    expected_first = sum((gamma * lam) ** k for k in range(T))
    np.testing.assert_allclose(adv[0], expected_first, rtol=1e-5)
    np.testing.assert_allclose(ret, adv + values, rtol=1e-6)


def test_gae_truncation_bootstraps_through_done():
    # one env, done at t=1 via truncation: the value AFTER it still bootstraps
    T = 3
    rewards = jnp.zeros((T, 1))
    dones = jnp.array([[0.0], [1.0], [0.0]])
    trunc = jnp.array([[0.0], [1.0], [0.0]])
    values = jnp.ones((T, 1))
    bootstrap = jnp.ones((1,))
    adv_trunc, _ = ppo.compute_gae(rewards, dones, trunc, values, bootstrap, 0.9, 1.0)
    adv_term, _ = ppo.compute_gae(
        rewards, dones, jnp.zeros((T, 1)), values, bootstrap, 0.9, 1.0)
    # terminal done kills the bootstrap -> more negative advantage at t=1
    assert float(adv_term[1, 0]) < float(adv_trunc[1, 0])


@pytest.mark.parametrize("use_mesh", [False, True])
def test_ppo_epoch_runs_and_updates(use_mesh):
    from pobrax_tpu.envs.ant import Ant
    from pobrax_tpu.parallel import make_mesh

    mesh = make_mesh() if use_mesh else None
    env = Ant()
    inf_fn, params, hist = ppo.train(
        env, num_timesteps=256, num_envs=8, episode_length=16,
        unroll_length=4, num_minibatches=2, num_update_epochs=1,
        mesh=mesh, seed=0,
        progress_fn=lambda s, m: None)
    obs = jnp.zeros((2, env.observation_size))
    act = inf_fn(params, obs, jax.random.PRNGKey(0))
    assert act.shape == (2, env.action_size)
    assert bool(jnp.all(jnp.abs(act) <= 1.0))


def test_ppo_deterministic_given_seed():
    from pobrax_tpu.envs.ant import Ant

    outs = []
    for _ in range(2):
        env = Ant()
        _, params, _ = ppo.train(
            env, num_timesteps=64, num_envs=4, episode_length=8,
            unroll_length=4, num_minibatches=2, num_update_epochs=1, seed=3)
        outs.append(params)
    a = jax.tree.leaves(outs[0][1])
    b = jax.tree.leaves(outs[1][1])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_evaluate_runs_on_device():
    from pobrax_tpu.envs.ant import Ant

    env = Ant()
    inf_fn, params, _ = ppo.train(
        env, num_timesteps=64, num_envs=4, episode_length=8,
        unroll_length=4, num_minibatches=2, num_update_epochs=1, seed=0)
    stats = ppo.evaluate(env, inf_fn, params, num_episodes=4, episode_length=10)
    assert set(stats) == {"eval/mean_return", "eval/std_return", "eval/mean_length"}
    assert 0 < stats["eval/mean_length"] <= 10


def test_gae_truncation_masks_boundary():
    # truncation at t=1: its delta is masked AND the next episode's GAE does
    # not leak backwards across the boundary (brax v0 compute_gae semantics)
    rewards = jnp.array([[1.0], [1.0], [1.0]])
    dones = jnp.array([[0.0], [1.0], [0.0]])
    trunc = jnp.array([[0.0], [1.0], [0.0]])
    values = jnp.array([[0.5], [0.25], [0.125]])
    bootstrap = jnp.array([0.0625])
    g, lam = 0.9, 0.8
    adv, ret = ppo.compute_gae(rewards, dones, trunc, values, bootstrap, g, lam)
    assert float(adv[1, 0]) == 0.0  # truncated step carries no advantage
    # t=0 sees only its own delta: the accumulator was cut at the boundary
    delta0 = 1.0 + g * 0.25 - 0.5
    np.testing.assert_allclose(float(adv[0, 0]), delta0, rtol=1e-6)
    # t=2 is an ordinary step bootstrapping into bootstrap_value
    delta2 = 1.0 + g * 0.0625 - 0.125
    np.testing.assert_allclose(float(adv[2, 0]), delta2, rtol=1e-6)


def test_rnn_ppo_trains_and_infers():
    from pobrax_tpu.envs.fast import Fast
    from pobrax_tpu.training import ppo_rnn

    inf_fn, params, hist = ppo_rnn.train(
        Fast(), num_timesteps=256, num_envs=8, episode_length=16,
        unroll_length=4, num_minibatches=2, num_update_epochs=1,
        hidden_size=16, encoder_sizes=(32,), seed=0,
        progress_fn=lambda s, m: None)
    assert len(hist) >= 1
    obs = jnp.zeros((3, 2))
    h = jnp.zeros((3, 16))
    h2, act = inf_fn(params, h, obs, jax.random.PRNGKey(0))
    assert act.shape == (3, 1) and h2.shape == (3, 16)
    # memory actually evolves
    assert float(jnp.abs(h2).max()) > 0.0


@pytest.mark.parametrize("use_mesh", [False, True])
def test_rnn_ppo_epoch_under_mesh(use_mesh):
    from pobrax_tpu.envs.fast import Fast
    from pobrax_tpu.parallel import make_mesh
    from pobrax_tpu.training import ppo_rnn

    mesh = make_mesh() if use_mesh else None
    inf_fn, params, hist = ppo_rnn.train(
        Fast(), num_timesteps=128, num_envs=8, episode_length=8,
        unroll_length=4, num_minibatches=2, num_update_epochs=1,
        hidden_size=8, encoder_sizes=(16,), mesh=mesh, seed=1,
        progress_fn=lambda s, m: None)
    assert all(np.isfinite(h["total_loss"]) for h in hist)


def test_ppo_bf16_network_dtype_runs():
    from pobrax_tpu.envs.fast import Fast

    inf_fn, params, hist = ppo.train(
        Fast(), num_timesteps=128, num_envs=8, episode_length=8,
        unroll_length=4, num_minibatches=2, num_update_epochs=1,
        network_dtype="bfloat16", seed=0, progress_fn=lambda s, m: None)
    assert all(np.isfinite(h["total_loss"]) for h in hist)
    act = inf_fn(params, jnp.zeros((2, 2)), jax.random.PRNGKey(0))
    assert act.dtype == jnp.float32  # outputs cast back to f32


def test_ppo_cached_autoreset_mode_trains():
    from pobrax_tpu.envs.fast import Fast

    _, _, hist = ppo.train(
        Fast(), num_timesteps=128, num_envs=8, episode_length=8,
        unroll_length=4, num_minibatches=2, num_update_epochs=1,
        autoreset_mode="cached", seed=0, progress_fn=lambda s, m: None)
    assert all(np.isfinite(h["total_loss"]) for h in hist)


@pytest.mark.parametrize("blocks", [None, 4])
def test_minibatch_indices_match_old_shuffle_chain(blocks):
    """The index-gather shuffle (one gather per leaf) must compose
    minibatches BIT-IDENTICALLY to the r2 reshape/swapaxes/permute chain it
    replaced — same key, same minibatch contents, just fewer HBM copies."""
    T, B, M = 6, 16, 4
    k = jax.random.PRNGKey(42)
    x = jnp.arange(T * B * 3, dtype=jnp.float32).reshape(T, B, 3)

    def old_chain(x):
        if blocks:
            D = blocks
            y = x.reshape((x.shape[0], D, -1) + x.shape[2:])
            y = jnp.swapaxes(y, 0, 1)
            y = y.reshape((D, -1) + y.shape[3:])
            y = jax.vmap(jax.random.permutation)(jax.random.split(k, D), y)
            y = y.reshape((D, M, -1) + y.shape[2:])
            y = jnp.swapaxes(y, 0, 1)
            return y.reshape((M, -1) + y.shape[3:])
        y = x.reshape((-1,) + x.shape[2:])
        y = jax.random.permutation(k, y)
        return y.reshape((M, -1) + y.shape[1:])

    idx = ppo.minibatch_indices(k, T, B, M, blocks)
    new = x.reshape((T * B,) + x.shape[2:])[idx]
    np.testing.assert_array_equal(np.asarray(old_chain(x)), np.asarray(new))


def test_prenormalized_loss_matches_inline_normalize():
    """Pre-normalizing the payload once (normalizer=None in the loss) gives
    the same loss value as the old inline per-minibatch normalize."""
    from pobrax_tpu.envs.ant import Ant
    from pobrax_tpu.envs import wrappers

    env = wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(Ant(), 8, 1), batch_size=4)
    cfg = ppo.PPOConfig(num_envs=4, unroll_length=4, num_minibatches=1,
                        num_update_epochs=1, episode_length=8)
    learner = ppo.PPOLearner(env, cfg)
    key = jax.random.PRNGKey(0)
    ts = learner.init(key)
    st = jax.jit(env.reset)(jax.random.split(key, 4))
    _, data, boot = learner._rollout(ts, st, key)
    adv, ret = ppo.compute_gae(data.reward, data.done, data.truncation,
                               data.value, boot, 0.97, 0.95)
    norm = running_statistics.update(ts.normalizer, data.obs)
    pre = data.replace(obs=running_statistics.normalize(norm, data.obs))
    l_new, _ = learner._loss(ts.params, None, pre, adv, ret, key)
    l_old, _ = learner._loss(ts.params, norm, data, adv, ret, key)
    np.testing.assert_allclose(float(l_new), float(l_old), rtol=1e-6)


def test_epochs_per_call_matches_host_loop():
    """jit_epochs(n) (one jitted lax.scan over n epochs) must produce the
    SAME final params and key stream as n sequential jit_epoch host-loop
    iterations — it only amortizes the per-dispatch cost."""
    from pobrax_tpu.envs.fast import Fast
    from pobrax_tpu.envs import wrappers

    env = wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(Fast(), 8, 1), batch_size=8)
    cfg = ppo.PPOConfig(num_envs=8, unroll_length=4, num_minibatches=2,
                        num_update_epochs=1, episode_length=8)
    learner = ppo.PPOLearner(env, cfg)
    key0 = jax.random.PRNGKey(3)
    ts0 = learner.init(key0)
    st0 = jax.jit(env.reset)(jax.random.split(key0, 8))

    # both paths consume donated buffers — give each its own copy
    clone = lambda t: jax.tree.map(jnp.array, t)

    # host loop, exactly train()'s key threading
    epoch_fn = learner.jit_epoch()
    ts_a, st_a, key = clone(ts0), clone(st0), key0
    for _ in range(3):
        key, k_epoch = jax.random.split(key)
        ts_a, st_a, _ = epoch_fn(ts_a, st_a, k_epoch)

    ts_b, st_b, key_b, _ = learner.jit_epochs(3)(ts0, st0, key0)

    np.testing.assert_array_equal(np.asarray(key), np.asarray(key_b))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        ts_a.params, ts_b.params)
    np.testing.assert_array_equal(int(ts_a.epochs), int(ts_b.epochs))


def test_posthoc_rollout_heads_match_inline():
    """_rollout computes value/log_prob POST-HOC in one (T*B) batch; they
    must match the inline per-step computation on the stored rollout."""
    from pobrax_tpu.envs.ant import Ant
    from pobrax_tpu.envs import wrappers

    env = wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(Ant(), 8, 1), batch_size=4)
    cfg = ppo.PPOConfig(num_envs=4, unroll_length=4, num_minibatches=1,
                        num_update_epochs=1, episode_length=8)
    learner = ppo.PPOLearner(env, cfg)
    key = jax.random.PRNGKey(0)
    ts = learner.init(key)
    st = jax.jit(env.reset)(jax.random.split(key, 4))
    _, data, _ = learner._rollout(ts, st, key)

    value_inline = learner._value_fn(ts.params, ts.normalizer, data.obs)
    dp_inline = learner._policy_params_fn(ts.params, ts.normalizer, data.obs)
    lp_inline = learner.dist.log_prob(dp_inline, data.action)
    np.testing.assert_allclose(np.asarray(data.value),
                               np.asarray(value_inline), atol=1e-5)
    np.testing.assert_allclose(np.asarray(data.log_prob),
                               np.asarray(lp_inline), atol=1e-5)


def test_rnn_epochs_per_call_matches_host_loop():
    """ppo_rnn.jit_epochs(n) must reproduce n sequential jit_epoch calls
    (same key stream, same params) — dispatch amortization only."""
    from pobrax_tpu.envs.fast import Fast
    from pobrax_tpu.envs import wrappers
    from pobrax_tpu.training import ppo_rnn

    env = wrappers.VmapWrapper(
        wrappers.EpisodeWrapper(Fast(), 8, 1), batch_size=8)
    cfg = ppo_rnn.RNNPPOConfig(num_envs=8, unroll_length=4,
                               num_minibatches=2, num_update_epochs=1,
                               episode_length=8, hidden_size=8,
                               encoder_sizes=(16,))
    learner = ppo_rnn.RNNPPOLearner(env, cfg)
    key0 = jax.random.PRNGKey(7)
    ts0 = learner.init(key0)
    st0 = jax.jit(env.reset)(jax.random.split(key0, 8))
    h0 = learner.h0(8)
    clone = lambda t: jax.tree.map(jnp.array, t)

    epoch_fn = learner.jit_epoch()
    ts_a, st_a, h_a, key = clone(ts0), clone(st0), clone(h0), key0
    for _ in range(3):
        key, k_epoch = jax.random.split(key)
        ts_a, st_a, h_a, _ = epoch_fn(ts_a, st_a, h_a, k_epoch)

    ts_b, st_b, h_b, key_b, _ = learner.jit_epochs(3)(ts0, st0, h0, key0)

    np.testing.assert_array_equal(np.asarray(key), np.asarray(key_b))
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6),
        ts_a.params, ts_b.params)
    np.testing.assert_allclose(np.asarray(h_a), np.asarray(h_b), atol=1e-6)

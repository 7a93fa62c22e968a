"""Recurrent PPO: a GRU policy/value learner for the PO task suite.

The PO envs are DESIGNED to defeat memoryless policies — AntTag observes the
target's absolute xy (never its own position, reference ant_tag.py:148-153),
AntHeavenHell shows the heaven direction only while near the priest
(ant_heavenhell.py:129-131). A feedforward PPO provably cannot track either
signal; this learner carries a GRU hidden state THROUGH the fused rollout
scan, so memory costs one extra carry in the same single-XLA-program epoch
(the reference has no trainer at all — its envs were consumed by external
feedforward brax PPO, SURVEY.md §3.5).

Design:
  * network: obs -> MLP encoder -> GRUCell -> (policy head, value head),
    one shared trunk (the memory is shared; heads are linear).
  * rollout: lax.scan carries (env_state, h); h is zeroed where an episode
    ended (autoreset gives a fresh env state, the policy gets fresh memory).
  * update: minibatches are slices of the ENV axis with time kept whole —
    each minibatch replays its unroll through the GRU from the stored
    rollout-start hidden state (stop-gradient h0, standard recurrent-PPO
    practice), recomputing log-probs/values with done-masked h resets.
  * everything else (GAE with truncation masking, clipped objective, obs
    normalization, 'data'-sharded mesh) is shared with training/ppo.py.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen
from flax import struct

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.training import running_statistics
from pobrax_tpu.training.distribution import NormalTanhDistribution
from pobrax_tpu.training.ppo import compute_gae


class GRUNet(linen.Module):
    """Encoder MLP -> GRU -> policy/value heads; applied one step at a time."""

    encoder_sizes: Tuple[int, ...]
    hidden_size: int
    policy_size: int

    @linen.compact
    def __call__(self, h: jnp.ndarray, obs: jnp.ndarray):
        x = obs
        for i, size in enumerate(self.encoder_sizes):
            x = linen.swish(linen.Dense(size, name=f"enc_{i}")(x))
        h, y = linen.GRUCell(features=self.hidden_size, name="gru")(h, x)
        pol = linen.Dense(self.policy_size, name="policy_head")(y)
        val = jnp.squeeze(linen.Dense(1, name="value_head")(y), axis=-1)
        return h, pol, val


@struct.dataclass
class RNNTrainingState:
    params: Any
    opt_state: Any
    normalizer: running_statistics.RunningStatisticsState
    epochs: jnp.ndarray


@struct.dataclass
class RNNTransition:
    """Time-major (T, B, ...) rollout slice (h is NOT stored per step —
    replay regenerates it from h0)."""

    obs: jnp.ndarray
    action: jnp.ndarray  # pre-tanh
    log_prob: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    truncation: jnp.ndarray
    value: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class RNNPPOConfig:
    num_timesteps: int = 1_000_000
    num_envs: int = 2048
    episode_length: int = 1000
    action_repeat: int = 1
    unroll_length: int = 32
    num_minibatches: int = 8  # slices of the ENV axis (time kept whole)
    num_update_epochs: int = 4
    learning_rate: float = 3e-4
    entropy_cost: float = 1e-2
    discounting: float = 0.97
    gae_lambda: float = 0.95
    clipping_epsilon: float = 0.3
    reward_scaling: float = 1.0
    normalize_observations: bool = True
    normalize_advantages: bool = True
    max_grad_norm: Optional[float] = 0.5
    flatten_optimizer: bool = True  # single-vector update (see ppo.py)
    encoder_sizes: Tuple[int, ...] = (256,)
    hidden_size: int = 128
    # epochs scanned inside one jitted call — amortizes the fixed
    # ~25-30ms per-dispatch cost; identical math/PRNG stream to the host
    # loop (see ppo.PPOConfig.epochs_per_call)
    epochs_per_call: int = 1


class RNNPPOLearner:
    def __init__(self, env: Env, cfg: RNNPPOConfig,
                 mesh: Optional[jax.sharding.Mesh] = None):
        if cfg.num_envs % cfg.num_minibatches:
            raise ValueError("num_envs must divide into num_minibatches")
        self.env = env
        self.cfg = cfg
        self.mesh = mesh
        self.action_size = env.action_size
        self.obs_size = env.observation_size
        self.dist = NormalTanhDistribution(event_size=self.action_size)
        self.net = GRUNet(encoder_sizes=cfg.encoder_sizes,
                          hidden_size=cfg.hidden_size,
                          policy_size=self.dist.param_size)
        self.optimizer = self._make_optimizer()
        self._epoch_fn = self._build_epoch_fn()

    def _make_optimizer(self):
        tx = optax.adam(learning_rate=self.cfg.learning_rate)
        if self.cfg.max_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(self.cfg.max_grad_norm), tx)
        if self.cfg.flatten_optimizer:
            tx = optax.flatten(tx)  # single-vector update (see ppo.py)
        return tx

    def h0(self, batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.cfg.hidden_size))

    def init(self, key: jnp.ndarray) -> RNNTrainingState:
        params = self.net.init(
            key, self.h0(1), jnp.zeros((1, self.obs_size)))
        return RNNTrainingState(
            params=params,
            opt_state=self.optimizer.init(params),
            normalizer=running_statistics.init_state(self.obs_size),
            epochs=jnp.zeros((), jnp.int32),
        )

    # ---- pieces ---------------------------------------------------------------

    def _apply(self, params, normalizer, h, obs):
        """`normalizer=None` means `obs` is already normalized (the epoch
        pre-normalizes the whole rollout once; the loss replay used to
        redo it per timestep per minibatch per update-epoch)."""
        if normalizer is not None and self.cfg.normalize_observations:
            obs = running_statistics.normalize(normalizer, obs)
        return self.net.apply(params, h, obs)

    def make_inference_fn(self) -> Callable:
        """policy(params_tuple, h, obs, key) -> (new_h, action). Thread `h`
        yourself (start from zeros; zero it when your episode resets)."""

        def policy(params_tuple, h, obs, key, deterministic: bool = False):
            normalizer, params = params_tuple
            h, pol, _ = self._apply(params, normalizer, h, obs)
            if deterministic:
                return h, self.dist.mode(pol)
            return h, self.dist.sample(pol, key)

        return policy

    # ---- rollout ---------------------------------------------------------------

    def _rollout(self, ts, env_state: State, h: jnp.ndarray, key: jnp.ndarray):
        def step(carry, _):
            env_state, h, key = carry
            key, k_sample = jax.random.split(key)
            nh, pol, value = self._apply(ts.params, ts.normalizer, h,
                                         env_state.obs)
            pre_tanh = self.dist.sample_no_postprocess(pol, k_sample)
            log_prob = self.dist.log_prob(pol, pre_tanh)
            action = self.dist.postprocess(pre_tanh)
            nstate = self.env.step(env_state, action)
            # fresh memory for the fresh episode the autoreset delivered
            nh = nh * (1.0 - nstate.done[:, None])
            t = RNNTransition(
                obs=env_state.obs,
                action=pre_tanh,
                log_prob=log_prob,
                reward=nstate.reward * self.cfg.reward_scaling,
                done=nstate.done,
                truncation=nstate.info.get(
                    "truncation", jnp.zeros_like(nstate.done)),
                value=value,
            )
            return (nstate, nh, key), t

        (env_state, h_final, _), data = jax.lax.scan(
            step, (env_state, h, key), None, length=self.cfg.unroll_length)
        _, _, bootstrap_value = self._apply(
            ts.params, ts.normalizer, h_final, env_state.obs)
        return env_state, h_final, data, bootstrap_value

    # ---- loss (replays the unroll through the GRU) -----------------------------

    def _loss(self, params, h0, data: RNNTransition,
              advantages, returns, key):
        """`data.obs` arrives pre-normalized from the epoch (see _apply)."""
        cfg = self.cfg

        def replay(h, xs):
            obs, done = xs
            nh, pol, val = self._apply(params, None, h, obs)
            nh = nh * (1.0 - done[:, None])
            return nh, (pol, val)

        _, (pol, value) = jax.lax.scan(
            replay, h0, (data.obs, data.done))  # (T, B, ...)

        log_prob = self.dist.log_prob(pol, data.action)
        ratio = jnp.exp(log_prob - data.log_prob)
        if cfg.normalize_advantages:
            advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        unclipped = ratio * advantages
        clipped = jnp.clip(ratio, 1.0 - cfg.clipping_epsilon,
                           1.0 + cfg.clipping_epsilon) * advantages
        policy_loss = -jnp.mean(jnp.minimum(unclipped, clipped))
        value_loss = 0.5 * jnp.mean(jnp.square(returns - value))
        entropy = jnp.mean(self.dist.entropy(pol, key))
        total = policy_loss + value_loss - cfg.entropy_cost * entropy
        return total, {"total_loss": total, "policy_loss": policy_loss,
                       "value_loss": value_loss, "entropy": entropy}

    # ---- the fused epoch -------------------------------------------------------

    def _build_epoch_fn(self):
        cfg = self.cfg
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)

        def minibatch_step(carry, xs):
            params, opt_state, key = carry
            h0_mb, data, advantages, returns = xs
            key, k_loss = jax.random.split(key)
            (_, metrics), grads = grad_fn(
                params, h0_mb, data, advantages, returns, k_loss)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), metrics

        def epoch(ts: RNNTrainingState, env_state: State, h: jnp.ndarray,
                  key: jnp.ndarray):
            key, k_roll, k_sgd = jax.random.split(key, 3)
            h0_roll = jax.lax.stop_gradient(h)
            env_state, h, data, bootstrap_value = self._rollout(
                ts, env_state, h, k_roll)
            advantages, returns = compute_gae(
                data.reward, data.done, data.truncation, data.value,
                bootstrap_value, cfg.discounting, cfg.gae_lambda)
            advantages = jax.lax.stop_gradient(advantages)
            returns = jax.lax.stop_gradient(returns)

            normalizer = ts.normalizer
            if cfg.normalize_observations:
                normalizer = running_statistics.update(normalizer, data.obs)
                # pre-normalize ONCE with the post-update stats; the loss
                # replay consumes it as-is (values bit-identical to the old
                # per-minibatch normalize, redundant work gone)
                data = data.replace(obs=running_statistics.normalize(
                    normalizer, data.obs))

            # minibatches: STRIDED env interleave (env b -> minibatch b % M),
            # time axis kept whole. With the env axis sharded in contiguous
            # blocks on a 'data' mesh, striding makes every minibatch draw
            # evenly from every device shard — contiguous blocks would leave
            # all but one device idle per grad step (measured: strong-scaling
            # efficiency 0.48 -> see docs/PERFORMANCE.md).
            def shape_mb(x):
                # (T, B, ...) -> (T, B/M, M, ...) -> (M, T, B/M, ...)
                x = x.reshape(x.shape[:1] + (-1, cfg.num_minibatches)
                              + x.shape[2:])
                return jnp.moveaxis(x, (2, 0), (0, 1))

            data_mb = jax.tree.map(shape_mb, (data, advantages, returns))
            h0_mb = jnp.moveaxis(
                h0_roll.reshape((-1, cfg.num_minibatches, cfg.hidden_size)),
                1, 0)

            def sgd_epoch(carry, _):
                carry, metrics = jax.lax.scan(
                    minibatch_step, carry, (h0_mb,) + data_mb)
                return carry, metrics

            (params, opt_state, _), metrics = jax.lax.scan(
                sgd_epoch, (ts.params, ts.opt_state, k_sgd),
                None, length=cfg.num_update_epochs)
            ts = RNNTrainingState(params=params, opt_state=opt_state,
                                  normalizer=normalizer, epochs=ts.epochs + 1)
            mean_metrics = jax.tree.map(jnp.mean, metrics)
            mean_metrics["mean_reward"] = (
                jnp.mean(data.reward) / cfg.reward_scaling)
            return ts, env_state, h, mean_metrics

        return epoch

    def jit_epoch(self):
        if self.mesh is None:
            return jax.jit(self._epoch_fn, donate_argnums=(0, 1, 2))
        P = jax.sharding.PartitionSpec
        data_sharding = jax.sharding.NamedSharding(self.mesh, P("data"))
        replicated = jax.sharding.NamedSharding(self.mesh, P())
        return jax.jit(
            self._epoch_fn,
            in_shardings=(replicated, data_sharding, data_sharding, replicated),
            out_shardings=(replicated, data_sharding, data_sharding, replicated),
            donate_argnums=(0, 1, 2),
        )

    def jit_epochs(self, n: Optional[int] = None):
        """`(ts, env_state, h, key) -> (ts, env_state, h, key', metrics)`:
        n epochs in ONE jitted lax.scan, key threaded like train()'s host
        loop (same epoch-key stream); amortizes per-dispatch latency."""
        n = self.cfg.epochs_per_call if n is None else n

        def epochs(ts, env_state, h, key):
            def body(carry, _):
                ts, env_state, h, key = carry
                key, k_epoch = jax.random.split(key)
                ts, env_state, h, metrics = self._epoch_fn(
                    ts, env_state, h, k_epoch)
                return (ts, env_state, h, key), metrics
            (ts, env_state, h, key), metrics = jax.lax.scan(
                body, (ts, env_state, h, key), None, length=n)
            return ts, env_state, h, key, jax.tree.map(
                lambda x: jnp.mean(x, axis=0), metrics)

        if self.mesh is None:
            return jax.jit(epochs, donate_argnums=(0, 1, 2))
        P = jax.sharding.PartitionSpec
        data_sharding = jax.sharding.NamedSharding(self.mesh, P("data"))
        replicated = jax.sharding.NamedSharding(self.mesh, P())
        return jax.jit(
            epochs,
            in_shardings=(replicated, data_sharding, data_sharding, replicated),
            out_shardings=(replicated, data_sharding, data_sharding,
                           replicated, replicated),
            donate_argnums=(0, 1, 2),
        )


def train(
    env: Env,
    cfg: Optional[RNNPPOConfig] = None,
    seed: int = 0,
    mesh: Optional[jax.sharding.Mesh] = None,
    progress_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1_000_000,
    autoreset_mode: str = "naive",
    watchdog_deadline_s: Optional[float] = 1800.0,
    **cfg_overrides,
):
    """Train recurrent PPO on a core env; returns
    (inference_fn, params_tuple, history). inference_fn threads a GRU hidden
    state: `h, action = inference_fn(params_tuple, h, obs, key)`.

    With `checkpoint_dir`, training state is saved every `checkpoint_every`
    env-steps and resumed from the latest step dir (same crash-recovery
    contract as ppo.train; env state and hidden state restart fresh — only
    params/optimizer/normalizer/epoch survive, which is the standard
    recurrent-PPO resume)."""
    from pobrax_tpu.envs import wrappers

    cfg = dataclasses.replace(cfg or RNNPPOConfig(), **cfg_overrides)
    wrapped = wrappers.ActionRepeatWrapper(env, cfg.action_repeat)
    wrapped = wrappers.EpisodeWrapper(wrapped, cfg.episode_length, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=cfg.num_envs)
    wrapped = wrappers.randomized_autoreset(wrapped, autoreset_mode)

    learner = RNNPPOLearner(wrapped, cfg, mesh=mesh)
    key = jax.random.PRNGKey(seed)
    key, k_init, k_reset = jax.random.split(key, 3)
    ts = learner.init(k_init)
    resumed_steps = 0
    if checkpoint_dir is not None:
        from pobrax_tpu.training import checkpoint as ckpt
        latest = ckpt.latest_step_dir(checkpoint_dir)
        if latest is not None:
            ts = ckpt.restore(latest, template=ts)
            resumed_steps = (int(ts.epochs) * cfg.unroll_length
                             * cfg.num_envs * cfg.action_repeat)
            key = jax.random.fold_in(key, int(ts.epochs))
    env_state = jax.jit(wrapped.reset)(jax.random.split(k_reset, cfg.num_envs))
    h = learner.h0(cfg.num_envs)
    if mesh is not None:
        P = jax.sharding.PartitionSpec
        data_sh = jax.sharding.NamedSharding(mesh, P("data"))
        env_state = jax.device_put(env_state, data_sh)
        h = jax.device_put(h, data_sh)
        ts = jax.device_put(ts, jax.sharding.NamedSharding(mesh, P()))

    epc = max(1, cfg.epochs_per_call)
    epoch_fn = learner.jit_epochs(epc) if epc > 1 else learner.jit_epoch()
    steps_per_epoch = cfg.unroll_length * cfg.num_envs * cfg.action_repeat
    steps_per_call = steps_per_epoch * epc
    remaining = max(0, cfg.num_timesteps - resumed_steps)
    num_calls = max(0 if resumed_steps else 1, -(-remaining // steps_per_call))
    history = []
    t0 = time.perf_counter()
    last_ckpt = resumed_steps

    from pobrax_tpu.parallel import health
    wd = (health.Watchdog(deadline_s=watchdog_deadline_s).start_monitor()
          if watchdog_deadline_s else None)
    if jax.process_count() > 1:
        health.ping()  # startup liveness barrier (see ppo.train)
    try:
        for i in range(num_calls):
            if epc > 1:
                ts, env_state, h, key, metrics = epoch_fn(
                    ts, env_state, h, key)
            else:
                key, k_epoch = jax.random.split(key)
                ts, env_state, h, metrics = epoch_fn(ts, env_state, h, k_epoch)
            if wd is not None:
                jax.block_until_ready(metrics)
                wd.beat()
            total_steps = resumed_steps + (i + 1) * steps_per_call
            if progress_fn is not None:
                metrics = jax.tree.map(float, jax.device_get(metrics))
                metrics["steps_per_second"] = (
                    (i + 1) * steps_per_call / (time.perf_counter() - t0))
                history.append(metrics)
                progress_fn(total_steps, metrics)
            if checkpoint_dir is not None and (
                    total_steps - last_ckpt >= checkpoint_every
                    or i == num_calls - 1):
                if jax.process_count() > 1:
                    health.ping()
                from pobrax_tpu.training import checkpoint as ckpt
                ckpt.save_step(checkpoint_dir, total_steps, ts)
                last_ckpt = total_steps
    finally:
        if wd is not None:
            wd.stop_monitor()
    return learner.make_inference_fn(), (ts.normalizer, ts.params), history

"""Soft Actor-Critic learner, fused on-device like the PPO one.

The reference's networks were consumed by external brax PPO/SAC (SURVEY.md
§3.5); this is the framework's SAC: twin Q critics, tanh-normal actor,
learned entropy temperature, and a device-resident ring replay buffer
(training/replay.py). One jitted epoch = `steps_per_epoch` env steps
(each inserting into replay) interleaved with gradient steps via
`lax.scan` — no host round-trips inside an epoch.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.models import networks
from pobrax_tpu.training import replay, running_statistics
from pobrax_tpu.training.distribution import NormalTanhDistribution


@struct.dataclass
class SACParams:
    policy: Any
    q: Any
    target_q: Any
    log_alpha: jnp.ndarray


@struct.dataclass
class SACTrainingState:
    params: SACParams
    policy_opt: Any
    q_opt: Any
    alpha_opt: Any
    normalizer: running_statistics.RunningStatisticsState
    buffer: replay.ReplayState
    # epoch counter (env-steps = epochs * steps_per_epoch * num_envs,
    # reconstructed host-side; an int32 env-step counter would overflow)
    epochs: jnp.ndarray


@dataclasses.dataclass(frozen=True)
class SACConfig:
    num_timesteps: int = 1_000_000
    num_envs: int = 128
    episode_length: int = 1000
    replay_capacity: int = 8192  # slots; each slot holds one (num_envs, ...) batch
    batch_size: int = 256  # individual transitions per gradient step
    steps_per_epoch: int = 16  # env steps (and grad steps) per jitted epoch
    grad_steps_per_env_step: int = 1
    min_replay: int = 64
    learning_rate: float = 3e-4
    discounting: float = 0.99
    tau: float = 0.005
    reward_scaling: float = 1.0
    normalize_observations: bool = True
    hidden: Tuple[int, ...] = (256, 256)


class SACLearner:
    def __init__(self, env: Env, cfg: SACConfig,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.mesh = mesh
        self.axis = "data" if mesh is not None else None
        self.n_shards = int(mesh.shape["data"]) if mesh is not None else 1
        if cfg.num_envs % self.n_shards or cfg.batch_size % self.n_shards:
            raise ValueError("num_envs and batch_size must divide the mesh "
                             "'data' axis")
        self.env = env
        self.cfg = cfg
        self.obs_size = env.observation_size
        self.action_size = env.action_size
        self.dist = NormalTanhDistribution(event_size=self.action_size)
        self.policy_model = networks.make_model(
            list(cfg.hidden) + [self.dist.param_size], self.obs_size)
        # twin Q: two INDEPENDENT critics (stacked params, vmapped apply) —
        # a shared trunk would make the min() clipping near-vacuous
        self.q_module = networks.MLP(
            layer_sizes=list(cfg.hidden) + [1], activation=jax.nn.relu)
        # single-vector Adam updates (see ppo.py::_make_optimizer)
        self.policy_opt = optax.flatten(optax.adam(cfg.learning_rate))
        self.q_opt = optax.flatten(optax.adam(cfg.learning_rate))
        self.alpha_opt = optax.adam(cfg.learning_rate)  # scalar already
        self.target_entropy = -0.5 * self.action_size

    # ---- init -----------------------------------------------------------------

    def init(self, key: jnp.ndarray, env_state: State) -> SACTrainingState:
        kp, kq = jax.random.split(key)
        policy = self.policy_model.init(kp)
        dummy = jnp.zeros((1, self.obs_size + self.action_size))
        q = jax.vmap(lambda k: self.q_module.init(k, dummy))(
            jax.random.split(kq, 2))  # stacked twin-critic params
        # target starts equal to q but must be a distinct buffer (donation
        # would otherwise see the same array twice)
        params = SACParams(
            policy=policy, q=q, target_q=jax.tree.map(jnp.copy, q),
            log_alpha=jnp.zeros(()))
        sample_transition = {
            "obs": env_state.obs,
            "action": jnp.zeros(env_state.obs.shape[:-1] + (self.action_size,)),
            "reward": env_state.reward,
            "next_obs": env_state.obs,
            "done": env_state.done,
            "truncation": env_state.done,
        }
        return SACTrainingState(
            params=params,
            policy_opt=self.policy_opt.init(policy),
            q_opt=self.q_opt.init(q),
            alpha_opt=self.alpha_opt.init(params.log_alpha),
            normalizer=running_statistics.init_state(self.obs_size),
            buffer=replay.init(sample_transition, self.cfg.replay_capacity),
            epochs=jnp.zeros((), jnp.int32),
        )

    # ---- pieces ---------------------------------------------------------------

    def _norm(self, normalizer, obs):
        if self.cfg.normalize_observations:
            return running_statistics.normalize(normalizer, obs)
        return obs

    def _q_values(self, q_params, normalizer, obs, action):
        x = jnp.concatenate([self._norm(normalizer, obs), action], axis=-1)
        # apply both critics; (..., 2) with the ensemble axis last
        out = jax.vmap(lambda p: self.q_module.apply(p, x))(q_params)
        return jnp.moveaxis(jnp.squeeze(out, -1), 0, -1)

    def _policy_dist(self, policy_params, normalizer, obs):
        return self.policy_model.apply(policy_params, self._norm(normalizer, obs))

    def _critic_loss(self, q_params, params: SACParams, normalizer, batch, key):
        alpha = jnp.exp(params.log_alpha)
        dist_params = self._policy_dist(params.policy, normalizer, batch["next_obs"])
        next_pre = self.dist.sample_no_postprocess(dist_params, key)
        next_action = self.dist.postprocess(next_pre)
        next_logp = self.dist.log_prob(dist_params, next_pre)
        next_q = self._q_values(params.target_q, normalizer, batch["next_obs"], next_action)
        next_v = jnp.min(next_q, axis=-1) - alpha * next_logp
        # bootstrap through truncation, not through true termination —
        # sound because next_obs stores the PRE-autoreset final observation
        not_terminal = 1.0 - batch["done"] * (1.0 - batch["truncation"])
        target = batch["reward"] * self.cfg.reward_scaling \
            + self.cfg.discounting * not_terminal * next_v
        target = jax.lax.stop_gradient(target)
        q = self._q_values(q_params, normalizer, batch["obs"], batch["action"])
        return 0.5 * jnp.mean(jnp.sum(jnp.square(q - target[..., None]), axis=-1))

    def _actor_loss(self, policy_params, params: SACParams, normalizer, batch, key):
        alpha = jnp.exp(params.log_alpha)
        dist_params = self._policy_dist(policy_params, normalizer, batch["obs"])
        pre = self.dist.sample_no_postprocess(dist_params, key)
        action = self.dist.postprocess(pre)
        logp = self.dist.log_prob(dist_params, pre)
        q = self._q_values(params.q, normalizer, batch["obs"], action)
        return jnp.mean(alpha * logp - jnp.min(q, axis=-1)), logp

    def _alpha_loss(self, log_alpha, logp):
        return jnp.mean(-jnp.exp(log_alpha)
                        * jax.lax.stop_gradient(logp + self.target_entropy))

    # ---- the fused epoch --------------------------------------------------------

    def build_epoch_fn(self) -> Callable:
        cfg = self.cfg
        # under shard_map shapes are per-shard: each shard samples
        # batch_size/n_shards transitions from ITS OWN envs' buffer columns
        # and the grads pmean over the mesh axis (replay never crosses ICI)
        local_bs = cfg.batch_size // self.n_shards
        axis = self.axis

        def pmean(x):
            return jax.lax.pmean(x, axis) if axis is not None else x

        def grad_step(ts: SACTrainingState, key):
            k1, k2, k3 = jax.random.split(key, 3)
            # batch_size INDIVIDUAL transitions (random slot AND env column) —
            # whole-slot sampling would train on time-correlated blocks and
            # make `batch_size` mean slots, not transitions
            batch = replay.sample_transitions(ts.buffer, k1, local_bs)

            q_loss, q_grads = jax.value_and_grad(self._critic_loss)(
                ts.params.q, ts.params, ts.normalizer, batch, k2)
            q_grads = pmean(q_grads)
            q_updates, q_opt = self.q_opt.update(q_grads, ts.q_opt)
            q_params = optax.apply_updates(ts.params.q, q_updates)

            (a_loss, logp), a_grads = jax.value_and_grad(
                self._actor_loss, has_aux=True)(
                ts.params.policy, ts.params, ts.normalizer, batch, k3)
            a_grads = pmean(a_grads)
            p_updates, policy_opt = self.policy_opt.update(a_grads, ts.policy_opt)
            policy_params = optax.apply_updates(ts.params.policy, p_updates)

            al_loss, al_grads = jax.value_and_grad(self._alpha_loss)(
                ts.params.log_alpha, logp)
            al_grads = pmean(al_grads)
            al_updates, alpha_opt = self.alpha_opt.update(al_grads, ts.alpha_opt)
            log_alpha = optax.apply_updates(ts.params.log_alpha, al_updates)

            target_q = jax.tree.map(
                lambda t, o: t * (1.0 - cfg.tau) + o * cfg.tau,
                ts.params.target_q, q_params)
            params = SACParams(policy=policy_params, q=q_params,
                               target_q=target_q, log_alpha=log_alpha)
            ts = ts.replace(params=params, policy_opt=policy_opt,
                            q_opt=q_opt, alpha_opt=alpha_opt)
            return ts, {"q_loss": pmean(q_loss), "actor_loss": pmean(a_loss),
                        "alpha": jnp.exp(log_alpha)}

        def epoch(ts: SACTrainingState, env_state: State, key: jnp.ndarray):
            def one_step(carry, _):
                ts, env_state, key = carry
                key, k_act, k_grad = jax.random.split(key, 3)
                dist_params = self._policy_dist(
                    ts.params.policy, ts.normalizer, env_state.obs)
                pre = self.dist.sample_no_postprocess(dist_params, k_act)
                action = self.dist.postprocess(pre)
                nstate = self.env.step(env_state, action)
                # next_obs must be the PRE-autoreset final observation — on a
                # done step nstate.obs is already the next episode's initial
                # obs (the autoreset wrappers expose the true one in
                # info['final_obs'])
                transition = {
                    "obs": env_state.obs,
                    "action": action,
                    "reward": nstate.reward,
                    "next_obs": nstate.info.get("final_obs", nstate.obs),
                    "done": nstate.done,
                    "truncation": nstate.info.get(
                        "truncation", jnp.zeros_like(nstate.done)),
                }
                buffer = replay.insert(ts.buffer, transition)
                normalizer = ts.normalizer
                if cfg.normalize_observations:
                    normalizer = running_statistics.update(
                        normalizer, env_state.obs, axis_name=axis)
                ts = ts.replace(buffer=buffer, normalizer=normalizer)

                def do_grads(ts):
                    ts2 = ts
                    metrics = None
                    for i in range(cfg.grad_steps_per_env_step):
                        ts2, metrics = grad_step(
                            ts2, jax.random.fold_in(k_grad, i))
                    return ts2, metrics

                def skip(ts):
                    zero = {"q_loss": jnp.float32(0), "actor_loss": jnp.float32(0),
                            "alpha": jnp.exp(ts.params.log_alpha)}
                    return ts, zero

                ts, metrics = jax.lax.cond(
                    ts.buffer.size >= cfg.min_replay, do_grads, skip, ts)
                metrics["mean_reward"] = pmean(jnp.mean(nstate.reward))
                return (ts, nstate, key), metrics

            (ts, env_state, _), metrics = jax.lax.scan(
                one_step, (ts, env_state, key), None, length=cfg.steps_per_epoch)
            ts = ts.replace(epochs=ts.epochs + 1)
            return ts, env_state, jax.tree.map(jnp.mean, metrics)

        if self.mesh is None:
            return epoch

        # SPMD epoch over the 'data' axis (same design as sac_rnn): envs
        # and replay columns sharded, learner replicated via pmean.
        from jax.experimental.shard_map import shard_map

        def epoch_sharded(ts, env_state, key):
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            return epoch(ts, env_state, key)

        P = jax.sharding.PartitionSpec
        ts_spec = self.state_spec()
        return shard_map(
            epoch_sharded, mesh=self.mesh,
            in_specs=(ts_spec, P("data"), P()),
            out_specs=(ts_spec, P("data"), P()),
            check_rep=False)

    def state_spec(self):
        """PartitionSpec pytree: replay env-columns sharded on 'data',
        everything else replicated."""
        P = jax.sharding.PartitionSpec
        rep = P()
        buf_spec = replay.ReplayState(
            data={f: P(None, "data") for f in (
                "obs", "action", "reward", "next_obs", "done", "truncation")},
            insert_pos=rep, size=rep)
        return SACTrainingState(
            params=rep, policy_opt=rep, q_opt=rep, alpha_opt=rep,
            normalizer=rep, buffer=buf_spec, epochs=rep)

    def state_sharding(self):
        mk = lambda spec: jax.sharding.NamedSharding(self.mesh, spec)
        return jax.tree.map(mk, self.state_spec(),
                            is_leaf=lambda x: isinstance(
                                x, jax.sharding.PartitionSpec))

    def make_inference_fn(self) -> Callable:
        def policy(params_tuple, obs, key, deterministic: bool = False):
            normalizer, policy_params = params_tuple
            dist_params = self._policy_dist(policy_params, normalizer, obs)
            if deterministic:
                return self.dist.mode(dist_params)
            return self.dist.sample(dist_params, key)
        return policy


def train(
    env: Env,
    cfg: Optional[SACConfig] = None,
    seed: int = 0,
    mesh: Optional[jax.sharding.Mesh] = None,
    progress_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    autoreset_mode: str = "naive",
    watchdog_deadline_s: Optional[float] = 1800.0,
    **cfg_overrides,
):
    """Train SAC on a core env; returns (inference_fn, params_tuple, history).

    `autoreset_mode`: 'naive' (per-step resample) or 'cached' (on-device
    cached refresh, faster stepping — docs/PERFORMANCE.md).
    With `mesh`, the epoch runs as one shard_map over 'data' (see
    sac_rnn.train — same replay-stays-local design)."""
    from pobrax_tpu.envs import wrappers

    cfg = dataclasses.replace(cfg or SACConfig(), **cfg_overrides)
    wrapped = wrappers.EpisodeWrapper(env, cfg.episode_length, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=cfg.num_envs)
    wrapped = wrappers.randomized_autoreset(wrapped, autoreset_mode)

    learner = SACLearner(wrapped, cfg, mesh=mesh)
    key = jax.random.PRNGKey(seed)
    key, k_init, k_reset = jax.random.split(key, 3)
    env_state = jax.jit(wrapped.reset)(jax.random.split(k_reset, cfg.num_envs))
    ts = learner.init(k_init, env_state)
    if mesh is not None:
        dsh = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        env_state = jax.device_put(env_state, dsh)
        ts = jax.device_put(ts, learner.state_sharding())
    epoch_fn = jax.jit(learner.build_epoch_fn(), donate_argnums=(0,))

    steps_per_epoch = cfg.steps_per_epoch * cfg.num_envs
    num_epochs = max(1, cfg.num_timesteps // steps_per_epoch)
    history = []
    t0 = time.perf_counter()

    from pobrax_tpu.parallel import health
    wd = (health.Watchdog(deadline_s=watchdog_deadline_s).start_monitor()
          if watchdog_deadline_s else None)
    if jax.process_count() > 1:
        health.ping()  # startup liveness barrier (see ppo.train)
    try:
        for i in range(num_epochs):
            key, k_epoch = jax.random.split(key)
            ts, env_state, metrics = epoch_fn(ts, env_state, k_epoch)
            if wd is not None:
                jax.block_until_ready(metrics)
                wd.beat()
            if progress_fn is not None:
                metrics = jax.tree.map(float, jax.device_get(metrics))
                metrics["steps_per_second"] = (
                    (i + 1) * steps_per_epoch / (time.perf_counter() - t0))
                history.append(metrics)
                progress_fn((i + 1) * steps_per_epoch, metrics)
    finally:
        if wd is not None:
            wd.stop_monitor()
    return learner.make_inference_fn(), (ts.normalizer, ts.params.policy), history

"""PPO learner, fused with the on-device scan rollout.

The reference delegates training to external brax PPO (SURVEY.md §3.5:
"these plug into brax's external PPO/SAC"); this module is the framework's
own learner, built TPU-first:

  * One training epoch = ONE jitted XLA program: `unroll_length` env steps
    via `lax.scan` (physics + task logic + autoreset fused), GAE, then
    `num_update_epochs x num_minibatches` clipped-PPO updates via nested
    `lax.scan` — no host round-trips inside an epoch.
  * Data parallelism is sharding, not code: the env-state batch and rollout
    data carry a `NamedSharding(mesh, P('data'))` layout; parameters are
    replicated. XLA inserts the gradient all-reduce (psum over ICI) at the
    minibatch boundary automatically. Single-device training is the same
    program on a 1-device mesh.
  * Observation normalization (running mean/std) and advantage
    normalization, matching standard brax-PPO practice.

Quality-of-life parity targets: the `train(...)` signature mirrors the brax
v0 PPO entry point the reference's envs were consumed by (num_timesteps,
num_envs, unroll_length, minibatches, epochs, learning_rate, entropy_cost,
discounting, gae_lambda, clipping_epsilon, reward_scaling).
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.models import networks
from pobrax_tpu.training import running_statistics
from pobrax_tpu.training.distribution import NormalTanhDistribution


@struct.dataclass
class PPOParams:
    policy: Any
    value: Any


@struct.dataclass
class TrainingState:
    params: PPOParams
    opt_state: Any
    normalizer: running_statistics.RunningStatisticsState
    # epoch counter, not raw env-steps: an int32 env-step counter overflows
    # 2^31 within an hour at measured throughput; env-steps are reconstructed
    # host-side as epochs * steps_per_epoch (resume assumes a stable config)
    epochs: jnp.ndarray


@struct.dataclass
class Transition:
    """One slice of rollout data, time-major (T, B, ...)."""

    obs: jnp.ndarray
    action: jnp.ndarray  # pre-tanh sample
    log_prob: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    truncation: jnp.ndarray
    value: jnp.ndarray


def compute_gae(
    rewards: jnp.ndarray,
    dones: jnp.ndarray,
    truncation: jnp.ndarray,
    values: jnp.ndarray,
    bootstrap_value: jnp.ndarray,
    discount: float,
    gae_lambda: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized advantage estimation over a (T, B) rollout.

    Terminal `done` kills the bootstrap. At a *truncated* step (episode cut
    by the step budget) the stored obs_{t+1} is already the NEXT episode's
    post-autoreset initial observation, so neither the TD delta nor the GAE
    accumulator may cross the boundary: both are masked by
    (1 - truncation), matching brax v0 PPO's compute_gae (the trainer the
    reference's envs were consumed by). The truncated step itself therefore
    contributes zero advantage — the honest choice given the pre-reset final
    observation is not stored in the rollout.
    """
    values_tp1 = jnp.concatenate([values[1:], bootstrap_value[None]], axis=0)
    truncation_mask = 1.0 - truncation
    # truncated steps are not true terminations
    termination = dones * (1.0 - truncation)

    def body(carry, xs):
        gae = carry
        reward, term, tmask, v, v_tp1 = xs
        delta = (reward + discount * (1.0 - term) * v_tp1 - v) * tmask
        gae = delta + discount * gae_lambda * (1.0 - term) * tmask * gae
        return gae, gae

    _, advantages = jax.lax.scan(
        body,
        jnp.zeros_like(bootstrap_value),
        (rewards, termination, truncation_mask, values, values_tp1),
        reverse=True,
    )
    return advantages, advantages + values


def minibatch_indices(k_perm: jnp.ndarray, T: int, B: int, M: int,
                      blocks: Optional[int]) -> jnp.ndarray:
    """Flat (M, minibatch) int32 indices into the (T*B)-flattened rollout.

    ONE gather per payload leaf replaces the old reshape/swapaxes/permute
    chain (2 full-payload transposes + a gather, per update epoch).
    Minibatch composition is bit-identical to the old chain:
    jax.random.permutation(k, n) draws the same shuffle as
    permutation(k, x) (both route through the same _shuffle), and the index
    arithmetic reproduces the (T, D, B/D) -> (D, T*B/D) block flattening.

    blocks=None: one global permutation of the T*B items.
    blocks=D: permute within each of D env blocks and give every minibatch
    an equal slice S of each block (shard-local shuffle on a 'data' mesh —
    every device contributes to every minibatch with zero resharding).
    """
    if blocks:
        D = blocks
        Bd = B // D
        perms = jax.vmap(lambda k: jax.random.permutation(k, T * Bd))(
            jax.random.split(k_perm, D))  # (D, T*Bd)
        # local index l in block d is (t = l // Bd, b' = l % Bd)
        # -> flat t*B + d*Bd + b'
        d_col = jnp.arange(D, dtype=perms.dtype)[:, None]
        flat = (perms // Bd) * B + d_col * Bd + perms % Bd
        # (D, T*Bd) -> (D, M, S) -> (M, D, S) -> (M, D*S)
        flat = flat.reshape(D, M, -1)
        return jnp.swapaxes(flat, 0, 1).reshape(M, -1)
    return jax.random.permutation(k_perm, T * B).reshape(M, -1)


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    num_timesteps: int = 1_000_000
    num_envs: int = 2048
    episode_length: int = 1000
    action_repeat: int = 1
    unroll_length: int = 20
    num_minibatches: int = 32
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
    # single-vector optimizer update (optax.flatten); per-element math is
    # unchanged — see _make_optimizer
    flatten_optimizer: bool = True
    policy_hidden: Tuple[int, ...] = (32, 32, 32, 32)
    value_hidden: Tuple[int, ...] = (256, 256, 256, 256, 256)
    # Minibatch shuffle locality. None = one global permutation of the
    # flattened (T*B) rollout — simplest, but on a 'data'-sharded mesh it
    # reshards the whole rollout every minibatch (measured: PPO-epoch
    # strong-scaling efficiency 0.24 @ 8 devices, docs/PERFORMANCE.md).
    # An int D = permute within D env-blocks and give every minibatch an
    # equal slice of each block: with D = the mesh 'data'-axis size the
    # shuffle is shard-LOCAL and every device contributes to every
    # minibatch. Auto-set to the mesh size when a mesh is passed.
    shuffle_blocks: Optional[int] = None
    # 'bfloat16' runs the policy/value matmuls in bf16 (params stay f32,
    # outputs cast back to f32 before GAE/loss math) — the MXU executes
    # bf16 matmuls at twice the f32 rate. Opt-in: None = full f32.
    network_dtype: Optional[str] = None
    # Epochs executed inside ONE jitted call (lax.scan over the epoch fn).
    # Each host->device dispatch costs a fixed ~25-30ms on the TPU relay —
    # ~40% of a 16-unroll epoch at 4096 envs (docs/PERFORMANCE.md); scanning
    # N epochs per call amortizes it N-fold. Identical math and PRNG stream
    # to N host-loop epochs (the scan body splits the carried key exactly
    # like train()'s host loop did); only the host-visible granularity of
    # metrics/checkpoints/watchdog beats coarsens to every N epochs.
    epochs_per_call: int = 1


class PPOLearner:
    """Builds the jitted epoch function for a wrapped (batched) env."""

    def __init__(self, env: Env, cfg: PPOConfig, mesh: Optional[jax.sharding.Mesh] = None):
        self.env = env
        self.cfg = cfg
        self.mesh = mesh
        self.action_size = env.action_size
        self.obs_size = env.observation_size
        self.dist = NormalTanhDistribution(event_size=self.action_size)
        net_dtype = jnp.bfloat16 if cfg.network_dtype == "bfloat16" \
            else jnp.float32
        self.policy_model = networks.make_model(
            list(cfg.policy_hidden) + [self.dist.param_size], self.obs_size,
            dtype=net_dtype)
        self.value_model = networks.make_model(
            list(cfg.value_hidden) + [1], self.obs_size, dtype=net_dtype)
        self.optimizer = self._make_optimizer()
        self.shuffle_blocks = cfg.shuffle_blocks
        if self.shuffle_blocks is None and mesh is not None:
            self.shuffle_blocks = int(mesh.shape.get("data", 1))
        if self.shuffle_blocks is not None:
            per_block = cfg.unroll_length * cfg.num_envs // self.shuffle_blocks
            if (cfg.num_envs % self.shuffle_blocks
                    or per_block % cfg.num_minibatches):
                raise ValueError(
                    "num_envs must divide by shuffle_blocks and "
                    "unroll*envs/blocks by num_minibatches")
        self._epoch_fn = self._build_epoch_fn()

    def _make_optimizer(self):
        tx = optax.adam(learning_rate=self.cfg.learning_rate)
        if self.cfg.max_grad_norm is not None:
            tx = optax.chain(optax.clip_by_global_norm(self.cfg.max_grad_norm), tx)
        if self.cfg.flatten_optimizer:
            # single-vector Adam: one fused elementwise update over the
            # concatenated params instead of ~2 dozen per-leaf kernels, in
            # a scan body that executes serially minibatches x update-epochs
            # times per epoch. Per-element math is unchanged (global-norm
            # clip reassociates the sum of squares at float round-off).
            tx = optax.flatten(tx)
        return tx

    # ---- init ----------------------------------------------------------------

    def init(self, key: jnp.ndarray) -> TrainingState:
        kp, kv = jax.random.split(key)
        params = PPOParams(
            policy=self.policy_model.init(kp), value=self.value_model.init(kv))
        return TrainingState(
            params=params,
            opt_state=self.optimizer.init(params),
            normalizer=running_statistics.init_state(self.obs_size),
            epochs=jnp.zeros((), jnp.int32),
        )

    # ---- policy --------------------------------------------------------------

    def _policy_params_fn(self, params: PPOParams, normalizer, obs: jnp.ndarray):
        """`normalizer=None` means `obs` is already normalized (the epoch
        pre-normalizes the whole rollout ONCE — the old per-minibatch
        normalize ran 2x per minibatch x minibatches x update-epochs on
        identical data; measured as a real slice of the SGD phase)."""
        if normalizer is not None and self.cfg.normalize_observations:
            obs = running_statistics.normalize(normalizer, obs)
        # distribution/loss math stays f32 regardless of matmul dtype
        return self.policy_model.apply(params.policy, obs).astype(jnp.float32)

    def _value_fn(self, params: PPOParams, normalizer, obs: jnp.ndarray):
        if normalizer is not None and self.cfg.normalize_observations:
            obs = running_statistics.normalize(normalizer, obs)
        return jnp.squeeze(self.value_model.apply(params.value, obs),
                           axis=-1).astype(jnp.float32)

    def make_inference_fn(self) -> Callable:
        """Returns `policy(params_tuple, obs, key) -> action in [-1, 1]`
        where params_tuple = (normalizer_state, policy_params)."""

        def policy(params_tuple, obs, key, deterministic: bool = False):
            normalizer, policy_params = params_tuple
            obs = running_statistics.normalize(normalizer, obs) \
                if self.cfg.normalize_observations else obs
            dist_params = self.policy_model.apply(policy_params, obs)
            if deterministic:
                return self.dist.mode(dist_params)
            return self.dist.sample(dist_params, key)

        return policy

    # ---- rollout + loss --------------------------------------------------------

    def _rollout(self, ts: TrainingState, env_state: State, key: jnp.ndarray):
        """The serial scan carries ONLY what the trajectory depends on:
        normalize -> policy forward -> sample -> env.step. The value head
        (the big [256x5] net) and log_prob do not influence the trajectory,
        so they run POST-HOC over the whole (T, B) rollout in one batched
        MXU call instead of T serial small calls inside the scan — measured
        as the dominant rollout overhead on TPU (docs/PERFORMANCE.md).
        log_prob is computed from the SAME dist_params used for sampling
        (carried out of the scan), so it matches the in-loop computation;
        the post-hoc normalize is bit-identical because ts.normalizer is
        fixed for the whole rollout (stats update after, in the epoch)."""
        def step(carry, _):
            env_state, key = carry
            key, k_sample = jax.random.split(key)
            norm_obs = (running_statistics.normalize(
                ts.normalizer, env_state.obs)
                if self.cfg.normalize_observations else env_state.obs)
            dist_params = self._policy_params_fn(ts.params, None, norm_obs)
            pre_tanh = self.dist.sample_no_postprocess(dist_params, k_sample)
            action = self.dist.postprocess(pre_tanh)
            nstate = self.env.step(env_state, action)
            ys = (env_state.obs, pre_tanh, dist_params,
                  nstate.reward * self.cfg.reward_scaling, nstate.done,
                  nstate.info.get("truncation", jnp.zeros_like(nstate.done)))
            return (nstate, key), ys

        (env_state, _), (obs, pre_tanh, dist_params, reward, done, trunc) = \
            jax.lax.scan(step, (env_state, key), None,
                         length=self.cfg.unroll_length)
        log_prob = self.dist.log_prob(dist_params, pre_tanh)  # (T, B)
        norm_all = (running_statistics.normalize(ts.normalizer, obs)
                    if self.cfg.normalize_observations else obs)
        value = self._value_fn(ts.params, None, norm_all)  # one (T*B) call
        data = Transition(obs=obs, action=pre_tanh, log_prob=log_prob,
                          reward=reward, done=done, truncation=trunc,
                          value=value)
        bootstrap_value = self._value_fn(ts.params, ts.normalizer, env_state.obs)
        return env_state, data, bootstrap_value

    def _loss(self, params: PPOParams, normalizer, data: Transition,
              advantages: jnp.ndarray, returns: jnp.ndarray, key: jnp.ndarray):
        cfg = self.cfg
        dist_params = self._policy_params_fn(params, normalizer, data.obs)
        log_prob = self.dist.log_prob(dist_params, data.action)
        ratio = jnp.exp(log_prob - data.log_prob)
        if cfg.normalize_advantages:
            advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        unclipped = ratio * advantages
        clipped = jnp.clip(
            ratio, 1.0 - cfg.clipping_epsilon, 1.0 + cfg.clipping_epsilon) * advantages
        policy_loss = -jnp.mean(jnp.minimum(unclipped, clipped))

        value = self._value_fn(params, normalizer, data.obs)
        value_loss = 0.5 * jnp.mean(jnp.square(returns - value))

        entropy = jnp.mean(self.dist.entropy(dist_params, key))
        entropy_loss = -cfg.entropy_cost * entropy

        total = policy_loss + value_loss + entropy_loss
        return total, {
            "total_loss": total,
            "policy_loss": policy_loss,
            "value_loss": value_loss,
            "entropy": entropy,
        }

    # ---- the fused epoch -------------------------------------------------------

    def _build_epoch_fn(self):
        cfg = self.cfg
        grad_fn = jax.value_and_grad(self._loss, has_aux=True)

        def minibatch_step(carry, xs):
            params, opt_state, key = carry
            data, advantages, returns = xs
            key, k_loss = jax.random.split(key)
            # normalizer=None: data.obs was pre-normalized once by the epoch
            (_, metrics), grads = grad_fn(
                params, None, data, advantages, returns, k_loss)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), metrics

        def epoch(ts: TrainingState, env_state: State, key: jnp.ndarray):
            key, k_roll, k_sgd = jax.random.split(key, 3)
            env_state, data, bootstrap_value = self._rollout(ts, env_state, k_roll)
            advantages, returns = compute_gae(
                data.reward, data.done, data.truncation, data.value,
                bootstrap_value, cfg.discounting, cfg.gae_lambda)
            advantages = jax.lax.stop_gradient(advantages)
            returns = jax.lax.stop_gradient(returns)

            normalizer = ts.normalizer
            if cfg.normalize_observations:
                normalizer = running_statistics.update(normalizer, data.obs)
                # normalize the whole rollout ONCE with the post-update
                # statistics — every minibatch loss used to redo this (2x:
                # policy + value) on identical data; the values are
                # bit-identical, only the redundant work is gone
                data = data.replace(obs=running_statistics.normalize(
                    normalizer, data.obs))

            payload = (data, advantages, returns)

            blocks = self.shuffle_blocks
            T, B = data.reward.shape
            M = cfg.num_minibatches

            def sgd_epoch(carry, _):
                params, opt_state, key = carry
                key, k_perm, k_mb = jax.random.split(key, 3)
                idx = minibatch_indices(k_perm, T, B, M, blocks)

                def shape_mb(x):
                    return x.reshape((T * B,) + x.shape[2:])[idx]

                carry2, metrics = jax.lax.scan(
                    minibatch_step,
                    (params, opt_state, k_mb),
                    jax.tree.map(shape_mb, payload),
                )
                params, opt_state, _ = carry2
                return (params, opt_state, key), metrics

            (params, opt_state, _), metrics = jax.lax.scan(
                sgd_epoch,
                (ts.params, ts.opt_state, k_sgd),
                None,
                length=cfg.num_update_epochs,
            )
            ts = TrainingState(
                params=params,
                opt_state=opt_state,
                normalizer=normalizer,
                epochs=ts.epochs + 1,
            )
            mean_metrics = jax.tree.map(jnp.mean, metrics)
            mean_metrics["mean_reward"] = jnp.mean(data.reward) / cfg.reward_scaling
            return ts, env_state, mean_metrics

        return epoch

    def jit_epoch(self):
        """Jit the epoch; if a mesh was given, shard the env batch on 'data'
        and replicate everything else (XLA then emits the gradient psum)."""
        if self.mesh is None:
            return jax.jit(self._epoch_fn, donate_argnums=(0, 1))
        P = jax.sharding.PartitionSpec
        data_sharding = jax.sharding.NamedSharding(self.mesh, P("data"))
        replicated = jax.sharding.NamedSharding(self.mesh, P())
        return jax.jit(
            self._epoch_fn,
            in_shardings=(replicated, data_sharding, replicated),
            out_shardings=(replicated, data_sharding, replicated),
            donate_argnums=(0, 1),
        )

    def jit_epochs(self, n: Optional[int] = None):
        """`(ts, env_state, key) -> (ts, env_state, key', mean_metrics)`
        running `n` epochs (default cfg.epochs_per_call) inside ONE jitted
        lax.scan — amortizes the fixed per-dispatch cost (see
        cfg.epochs_per_call). The scan body splits the carried key the same
        way train()'s host loop does, so the epoch key stream is identical
        to n sequential jit_epoch calls; `key'` continues the stream."""
        n = self.cfg.epochs_per_call if n is None else n

        def epochs(ts: TrainingState, env_state: State, key: jnp.ndarray):
            def body(carry, _):
                ts, env_state, key = carry
                key, k_epoch = jax.random.split(key)
                ts, env_state, metrics = self._epoch_fn(ts, env_state, k_epoch)
                return (ts, env_state, key), metrics
            (ts, env_state, key), metrics = jax.lax.scan(
                body, (ts, env_state, key), None, length=n)
            return ts, env_state, key, jax.tree.map(
                lambda x: jnp.mean(x, axis=0), metrics)

        if self.mesh is None:
            return jax.jit(epochs, donate_argnums=(0, 1))
        P = jax.sharding.PartitionSpec
        data_sharding = jax.sharding.NamedSharding(self.mesh, P("data"))
        replicated = jax.sharding.NamedSharding(self.mesh, P())
        return jax.jit(
            epochs,
            in_shardings=(replicated, data_sharding, replicated),
            out_shardings=(replicated, data_sharding, replicated, replicated),
            donate_argnums=(0, 1),
        )


def evaluate(
    env: Env,
    inference_fn: Callable,
    params_tuple,
    num_episodes: int = 32,
    episode_length: int = 1000,
    seed: int = 0,
    deterministic: bool = True,
) -> Dict[str, float]:
    """Evaluate a policy on a core env: `num_episodes` parallel episodes,
    fully on-device (one jitted scan). Returns mean return / length.

    The in-scan accumulators replicate the stock EvalWrapper's semantics
    (sum rewards until the first done, count steps survived)."""
    from pobrax_tpu.envs import wrappers

    wrapped = wrappers.EpisodeWrapper(env, episode_length, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=num_episodes)

    def run(key):
        k_reset, k_act = jax.random.split(key)
        state = wrapped.reset(jax.random.split(k_reset, num_episodes))
        ret0 = jnp.zeros(num_episodes)

        def body(carry, _):
            state, ret, length, alive, key = carry
            key, k = jax.random.split(key)
            act = inference_fn(params_tuple, state.obs, k,
                               deterministic=deterministic)
            state = wrapped.step(state, act)
            ret = ret + state.reward * alive
            length = length + alive
            alive = alive * (1.0 - state.done)
            return (state, ret, length, alive, key), None

        (_, ret, length, _, _), _ = jax.lax.scan(
            body, (state, ret0, ret0, jnp.ones(num_episodes), k_act),
            None, length=episode_length)
        return ret, length

    ret, length = jax.jit(run)(jax.random.PRNGKey(seed))
    return {
        "eval/mean_return": float(jnp.mean(ret)),
        "eval/std_return": float(jnp.std(ret)),
        "eval/mean_length": float(jnp.mean(length)),
    }


def train(
    env: Env,
    cfg: Optional[PPOConfig] = None,
    seed: int = 0,
    mesh: Optional[jax.sharding.Mesh] = None,
    progress_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1_000_000,
    autoreset_mode: str = "naive",
    watchdog_deadline_s: Optional[float] = 1800.0,
    **cfg_overrides,
):
    """Train PPO on a *core* env (unwrapped); builds the fused wrapper stack.

    `autoreset_mode`: 'naive' (reference-parity per-step resample) or
    'cached' (on-device cached refresh — ~31% faster stepping, see
    docs/PERFORMANCE.md).

    With `checkpoint_dir`, training state is saved every `checkpoint_every`
    env-steps and resumed from the latest step dir if one exists (crash
    recovery — the failure-detection story's restart half).

    Failure DETECTION: a `parallel.health.Watchdog` (monitored in a daemon
    thread) is beaten after every completed epoch; a hang inside a device
    call longer than `watchdog_deadline_s` (default 30 min — first epoch
    includes compile) is reported loudly on stderr and raises at the next
    heartbeat instead of stalling silently. Multi-process runs additionally
    `health.ping()` (a real collective) at startup and every checkpoint
    boundary, so a dead peer converts into a watchdog-visible hang at a
    known point. Disable with watchdog_deadline_s=None.

    Returns (inference_fn, params_tuple, metrics_history).
    """
    from pobrax_tpu.envs import wrappers  # local import to avoid cycles

    cfg = dataclasses.replace(cfg or PPOConfig(), **cfg_overrides)
    wrapped = wrappers.ActionRepeatWrapper(env, cfg.action_repeat)
    wrapped = wrappers.EpisodeWrapper(wrapped, cfg.episode_length, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=cfg.num_envs)
    wrapped = wrappers.randomized_autoreset(wrapped, autoreset_mode)

    learner = PPOLearner(wrapped, cfg, mesh=mesh)
    key = jax.random.PRNGKey(seed)
    key, k_init, k_reset = jax.random.split(key, 3)
    ts = learner.init(k_init)
    resumed_steps = 0
    if checkpoint_dir is not None:
        from pobrax_tpu.training import checkpoint as ckpt
        latest = ckpt.latest_step_dir(checkpoint_dir)
        if latest is not None:
            ts = ckpt.restore(latest, template=ts)
            resumed_steps = int(ts.epochs) * cfg.unroll_length * cfg.num_envs \
                * cfg.action_repeat
            # continue the PRNG stream instead of replaying the pre-crash one
            key = jax.random.fold_in(key, int(ts.epochs))
    env_keys = jax.random.split(k_reset, cfg.num_envs)
    env_state = jax.jit(wrapped.reset)(env_keys)
    if mesh is not None:
        P = jax.sharding.PartitionSpec
        env_state = jax.device_put(
            env_state, jax.sharding.NamedSharding(mesh, P("data")))
        ts = jax.device_put(ts, jax.sharding.NamedSharding(mesh, P()))

    epc = max(1, cfg.epochs_per_call)
    epoch_fn = learner.jit_epochs(epc) if epc > 1 else learner.jit_epoch()
    steps_per_epoch = cfg.unroll_length * cfg.num_envs * cfg.action_repeat
    steps_per_call = steps_per_epoch * epc
    # ceil of the remaining budget: at least one call whenever any steps
    # remain, zero only when the checkpoint already covers num_timesteps
    # (epochs_per_call>1 may overshoot num_timesteps by < one call)
    remaining = max(0, cfg.num_timesteps - resumed_steps)
    num_calls = -(-remaining // steps_per_call)
    history = []
    t0 = time.perf_counter()
    last_ckpt = resumed_steps

    from pobrax_tpu.parallel import health
    wd = (health.Watchdog(deadline_s=watchdog_deadline_s).start_monitor()
          if watchdog_deadline_s else None)
    if jax.process_count() > 1:
        health.ping()  # startup liveness barrier: all peers present
    try:
        for i in range(num_calls):
            if epc > 1:
                # key threaded through the call: same epoch-key stream as
                # epc sequential host-loop iterations (see jit_epochs)
                ts, env_state, key, metrics = epoch_fn(ts, env_state, key)
            else:
                key, k_epoch = jax.random.split(key)
                ts, env_state, metrics = epoch_fn(ts, env_state, k_epoch)
            if wd is not None:
                jax.block_until_ready(metrics)
                wd.beat()  # raises if the monitor latched a stall
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
                    health.ping()  # peers alive before the save barrier
                from pobrax_tpu.training import checkpoint as ckpt
                ckpt.save_step(checkpoint_dir, total_steps, ts)
                last_ckpt = total_steps
    finally:
        if wd is not None:
            wd.stop_monitor()

    inference_fn = learner.make_inference_fn()
    params_tuple = (ts.normalizer, ts.params.policy)
    return inference_fn, params_tuple, history

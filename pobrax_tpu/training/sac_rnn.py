"""Recurrent Soft Actor-Critic: off-policy memory agent for the PO suite.

R2D2-style sequence replay (docs/LEARNING.md motivates memory for the PO
envs; the reference stack has no trainer at all — SURVEY.md §3.5). Design:

  * actor: obs -> MLP encoder -> GRU -> tanh-normal head (same recurrent
    cell as ppo_rnn's policy).
  * critics: obs -> MLP encoder -> GRU -> concat(features, action) -> MLP
    -> q. The action joins AFTER the recurrence, so the hidden state
    evolves on the observation history only — Q(h_t, a) for arbitrary `a`
    (the sampled next action, the actor's reparameterized action) needs no
    counterfactual replay of the GRU. Twin critics = stacked params,
    vmapped apply, like sac.py.
  * replay: each slot stores a WHOLE (seq_len, num_envs, ...) sequence
    plus the actor's hidden state at the sequence start (R2D2's stored
    recurrent state). Sampling draws (slot, env-column) pairs ->
    decorrelated (seq_len, batch, ...) sequences; with cfg.per_alpha > 0
    the draw is prioritized (R2D2's eta-mixed |TD| priorities with
    importance-weighted critic loss — replay.sample_prioritized).
  * burn-in: the first `burn_in` steps of a sampled sequence only warm the
    hiddens (stop-gradient, losses masked out); critic hiddens start at
    zero, the actor's from the stored h0. Hiddens are zeroed where a step
    ended (fresh episode -> fresh memory), mirroring the rollout.
  * everything else (tanh-normal dist, learned temperature, soft target
    update, truncation-aware bootstrapping through info['final_obs'])
    matches training/sac.py.

One jitted epoch = `seqs_per_epoch` x (seq_len env steps -> one sequence
insert -> `grad_steps_per_seq` gradient steps), all inside `lax.scan`.
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
from pobrax_tpu.training import replay, running_statistics
from pobrax_tpu.training.distribution import NormalTanhDistribution


class ActorGRU(linen.Module):
    encoder_sizes: Tuple[int, ...]
    hidden_size: int
    out_size: int

    @linen.compact
    def __call__(self, h, obs):
        x = obs
        for i, size in enumerate(self.encoder_sizes):
            x = linen.swish(linen.Dense(size, name=f"enc_{i}")(x))
        h, y = linen.GRUCell(features=self.hidden_size, name="gru")(h, x)
        return h, linen.Dense(self.out_size, name="head")(y)


class CriticGRU(linen.Module):
    """Recurrent trunk on obs; action joins at the head (see module doc)."""

    encoder_sizes: Tuple[int, ...]
    hidden_size: int
    head_sizes: Tuple[int, ...]

    @linen.compact
    def trunk(self, h, obs):
        x = obs
        for i, size in enumerate(self.encoder_sizes):
            x = linen.swish(linen.Dense(size, name=f"enc_{i}")(x))
        h, y = linen.GRUCell(features=self.hidden_size, name="gru")(h, x)
        return h, y

    @linen.compact
    def head(self, y, action):
        x = jnp.concatenate([y, action], axis=-1)
        for i, size in enumerate(self.head_sizes):
            x = linen.swish(linen.Dense(size, name=f"head_{i}")(x))
        return jnp.squeeze(linen.Dense(1, name="q")(x), axis=-1)

    def __call__(self, h, obs, action):  # used only for init
        h, y = self.trunk(h, obs)
        return h, self.head(y, action)


@struct.dataclass
class RSACParams:
    policy: Any
    q: Any
    target_q: Any
    log_alpha: jnp.ndarray


@struct.dataclass
class RSACTrainingState:
    params: RSACParams
    policy_opt: Any
    q_opt: Any
    alpha_opt: Any
    normalizer: running_statistics.RunningStatisticsState
    buffer: replay.ReplayState
    epochs: jnp.ndarray
    # (capacity, num_envs) PER table when cfg.per_alpha > 0, else () — kept
    # out of _ckpt_slice like the buffer itself (stale across phases)
    priorities: Any = ()


@dataclasses.dataclass(frozen=True)
class RSACConfig:
    num_timesteps: int = 1_000_000
    num_envs: int = 64
    episode_length: int = 1000
    action_repeat: int = 1  # HAI envs train at 6 (envs.HAI_ACTION_REPEAT)
    seq_len: int = 16  # stored sequence length (burn_in + trained steps)
    burn_in: int = 4
    replay_capacity: int = 512  # sequence slots
    batch_size: int = 64  # sequences per gradient step
    seqs_per_epoch: int = 4
    grad_steps_per_seq: int = 1
    min_replay: int = 16  # sequence slots before training starts
    learning_rate: float = 3e-4
    discounting: float = 0.99
    tau: float = 0.005
    reward_scaling: float = 1.0
    # n-step TD targets within the stored sequence (R2D2 uses 5); 1 = the
    # plain one-step SAC target. Off-policy bias from behavior-policy
    # actions inside the window is the standard R2D2 trade.
    nstep: int = 1
    # prioritized sequence replay (replay.sample_prioritized): P ∝ p^alpha
    # with p = eta·max|TD| + (1-eta)·mean|TD| over the trained segment
    # (R2D2's mix) and (N·P)^-beta importance weights on the critic loss.
    # per_alpha = 0 keeps uniform sampling (the default).
    per_alpha: float = 0.0
    per_beta: float = 0.4
    per_eta: float = 0.9
    # freeze the actor + temperature for the first N epochs of THIS run
    # (counted from the resumed epoch counter): critic-only updates while
    # the value surface re-adapts to a changed env — the standard
    # off-policy fine-tune guard against the actor chasing an
    # off-distribution critic (motivated by the measured curriculum
    # collapse in docs/LEARNING.md)
    actor_freeze_epochs: int = 0
    normalize_observations: bool = True
    encoder_sizes: Tuple[int, ...] = (128,)
    hidden_size: int = 64
    head_sizes: Tuple[int, ...] = (128,)


def nstep_targets(r, not_terminal, v_boot, gamma: float, n: int):
    """(L, B) n-step TD targets within a sequence (R2D2-style).

    G^(k)_t = r_t + gamma * nt_t * G^(k-1)_{t+1}; the boundary row t=L-1
    keeps its 1-step target (bootstraps from v_boot's final entry), and a
    terminal at t zeroes the recursion (rewards of the next episode in an
    autoreset sequence never leak backwards). n=1 is the plain TD target."""
    g1 = r + gamma * not_terminal * v_boot
    target = g1
    for _ in range(n - 1):
        # row t consumes row t+1's target; the boundary row t=L-1 is
        # RESTORED to its 1-step value each pass (it has nothing to look
        # ahead to), which also gives the tail rows their naturally
        # shorter horizons
        new = r[:-1] + gamma * not_terminal[:-1] * target[1:]
        target = jnp.concatenate([new, g1[-1:]], axis=0)
    return target


class RSACLearner:
    def __init__(self, env: Env, cfg: RSACConfig,
                 mesh: Optional[jax.sharding.Mesh] = None,
                 carry_env: Optional[Env] = None, carry_envs: int = 0):
        if cfg.burn_in >= cfg.seq_len:
            raise ValueError("burn_in must be < seq_len")
        self.mesh = mesh
        self.axis = "data" if mesh is not None else None
        self.n_shards = int(mesh.shape["data"]) if mesh is not None else 1
        if cfg.num_envs % self.n_shards or cfg.batch_size % self.n_shards:
            raise ValueError("num_envs and batch_size must divide the mesh "
                             "'data' axis")
        # curriculum replay carry-over: the first `carry_envs` env columns
        # of every shard collect from `carry_env` (the PREVIOUS phase's
        # env) instead of `env`, so the replay keeps a steady stream of
        # on-old-distribution sequences anchoring the critic while the env
        # changes under the agent (motivated by the measured curriculum
        # collapse in docs/LEARNING.md — the narrowed radius zeroes an obs
        # channel, the critic's value surface there goes stale, and the
        # actor follows it down)
        self.carry_env = carry_env
        if carry_env is not None:
            if not 0 < carry_envs < cfg.num_envs:
                raise ValueError("carry_envs must be in (0, num_envs)")
            if carry_envs % self.n_shards:
                raise ValueError("the mesh 'data' axis size must divide "
                                 "carry_envs")
            if (carry_env.observation_size != env.observation_size
                    or carry_env.action_size != env.action_size):
                raise ValueError("carry_env must match obs/action sizes")
            # _step_envs tree-concatenates the two envs' stepped states, so
            # the State pytrees must match STRUCTURALLY too (same metrics/
            # info keys — in practice: the same env class, e.g. two radii
            # of the same task). Check at construction with abstract eval
            # rather than failing with an opaque trace-time error later.
            t_env = jax.tree_util.tree_structure(jax.eval_shape(
                env.reset, jax.ShapeDtypeStruct((cfg.num_envs, 2), jnp.uint32)))
            t_carry = jax.tree_util.tree_structure(jax.eval_shape(
                carry_env.reset, jax.ShapeDtypeStruct((carry_envs, 2), jnp.uint32)))
            if t_env != t_carry:
                raise ValueError(
                    "carry_env State pytree structure differs from env's "
                    "(different metrics/info keys?) — carry_env must be the "
                    f"same env class. env: {t_env}\ncarry_env: {t_carry}")
        self._carry_local = carry_envs // self.n_shards
        self.env = env
        self.cfg = cfg
        self.obs_size = env.observation_size
        self.action_size = env.action_size
        self.dist = NormalTanhDistribution(event_size=self.action_size)
        self.actor = ActorGRU(encoder_sizes=cfg.encoder_sizes,
                              hidden_size=cfg.hidden_size,
                              out_size=self.dist.param_size)
        self.critic = CriticGRU(encoder_sizes=cfg.encoder_sizes,
                                hidden_size=cfg.hidden_size,
                                head_sizes=cfg.head_sizes)
        self.policy_opt = optax.flatten(optax.adam(cfg.learning_rate))
        self.q_opt = optax.flatten(optax.adam(cfg.learning_rate))
        self.alpha_opt = optax.adam(cfg.learning_rate)
        self.target_entropy = -0.5 * self.action_size

    def h0(self, batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.cfg.hidden_size))

    def _step_envs(self, env_state: State, action: jnp.ndarray) -> State:
        """One collection step; with a carry_env the batch splits into
        [0:carry_local] stepped by the old-phase env and the rest by the
        training env (per shard — train() lays the global batch out so
        every shard's block starts with its carry columns)."""
        if self.carry_env is None:
            return self.env.step(env_state, action)
        k = self._carry_local
        s_old = jax.tree.map(lambda x: x[:k], env_state)
        s_new = jax.tree.map(lambda x: x[k:], env_state)
        n_old = self.carry_env.step(s_old, action[:k])
        n_new = self.env.step(s_new, action[k:])
        return jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), n_old, n_new)

    # ---- init -----------------------------------------------------------------

    def init(self, key: jnp.ndarray, env_state: State) -> RSACTrainingState:
        kp, kq = jax.random.split(key)
        B = env_state.obs.shape[0]
        dummy_h = self.h0(1)
        dummy_obs = jnp.zeros((1, self.obs_size))
        dummy_act = jnp.zeros((1, self.action_size))
        policy = self.actor.init(kp, dummy_h, dummy_obs)
        q = jax.vmap(lambda k: self.critic.init(k, dummy_h, dummy_obs,
                                                dummy_act))(
            jax.random.split(kq, 2))
        params = RSACParams(policy=policy, q=q,
                            target_q=jax.tree.map(jnp.copy, q),
                            log_alpha=jnp.zeros(()))
        L = self.cfg.seq_len
        seq_sample = {
            "obs": jnp.zeros((L, B, self.obs_size)),
            "action": jnp.zeros((L, B, self.action_size)),
            "reward": jnp.zeros((L, B)),
            "done": jnp.zeros((L, B)),
            "truncation": jnp.zeros((L, B)),
            "final_obs": jnp.zeros((L, B, self.obs_size)),
            "h0": jnp.zeros((B, self.cfg.hidden_size)),
        }
        return RSACTrainingState(
            params=params,
            policy_opt=self.policy_opt.init(policy),
            q_opt=self.q_opt.init(q),
            alpha_opt=self.alpha_opt.init(params.log_alpha),
            normalizer=running_statistics.init_state(self.obs_size),
            buffer=replay.init(seq_sample, self.cfg.replay_capacity),
            epochs=jnp.zeros((), jnp.int32),
            priorities=(replay.priorities_init(self.cfg.replay_capacity, B)
                        if self.cfg.per_alpha > 0 else ()),
        )

    # ---- pieces ---------------------------------------------------------------

    def _norm(self, normalizer, obs):
        if self.cfg.normalize_observations:
            return running_statistics.normalize(normalizer, obs)
        return obs

    def _actor_roll(self, policy_params, h, obs_seq, done_seq):
        """Roll the actor GRU over (T, batch, obs); hiddens zeroed after a
        done step. Returns per-step dist params (T, batch, P)."""
        def step(h, xs):
            obs, done = xs
            nh, dp = self.actor.apply(policy_params, h, obs)
            nh = nh * (1.0 - done[:, None])
            return nh, dp
        return jax.lax.scan(step, h, (obs_seq, done_seq))

    def _critic_roll(self, q_params, h, obs_seq, done_seq):
        """Roll BOTH critics' GRU trunks (stacked params) over the obs
        sequence. h: (2, batch, H). Returns features (T, 2, batch, H)."""
        def step(h, xs):
            obs, done = xs
            nh, y = jax.vmap(
                lambda p, hh: self.critic.apply(p, hh, obs,
                                                method=self.critic.trunk)
            )(q_params, h)
            nh = nh * (1.0 - done[None, :, None])
            return nh, y
        return jax.lax.scan(step, h, (obs_seq, done_seq))

    def _q_head(self, q_params, y, action):
        """y: (..., 2, batch, H); action: (..., batch, A) -> (..., batch, 2)."""
        out = jax.vmap(
            lambda p, yy: self.critic.apply(p, yy, action,
                                            method=self.critic.head),
            in_axes=(0, -3), out_axes=-2,
        )(q_params, y)
        return jnp.moveaxis(out, -2, -1)

    # ---- losses over a sampled sequence batch ----------------------------------

    def _roll_all(self, params: RSACParams, normalizer, seq):
        """Shared rollouts for both losses: actor dist params and critic
        features over the whole sequence (burn-in included; the caller
        masks). Also returns the FINAL actor/target-critic carries for the
        last-step bootstrap."""
        obs = self._norm(normalizer, seq["obs"])
        done = seq["done"]
        B = obs.shape[1]
        h_a = jax.lax.stop_gradient(seq["h0"])
        h_a_end, dp = self._actor_roll(params.policy, h_a, obs, done)
        hq = jnp.zeros((2, B, self.cfg.hidden_size))
        _, y = self._critic_roll(params.q, hq, obs, done)
        h_qt_end, y_tgt = self._critic_roll(params.target_q, hq, obs, done)
        return obs, dp, y, y_tgt, h_a_end, h_qt_end

    def _losses(self, params: RSACParams, normalizer, seq, key):
        """Returns (critic_loss, actor_loss, logp) with burn-in masking.

        The training segment is steps [burn_in, L-1]; step t bootstraps
        from step t+1's quantities, except the LAST step which bootstraps
        from final_obs via one extra trunk step (handles both mid-sequence
        and truncation-at-rollout-boundary cases)."""
        cfg = self.cfg
        L = cfg.seq_len
        alpha = jnp.exp(params.log_alpha)
        obs, dp, y, y_tgt, h_a_end, h_qt_end = self._roll_all(
            params, normalizer, seq)

        k1, k2 = jax.random.split(key)
        pre = self.dist.sample_no_postprocess(dp, k1)
        a_pi = self.dist.postprocess(pre)
        logp = self.dist.log_prob(dp, pre)  # (L, B)

        # --- critic target: v_{t+1} = min_q_tgt(y_tgt_{t+1}, a_pi_{t+1}) -
        # alpha * logp_{t+1}, shifted so target_t pairs with reward_t.
        q_next = self._q_head(params.target_q, y_tgt, a_pi)  # (L, B, 2)
        v_next = jnp.min(q_next, axis=-1) - alpha * logp  # (L, B)
        # the LAST step bootstraps from the stored pre-reset final
        # observation via one extra actor/target-trunk step on the final
        # rollout carries (so truncation at the sequence boundary still
        # bootstraps, termination is masked by not_terminal below)
        fin = self._norm(normalizer, seq["final_obs"][-1])
        _, dp_fin = self.actor.apply(params.policy, h_a_end, fin)
        pre_fin = self.dist.sample_no_postprocess(dp_fin, k2)
        a_fin = self.dist.postprocess(pre_fin)
        logp_fin = self.dist.log_prob(dp_fin, pre_fin)
        _, y_fin = jax.vmap(lambda p, hh: self.critic.apply(
            p, hh, fin, method=self.critic.trunk))(params.target_q, h_qt_end)
        q_fin = self._q_head(params.target_q, y_fin, a_fin)  # (B, 2)
        v_fin = jnp.min(q_fin, axis=-1) - alpha * logp_fin
        v_boot = jnp.concatenate([v_next[1:], v_fin[None]], axis=0)

        not_terminal = 1.0 - seq["done"] * (1.0 - seq["truncation"])
        target = jax.lax.stop_gradient(nstep_targets(
            seq["reward"] * cfg.reward_scaling, not_terminal, v_boot,
            cfg.discounting, cfg.nstep))

        q_taken = self._q_head(params.q, y, seq["action"])  # (L, B, 2)
        mask = jnp.zeros((L, 1))
        mask = mask.at[cfg.burn_in:].set(1.0)
        denom = jnp.maximum(mask.sum() * q_taken.shape[1], 1.0)
        err = q_taken - target[..., None]  # (L, B, 2)
        # per-sequence importance weights (prioritized replay); absent key
        # = uniform sampling = weight 1
        w = seq["is_weight"][:, None] if "is_weight" in seq else 1.0
        critic_loss = 0.5 * jnp.sum(
            w * mask[..., None] * jnp.square(err)) / denom
        # per-sequence |TD| summary for priority write-back (R2D2's
        # eta-mix of max and mean over the trained segment, twin-averaged)
        abs_err = jax.lax.stop_gradient(jnp.mean(jnp.abs(err), axis=-1))
        td_mean = jnp.sum(mask * abs_err, axis=0) / jnp.maximum(mask.sum(), 1.0)
        td_max = jnp.max(mask * abs_err, axis=0)
        td_seq = cfg.per_eta * td_max + (1.0 - cfg.per_eta) * td_mean

        # --- actor loss on the training segment, via the ONLINE critic
        # features (gradient reaches the actor only through the action)
        q_pi = self._q_head(params.q, jax.lax.stop_gradient(y), a_pi)
        actor_loss = jnp.sum(
            mask * (alpha * logp - jnp.min(q_pi, axis=-1))) / denom
        logp_masked = jax.lax.stop_gradient(
            jnp.sum(mask * logp) / denom)
        return critic_loss, actor_loss, logp_masked, td_seq

    def _critic_loss(self, q_params, params, normalizer, seq, key):
        """Returns (loss, per-sequence |TD| for priority write-back)."""
        p = params.replace(q=q_params)
        closs, _, _, td_seq = self._losses(p, normalizer, seq, key)
        return closs, td_seq

    def _actor_loss(self, policy_params, params, normalizer, seq, key):
        p = params.replace(policy=policy_params)
        _, aloss, logp, _ = self._losses(p, normalizer, seq, key)
        return aloss, logp

    def _alpha_loss(self, log_alpha, logp):
        return -jnp.exp(log_alpha) * (logp + self.target_entropy)

    # ---- the fused epoch -------------------------------------------------------

    def build_epoch_fn(self, freeze_until: int = 0) -> Callable:
        """`freeze_until`: absolute epoch index before which the actor and
        temperature are NOT updated (cfg.actor_freeze_epochs offset by the
        resumed counter — train() computes it)."""
        cfg = self.cfg
        # under shard_map shapes are per-shard: each shard samples its own
        # envs' columns (communication-free — the buffer never leaves its
        # device) and contributes batch_size/n_shards sequences to every
        # gradient step, whose grads pmean over the mesh axis below
        local_bs = cfg.batch_size // self.n_shards
        axis = self.axis

        def pmean(x):
            return jax.lax.pmean(x, axis) if axis is not None else x

        def grad_step(ts: RSACTrainingState, key):
            k1, k2, k3 = jax.random.split(key, 3)
            # draw (slot, env-column) pairs: storage is (capacity, L, B, ...)
            # with the env-column axis AFTER time, so the generic
            # replay.sample_transitions layout doesn't apply here
            k_slot, k_col = jax.random.split(k1)
            if cfg.per_alpha > 0:
                # sharded: per-shard tables and per-shard IS normalization —
                # the R2D2 distributed approximation
                slot, col, is_w = replay.sample_prioritized(
                    ts.priorities, k_slot, local_bs,
                    cfg.per_alpha, cfg.per_beta)
            else:
                size = jnp.maximum(ts.buffer.size, 1)
                slot = jax.random.randint(k_slot, (local_bs,), 0, size)
                B_env = ts.buffer.data["h0"].shape[1]
                col = jax.random.randint(k_col, (local_bs,), 0, B_env)
                is_w = None
            seq = {
                "h0": ts.buffer.data["h0"][slot, col],
                # advanced indexing puts the paired (slot, col) batch axis
                # first: (batch, L, ...) -> time-major (L, batch, ...)
                **{f: jnp.moveaxis(ts.buffer.data[f][slot, :, col], 0, 1)
                   for f in ("obs", "action", "reward", "done",
                             "truncation", "final_obs")},
            }
            if is_w is not None:
                seq["is_weight"] = is_w

            (q_loss, td_seq), q_grads = jax.value_and_grad(
                self._critic_loss, has_aux=True)(
                ts.params.q, ts.params, ts.normalizer, seq, k2)
            q_grads = pmean(q_grads)
            q_updates, q_opt = self.q_opt.update(q_grads, ts.q_opt)
            q_params = optax.apply_updates(ts.params.q, q_updates)

            def do_actor(_):
                (a_loss, logp), a_grads = jax.value_and_grad(
                    self._actor_loss, has_aux=True)(
                    ts.params.policy, ts.params, ts.normalizer, seq, k3)
                a_grads = pmean(a_grads)
                p_updates, policy_opt = self.policy_opt.update(
                    a_grads, ts.policy_opt)
                policy_params = optax.apply_updates(
                    ts.params.policy, p_updates)
                # logp is the per-shard masked mean; pmean it so the
                # (scalar) temperature update is identical on every shard
                logp = pmean(logp)
                al_loss, al_grads = jax.value_and_grad(self._alpha_loss)(
                    ts.params.log_alpha, logp)
                al_updates, alpha_opt = self.alpha_opt.update(
                    al_grads, ts.alpha_opt)
                log_alpha = optax.apply_updates(
                    ts.params.log_alpha, al_updates)
                return (policy_params, policy_opt, log_alpha, alpha_opt,
                        pmean(a_loss))

            def skip_actor(_):
                return (ts.params.policy, ts.policy_opt,
                        ts.params.log_alpha, ts.alpha_opt, jnp.float32(0))

            if freeze_until > 0:
                (policy_params, policy_opt, log_alpha, alpha_opt,
                 a_loss) = jax.lax.cond(
                    ts.epochs >= freeze_until, do_actor, skip_actor, None)
            else:
                (policy_params, policy_opt, log_alpha, alpha_opt,
                 a_loss) = do_actor(None)

            target_q = jax.tree.map(
                lambda t, o: t * (1.0 - cfg.tau) + o * cfg.tau,
                ts.params.target_q, q_params)
            params = RSACParams(policy=policy_params, q=q_params,
                                target_q=target_q, log_alpha=log_alpha)
            pri = (replay.priorities_update(ts.priorities, slot, col, td_seq)
                   if cfg.per_alpha > 0 else ts.priorities)
            ts = ts.replace(params=params, policy_opt=policy_opt,
                            q_opt=q_opt, alpha_opt=alpha_opt, priorities=pri)
            return ts, {"q_loss": pmean(q_loss), "actor_loss": pmean(a_loss),
                        "alpha": jnp.exp(log_alpha)}

        def collect_seq(ts, env_state, h, key):
            """seq_len acting steps -> one (L, B, ...) sequence + h0."""
            h_start = h

            def one_step(carry, _):
                env_state, h, key, normalizer = carry
                key, k_act = jax.random.split(key)
                obs_n = self._norm(normalizer, env_state.obs)
                nh, dp = self.actor.apply(ts.params.policy, h, obs_n)
                pre = self.dist.sample_no_postprocess(dp, k_act)
                action = self.dist.postprocess(pre)
                nstate = self._step_envs(env_state, action)
                nh = nh * (1.0 - nstate.done[:, None])
                if cfg.normalize_observations:
                    normalizer = running_statistics.update(
                        normalizer, env_state.obs, axis_name=axis)
                row = {
                    "obs": env_state.obs,
                    "action": action,
                    "reward": nstate.reward,
                    "done": nstate.done,
                    "truncation": nstate.info.get(
                        "truncation", jnp.zeros_like(nstate.done)),
                    "final_obs": nstate.info.get("final_obs", nstate.obs),
                }
                return (nstate, nh, key, normalizer), row

            (env_state, h, _, normalizer), rows = jax.lax.scan(
                one_step, (env_state, h, key, ts.normalizer), None,
                length=cfg.seq_len)
            seq = {**rows, "h0": h_start}
            return env_state, h, normalizer, seq

        def epoch(ts: RSACTrainingState, env_state: State, h: jnp.ndarray,
                  key: jnp.ndarray):
            def one_chunk(carry, _):
                ts, env_state, h, key = carry
                key, k_seq, k_grad = jax.random.split(key, 3)
                env_state, h, normalizer, seq = collect_seq(
                    ts, env_state, h, k_seq)
                pri = (replay.priorities_on_insert(
                    ts.priorities, ts.buffer.insert_pos)
                    if cfg.per_alpha > 0 else ts.priorities)
                ts = ts.replace(buffer=replay.insert(ts.buffer, seq),
                                normalizer=normalizer, priorities=pri)

                def do_grads(ts):
                    ts2, metrics = ts, None
                    for i in range(cfg.grad_steps_per_seq):
                        ts2, metrics = grad_step(
                            ts2, jax.random.fold_in(k_grad, i))
                    return ts2, metrics

                def skip(ts):
                    return ts, {"q_loss": jnp.float32(0),
                                "actor_loss": jnp.float32(0),
                                "alpha": jnp.exp(ts.params.log_alpha)}

                ts, metrics = jax.lax.cond(
                    ts.buffer.size >= cfg.min_replay, do_grads, skip, ts)
                metrics["mean_reward"] = pmean(jnp.mean(seq["reward"]))
                return (ts, env_state, h, key), metrics

            (ts, env_state, h, _), metrics = jax.lax.scan(
                one_chunk, (ts, env_state, h, key), None,
                length=cfg.seqs_per_epoch)
            ts = ts.replace(epochs=ts.epochs + 1)
            return ts, env_state, h, jax.tree.map(jnp.mean, metrics)

        if self.mesh is None:
            return epoch

        # SPMD epoch: one shard_map over the 'data' axis. Env state, GRU
        # hiddens, the replay buffer's env-column axis, and the PER table
        # are sharded; params/opts/normalizer replicated. Each shard steps
        # its own envs, inserts into its own buffer columns, samples its
        # own sequences; the only collectives are the gradient/logp pmeans
        # and the normalizer psum above — replay data never crosses ICI.
        from jax.experimental.shard_map import shard_map

        def epoch_sharded(ts, env_state, h, key):
            # decorrelate shards: every shard gets its own key stream for
            # action sampling and replay draws
            key = jax.random.fold_in(key, jax.lax.axis_index("data"))
            return epoch(ts, env_state, h, key)

        P = jax.sharding.PartitionSpec
        ts_spec = self.state_spec()
        dspec = P("data")
        return shard_map(
            epoch_sharded, mesh=self.mesh,
            in_specs=(ts_spec, dspec, dspec, P()),
            out_specs=(ts_spec, dspec, dspec, P()),
            check_rep=False)

    def state_spec(self):
        """PartitionSpec pytree for RSACTrainingState: replay env-columns
        and the PER table sharded on 'data', everything else replicated."""
        P = jax.sharding.PartitionSpec
        rep = P()
        buf_spec = replay.ReplayState(
            data={f: (P(None, "data") if f == "h0" else P(None, None, "data"))
                  for f in ("obs", "action", "reward", "done", "truncation",
                            "final_obs", "h0")},
            insert_pos=rep, size=rep)
        return RSACTrainingState(
            params=rep, policy_opt=rep, q_opt=rep, alpha_opt=rep,
            normalizer=rep, buffer=buf_spec, epochs=rep,
            priorities=(P(None, "data") if self.cfg.per_alpha > 0 else ()))

    def state_sharding(self):
        """NamedSharding pytree mirroring state_spec for device_put."""
        mk = lambda spec: jax.sharding.NamedSharding(self.mesh, spec)
        return jax.tree.map(mk, self.state_spec(),
                            is_leaf=lambda x: isinstance(
                                x, jax.sharding.PartitionSpec))

    def make_inference_fn(self) -> Callable:
        """`h, action = inference_fn(params_tuple, h, obs, key)` — same
        recurrent contract as ppo_rnn."""
        def policy(params_tuple, h, obs, key, deterministic: bool = False):
            normalizer, policy_params = params_tuple
            nh, dp = self.actor.apply(policy_params, h,
                                      self._norm(normalizer, obs))
            if deterministic:
                return nh, self.dist.mode(dp)
            return nh, self.dist.sample(dp, key)
        return policy


def _ckpt_slice(ts: RSACTrainingState) -> dict:
    """The checkpointed subset of the training state: everything EXCEPT the
    replay buffer (GB-scale at production sizes, and stale across curriculum
    phase boundaries anyway — resume refills it through min_replay warmup)."""
    return {"params": ts.params, "policy_opt": ts.policy_opt,
            "q_opt": ts.q_opt, "alpha_opt": ts.alpha_opt,
            "normalizer": ts.normalizer, "epochs": ts.epochs}


def train(
    env: Env,
    cfg: Optional[RSACConfig] = None,
    seed: int = 0,
    mesh: Optional[jax.sharding.Mesh] = None,
    progress_fn: Optional[Callable[[int, Dict[str, float]], None]] = None,
    autoreset_mode: str = "naive",
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 1_000_000,
    watchdog_deadline_s: Optional[float] = 1800.0,
    carry_env: Optional[Env] = None,
    carry_frac: float = 0.25,
    **cfg_overrides,
):
    """Train recurrent SAC on a core env; returns
    (inference_fn, params_tuple, history).

    With `checkpoint_dir`, params/optimizers/normalizer are saved every
    `checkpoint_every` env-steps and resumed from the latest step dir (the
    replay buffer is NOT checkpointed — see _ckpt_slice; resume re-warms it
    through min_replay).

    With `carry_env` (a curriculum's PREVIOUS-phase env), a `carry_frac`
    fraction of the env batch keeps collecting from it for the whole run:
    the replay holds a steady stream of old-distribution sequences
    anchoring the critic while the training env changes — the rehearsal
    remedy for the measured off-policy curriculum collapse
    (docs/LEARNING.md). Evaluation/inference are unaffected.

    With `mesh` (a ('data', 'model') Mesh), the epoch runs as one
    shard_map: envs, replay columns, and PER table sharded on 'data',
    learner replicated via gradient pmean — replay never crosses ICI."""
    from pobrax_tpu.envs import wrappers
    from pobrax_tpu.parallel import health

    cfg = dataclasses.replace(cfg or RSACConfig(), **cfg_overrides)
    wrapped = wrappers.ActionRepeatWrapper(env, cfg.action_repeat)
    wrapped = wrappers.EpisodeWrapper(wrapped, cfg.episode_length, 1)
    wrapped = wrappers.VmapWrapper(wrapped, batch_size=cfg.num_envs)
    wrapped = wrappers.randomized_autoreset(wrapped, autoreset_mode)

    n_shards = int(mesh.shape["data"]) if mesh is not None else 1
    carry_envs = 0
    carry_wrapped = None
    if carry_env is not None and carry_frac <= 0.0:
        # carry_frac<=0 means "no carry" — drop the carry env entirely so a
        # carry_frac=0 control run really is pure-env collection (advisor
        # finding: the old rounding carried n_shards columns silently)
        carry_env = None
    if carry_env is not None:
        if not 0.0 < carry_frac < 1.0:
            raise ValueError("carry_frac must be in (0, 1)")
        # round the carry block to a whole number of per-shard columns
        carry_envs = max(1, round(carry_frac * cfg.num_envs / n_shards)) \
            * n_shards
        carry_wrapped = wrappers.ActionRepeatWrapper(
            carry_env, cfg.action_repeat)
        carry_wrapped = wrappers.EpisodeWrapper(
            carry_wrapped, cfg.episode_length, 1)
        carry_wrapped = wrappers.VmapWrapper(
            carry_wrapped, batch_size=carry_envs)
        carry_wrapped = wrappers.randomized_autoreset(
            carry_wrapped, autoreset_mode)

    learner = RSACLearner(wrapped, cfg, mesh=mesh,
                          carry_env=carry_wrapped, carry_envs=carry_envs)
    key = jax.random.PRNGKey(seed)
    key, k_init, k_reset = jax.random.split(key, 3)
    if carry_wrapped is None:
        env_state = jax.jit(wrapped.reset)(
            jax.random.split(k_reset, cfg.num_envs))
    else:
        # global batch layout: each shard's block is [carry | train]
        # columns, matching _step_envs' per-shard split under shard_map
        keys = jax.random.split(k_reset, cfg.num_envs)
        s_old = jax.jit(carry_wrapped.reset)(keys[:carry_envs])
        s_new = jax.jit(wrapped.reset)(keys[carry_envs:])
        k_loc = carry_envs // n_shards
        per = cfg.num_envs // n_shards

        def interleave(a, b):
            a = a.reshape((n_shards, k_loc) + a.shape[1:])
            b = b.reshape((n_shards, per - k_loc) + b.shape[1:])
            return jnp.concatenate([a, b], axis=1).reshape(
                (cfg.num_envs,) + a.shape[2:])

        env_state = jax.tree.map(interleave, s_old, s_new)
    ts = learner.init(k_init, env_state)
    resumed_steps = 0
    if checkpoint_dir is not None:
        from pobrax_tpu.training import checkpoint as ckpt
        latest = ckpt.latest_step_dir(checkpoint_dir)
        if latest is not None:
            piece = ckpt.restore(latest, template=_ckpt_slice(ts))
            ts = ts.replace(**piece)
            resumed_steps = int(ts.epochs) * (
                cfg.seqs_per_epoch * cfg.seq_len * cfg.num_envs
                * cfg.action_repeat)
            key = jax.random.fold_in(key, int(ts.epochs))
    h = learner.h0(cfg.num_envs)
    if mesh is not None:
        dsh = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("data"))
        env_state = jax.device_put(env_state, dsh)
        h = jax.device_put(h, dsh)
        ts = jax.device_put(ts, learner.state_sharding())
    # actor freeze window is relative to THIS run: offset by the resumed
    # epoch counter so a fine-tune resume freezes its FIRST N epochs
    freeze_until = (int(ts.epochs) + cfg.actor_freeze_epochs
                    if cfg.actor_freeze_epochs else 0)
    epoch_fn = jax.jit(learner.build_epoch_fn(freeze_until),
                       donate_argnums=(0,))

    steps_per_epoch = (cfg.seqs_per_epoch * cfg.seq_len * cfg.num_envs
                       * cfg.action_repeat)
    remaining = max(0, cfg.num_timesteps - resumed_steps)
    num_epochs = max(0 if resumed_steps else 1,
                     -(-remaining // steps_per_epoch))
    history = []
    t0 = time.perf_counter()
    last_ckpt = resumed_steps
    wd = (health.Watchdog(deadline_s=watchdog_deadline_s).start_monitor()
          if watchdog_deadline_s else None)
    if jax.process_count() > 1:
        health.ping()
    try:
        for i in range(num_epochs):
            key, k_epoch = jax.random.split(key)
            ts, env_state, h, metrics = epoch_fn(ts, env_state, h, k_epoch)
            if wd is not None:
                jax.block_until_ready(metrics)
                wd.beat()
            total_steps = resumed_steps + (i + 1) * steps_per_epoch
            if progress_fn is not None:
                metrics = jax.tree.map(float, jax.device_get(metrics))
                metrics["steps_per_second"] = (
                    (i + 1) * steps_per_epoch / (time.perf_counter() - t0))
                history.append(metrics)
                progress_fn(total_steps, metrics)
            if checkpoint_dir is not None and (
                    total_steps - last_ckpt >= checkpoint_every
                    or i == num_epochs - 1):
                if jax.process_count() > 1:
                    health.ping()
                from pobrax_tpu.training import checkpoint as ckpt
                ckpt.save_step(checkpoint_dir, total_steps, _ckpt_slice(ts))
                last_ckpt = total_steps
    finally:
        if wd is not None:
            wd.stop_monitor()
    return learner.make_inference_fn(), (ts.normalizer, ts.params.policy), history

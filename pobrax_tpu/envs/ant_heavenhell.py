"""AntHeavenHell: a T-maze where a priest reveals which arm is heaven.

Behavioral spec from /root/reference/po_brax/envs/ant_heavenhell.py — scene
with Priest/Target/Hell spheres + T-maze walls (:13-39), randomized
heaven/hell side swap each episode (:99-101), priest-gated heaven-direction
observation bit (:115-116, :129-131), +1/-1/dying rewards with done on any
nonzero reward (:117-119). Quirks preserved:
  * the key split at reset reuses `rng3` for both the ant position and the
    heaven/hell side choice (:88,93,99) — load-bearing for seed parity;
  * `ant_indices` includes the frozen Ground body (:70);
  * the step metrics write a 'hits' key while reset declares
    'heavens'/'hells' (:80-83,122). Here all three keys are declared at
    reset so the State pytree structure is scan-stable; values match.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.envs.common import ant_full_obs, dead_and_reward
from pobrax_tpu.physics import ant as ant_model
from pobrax_tpu.physics import config as pcfg, scene
from pobrax_tpu.physics.state import Info, QP


def extend_ant_cfg(hhp: jnp.ndarray, hallway_width: float = 2.0) -> pcfg.Config:
    """Ant + Priest/Target/Hell frozen spheres + T-maze walls (reference
    :13-39). Body order: ant(9), Ground, Priest, Target, Hell, Arena."""
    cfg = ant_model.ant_config()
    cfg = cfg.add_body(
        pcfg.Body(name="Priest", colliders=(pcfg.Collider(geom=pcfg.Sphere(0.5)),),
                  mass=1.0, frozen=True))
    cfg = cfg.add_default_qp(
        pcfg.DefaultQP(name="Priest", pos=(float(hhp[-1, 0]), float(hhp[-1, 1]), 1.0)))
    cfg = cfg.add_body(
        pcfg.Body(name="Target", colliders=(pcfg.Collider(geom=pcfg.Sphere(0.5)),),
                  mass=1.0, frozen=True))
    cfg = cfg.add_body(
        pcfg.Body(name="Hell", colliders=(pcfg.Collider(geom=pcfg.Sphere(0.5)),),
                  mass=1.0, frozen=True))
    cfg = scene.draw_t_maze(
        cfg,
        t_x=float(hhp[:, 0].max()) + hallway_width / 2,
        t_y=float(hhp[:, 1].max()) + hallway_width / 2,
        hallway_width=hallway_width,
    )
    for name in ant_model.ANT_BODY_NAMES:
        cfg = cfg.add_collide_pair(name, "Arena")
    return cfg


class AntHeavenHellEnv(Env):
    """Args (reference :43-50):
        heaven_hell: xy of the two goal arms (same y, left + right)
        priest_position: priest xy (top of the T)
        visible_radius: in-range radius for goals and priest
        dying_cost: reward on torso-height death
    """

    def __init__(
        self,
        heaven_hell: Sequence[Sequence[float]] = ((-5.25, 7.0), (5.25, 7.0)),
        priest_position: Sequence[float] = (0.0, 7.0),
        visible_radius: float = 2.0,
        dying_cost: float = -2.0,
        **kwargs,
    ):
        import numpy as np

        self.heaven_hell_xy = jnp.asarray(heaven_hell, jnp.float32)
        self.priest_pos = jnp.asarray(priest_position, jnp.float32)
        hhp = np.concatenate(
            [np.concatenate([np.asarray(heaven_hell, np.float32),
                             np.asarray(priest_position, np.float32)[None]], 0),
             np.ones((3, 1), np.float32)],
            axis=1,
        )
        self._hhp = jnp.asarray(hhp)
        self.visible_radius = visible_radius
        self.dying_cost = dying_cost
        super().__init__(extend_ant_cfg(hhp=hhp, hallway_width=2.0))
        self.target_idx = self.sys.body.index["Target"]
        self.hell_idx = self.sys.body.index["Hell"]
        self.priest_idx = self.sys.body.index["Priest"]
        self.torso_idx = self.sys.body.index["$ Torso"]
        self.ant_slice = slice(self.torso_idx, self.priest_idx)  # incl. Ground (quirk)
        # per-dimension (low, high) rows for the ant spawn box (reference :73)
        self._init_ant_pos = jnp.array([[-0.5, 0.5], [0.5, 1.5]], jnp.float32)

    def reset(self, rng: jnp.ndarray) -> State:
        rng, qp = self.sample_init_qp(rng)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info, jnp.float32(0))
        reward, done, zero = jnp.zeros(3)
        metrics = {"heavens": zero, "hells": zero, "hits": zero}
        return State(qp, obs, reward, done, metrics, {"rng": rng})

    def sample_init_qp(self, rng: jnp.ndarray):
        rng, rng1, rng2, rng3, rng4 = jax.random.split(rng, 5)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(rng2, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        # rng3 used for the spawn AND reused below for the side swap — quirk (:93,:99)
        ant_pos = jax.random.uniform(
            rng3, (2,), minval=self._init_ant_pos[0], maxval=self._init_ant_pos[1])
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        pos = qp.pos.at[self.ant_slice, :2].add(ant_pos)
        hh = jax.random.choice(rng3, self._hhp[:2], (2,), replace=False)
        target_pos, hell_pos = hh[0], hh[1]
        pos = pos.at[jnp.stack([self.target_idx, self.hell_idx])].set(
            jnp.stack([target_pos, hell_pos]))
        return rng, qp.replace(pos=pos)

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        dead, reward = dead_and_reward(qp, self.torso_idx, self.dying_cost)
        hhp = jnp.stack([
            qp.pos[self.target_idx], qp.pos[self.hell_idx], qp.pos[self.priest_idx]])
        in_range = (
            jnp.linalg.norm(hhp[:, :2] - qp.pos[self.torso_idx, :2], axis=-1)
            <= self.visible_radius
        )
        priest_in_range = in_range[-1].astype(jnp.float32)
        reward = jnp.where(in_range[0], jnp.float32(1), reward)
        reward = jnp.where(in_range[1], jnp.float32(-1), reward)
        done = jnp.where(reward != 0, jnp.float32(1), jnp.float32(0))
        obs = self._get_obs(qp, info, priest_in_range)
        metrics = {**state.metrics, "hits": done}
        return state.replace(qp=qp, obs=obs, reward=reward, done=done, metrics=metrics)

    def _get_obs(self, qp: QP, info: Info, priest_in_range: jnp.ndarray) -> jnp.ndarray:
        """Core ant obs + priest-gated heaven direction sign(target_x) (:129-131)."""
        tgt_x = qp.pos[self.target_idx][0][None]
        heaven_direction = jnp.where(priest_in_range > 0, jnp.sign(tgt_x), jnp.zeros_like(tgt_x))
        return jnp.concatenate(ant_full_obs(self.sys, qp, info) + [heaven_direction])


if __name__ == "__main__":
    # per-module smoke (reference keeps one in every env module, e.g.
    # ant_tag.py:184-202): 200 random-action steps through the full wrapper
    # stack, fully on-device
    import time

    import jax

    from pobrax_tpu.envs import create

    env = create("ant_heavenhell", episode_length=1000, batch_size=16,
                 randomized_autoreset=True)
    key = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(jax.random.split(key, 16))

    def rollout(state, key, steps=200):
        def body(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            action = jax.random.uniform(
                k, (16, env.action_size), minval=-1.0, maxval=1.0)
            state = env.step(state, action)
            return (state, key), state.reward

        return jax.lax.scan(body, (state, key), None, length=steps)

    rollout = jax.jit(rollout)
    t0 = time.perf_counter()
    (state, _), rewards = rollout(state, key)
    jax.block_until_ready(rewards)
    print(f"compile+run: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    (state, _), rewards = rollout(state, key)
    jax.block_until_ready(rewards)
    dt = time.perf_counter() - t0
    print(f"16x200 steps in {dt:.3f}s ({16 * 200 / dt:,.0f} env-steps/s); "
          f"mean reward {float(rewards.mean()):+.4f}")

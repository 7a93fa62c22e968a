"""AntTag: an ant chases an evasive moving target, visible only nearby.

Behavioral spec from /root/reference/po_brax/envs/ant_tag.py — scene
(extend_ant_cfg :13-25), rejection-sampled target spawn (:90-105), the
4-move adversary state machine (:129-146), visibility-gated observation
(:148-181), tag/death termination (:107-127). Documented quirks preserved:
  * `ant_indices` spans torso..Target exclusive, so the frozen Ground body
    is included in the spawn-offset scatter (:59, harmless, kept);
  * target z is 0.5 at spawn (:103) but 1.0 after every adversary step
    (:146);
  * the whole adversary move reverts if ANY |coord| exceeds the cage (:145).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.envs.common import ant_full_obs, dead_and_reward
from pobrax_tpu.physics import ant as ant_model
from pobrax_tpu.physics import config as pcfg, scene
from pobrax_tpu.physics.state import Info, QP


def extend_ant_cfg(cage_max_xy=(4.5, 4.5), offset: float = 1.0) -> pcfg.Config:
    """Ant + frozen Target sphere + box-wall arena + ant-vs-arena contacts."""
    cfg = ant_model.ant_config()
    cfg = cfg.add_body(
        pcfg.Body(name="Target", colliders=(pcfg.Collider(geom=pcfg.Sphere(0.5)),),
                  mass=1.0, frozen=True)
    )
    cfg = scene.draw_arena(cfg, cage_max_xy[0] + offset, cage_max_xy[1] + offset, 0.5)
    for name in ant_model.ANT_BODY_NAMES:
        cfg = cfg.add_collide_pair(name, "Arena")
    return cfg


class AntTagEnv(Env):
    """Args (reference ant_tag.py:29-37):
        tag_radius: distance at which the target counts as tagged (ends episode)
        visible_radius: distance within which the target appears in the obs
        target_step: adversary step size
        min_spawn_distance: minimum target spawn distance from the ant
        cage_xy: play-area half-extent
        dying_cost: reward on torso-height death
    """

    def __init__(
        self,
        tag_radius: float = 1.5,
        visible_radius: float = 3.0,
        target_step: float = 0.5,
        min_spawn_distance: float = 5.0,
        cage_xy: Sequence[float] = (4.5, 4.5),
        dying_cost: float = -1.0,
        **kwargs,
    ):
        self.tag_radius = tag_radius
        self.visible_radius = visible_radius
        self.target_step = target_step
        self.min_spawn_distance = min_spawn_distance
        self.cage_xy = jnp.asarray(cage_xy, jnp.float32)
        self.dying_cost = dying_cost
        super().__init__(extend_ant_cfg(cage_max_xy=tuple(cage_xy), offset=1.0))
        self.target_idx = self.sys.body.index["Target"]
        self.torso_idx = self.sys.body.index["$ Torso"]
        # all bodies in [torso, target): includes Ground — reference quirk
        self.ant_slice = slice(self.torso_idx, self.target_idx)

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2, rng3, rng4 = jax.random.split(rng, 5)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(rng2, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        ant_pos = jax.random.uniform(rng3, (2,), minval=-self.cage_xy, maxval=self.cage_xy)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        pos = qp.pos.at[self.ant_slice, :2].add(ant_pos)
        _, tgt = self._random_target(rng4, ant_pos)
        pos = pos.at[self.target_idx].set(tgt)
        qp = qp.replace(pos=pos)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        reward, done, zero = jnp.zeros(3)
        return State(qp, obs, reward, done, {"hits": zero}, {"rng": rng})

    def _random_target(self, rng: jnp.ndarray, ant_xy: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Rejection-sample a spawn >= min_spawn_distance from the ant
        (reference :90-105; resampling threads a fresh key each iteration)."""
        xy = jax.random.uniform(rng, (2,), minval=-self.cage_xy, maxval=self.cage_xy)

        def resample(carry):
            rng, _ = carry
            _, rng1 = jax.random.split(rng, 2)
            xy = jax.random.uniform(rng1, (2,), minval=-self.cage_xy, maxval=self.cage_xy)
            return rng1, xy

        _, xy = jax.lax.while_loop(
            lambda c: jnp.linalg.norm(c[1] - ant_xy) <= self.min_spawn_distance,
            resample,
            (rng, xy),
        )
        target_z = jnp.float32(0.5)
        return rng, jnp.concatenate([xy, target_z[None]])

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        dead, reward = dead_and_reward(qp, self.torso_idx, self.dying_cost)
        rng, tgt_pos = self._step_target(
            state.info["rng"], qp.pos[self.torso_idx, :2], qp.pos[self.target_idx, :2])
        qp = qp.replace(pos=qp.pos.at[self.target_idx].set(tgt_pos))
        obs = self._get_obs(qp, info)
        done = jnp.where(
            jnp.linalg.norm(qp.pos[self.torso_idx, :2] - qp.pos[self.target_idx, :2])
            <= self.tag_radius,
            jnp.float32(1),
            jnp.float32(0),
        )
        reward = jnp.where(done > 0, jnp.float32(1), reward)
        metrics = {**state.metrics, "hits": done}
        new_info = {**state.info, "rng": rng}
        return state.replace(
            qp=qp, obs=obs, reward=reward, done=jnp.logical_or(dead, done).astype(jnp.float32),
            metrics=metrics, info=new_info,
        )

    def _step_target(self, rng, ant_xy, tgt_xy) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Adversary: one of {2 perpendiculars, flee, stay}, reverting moves
        that leave the cage (reference :129-146).

        HAZARD (parity with reference ant_tag.py:135): if the ant torso sits
        exactly on the target, norm(t2a) is 0 and the division yields NaN,
        which propagates into the target position. Unreachable at the default
        tag_radius=1.5 (the episode ends first); reachable only via config
        (tag_radius=0). Kept as-is because the divide is part of the
        fixed-seed bit-exactness surface."""
        rng, rng1 = jax.random.split(rng, 2)
        choice = jax.random.randint(rng1, (), 0, 4)
        t2a = ant_xy - tgt_xy
        t2a = t2a / jnp.linalg.norm(t2a)
        per_vec_1 = t2a[::-1] * jnp.array([1.0, -1.0])
        per_vec_2 = t2a[::-1] * jnp.array([-1.0, 1.0])
        vec_list = jnp.stack([per_vec_1, per_vec_2, -t2a, jnp.zeros(2)], 0)
        new_xy = vec_list[choice] * self.target_step + tgt_xy
        new_xy = jnp.where((jnp.abs(new_xy) > self.cage_xy).any(), tgt_xy, new_xy)
        # target z pinned to 1.0 after stepping — reference quirk (:146)
        return rng, jnp.concatenate([new_xy, jnp.ones(1)])

    def _get_obs(self, qp: QP, info: Info) -> jnp.ndarray:
        """Core ant obs + target xy zeroed outside visible_radius (:148-153)."""
        target_xy = qp.pos[self.target_idx, :2]
        ant_xy = qp.pos[self.torso_idx, :2]
        target_xy = jnp.where(
            jnp.linalg.norm(target_xy - ant_xy) <= self.visible_radius,
            target_xy,
            jnp.zeros(2),
        )
        return jnp.concatenate(ant_full_obs(self.sys, qp, info) + [target_xy])


if __name__ == "__main__":
    # per-module smoke (reference keeps one in every env module, e.g.
    # ant_tag.py:184-202): 200 random-action steps through the full wrapper
    # stack, fully on-device
    import time

    import jax

    from pobrax_tpu.envs import create

    env = create("ant_tag", episode_length=1000, batch_size=16,
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

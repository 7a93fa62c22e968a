"""AntMaze: navigate a procedurally-built maze to a goal cell.

The reference ships an AntMaze that cannot be constructed (stale AntGather
copy with undefined names — /root/reference/po_brax/envs/ant_maze.py:62, see
SURVEY.md §2.8) and a maze toolkit it never calls (maze_utils.py). This env
is what that file was evidently *for*, built working: `construct_maze`'s
grids (ids 0-10) become merged wall segments -> frozen box-wall bodies; the
ant spawns at the 'r' cell and is rewarded for reaching a 'g' cell.

Partial observability: the ant senses walls through an egocentric n_bins
range sensor (ray-vs-segment distances, vectorized over rays x segments
inside the jitted step) and sees the goal's direction only within
`visible_radius` — the AntTag-style gating (ant_tag.py:153).

Observation: ant proprio+contacts (27 + 6*nbody) + n_bins wall readings +
2 gated goal-direction dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pobrax_tpu.envs import maze_utils
from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.envs.common import ant_full_obs, dead_and_reward
from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics import ant as ant_model
from pobrax_tpu.physics import config as pcfg, scene
from pobrax_tpu.physics.state import Info, QP


def extend_ant_cfg(maze_id: int = 0, length: int = 1, scaling: float = 4.0,
                   wall_half_height: float = 1.0) -> pcfg.Config:
    """Ant + maze walls (one frozen body, one box collider per merged
    segment) + frozen Goal sphere. Body order: ant(9), Ground, Maze, Goal."""
    cfg = ant_model.ant_config()
    structure = maze_utils.construct_maze(maze_id, length)
    segments = maze_utils.maze_to_wall_segments(structure, scaling)
    colliders = tuple(
        scene.box_wall(seg[0], seg[1], half_height=wall_half_height,
                       wall_width=0.25)
        for seg in segments)
    cfg = cfg.add_body(pcfg.Body(name="Maze", colliders=colliders,
                                 mass=1.0, frozen=True))
    cfg = cfg.add_default_qp(pcfg.DefaultQP(name="Maze",
                                            pos=(0.0, 0.0, wall_half_height)))
    for name in ant_model.ANT_BODY_NAMES:
        cfg = cfg.add_collide_pair(name, "Maze")
    cfg = cfg.add_body(pcfg.Body(
        name="Goal", colliders=(pcfg.Collider(geom=pcfg.Sphere(0.5)),),
        mass=1.0, frozen=True))
    return cfg


class AntMazeEnv(Env):
    def __init__(self, maze_id: int = 0, length: int = 1, scaling: float = 4.0,
                 n_bins: int = 8, sensor_range: float = 6.0,
                 sensor_span: float = 2.0 * np.pi,
                 visible_radius: float = 3.0,
                 goal_reward: float = 10.0, dying_cost: float = -10.0,
                 **kwargs):
        super().__init__(extend_ant_cfg(maze_id, length, scaling))
        self.maze_id = maze_id
        self.length = length
        self.scaling = scaling
        self.n_bins = n_bins
        self.sensor_range = sensor_range
        self.half_span = sensor_span / 2.0
        self.visible_radius = visible_radius
        self.goal_reward = goal_reward
        self.dying_cost = dying_cost
        self.torso_idx = self.sys.body.index["$ Torso"]
        self.goal_idx = self.sys.body.index["Goal"]
        self.ant_indices = jnp.arange(self.torso_idx, self.sys.body.index["Ground"])

        structure = maze_utils.construct_maze(maze_id, length)
        self._segments = jnp.asarray(
            maze_utils.maze_to_wall_segments(structure, scaling), jnp.float32)
        _, goals, _ = maze_utils.maze_cell_centers(structure, scaling)
        if goals is None:
            raise ValueError(f"maze {maze_id} has no goal cell")
        self._goals = np.asarray(goals, np.float32)

    # ---- sensors -------------------------------------------------------------

    def _heading(self, qp: QP) -> jnp.ndarray:
        rot = qp.rot[self.torso_idx]
        fwd = quat.rotate(jnp.array([1.0, 0.0, 0.0]), rot)
        return jnp.arctan2(fwd[1], fwd[0])

    def _wall_readings(self, qp: QP) -> jnp.ndarray:
        """(n_bins,) normalized wall proximity per egocentric angular bin:
        1 at contact, 0 at/beyond sensor_range. Vectorized ray casting
        against the static merged segments (rays x segments)."""
        xy = qp.pos[self.torso_idx, :2]
        ori = self._heading(qp)
        bin_angles = ori - self.half_span + (jnp.arange(self.n_bins) + 0.5) \
            * (2.0 * self.half_span / self.n_bins)
        d = jnp.stack([jnp.cos(bin_angles), jnp.sin(bin_angles)], axis=-1)  # (R,2)
        p = self._segments[:, 0]  # (S,2)
        e = self._segments[:, 1] - p  # (S,2)
        rel = p[None, :, :] - xy[None, None, :]  # (1,S,2) broadcast over rays
        det = d[:, None, 0] * (-e[None, :, 1]) + d[:, None, 1] * e[None, :, 0]
        ok = jnp.abs(det) > 1e-8
        det = jnp.where(ok, det, 1.0)
        t = (rel[..., 0] * (-e[None, :, 1]) + rel[..., 1] * e[None, :, 0]) / det
        s = (d[:, None, 0] * rel[..., 1] - d[:, None, 1] * rel[..., 0]) / det
        hit = ok & (t >= 0.0) & (s >= 0.0) & (s <= 1.0)
        dist = jnp.min(jnp.where(hit, t, jnp.inf), axis=1)  # (R,)
        return jnp.clip(1.0 - dist / self.sensor_range, 0.0, 1.0)

    def _goal_obs(self, qp: QP) -> jnp.ndarray:
        """Goal direction (unit xy in the ant's frame), zeroed beyond
        visible_radius — the AntTag-style PO gating."""
        rel = qp.pos[self.goal_idx, :2] - qp.pos[self.torso_idx, :2]
        dist = jnp.linalg.norm(rel)
        ori = self._heading(qp)
        ca, sa = jnp.cos(-ori), jnp.sin(-ori)
        local = jnp.stack([ca * rel[0] - sa * rel[1], sa * rel[0] + ca * rel[1]])
        unit = local / jnp.maximum(dist, 1e-6)
        return jnp.where(dist <= self.visible_radius, unit, jnp.zeros(2))

    # ---- env API -------------------------------------------------------------

    def reset(self, rng: jnp.ndarray) -> State:
        rng, rng1, rng2, rng3 = jax.random.split(rng, 4)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        # goal: one of the maze's 'g' cells, uniformly
        gi = jax.random.randint(rng3, (), 0, len(self._goals))
        goal = jnp.asarray(self._goals)[gi]
        qp = qp.replace(pos=qp.pos.at[self.goal_idx, :2].set(goal)
                        .at[self.goal_idx, 2].set(0.5))
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        zero = jnp.float32(0)
        return State(qp, obs, zero, zero, {"goals": zero}, {"rng": rng})

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)
        dead, reward = dead_and_reward(qp, self.torso_idx, self.dying_cost)
        dist = jnp.linalg.norm(
            qp.pos[self.goal_idx, :2] - qp.pos[self.torso_idx, :2])
        reached = jnp.where(dist <= 1.0, jnp.float32(1), jnp.float32(0))
        reward = jnp.where(reached > 0, jnp.float32(self.goal_reward), reward)
        done = jnp.maximum(dead, reached)
        metrics = {**state.metrics, "goals": reached}
        return state.replace(qp=qp, obs=obs, reward=reward, done=done, metrics=metrics)

    def _get_obs(self, qp: QP, info: Info) -> jnp.ndarray:
        return jnp.concatenate(
            ant_full_obs(self.sys, qp, info)
            + [self._wall_readings(qp), self._goal_obs(qp)])


if __name__ == "__main__":
    # per-module smoke (reference keeps one in every env module, e.g.
    # ant_tag.py:184-202): 200 random-action steps through the full wrapper
    # stack, fully on-device
    import time

    import jax

    from pobrax_tpu.envs import create

    env = create("ant_maze", episode_length=1000, batch_size=16,
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

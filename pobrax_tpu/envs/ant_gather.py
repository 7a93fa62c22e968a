"""AntGather: collect apples (+1), avoid bombs (-1), sensed through a binned
egocentric range sensor.

Behavioral spec from /root/reference/po_brax/envs/ant_gather.py — arena +
8 frozen apple and 8 frozen bomb spheres (:17-39), integer-grid spawns
sampled without replacement (:88-91, :109-123), catch-and-teleport to a
waiting area (:91, :137-140), any-apple/any-bomb (not summed; bomb wins)
rewards (:142-144), and the binned range-bearing sensor (:152-181).
Quirks preserved (all load-bearing for seed parity):
  * object bearing uses arctan2(x, y) of the object's *absolute* position —
    not relative to the ant (:170);
  * bomb readings are offset by n_apples (8), not n_bins (10), so bombs
    overlap apple bins 8-9 when n_bins=10 (:175);
  * out-of-range objects scatter intensity 0 into bin -1, which wraps to the
    last reading slot and can erase a real reading there (:177-178);
  * the waiting area adds 2*sensor_range to ALL THREE coords of the last
    grid point — caught objects teleport into the sky (:91);
  * `metrics['objects']` is declared but never updated (:104, :148).
Scatter order is made deterministic (objects written in index order, last
writer wins) via an unrolled sequential update.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pobrax_tpu.envs.base import Env, State
from pobrax_tpu.envs.common import ant_full_obs, dead_and_reward
from pobrax_tpu.ops import quaternion as quat
from pobrax_tpu.physics import ant as ant_model
from pobrax_tpu.physics import config as pcfg, scene
from pobrax_tpu.physics.state import Info, QP


def extend_ant_cfg(cage_max_xy=(6.0, 6.0), offset: float = 1.0,
                   n_apples: int = 8, n_bombs: int = 8) -> pcfg.Config:
    """Ant + arena + frozen Target_i/Bomb_i spheres r=0.25 (reference :17-39).
    Body order: ant(9), Ground, Arena, Target_1..n, Bomb_1..n."""
    cfg = ant_model.ant_config()
    cfg = scene.draw_arena(cfg, cage_max_xy[0] + offset, cage_max_xy[1] + offset, 0.5)
    for name in ant_model.ANT_BODY_NAMES:
        cfg = cfg.add_collide_pair(name, "Arena")
    for i in range(n_apples):
        cfg = cfg.add_body(pcfg.Body(
            name=f"Target_{i + 1}",
            colliders=(pcfg.Collider(geom=pcfg.Sphere(0.25)),), mass=1.0, frozen=True))
    for i in range(n_bombs):
        cfg = cfg.add_body(pcfg.Body(
            name=f"Bomb_{i + 1}",
            colliders=(pcfg.Collider(geom=pcfg.Sphere(0.25)),), mass=1.0, frozen=True))
    return cfg


class AntGatherEnv(Env):
    """Args (reference :43-58): n_apples/n_bombs, cage_xy,
    robot_object_spacing (min spawn distance from origin), catch_range,
    n_bins / sensor_range / sensor_span (egocentric sensor), dying_cost."""

    def __init__(
        self,
        n_apples: int = 8,
        n_bombs: int = 8,
        cage_xy: Sequence[float] = (6.0, 6.0),
        robot_object_spacing: float = 2.0,
        catch_range: float = 1.0,
        n_bins: int = 10,
        sensor_range: float = 6.0,
        sensor_span: float = float(np.pi),
        dying_cost: float = -10.0,
        bomb_bin_offset: int | None = None,
        **kwargs,
    ):
        self.cage_xy = jnp.asarray(cage_xy, jnp.float32)
        super().__init__(extend_ant_cfg(cage_max_xy=tuple(cage_xy), offset=1.0,
                                        n_apples=n_apples, n_bombs=n_bombs))
        self.torso_idx = self.sys.body.index["$ Torso"]
        self.n_apples = n_apples
        self.n_bombs = n_bombs
        self.n_objects = n_apples + n_bombs
        self.n_bins = n_bins
        # Reference quirk (:175): bomb readings land at bin + n_apples, so
        # with the defaults (8 apples, 10 bins) bombs overlap apple bins
        # 8-9 — an apple/bomb ALIASING baked into the sensor. The default
        # (None -> n_apples) preserves it for parity; bomb_bin_offset=n_bins
        # is the DIAGNOSTIC de-aliased sensor used to measure what the
        # aliasing costs a trained agent (docs/LEARNING.md).
        self.bomb_bin_offset = n_apples if bomb_bin_offset is None else int(bomb_bin_offset)
        self.dying_cost = dying_cost
        self.sensor_range = sensor_range
        self.half_span = sensor_span / 2
        self.catch_range = catch_range
        last = self.sys.num_bodies
        self.object_indices = jnp.arange(last - self.n_objects, last)

        # integer grid positions at least robot_object_spacing from the origin,
        # in meshgrid-xy raveled order (x varies fastest) — reference :88-90
        gx, gy = np.meshgrid(
            np.arange(-cage_xy[0], cage_xy[0] + 1),
            np.arange(-cage_xy[1], cage_xy[1] + 1),
            indexing="xy",
        )
        grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float32)
        grid = grid[np.linalg.norm(grid, axis=1) > robot_object_spacing]
        grid = np.concatenate([grid, np.zeros((grid.shape[0], 1), np.float32)], axis=1)
        self.possible_grid_positions = jnp.asarray(grid)
        # ALL coords shifted by 2*sensor_range, including z — reference quirk (:91)
        self.waiting_area = self.possible_grid_positions[-1] + self.sensor_range * 2

    def reset(self, rng: jnp.ndarray) -> State:
        qp = self.sample_init_qp(rng)
        info = self.sys.info(qp)
        distances = jnp.linalg.norm(
            qp.pos[self.torso_idx][:2] - qp.pos[self.object_indices][..., :2], axis=1)
        obs = self._get_obs(qp, info, distances)
        reward, done, zero = jnp.zeros(3)
        metrics = {"apples": zero, "bombs": zero, "objects": zero}
        return State(qp, obs, reward, done, metrics, {"rng": rng})

    def sample_init_qp(self, rng: jnp.ndarray) -> QP:
        rng, rng1, rng2, rng3 = jax.random.split(rng, 4)
        qpos = self.sys.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qvel = jax.random.uniform(rng2, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1)
        qp = self.sys.default_qp(joint_angle=qpos, joint_velocity=qvel)
        object_pos = jax.random.choice(
            rng3, self.possible_grid_positions, (self.n_objects,), replace=False)
        # apples sit at z=1, bombs stay at z=0 (reference :119)
        object_pos = object_pos.at[jnp.arange(0, self.n_apples), 2].set(1.0)
        pos = qp.pos.at[self.object_indices].set(object_pos)
        return qp.replace(pos=pos)

    def step(self, state: State, action: jnp.ndarray) -> State:
        qp, info = self.sys.step(state.qp, action)
        distances = jnp.linalg.norm(
            qp.pos[self.torso_idx][:2] - qp.pos[self.object_indices][..., :2], axis=1)
        # observation uses pre-teleport positions — reference order (:128-131)
        obs = self._get_obs(qp, info, distances)
        dead, reward = dead_and_reward(qp, self.torso_idx, self.dying_cost)
        in_range = distances <= self.catch_range
        tgt_pos = jnp.where(in_range[:, None], self.waiting_area, qp.pos[self.object_indices])
        qp = qp.replace(pos=qp.pos.at[self.object_indices].set(tgt_pos))

        in_range_apple = in_range[: self.n_apples]
        in_range_bomb = in_range[self.n_apples:]
        reward = jnp.where(in_range_apple.any() & (dead == 0), jnp.float32(1), reward)
        reward = jnp.where(in_range_bomb.any() & (dead == 0), jnp.float32(-1), reward)
        done = jnp.where(
            (qp.pos[self.object_indices] == self.waiting_area).all(), jnp.float32(1), dead)
        metrics = {
            **state.metrics,
            "apples": in_range_apple.sum().astype(jnp.float32),
            "bombs": in_range_bomb.sum().astype(jnp.float32),
        }
        return state.replace(qp=qp, obs=obs, reward=reward, done=done, metrics=metrics)

    def _get_readings(self, qp: QP, distances: jnp.ndarray) -> jnp.ndarray:
        """Binned range-bearing sensor (reference :152-181), quirks intact."""
        bin_res = (2 * self.half_span) / self.n_bins
        ant_orientation = qp.rot[self.torso_idx]
        ori_vec = quat.quat_mul(
            quat.quat_mul(ant_orientation, jnp.array([0.0, 1.0, 0.0, 0.0])),
            quat.quat_inv(ant_orientation),
        )[1:3]
        ori = jnp.arctan2(ori_vec[1], ori_vec[0])
        object_xy = qp.pos[self.object_indices][..., :2]
        # arctan2(x, y) of ABSOLUTE object position — reference quirk (:170)
        angles = jnp.arctan2(object_xy[..., 0], object_xy[..., 1]) - ori
        in_range = distances <= self.sensor_range
        object_bins = jnp.where(
            jnp.logical_and(jnp.abs(angles) <= self.half_span, in_range),
            ((angles + self.half_span) / bin_res).astype(jnp.int32),
            jnp.int32(-1),
        )
        if self.bomb_bin_offset != self.n_apples:
            # de-aliased diagnostic only: the reference bin formula yields
            # n_bins (an 11th bin) at angle EXACTLY +half_span — a measure-
            # zero bearing that would re-alias the layout (boundary apples
            # at slot n_bins vs bomb bin 0). Merge it into the last bin.
            object_bins = jnp.where(
                object_bins >= 0,
                jnp.minimum(object_bins, self.n_bins - 1), object_bins)
        # bombs offset by n_apples, NOT n_bins — reference quirk (:175);
        # bomb_bin_offset=n_bins gives the de-aliased diagnostic sensor
        bomb_bins = jnp.where(
            object_bins[self.n_apples:] >= 0,
            object_bins[self.n_apples:] + self.bomb_bin_offset,
            -1,
        )
        object_bins = object_bins.at[jnp.arange(self.n_apples, self.n_objects)].set(bomb_bins)
        object_intensities = jnp.where(
            object_bins >= 0, 1.0 - (distances / self.sensor_range), jnp.float32(0))
        # last-writer-wins in object order, bin -1 wrapping to the last slot
        # (reference :177-178 semantics). Written as one-hot selects rather
        # than dynamic scatters — a dynamic .at[i].set per object serializes
        # on TPU; compare-and-select fuses into one VPU kernel.
        n_slots = self.n_bins * 2
        if self.bomb_bin_offset == self.n_apples:
            # reference wrap: bin -1 -> last slot (writes a 0.0 there; with
            # the aliased offset that slot never holds a real reading)
            work_slots = n_slots
        else:
            # de-aliased sensor: bombs occupy bins n_bins..2*n_bins-1, so the
            # -1 wrap WOULD erase a real last-bin bomb reading — route it to
            # a trash slot instead (dropped below) to keep the diagnostic
            # free of any aliasing
            work_slots = n_slots + 1
        slots = jnp.where(object_bins < 0, object_bins + work_slots, object_bins)
        slot_ids = jnp.arange(work_slots)
        readings = jnp.zeros(work_slots)
        for i in range(self.n_objects):
            readings = jnp.where(slot_ids == slots[i], object_intensities[i], readings)
        return readings[:n_slots]

    def _get_obs(self, qp: QP, info: Info, distances: jnp.ndarray) -> jnp.ndarray:
        return jnp.concatenate(
            ant_full_obs(self.sys, qp, info) + [self._get_readings(qp, distances)])


if __name__ == "__main__":
    # per-module smoke (reference keeps one in every env module, e.g.
    # ant_tag.py:184-202): 200 random-action steps through the full wrapper
    # stack, fully on-device
    import time

    import jax

    from pobrax_tpu.envs import create

    env = create("ant_gather", episode_length=1000, batch_size=16,
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

"""Count-based exploration bonuses as a training-time wrapper.

The PO suite's unsolved tail (AntGather's far apples — docs/LEARNING.md)
is a SEARCH problem: once the nearby apples are eaten the survivors sit
beyond sensor range and nothing in the reward points at unvisited ground.
`GridNoveltyBonusWrapper` adds the classic count-based novelty bonus
beta / sqrt(N(cell)) on a coarse torso-xy grid (Strehl & Littman's
MBIE-EB form, the tabular ancestor of pseudo-count bonuses).

TPU-first mechanics (CLAUDE.md perf rules):
  * the per-env count grid lives in `state.info` — a (G, G) float32 array
    threaded through the jitted scan like every other env field, so the
    bonus costs no host round-trip and vmaps across the batch;
  * cell updates/reads are ONE-HOT outer products and masked sums, never
    dynamic scatter/gather on tiny axes;
  * counts DECAY (halflife_steps) instead of resetting at episode
    boundaries: autoreset wrappers only restore qp/obs (wrappers.py), so
    an episodic reset isn't visible from below the EpisodeWrapper — decay
    makes the novelty signal time-local without needing one, and keeps
    the bonus alive under the cached-autoreset production stack.

The wrapper is TRAINING-TIME shaping; evaluate on the unwrapped env.
No reference counterpart (the reference has no exploration machinery);
this is framework breadth motivated by VERDICT-r4 next-step #1(b).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from pobrax_tpu.envs.base import State, Wrapper


class GridNoveltyBonusWrapper(Wrapper):
    """r' = r + beta / sqrt(N(cell(torso_xy))) with decayed visit counts.

    With `bomb_memory > 0` the wrapper also maintains a DANGER grid: on
    any step where the wrapped env's `metrics['bombs']` indicator fires,
    the current cell is marked; afterwards, standing in a marked cell
    costs `bomb_memory` per step (no decay — bombs are static within an
    episode, and the danger field carrying across an autoreset boundary
    only marks cells that USED to hold a bomb, a mild prior). This is the
    'remembered danger' lever from the round-5 apple-bomb-frontier
    diagnosis (docs/LEARNING.md): the 6 m sensor forgets bombs it leaves
    behind; the field re-supplies that memory at TRAINING time so the
    policy can learn routes that do not re-cross known bombs.

    Args:
      env: core (unbatched) env exposing `torso_idx` (or pass torso_idx).
      beta: bonus scale; 0 disables (wrapper becomes pass-through shaping).
      half_extent: the grid covers [-half_extent, half_extent]^2 in xy.
      grid: cells per side.
      halflife_steps: visit-count half-life in env steps (decay
        = 0.5 ** (1/halflife)); None/inf keeps counts forever.
      bomb_memory: per-step penalty for occupying a cell where a bomb
        was previously hit; 0 disables the danger grid entirely.
    """

    def __init__(self, env, beta: float = 0.25, half_extent: float = 10.0,
                 grid: int = 16, halflife_steps: float | None = 500.0,
                 torso_idx: int | None = None, bomb_memory: float = 0.0):
        super().__init__(env)
        if beta < 0:
            raise ValueError("beta must be >= 0")
        if bomb_memory < 0:
            raise ValueError("bomb_memory must be >= 0")
        self.beta = float(beta)
        self.bomb_memory = float(bomb_memory)
        self.half_extent = float(half_extent)
        self.grid = int(grid)
        self.cell = 2.0 * self.half_extent / self.grid
        self.decay = (1.0 if not halflife_steps or math.isinf(halflife_steps)
                      else 0.5 ** (1.0 / float(halflife_steps)))
        self.torso_idx = (getattr(env.unwrapped, "torso_idx", 0)
                          if torso_idx is None else int(torso_idx))

    def _onehot_cell(self, qp):
        """(G,) x (G,) one-hot factors of the torso's cell (clipped to the
        border cells outside the extent) — compare/select, no gather."""
        xy = qp.pos[self.torso_idx, :2]
        ij = jnp.clip(jnp.floor((xy + self.half_extent) / self.cell),
                      0, self.grid - 1).astype(jnp.int32)
        ar = jnp.arange(self.grid)
        return ((ar == ij[0]).astype(jnp.float32),
                (ar == ij[1]).astype(jnp.float32))

    def reset(self, rng: jnp.ndarray) -> State:
        state = self.env.reset(rng)
        counts = jnp.zeros((self.grid, self.grid), jnp.float32)
        info = {**state.info, "visit_counts": counts}
        if self.bomb_memory > 0.0:
            info["bomb_cells"] = jnp.zeros((self.grid, self.grid),
                                           jnp.float32)
        return state.replace(info=info)

    def step(self, state: State, action: jnp.ndarray) -> State:
        nstate = self.env.step(state, action)
        oi, oj = self._onehot_cell(nstate.qp)
        onehot = oi[:, None] * oj[None, :]
        counts = state.info["visit_counts"] * self.decay + onehot
        n_here = jnp.sum(counts * onehot)  # masked sum, not a gather
        bonus = self.beta / jnp.sqrt(jnp.maximum(n_here, 1.0))
        info = {**nstate.info, "visit_counts": counts}
        if self.bomb_memory > 0.0:
            # metrics['bombs'] is the wrapped env's per-step bomb-hit
            # indicator (ant_gather semantics); mark-at-cell is a one-hot
            # multiply-add, occupancy check a masked sum — no scatters
            hit = nstate.metrics.get("bombs", jnp.zeros(()))
            bomb_cells = jnp.maximum(state.info["bomb_cells"],
                                     onehot * jnp.minimum(hit, 1.0))
            in_danger = jnp.sum(bomb_cells * onehot)
            bonus = bonus - self.bomb_memory * jnp.minimum(in_danger, 1.0)
            info["bomb_cells"] = bomb_cells
        return nstate.replace(
            reward=nstate.reward + bonus,
            info=info)

"""Maze utilities + AntMaze env tests."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pobrax_tpu.envs import maze_utils
from pobrax_tpu.envs.ant_maze import AntMazeEnv


def test_line_intersect_basic():
    xi, yi, valid, r, s = maze_utils.line_intersect((0, 0), (2, 0), (1, -1), (1, 1))
    assert valid == 1
    assert (xi, yi) == (1.0, 0.0)
    assert r == 0.5 and s == 0.5


def test_line_intersect_parallel_invalid():
    out = maze_utils.line_intersect((0, 0), (1, 0), (0, 1), (1, 1))
    assert out[2] == 0


def test_ray_segment_intersect():
    hit = maze_utils.ray_segment_intersect(((0, 0), 0.0), ((2, -1), (2, 1)))
    assert hit is not None
    np.testing.assert_allclose(hit, (2.0, 0.0), atol=1e-9)
    miss = maze_utils.ray_segment_intersect(((0, 0), math.pi), ((2, -1), (2, 1)))
    assert miss is None


def test_ray_segments_vectorized_matches_scalar():
    segs = np.array([[[2, -1], [2, 1]], [[-3, -1], [-3, 1]], [[0, 5], [1, 5]]], float)
    d = maze_utils.ray_segments_intersect(((0, 0), 0.0), segs)
    assert d[0] == pytest.approx(2.0)
    assert np.isinf(d[1]) and np.isinf(d[2])


@pytest.mark.parametrize("maze_id,length", [(0, 1), (1, 3), (2, 3), (3, 2),
                                            (4, 1), (5, 1), (6, 1), (7, 1),
                                            (8, 1), (9, 1), (10, 1)])
def test_construct_maze_layouts(maze_id, length):
    grid = maze_utils.construct_maze(maze_id, length)
    flat = [v for row in grid for v in row]
    assert flat.count("r") == 1
    assert flat.count("g") >= 1
    # border is solid wall
    assert all(v == 1 for v in grid[0]) and all(v == 1 for v in grid[-1])
    assert all(row[0] == 1 and row[-1] == 1 for row in grid)


def test_construct_maze_id0_requires_length1():
    with pytest.raises(NotImplementedError):
        maze_utils.construct_maze(0, length=2)


def test_wall_segments_closed_and_merged():
    grid = maze_utils.construct_maze(0)
    segs = maze_utils.maze_to_wall_segments(grid, scaling=4.0)
    assert segs.shape[1:] == (2, 2)
    # merged: the 5x5 benchmark maze needs far fewer segments than raw edges
    assert 4 <= segs.shape[0] <= 16


def test_antmaze_runs_and_senses_walls():
    env = AntMazeEnv(maze_id=0)
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # ant proprio (29: pos3+quat4+angles8+vel3+ang3+vels8) + contacts (6*nbody)
    # + wall bins + gated goal direction
    assert s.obs.shape == (29 + 6 * env.sys.num_bodies + env.n_bins + 2,)
    walls = s.obs[-(env.n_bins + 2):-2]
    assert float(walls.max()) > 0.3  # spawn cell has nearby walls
    assert jnp.allclose(s.obs[-2:], 0.0)  # goal hidden at spawn

    def roll(s, key, T=50):
        def body(carry, _):
            s, key = carry
            key, k = jax.random.split(key)
            a = jax.random.uniform(k, (env.action_size,), minval=-1, maxval=1)
            s = env.step(s, a)
            return (s, key), s.obs
        return jax.lax.scan(body, (s, key), None, length=T)

    (_, _), obs = jax.jit(roll)(s, jax.random.PRNGKey(1))
    assert bool(jnp.all(jnp.isfinite(obs)))


def test_antmaze_goal_visible_within_radius():
    env = AntMazeEnv(maze_id=0)
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    qp = s.qp.replace(pos=s.qp.pos.at[0, :2].set(
        jnp.asarray(env._goals[0]) + jnp.array([1.0, 0.0])))
    obs = env._get_obs(qp, env.sys.info(qp))
    assert float(jnp.linalg.norm(obs[-2:])) == pytest.approx(1.0, abs=1e-4)


def test_geodesic_field_monotone_along_corridor():
    """The potential-shaping field: distance decreases monotonically along
    maze 0's U-corridor toward the goal, and wall cells are repulsive
    (higher than any floor value, so interpolated gradients point away)."""
    structure = maze_utils.construct_maze(0)
    field, x0, y0, res = maze_utils.geodesic_distance_field(structure, 4.0, 5)
    assert field.shape == (25, 25)

    def at(x, y):
        return field[int(round((y0 - y) / res)), int(round((x - x0) / res))]

    corridor = [(0, 0), (4, 0), (8, 0), (8, -4), (8, -8), (4, -8), (0, -8)]
    vals = [at(*p) for p in corridor]
    assert vals[-1] == 0.0  # goal cell
    assert all(a > b for a, b in zip(vals, vals[1:]))  # strictly decreasing
    # the wall cell on the euclidean straight line r->g is repulsive
    assert at(0, -4) > max(vals)


def test_shaped_ant_maze_progress_reward():
    """ShapedAntMaze adds coef*(phi'-phi); teleporting the ant one cell
    along the corridor must yield a positive shaped delta even though the
    euclidean distance to the goal INCREASES on that segment (maze 0:
    (0,0)->(4,0) moves away from the goal at (0,-8) in straight line)."""
    from examples.train_ant_maze_rnn import ShapedAntMaze
    from pobrax_tpu.envs.ant_maze import AntMazeEnv

    env = ShapedAntMaze(AntMazeEnv(maze_id=0), coef=1.0)
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    p0 = env._phi(s.qp)
    qp1 = s.qp.replace(pos=s.qp.pos.at[0, :2].set(jnp.array([4.0, 0.0])))
    p1 = env._phi(qp1)
    assert float(p1) > float(p0)
    # euclidean check that this is the case euclidean shaping gets wrong
    goal = jnp.asarray(env.unwrapped._goals[0])
    assert float(jnp.linalg.norm(jnp.array([4.0, 0.0]) - goal)) > float(
        jnp.linalg.norm(jnp.array([0.0, 0.0]) - goal))
    # a shaped step runs under jit and stays finite
    a = jnp.zeros((env.action_size,))
    ns = jax.jit(env.step)(s, a)
    assert bool(jnp.isfinite(ns.reward))

"""AntGather motion-budget ceiling: how far must an ideal agent travel?

The trained catch-mask policy plateaus at 5.38 apples (det) of 8 —
is that a learning failure or the episode's motion budget? This tool
computes the GREEDY NEAREST-APPLE TOUR length distribution over the real
spawn process (integer grid, >2 from origin, without replacement, 8
apples + 8 bombs — pobrax_tpu/envs/ant_gather.py:91-101,121-124): the
cumulative distance an ideal apple-seeking point agent travels to reach
its k-th apple, starting at the origin. Marginal distance per apple
grows steeply as the field depletes, which bounds what ANY policy of a
given speed can collect in a fixed episode.

Prints a JSON summary consumed by docs/LEARNING.md.
"""

import json

import numpy as np


def spawn(rng, cage=6.0, spacing=2.0, n_objects=16):
    g = np.arange(-cage, cage + 1)
    gx, gy = np.meshgrid(g, g, indexing="xy")
    grid = np.stack([gx.ravel(), gy.ravel()], axis=1).astype(np.float64)
    grid = grid[np.linalg.norm(grid, axis=1) > spacing]
    idx = rng.choice(len(grid), size=n_objects, replace=False)
    pos = grid[idx]
    return pos[:8], pos[8:]  # apples, bombs


def greedy_tour(apples, start=(0.0, 0.0)):
    """Cumulative greedy nearest-apple tour distances (length 8)."""
    pos = np.asarray(start, np.float64)
    left = apples.copy()
    cum, total = [], 0.0
    for _ in range(len(apples)):
        d = np.linalg.norm(left - pos, axis=1)
        j = int(np.argmin(d))
        total += d[j]
        cum.append(total)
        pos = left[j]
        left = np.delete(left, j, axis=0)
    return np.asarray(cum)


def main(n=20000, seed=0):
    rng = np.random.default_rng(seed)
    tours = np.stack([greedy_tour(spawn(rng)[0]) for _ in range(n)])
    mean = tours.mean(axis=0)
    out = {
        "n_samples": n,
        "mean_cum_distance_to_kth_apple": [round(float(x), 2) for x in mean],
        "marginal_distance_per_apple": [round(float(x), 2) for x in
                                        np.diff(mean, prepend=0.0)],
    }
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

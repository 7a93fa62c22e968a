"""Running observation statistics for input normalization.

Welford-style streaming mean/std over all observations seen so far, carried
as a pure pytree so updates fuse into the jitted training step. Under a
data-sharded mesh the batch statistics are combined with `psum` semantics
automatically by XLA (the reductions below are over the global batch once the
arrays are sharded), so no hand-written collectives are needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RunningStatisticsState:
    count: jnp.ndarray  # scalar
    mean: jnp.ndarray  # (obs_size,)
    summed_variance: jnp.ndarray  # (obs_size,)
    std: jnp.ndarray  # (obs_size,)


def init_state(obs_size: int) -> RunningStatisticsState:
    return RunningStatisticsState(
        count=jnp.zeros((), jnp.float32),
        mean=jnp.zeros((obs_size,), jnp.float32),
        summed_variance=jnp.zeros((obs_size,), jnp.float32),
        std=jnp.ones((obs_size,), jnp.float32),
    )


def update(state: RunningStatisticsState, batch: jnp.ndarray,
           axis_name=None) -> RunningStatisticsState:
    """Fold a batch (..., obs_size) into the running statistics.

    Under jit+shardings the reductions below already run over the global
    batch (XLA inserts the collectives). Under `shard_map`, where shapes
    are per-shard, pass `axis_name` so the batch sums psum over the mesh
    axis and every shard folds the identical global statistics."""
    flat = batch.reshape((-1, batch.shape[-1]))
    batch_count = jnp.asarray(flat.shape[0], jnp.float32)
    diff_to_old = flat - state.mean
    sum_old = jnp.sum(diff_to_old, axis=0)
    if axis_name is not None:
        batch_count = jax.lax.psum(batch_count, axis_name)
        sum_old = jax.lax.psum(sum_old, axis_name)
    count = state.count + batch_count
    mean = state.mean + sum_old / count
    diff_to_new = flat - mean
    sum_var = jnp.sum(diff_to_old * diff_to_new, axis=0)
    if axis_name is not None:
        sum_var = jax.lax.psum(sum_var, axis_name)
    summed_variance = state.summed_variance + sum_var
    std = jnp.sqrt(jnp.maximum(summed_variance / count, 1e-6))
    return RunningStatisticsState(
        count=count, mean=mean, summed_variance=summed_variance, std=std)


def normalize(state: RunningStatisticsState, batch: jnp.ndarray) -> jnp.ndarray:
    return (batch - state.mean) / state.std

"""Device-resident ring replay buffer.

A pure-pytree uniform replay buffer: storage lives on device as
(capacity, ...) arrays inside the training state, inserts are dynamic-slice
writes, sampling is a gather by random indices — everything jit/scan-safe,
no host round-trips. Sharding: with storage laid out (capacity, batch, ...)
and `batch` sharded on the mesh 'data' axis, each shard owns its own envs'
history (insert/sample are per-column), so SAC scales like PPO.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    data: Any  # pytree of (capacity, ...) arrays
    insert_pos: jnp.ndarray  # scalar int32: next write slot
    size: jnp.ndarray  # scalar int32: valid entries


def init(sample: Any, capacity: int) -> ReplayState:
    """Allocate storage shaped (capacity, *leaf.shape) from one sample."""
    data = jax.tree.map(
        lambda x: jnp.zeros((capacity,) + jnp.shape(x), jnp.asarray(x).dtype),
        sample)
    return ReplayState(
        data=data,
        insert_pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def insert(state: ReplayState, sample: Any) -> ReplayState:
    """Write one slot (sample may be batched along its own trailing dims)."""
    capacity = jax.tree.leaves(state.data)[0].shape[0]
    data = jax.tree.map(
        lambda buf, x: jax.lax.dynamic_update_index_in_dim(
            buf, jnp.asarray(x, buf.dtype), state.insert_pos, 0),
        state.data, sample)
    return ReplayState(
        data=data,
        insert_pos=(state.insert_pos + 1) % capacity,
        size=jnp.minimum(state.size + 1, capacity),
    )


def sample(state: ReplayState, key: jnp.ndarray, batch: int) -> Any:
    """Uniform sample of `batch` whole slots (with replacement).

    Slot-granular: with (capacity, num_envs, ...) storage each draw returns
    one full env-batch row. Keeps per-column locality, so it stays correct
    when the column axis is sharded on a mesh 'data' axis."""
    idx = jax.random.randint(key, (batch,), 0, jnp.maximum(state.size, 1))
    return jax.tree.map(lambda buf: buf[idx], state.data)


# ---- prioritized sampling over (slot, column) pairs -------------------------
#
# R2D2-style PER for sequence storage laid out (capacity, [time,] columns,
# ...): a (capacity, columns) priority table lives alongside the ReplayState
# (plain array, so trainers can carry it in their own state and the uniform
# path pays nothing). Sampling is a single categorical draw over the
# flattened table — no sum-tree needed on TPU, the masked softmax over
# capacity*columns entries is one fused reduction.


def priorities_init(capacity: int, columns: int) -> jnp.ndarray:
    """Zeroed (capacity, columns) priority table; p=0 marks never-written
    entries and masks them out of sampling."""
    return jnp.zeros((capacity, columns), jnp.float32)


def priorities_on_insert(pri: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """Give a freshly written slot max priority (PER convention: every
    sequence is sampleable at full weight until its TD error is known)."""
    return pri.at[slot].set(jnp.maximum(jnp.max(pri), 1.0))


def sample_prioritized(
    pri: jnp.ndarray, key: jnp.ndarray, batch: int,
    alpha: float, beta: float,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Draw `batch` (slot, col) pairs with P(i) ∝ p_i^alpha (with
    replacement) and return (slot, col, w) where w are the importance
    weights (N·P(i))^-beta normalized by their max (so w ≤ 1 and alpha=0
    recovers uniform sampling with w ≡ 1). Requires ≥1 written entry.
    NOTE: gathers across the column axis — same sharding caveat as
    sample_transitions."""
    valid = pri > 0
    pa = jnp.where(valid, jnp.power(pri, alpha), 0.0)
    logits = jnp.where(valid, jnp.log(jnp.maximum(pa, 1e-30)), -jnp.inf)
    flat = jax.random.categorical(key, logits.reshape(-1), shape=(batch,))
    slot = flat // pri.shape[1]
    col = flat % pri.shape[1]
    probs = (pa / jnp.maximum(jnp.sum(pa), 1e-30)).reshape(-1)[flat]
    n = jnp.maximum(jnp.sum(valid).astype(jnp.float32), 1.0)
    w = jnp.power(n * jnp.maximum(probs, 1e-30), -beta)
    return slot, col, w / jnp.maximum(jnp.max(w), 1e-30)


def priorities_update(pri: jnp.ndarray, slot: jnp.ndarray, col: jnp.ndarray,
                      td_abs: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
    """Write back |TD| priorities for sampled pairs (duplicates: last write
    wins, the standard with-replacement PER trade)."""
    return pri.at[slot, col].set(td_abs + eps)


def sample_transitions(state: ReplayState, key: jnp.ndarray, batch: int) -> Any:
    """Uniform sample of `batch` individual transitions (with replacement).

    Requires every leaf shaped (capacity, columns, ...): draws independent
    (slot, column) pairs so a batch is decorrelated in time AND across envs.
    NOTE: gathers across the column axis — if storage is sharded on that
    axis this induces cross-shard collectives; use `sample` there instead."""
    cols = jax.tree.leaves(state.data)[0].shape[1]
    k_slot, k_col = jax.random.split(key)
    slot = jax.random.randint(k_slot, (batch,), 0, jnp.maximum(state.size, 1))
    col = jax.random.randint(k_col, (batch,), 0, cols)
    return jax.tree.map(lambda buf: buf[slot, col], state.data)

"""Device mesh + sharding helpers.

The reference has no distribution layer at all (SURVEY.md: "Parallelism is
exactly one axis: single-device vmap batching"); this module supplies the
TPU-native one. The design follows the standard JAX recipe: pick a Mesh,
annotate shardings, let XLA insert the collectives.

Axes:
  * 'data'  — env batch / rollout batch. Every env-state and trajectory
              pytree is sharded on its leading batch dim. PPO gradients
              all-reduce (psum) over this axis automatically.
  * 'model' — reserved for parameter sharding. The reference's nets are tiny
              MLPs (networks.py:121-122) so this axis is size 1 by default,
              but every helper takes the axis name so a larger model can
              shard without API changes.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """A ('data', 'model') mesh over the given (default: all) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} does not tile {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis batch sharding over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh):
    """Place a batched pytree so its leading axis is sharded over 'data'."""
    return jax.device_put(tree, data_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def initialize_distributed(**kwargs) -> bool:
    """Multi-host runtime bring-up (jax.distributed.initialize).

    MUST run before any JAX computation (backend init) in the process —
    probing jax.process_count()/jax.devices() first would itself initialize
    the local backend and make this a guaranteed no-op. Returns True when
    the distributed runtime came up, False when running single-process
    (no coordinator configured). Re-raises if the runtime was requested but
    could not initialize (e.g. called too late)."""
    try:
        jax.distributed.initialize(**kwargs)
        return True
    except ValueError:
        # no coordinator address given or discoverable: single-process run
        return False

"""pobrax_tpu — a TPU-native partially-observable continuous-control RL suite.

A from-scratch JAX/XLA framework with the capabilities of DavidSlayback/po-brax:
a batched rigid-body spring-physics engine (legacy-Brax-style dynamics contract,
see reference po_brax usage at /root/reference), PO ant tasks (AntTag,
AntHeavenHell, AntGather), observability masks for stock envs, vectorization +
randomized-autoreset machinery, policy/value networks, a PPO learner, and
multi-host data-parallel scaling via jax.sharding.

Design: everything on the hot path is a pure function of pytrees; scene
configuration is host-side frozen dataclasses compiled once into static arrays;
`vmap` batches envs, `lax.scan` fuses rollouts, `shard_map`/NamedSharding
spreads the env batch over a device mesh.
"""

__version__ = "0.1.0"

from pobrax_tpu import envs, io, models, ops, parallel, physics, training, utils

__all__ = ["envs", "io", "models", "ops", "parallel", "physics", "training",
           "utils", "__version__"]

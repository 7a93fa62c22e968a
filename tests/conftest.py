"""Test configuration: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers the axon TPU relay and overrides
JAX_PLATFORMS at import time, so we must set the platform via jax.config
*after* importing jax. 8 host devices let sharding tests exercise a real
multi-device Mesh without a pod (SURVEY.md §4 implication (d)).
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

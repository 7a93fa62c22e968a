"""Parametric action distributions for continuous control.

The reference ships only networks (/root/reference/po_brax/training/
networks.py) and delegates training to external brax PPO/SAC; this module
provides the distribution layer that learner needs: a tanh-squashed diagonal
normal over the action box, parameterized by the policy net's output
(2 * action_size values: loc, pre-softplus scale).

Everything is shape-polymorphic over leading batch dims and built from
jnp primitives only, so it fuses into the jitted rollout step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NormalTanhDistribution:
    """tanh(Normal(loc, scale)) with a stable log-prob correction."""

    event_size: int
    min_std: float = 0.001

    @property
    def param_size(self) -> int:
        return 2 * self.event_size

    def _split(self, params: jnp.ndarray):
        loc, scale = jnp.split(params, 2, axis=-1)
        scale = jax.nn.softplus(scale) + self.min_std
        return loc, scale

    def sample_no_postprocess(self, params: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
        """Pre-tanh sample (the value whose log-prob is cheap to evaluate)."""
        loc, scale = self._split(params)
        return loc + scale * jax.random.normal(key, loc.shape)

    def sample(self, params: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
        return self.postprocess(self.sample_no_postprocess(params, key))

    def mode(self, params: jnp.ndarray) -> jnp.ndarray:
        loc, _ = self._split(params)
        return jnp.tanh(loc)

    def postprocess(self, pre_tanh: jnp.ndarray) -> jnp.ndarray:
        return jnp.tanh(pre_tanh)

    def log_prob(self, params: jnp.ndarray, pre_tanh: jnp.ndarray) -> jnp.ndarray:
        """log p(tanh(x)) for a pre-tanh sample x, summed over the event axis.

        Uses the numerically-stable tanh jacobian
        log(1 - tanh(x)^2) = 2 (log 2 - x - softplus(-2x)).
        """
        loc, scale = self._split(params)
        base = -0.5 * jnp.square((pre_tanh - loc) / scale) - jnp.log(scale) \
            - 0.5 * jnp.log(2.0 * jnp.pi)
        squash = 2.0 * (jnp.log(2.0) - pre_tanh - jax.nn.softplus(-2.0 * pre_tanh))
        return jnp.sum(base - squash, axis=-1)

    def entropy(self, params: jnp.ndarray, key: jnp.ndarray) -> jnp.ndarray:
        """Entropy estimate: analytic normal entropy + sampled tanh correction."""
        loc, scale = self._split(params)
        normal_ent = 0.5 * jnp.log(2.0 * jnp.pi * jnp.e) + jnp.log(scale)
        x = loc + scale * jax.random.normal(key, loc.shape)
        squash = 2.0 * (jnp.log(2.0) - x - jax.nn.softplus(-2.0 * x))
        return jnp.sum(normal_ent + squash, axis=-1)

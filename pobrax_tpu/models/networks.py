"""Policy/value network definitions (flax linen).

Behavioral equivalent of the reference's network layer
(/root/reference/po_brax/training/networks.py): `FeedForwardModel`
init/apply pairs, plain `MLP`, spectral-normalized `SNMLP` (two RNG streams:
'params' and 'sing_vec'), `make_model` (swish default), and `make_models`
(policy [32,32,32,32,P], value [256x5,1] — networks.py:121-122).

TPU notes: the hidden sizes above are tiny relative to the MXU's 128x128
tiles, so the win on TPU comes from batch size, not from per-layer tuning —
`apply` broadcasts over arbitrary leading batch dims and the learner calls it
on (num_envs, obs) blocks that tile the MXU fully. An optional `dtype`
argument runs the matmuls in bfloat16 while keeping parameters in float32
(standard mixed-precision recipe).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen


@dataclasses.dataclass
class FeedForwardModel:
    init: Any
    apply: Any


class SNDense(linen.Module):
    """Dense layer with spectral normalization by power iteration.

    Stand-in for the third-party spectral-norm Dense the reference imports
    (`brax.training.spectral_norm.SNDense`, networks.py:25 — brax is not in
    this environment). The singular-vector estimate lives in a 'sing_vec'
    flax collection and is refreshed with `n_steps` power iterations per
    forward pass; initialization draws from the 'sing_vec' RNG stream.
    """

    features: int
    use_bias: bool = True
    kernel_init: Callable[..., Any] = jax.nn.initializers.lecun_uniform()
    bias_init: Callable[..., Any] = jax.nn.initializers.zeros
    n_steps: int = 1
    eps: float = 1e-4
    dtype: Any = jnp.float32

    @linen.compact
    def __call__(self, inputs: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", self.kernel_init, (inputs.shape[-1], self.features))
        u0_init = linen.initializers.normal(stddev=1.0)
        u_var = self.variable(
            "sing_vec", "u", u0_init, self.make_rng("sing_vec"), (1, self.features))

        u = u_var.value
        for _ in range(self.n_steps):
            v = u @ kernel.T
            v = v / jnp.maximum(jnp.linalg.norm(v), self.eps)
            u = v @ kernel
            u = u / jnp.maximum(jnp.linalg.norm(u), self.eps)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        if not self.is_initializing():
            u_var.value = u
        sigma = jnp.squeeze(v @ kernel @ u.T)
        y = jnp.asarray(inputs, self.dtype) @ jnp.asarray(kernel / sigma, self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + jnp.asarray(bias, self.dtype)
        return y


class MLP(linen.Module):
    """Plain MLP; hidden activations after every layer except (optionally) the last."""

    layer_sizes: Sequence[int]
    activation: Callable[[jnp.ndarray], jnp.ndarray] = linen.relu
    kernel_init: Callable[..., Any] = jax.nn.initializers.lecun_uniform()
    activate_final: bool = False
    bias: bool = True
    dtype: Any = jnp.float32

    @linen.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.layer_sizes)
        for i, size in enumerate(self.layer_sizes):
            x = linen.Dense(
                size,
                name=f"hidden_{i}",
                kernel_init=self.kernel_init,
                use_bias=self.bias,
                dtype=self.dtype,
            )(x)
            if i < n - 1 or self.activate_final:
                x = self.activation(x)
        return x


class SNMLP(linen.Module):
    """MLP with spectral normalization on every Dense (two RNG streams)."""

    layer_sizes: Sequence[int]
    activation: Callable[[jnp.ndarray], jnp.ndarray] = linen.relu
    kernel_init: Callable[..., Any] = jax.nn.initializers.lecun_uniform()
    activate_final: bool = False
    bias: bool = True

    @linen.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = len(self.layer_sizes)
        for i, size in enumerate(self.layer_sizes):
            x = SNDense(
                size,
                name=f"hidden_{i}",
                kernel_init=self.kernel_init,
                use_bias=self.bias,
            )(x)
            if i < n - 1 or self.activate_final:
                x = self.activation(x)
        return x


def make_model(
    layer_sizes: Sequence[int],
    obs_size: int,
    activation: Callable[[jnp.ndarray], jnp.ndarray] = linen.swish,
    spectral_norm: bool = False,
    dtype: Any = jnp.float32,
) -> FeedForwardModel:
    """Create an init/apply model (reference networks.py:80-107).

    Spectral-norm models init from two RNG streams
    (`init(rng_params, rng_sing_vec)`) and their `apply` takes
    `{'params': ..., 'sing_vec': ...}` plus a `mutable=['sing_vec']` kwarg if
    the caller wants refreshed singular vectors back.
    """
    dummy_obs = jnp.zeros((1, obs_size))
    if spectral_norm:
        module = SNMLP(layer_sizes=list(layer_sizes), activation=activation)
        return FeedForwardModel(
            init=lambda rng1, rng2: module.init(
                {"params": rng1, "sing_vec": rng2}, dummy_obs),
            apply=module.apply,
        )
    module = MLP(layer_sizes=list(layer_sizes), activation=activation, dtype=dtype)
    return FeedForwardModel(
        init=lambda rng: module.init(rng, dummy_obs), apply=module.apply)


def make_models(
    policy_params_size: int, obs_size: int,
) -> Tuple[FeedForwardModel, FeedForwardModel]:
    """Policy + value model pair with the reference's sizes
    (networks.py:121-122)."""
    policy_model = make_model([32, 32, 32, 32, policy_params_size], obs_size)
    value_model = make_model([256, 256, 256, 256, 256, 1], obs_size)
    return policy_model, value_model

"""Fused observation masking: turn any env into a PO variant.

The reference ships index tables with no consumer (SURVEY.md §2.2); here the
mask is applied *inside* the jitted step as one elementwise select, so a
masked env costs one fused `where` on top of the base env — the obs-mask
fusion configuration benchmarked by BASELINE.json config 4.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from pobrax_tpu.envs.base import Env, State, Wrapper
from pobrax_tpu.envs.masks import segment_mask


class MaskedObservationWrapper(Wrapper):
    """Zeroes hidden observation segments on every reset/step.

    Either pass `mask` (boolean keep-mask over the obs vector) or
    `env_name` + `hidden` segment names resolved via the standard tables.
    """

    def __init__(self, env: Env, mask: Optional[np.ndarray] = None,
                 env_name: Optional[str] = None,
                 hidden: Sequence[str] = ("VELOCITY",)):
        super().__init__(env)
        if mask is None:
            if env_name is None:
                raise ValueError("need either mask or env_name")
            mask = segment_mask(env_name, env.observation_size, hidden)
        self._mask = jnp.asarray(np.asarray(mask, bool))

    def _apply(self, state: State) -> State:
        return state.replace(obs=jnp.where(self._mask, state.obs, 0.0))

    def reset(self, rng: jnp.ndarray) -> State:
        return self._apply(self.env.reset(rng))

    def step(self, state: State, action: jnp.ndarray) -> State:
        return self._apply(self.env.step(state, action))

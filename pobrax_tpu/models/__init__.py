"""Model definitions (policy/value networks)."""

from pobrax_tpu.models.networks import (
    MLP,
    SNMLP,
    SNDense,
    FeedForwardModel,
    make_model,
    make_models,
)

__all__ = [
    "MLP",
    "SNMLP",
    "SNDense",
    "FeedForwardModel",
    "make_model",
    "make_models",
]

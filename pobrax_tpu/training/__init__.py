"""Training layer: networks re-export, distributions, PPO learner.

The reference keeps networks under `po_brax.training.networks`; we re-export
the models layer here so `pobrax_tpu.training.networks` resolves for users
coming from the reference's import path.
"""

from pobrax_tpu.models import networks
from pobrax_tpu.training import (distribution, ppo, ppo_rnn, replay,
                                 running_statistics, sac, sac_rnn)

__all__ = ["networks", "distribution", "ppo", "ppo_rnn", "replay",
           "running_statistics", "sac", "sac_rnn"]

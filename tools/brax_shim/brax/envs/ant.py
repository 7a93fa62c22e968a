"""brax.envs.ant compatibility: `_SYSTEM_CONFIG`.

The reference parses this text as the base scene for all three PO envs
(/root/reference/po_brax/envs/ant_tag.py:13, ant_heavenhell.py:13,
ant_gather.py:17). It is synthesized FROM our own ant model
(pobrax_tpu.physics.ant.ant_config) at import time, so the proto round-trip
(text -> parse -> proto_to_config) reproduces the engine's ant exactly by
construction — see tests/test_brax_shim.py.
"""

from pobrax_tpu.physics import ant as _ant

from tools.brax_shim.textproto import config_to_textproto

_SYSTEM_CONFIG = config_to_textproto(_ant.ant_config())

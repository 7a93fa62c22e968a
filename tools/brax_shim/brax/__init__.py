"""brax-v0 compatibility shim, backed by the pobrax_tpu engine.

Exposes the exact surface the reference's env layer consumes (SURVEY.md
§2.9): `brax.Config` (a REAL protobuf message, so google.protobuf.text_format
and the reference's mutation code work literally), `brax.System` (our
engine), `brax.QP`/`brax.Info` (our state pytrees), `brax.jumpy`,
`brax.math`, `brax.envs.env.Env/State`, and `brax.envs.ant._SYSTEM_CONFIG`.

Purpose: run /root/reference/po_brax's LITERAL env code (reset sampling, RNG
threading, adversary FSM, sensor binning, reward/done) against our physics,
and dump cross-implementation trajectory fixtures
(tools/compare_reference.py dump --impl reference). Import via
tools.brax_shim.loader.install(), which puts this package and the repo root
on sys.path.

NOT an implementation of brax: every numeric goes through pobrax_tpu.
"""

from pobrax_tpu.physics.state import QP, Info, P  # noqa: F401
from pobrax_tpu.physics.system import System as _PSystem

from brax.physics.config_pb2 import Config  # noqa: F401
from brax import envs, jumpy, math, physics  # noqa: F401


class System(_PSystem):
    """pobrax_tpu System constructible from a legacy Config proto."""

    def __init__(self, config):
        if isinstance(config, Config):
            from tools.brax_shim.convert import proto_to_config
            config = proto_to_config(config)
        super().__init__(config)

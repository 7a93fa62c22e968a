"""The brax-v0 compatibility shim: reference LITERAL code on our engine.

Converts "quirk-faithful" from a claim into a test (VERDICT round 2, Next
round #1): tools/brax_shim lets /root/reference/po_brax's env modules import
and run unmodified — `brax.Config` is a real protobuf message, `brax.System`
is our engine, `brax.jumpy`/`brax.math` are our ops. These tests assert:

  1. scene parity — the scene the reference BUILDS (text_format.Parse of the
     synthesized ant proto + its own extend_ant_cfg mutations) converts to a
     Config equal to the one our env builds, at float32 precision;
  2. reset parity — the reference's reset (its RNG threading: rng3 reuse at
     ant_heavenhell.py:88-99, rejection sampling at ant_tag.py:90-105, grid
     choice at ant_gather.py:109-123) produces BIT-EXACT observations vs
     ours under the same seed.

Full 100-step trajectory parity is locked by the committed ref_*.npz
fixtures in tests/test_replay_fixtures.py (dumped from the reference's own
step/obs/reward code via tools/compare_reference.py dump --impl reference).
"""

import dataclasses

import jax
import numpy as np
import pytest

from tools.brax_shim import loader

ENVS = ["ant_tag", "ant_heavenhell", "ant_gather"]


def _ours(name):
    from pobrax_tpu.envs import ant_gather, ant_heavenhell, ant_tag

    return {
        "ant_tag": ant_tag.AntTagEnv,
        "ant_heavenhell": ant_heavenhell.AntHeavenHellEnv,
        "ant_gather": ant_gather.AntGatherEnv,
    }[name]()


def _f32_tree(x):
    """Dataclass -> nested dict with floats squeezed through float32 (proto
    float fields are 32-bit; f32(f64(x)) round-trips exactly)."""
    if dataclasses.is_dataclass(x):
        d = {f.name: _f32_tree(getattr(x, f.name)) for f in dataclasses.fields(x)}
        d["__type__"] = type(x).__name__
        return d
    if isinstance(x, tuple):
        return tuple(_f32_tree(v) for v in x)
    if isinstance(x, float):
        return float(np.float32(x))
    return x


@pytest.mark.parametrize("name", ENVS)
def test_reference_scene_equals_ours(name):
    ref = loader.make_reference_env(name)
    ours = _ours(name)
    assert _f32_tree(ref.sys.config) == _f32_tree(ours.sys.config)


@pytest.mark.parametrize("name", ENVS)
def test_reference_reset_bit_exact(name):
    ref = loader.make_reference_env(name)
    ours = _ours(name)
    key = jax.random.PRNGKey(3)
    ref_state = jax.jit(ref.reset)(key)
    our_state = jax.jit(ours.reset)(key)
    np.testing.assert_array_equal(np.asarray(ref_state.obs),
                                  np.asarray(our_state.obs))
    np.testing.assert_array_equal(np.asarray(ref_state.qp.pos),
                                  np.asarray(our_state.qp.pos))


def test_ant_textproto_roundtrip():
    """text -> parse -> convert reproduces ant_config() at f32."""
    from google.protobuf import text_format

    import brax
    from pobrax_tpu.physics.ant import ant_config
    from tools.brax_shim.convert import proto_to_config
    from tools.brax_shim.textproto import config_to_textproto

    cfg = ant_config()
    proto = text_format.Parse(config_to_textproto(cfg), brax.Config())
    assert _f32_tree(proto_to_config(proto)) == _f32_tree(cfg)

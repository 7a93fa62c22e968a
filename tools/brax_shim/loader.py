"""Load the reference's literal po_brax env code against the brax shim.

`install()` puts the shim `brax` package and the repo root on sys.path, then
registers *stub* parent packages for `po_brax` / `po_brax.envs` pointing at
/root/reference — so `po_brax.envs.ant_tag` et al. import WITHOUT executing
po_brax/envs/__init__.py (which imports 15 stock brax env modules and gym
that the shim deliberately does not provide —
/root/reference/po_brax/envs/__init__.py:6-26). The env modules themselves
(ant_tag/ant_heavenhell/ant_gather + utils + more_jp) run unmodified.

The reference tree is read-only public content: we execute its code to
cross-validate trajectories, nothing more.
"""

from __future__ import annotations

import importlib
import os
import sys
import types

_HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(_HERE))
REFERENCE = os.environ.get("POBRAX_REFERENCE", "/root/reference")

ENV_CLASSES = {
    "ant_tag": ("po_brax.envs.ant_tag", "AntTagEnv"),
    "ant_heavenhell": ("po_brax.envs.ant_heavenhell", "AntHeavenHellEnv"),
    "ant_gather": ("po_brax.envs.ant_gather", "AntGatherEnv"),
}


def install():
    """Idempotently wire up the shim + reference stub packages."""
    for p in (REPO, _HERE):
        if p not in sys.path:
            sys.path.insert(0, p)
    import brax  # resolves to the shim (no real brax exists in-container)
    if not getattr(brax, "__file__", "").startswith(_HERE):
        raise ImportError(
            f"'brax' resolved to {brax.__file__!r}, not the shim — a real "
            f"brax install would shadow it; refusing to mix engines")
    for name, path in (
        ("po_brax", os.path.join(REFERENCE, "po_brax")),
        ("po_brax.envs", os.path.join(REFERENCE, "po_brax", "envs")),
    ):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__path__ = [path]
            mod.__package__ = name
            sys.modules[name] = mod
    return brax


def load_reference_env_class(env_name: str):
    """Import the reference's env class (literal code) under the shim."""
    install()
    module, cls = ENV_CLASSES[env_name]
    return getattr(importlib.import_module(module), cls)


def make_reference_env(env_name: str, **kwargs):
    return load_reference_env_class(env_name)(**kwargs)

"""Checkpoint / resume for training state (orbax-backed, pytree-native).

The reference has no state serialization anywhere (SURVEY.md §5); this is
the framework's own. Everything that matters is a pure pytree
(TrainingState: params / opt_state / normalizer / env_steps), so
checkpointing is structural: save with orbax's async-capable
PyTreeCheckpointer, restore against a template built by the same learner
init. Multi-host: only process 0 writes (orbax handles coordination when
jax.distributed is initialized).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save(path: str, state: Any, force: bool = True) -> None:
    """Save a pytree (e.g. ppo.TrainingState) to `path` (a directory)."""
    path = os.path.abspath(path)
    _checkpointer().save(path, jax.device_get(state), force=force)


def restore(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree from `path`; with a `template` the result has the
    template's exact structure/dtypes (pass learner.init(key) output)."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    if template is None:
        return ckpt.restore(path)
    import orbax.checkpoint as ocp
    return ckpt.restore(path, item=jax.device_get(template))


def latest_step_dir(root: str) -> Optional[str]:
    """Return the lexicographically-latest step directory under root
    (convention: root/step_000001000, ...), or None."""
    if not os.path.isdir(root):
        return None
    steps = sorted(d for d in os.listdir(root) if d.startswith("step_"))
    return os.path.join(root, steps[-1]) if steps else None


def save_step(root: str, step: int, state: Any) -> str:
    path = os.path.join(root, f"step_{step:012d}")
    save(path, state)
    return path

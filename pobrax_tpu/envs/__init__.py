"""Env registry and factory.

Mirrors the reference factory surface (/root/reference/po_brax/envs/__init__.py):
`create(env_name, episode_length, action_repeat, auto_reset, batch_size,
eval_metrics, **kwargs)` assembling the wrapper stack in the same order
(:50-72), `create_fn` (:75-77), and `create_gym_env` (:98-121, gymnasium
here — classic gym is not in this environment). `HAI_ACTION_REPEAT = 6`
reproduces the 0.3 s control interval (:28).

The native API is the jitted pytree one — `create(...)` then
`jit(env.reset)` / `jit(env.step)`; the gym adapters exist for host
training-loop parity.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

from pobrax_tpu.envs import wrappers
from pobrax_tpu.envs.acrobot import Acrobot
from pobrax_tpu.envs.ant import Ant
from pobrax_tpu.envs.ant_gather import AntGatherEnv
from pobrax_tpu.envs.ant_heavenhell import AntHeavenHellEnv
from pobrax_tpu.envs.ant_maze import AntMazeEnv
from pobrax_tpu.envs.ant_tag import AntTagEnv
from pobrax_tpu.envs.base import Env, State, Wrapper
from pobrax_tpu.envs.fast import Fast
from pobrax_tpu.envs.fetch import Fetch
from pobrax_tpu.envs.grasp import Grasp
from pobrax_tpu.envs.humanoid import Humanoid, HumanoidStandup
from pobrax_tpu.envs.masked import MaskedObservationWrapper
from pobrax_tpu.envs.pendulum import InvertedDoublePendulum, InvertedPendulum
from pobrax_tpu.envs.planar import Halfcheetah, Hopper, Walker2d
from pobrax_tpu.envs.reacher import Reacher, ReacherAngle
from pobrax_tpu.envs.ur5e import Ur5e

HAI_ACTION_REPEAT = 6

# mirrors the reference registry (/root/reference/po_brax/envs/__init__.py:29-47)
_envs = {
    # backs the mask tables' 'acrobot' entry (no env exists in the reference)
    "acrobot": Acrobot,
    "ant": Ant,
    "ant_tag": AntTagEnv,
    "ant_heavenhell": AntHeavenHellEnv,
    "ant_gather": AntGatherEnv,
    # working AntMaze (the reference's is unconstructible — SURVEY.md §2.8)
    "ant_maze": AntMazeEnv,
    "fast": Fast,
    "fetch": Fetch,
    "grasp": Grasp,
    "halfcheetah": Halfcheetah,
    "hopper": Hopper,
    "humanoid": Humanoid,
    "humanoidstandup": HumanoidStandup,
    "inverted_pendulum": InvertedPendulum,
    "inverted_double_pendulum": InvertedDoublePendulum,
    "reacher": Reacher,
    "reacherangle": ReacherAngle,
    "ur5e": Ur5e,
    "walker2d": Walker2d,
}


def register(name: str, cls) -> None:
    _envs[name] = cls


def create(
    env_name: str,
    episode_length: Optional[int] = 1000,
    action_repeat: Optional[int] = 1,
    auto_reset: bool = True,
    batch_size: Optional[int] = None,
    eval_metrics: bool = False,
    randomized_autoreset: bool = False,
    autoreset_mode: str = "naive",
    **kwargs,
) -> Env:
    """Create an Env with the reference's wrapper stack order (:58-72).

    `randomized_autoreset=True` swaps the cached AutoResetWrapper for a
    fully on-device randomized variant — the configuration the reference's
    own benchmark favours (ant_heavenhell.py:194-205). `autoreset_mode`
    selects it: 'naive' (resample every step — reference parity, costs ~31%
    of the fused step) or 'cached' (RandomizedAutoResetWrapperCachedOnDevice
    — cached fresh states refreshed on device every 200 steps, near-zero
    cost; see docs/PERFORMANCE.md)."""
    if autoreset_mode not in ("naive", "cached"):
        raise ValueError(
            f"autoreset_mode must be 'naive' or 'cached', got {autoreset_mode!r}")
    if autoreset_mode != "naive" and not (auto_reset and randomized_autoreset):
        raise ValueError(
            "autoreset_mode='cached' requires auto_reset=True and "
            "randomized_autoreset=True — without them the mode is silently "
            "ignored and the run would NOT be in cached mode")
    # substeps=N opts into the integrator retune (fast preset; see
    # Env.retune_substeps — substeps=8 is the measured stability edge and
    # buys +18% TPU step throughput; default 10 = reference parity)
    substeps = kwargs.pop("substeps", None)
    env = _envs[env_name](**kwargs)
    if substeps is not None:
        env.retune_substeps(substeps)
    if action_repeat is not None:
        env = wrappers.ActionRepeatWrapper(env, action_repeat=action_repeat)
    if episode_length is not None:
        env = wrappers.EpisodeWrapper(env, episode_length, 1)
    if batch_size:
        env = wrappers.VmapWrapper(env, batch_size=batch_size)
    if auto_reset:
        if randomized_autoreset:
            env = wrappers.randomized_autoreset(env, autoreset_mode)
        else:
            env = wrappers.AutoResetWrapper(env)
    if eval_metrics:
        env = wrappers.EvalWrapper(env)
    return env


def create_fn(env_name: str, **kwargs) -> Callable[..., Env]:
    """Returns a function that when called, creates an Env (:75-77)."""
    return functools.partial(create, env_name, **kwargs)


def create_gym_env(
    env_name: str,
    batch_size: Optional[int] = None,
    seed: int = 0,
    backend: Optional[str] = None,
    **kwargs,
):
    """Create a gymnasium Env / VectorEnv with host-side autoreset
    (:98-121). Lazily imports the adapter so headless/pure-jit users never
    pay for gymnasium."""
    from pobrax_tpu.envs.gym_adapter import AutoresetGymWrapper, AutoresetVmapGymWrapper, EvalGymWrapper

    kwargs["auto_reset"] = False  # the gym side owns autoreset (:108)
    eval_metrics = kwargs.pop("eval_metrics", False)
    discount = kwargs.pop("discount", 1.0)
    environment = create(env_name=env_name, batch_size=batch_size, **kwargs)
    if batch_size is None:
        e = AutoresetGymWrapper(environment, seed=seed, backend=backend)
    else:
        if batch_size <= 0:
            raise ValueError(
                f"batch_size must be a positive int or None, got {batch_size!r}")
        e = AutoresetVmapGymWrapper(environment, batch_size, seed=seed, backend=backend)
    if eval_metrics:
        e = EvalGymWrapper(e, discount=discount)
    return e


__all__ = [
    "Ant",
    "AntGatherEnv",
    "AntHeavenHellEnv",
    "AntTagEnv",
    "Env",
    "State",
    "Wrapper",
    "MaskedObservationWrapper",
    "HAI_ACTION_REPEAT",
    "create",
    "create_fn",
    "create_gym_env",
    "register",
    "wrappers",
]

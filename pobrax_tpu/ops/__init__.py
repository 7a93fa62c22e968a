"""Numeric core ops: quaternion algebra, vector helpers, RNG discipline.

This layer replaces the reference's `brax.math` + `brax.jumpy` +
`po_brax/more_jp.py` (reference: /root/reference/po_brax/more_jp.py) with
jax.numpy-only, batch-friendly implementations (all ops act on the last axis
and broadcast over arbitrary leading batch dims — vmap-free batching where it
matters on TPU).
"""

from pobrax_tpu.ops.quaternion import (
    ang_to_quat,
    euler_to_quat,
    quat_inv,
    quat_mul,
    quat_rot_axis,
    quat_to_axis_angle,
    relative_quat,
    rotate,
    inv_rotate,
)
from pobrax_tpu.ops.vector import (
    cross,
    norm,
    normalize,
    safe_norm,
)

__all__ = [
    "ang_to_quat",
    "euler_to_quat",
    "quat_inv",
    "quat_mul",
    "quat_rot_axis",
    "quat_to_axis_angle",
    "relative_quat",
    "rotate",
    "inv_rotate",
    "cross",
    "norm",
    "normalize",
    "safe_norm",
]

"""brax.math compatibility surface (quaternion ops), backed by
pobrax_tpu.ops.quaternion — the same kernels our envs use, so reference code
(e.g. /root/reference/po_brax/envs/ant_gather.py:167) computes bit-identical
values."""

from pobrax_tpu.ops.quaternion import (  # noqa: F401
    ang_to_quat,
    euler_to_quat,
    inv_rotate,
    quat_inv,
    quat_mul,
    quat_rot_axis,
    rotate,
)

"""Pallas whole-step kernel: one TPU kernel per physics control step.

`fused.make_fused_step`'s `step_core` is shape-polymorphic: called with
state arrays carrying a TRAILING batch axis ((n,3,B)/(n,4,B)), every
per-env "scalar" becomes a contiguous (B,) vector — 8x128 VREG tiles at
block=1024. This module wraps that call in a single `pl.pallas_call`
gridded over batch blocks, so ALL `substeps` substeps — joint springs,
integrator, every contact row — execute inside ONE kernel with the whole
rigid-body state resident in VMEM: no intermediate HBM materialization
between XLA fusion islands and no kernel-launch gaps across the substep
chain.

Dispatch: `System.__init__` wraps the fused step in
`jax.custom_batching.custom_vmap` when `POBRAX_PALLAS=1`; under the env
stack's VmapWrapper the batch rule routes the WHOLE batch here, while
unbatched callers (single-env tests, fixture replays) keep the plain
fused path. On CPU the kernel runs in Pallas interpret mode, which is how
tests/test_pallas.py cross-validates it against `step_generic`.

(The reference outsources physics to external brax (SURVEY.md §2.9) and
has no comparable single-kernel step.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from pobrax_tpu.physics.state import Info, P, QP


def _choose_block(B: int, want: int) -> int:
    blk = min(want, B)
    while B % blk:
        blk //= 2
    return max(blk, 1)


def make_pallas_batched_step(sys, step_core, block: int = 1024,
                             interpret: bool = False):
    """Batched `(qp_B, act_B) -> (qp_B, Info_B)` running step_core inside
    one Pallas kernel per batch block. qp leaves are batch-LEADING
    ((B,n,3)...) at the boundary — the transposes to/from the kernel's
    trailing-batch layout are ~2x the state size per control step,
    negligible against the 10-substep HBM round-trips they remove."""
    n = sys.num_bodies
    A = max(sys.action_size, 1)

    def batched(qp_b: QP, act_b: jnp.ndarray) -> Tuple[QP, Info]:
        B = act_b.shape[0]
        blk = _choose_block(B, block)
        dtype = qp_b.pos.dtype

        # Mosaic (unlike interpret mode) forbids array constants captured
        # by the kernel closure — and step_core bakes the vectorized
        # contact phase's (K,)/(K,3) tables in as trace-time constants.
        # Trace it to a jaxpr at the block shape and pass jaxpr.consts as
        # explicit pallas_call operands, evaluating via eval_jaxpr inside
        # the kernel. (jax.closure_convert does NOT do this: it hoists
        # only differentiation-relevant captured tracers.)
        example = (jax.ShapeDtypeStruct((n, 3, blk), dtype),
                   jax.ShapeDtypeStruct((n, 4, blk), dtype),
                   jax.ShapeDtypeStruct((n, 3, blk), dtype),
                   jax.ShapeDtypeStruct((n, 3, blk), dtype),
                   jax.ShapeDtypeStruct((A, blk), dtype))
        closed, out_sd = jax.make_jaxpr(step_core, return_shape=True)(
            *example)
        out_tree = jax.tree.structure(out_sd)
        consts = [jnp.asarray(c) for c in closed.consts]

        def core_conv(*args_and_consts):
            args, cvals = args_and_consts[:5], args_and_consts[5:]
            out_flat = jax.core.eval_jaxpr(closed.jaxpr, cvals, *args)
            return jax.tree.unflatten(out_tree, out_flat)

        # TPU VMEM refs want >=1-d shapes; lift 0-d consts to (1,).
        const_shapes = [c.shape for c in consts]
        consts = [c.reshape(1) if c.ndim == 0 else c for c in consts]

        def kernel(pos_ref, rot_ref, vel_ref, ang_ref, act_ref, *refs):
            const_refs = refs[:len(consts)]
            out_refs = refs[len(consts):]
            cvals = [ref[...].reshape(shape) for ref, shape
                     in zip(const_refs, const_shapes)]
            (p, r, v, a), info = core_conv(
                pos_ref[...], rot_ref[...], vel_ref[...], ang_ref[...],
                act_ref[...], *cvals)
            outs = (p, r, v, a,
                    info.contact.vel, info.contact.ang,
                    info.joint.vel, info.joint.ang,
                    info.actuator.vel, info.actuator.ang)
            for ref, val in zip(out_refs, outs):
                ref[...] = val

        def t(x):  # (B, n, k) -> (n, k, B)
            return jnp.moveaxis(x, 0, -1)

        act_t = jnp.moveaxis(act_b, 0, -1)
        if act_t.shape[0] == 0:  # degenerate no-actuator system
            act_t = jnp.zeros((1, B), dtype)

        def spec(k):
            return pl.BlockSpec((n, k, blk), lambda i: (0, 0, i))

        def const_spec(c):
            return pl.BlockSpec(c.shape, lambda i, nd=c.ndim: (0,) * nd)

        in_specs = [spec(3), spec(4), spec(3), spec(3),
                    pl.BlockSpec((A, blk), lambda i: (0, i))]
        in_specs += [const_spec(c) for c in consts]
        out_ks = (3, 4, 3, 3, 3, 3, 3, 3, 3, 3)
        out_specs = tuple(spec(k) for k in out_ks)
        out_shape = tuple(jax.ShapeDtypeStruct((n, k, B), dtype)
                          for k in out_ks)

        outs = pl.pallas_call(
            kernel,
            grid=(B // blk,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(t(qp_b.pos), t(qp_b.rot), t(qp_b.vel), t(qp_b.ang), act_t,
          *consts)

        def ut(x):  # (n, k, B) -> (B, n, k)
            return jnp.moveaxis(x, -1, 0)

        p, r, v, a, cv, ca, jv, ja, av, aa = outs
        qp2 = QP(pos=ut(p), rot=ut(r), vel=ut(v), ang=ut(a))
        info = Info(contact=P(vel=ut(cv), ang=ut(ca)),
                    joint=P(vel=ut(jv), ang=ut(ja)),
                    actuator=P(vel=ut(av), ang=ut(aa)))
        return qp2, info

    return batched


def wrap_custom_vmap(sys, fused_step, block: int = 1024,
                     interpret: bool | None = None):
    """`step(qp, act)` that runs the plain fused path unbatched and the
    Pallas whole-step kernel when vmapped (the production VmapWrapper
    shape)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    batched = make_pallas_batched_step(sys, fused_step.core, block=block,
                                       interpret=interpret)

    @jax.custom_batching.custom_vmap
    def step(qp: QP, act: jnp.ndarray):
        return fused_step(qp, act)

    @step.def_vmap
    def _rule(axis_size, in_batched, qp, act):
        # broadcast any unbatched leaf to the mapped axis so the kernel
        # sees one uniform (B, ...) batch
        def bc(leaf, isb):
            return leaf if isb else jnp.broadcast_to(
                leaf, (axis_size,) + jnp.shape(leaf))

        qp = jax.tree.map(bc, qp, in_batched[0])
        act = bc(act, in_batched[1])
        out = batched(qp, act)
        return out, jax.tree.map(lambda _: True, out)

    return step

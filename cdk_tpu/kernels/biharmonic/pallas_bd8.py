"""VMEM-resident bd8 biharmonic: the n-application chain INSIDE one Pallas
kernel.

The grouped block-diagonal operator (operator.blockdiag_group_operator)
makes 8-element groups fully independent: group b's (128, ncol) tracer
block evolves under its own (128, 128) operator only.  So the reference's
`do n=1,nIters` loop (biharmonic_wk_kernel.F90:560-568 around the kernel
call) can run entirely on-chip: load a group's tracer block into VMEM once,
apply the operator n times on the MXU, write the result once.  HBM traffic
drops from (read+write qtens) per application — the binding cost of the
XLA bd8 scan, measured 349 GB/s effective / 1.554 ms at production — to
once per RUN, leaving pure MXU work.

This is the same move as mpdata's pallas_resident/masked kloop (in-kernel
time loop over VMEM-resident state), applied to the kernel whose state
DOES fit per-block: one group block is npts*g*ncol*4 = 368 KB at
production ncol=720, vs the full 249 MB qtens field that can never be a
VMEM-resident XLA scan carry.

Measured (v5e, production nelemd=5400 qsize=10 / shipped 16x72x40):
  fused_operator_bd8 (XLA scan)      1.556 ms   |  5.0 us   L2 8.2e-6
  bd8_resident  ("highest", bf16x6)  0.629 ms   |  6.6 us   L2 7.6e-8
  bd8_resident_x3 (manual bf16x3)    0.372 ms   |  4.1 us   L2 1.6e-6
x3 is 4.2x the XLA bd8 scan, 2.4x PAST the ~0.9 ms full-field HBM
streaming bound (only a resident form can beat it), at 128 TFLOPS
effective = 65% of bf16 MXU peak — and it also beats fused_operator
(4.3 us) at the shipped size.  Per step the MXU chain is
eg*(gn,gn)@(gn,ncol) = 15.9 GFLOP; DMA is once per run.
Precision: Mosaic supports only DEFAULT/HIGHEST dot precision ("high"
raises NotImplementedError), so the exact baseline runs "highest" and
the x3 form emulates "high" with a manual hi/lo bf16 split.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdk_tpu.core.platform import pallas_interpret
from cdk_tpu.core.registry import register
from cdk_tpu.kernels.biharmonic.operator import (
    blockdiag_group_operator,
    build_element_operator,
)
from cdk_tpu.kernels.biharmonic.problem import (
    BiharmonicData,
    from_lane_layout,
    to_lane_layout,
)


def _resident_kernel(l_ref, q_ref, out_ref, *, nsteps, precision):
    # ONE fori_loop carrying every group's state (a tuple), body unrolled
    # over the (small, static) group block: the per-group chains are
    # independent, so merging them into one loop body hands Mosaic
    # cross-group instruction-level parallelism — group b's VPU hi/lo
    # splits can overlap group b-1's MXU passes, where the earlier
    # one-fori_loop-per-group form serialized each group's
    # split->dot->split dependency chain end to end
    bg = q_ref.shape[0]
    if precision == "bf16x3":
        # manual 3-pass f32 emulation (the einsum variants' "high", which
        # Mosaic's dot doesn't expose): a@b ~= ah@bh + ah@bl + al@bh with
        # hi/lo bf16 splits; the operator split is hoisted out of the
        # time loop (L is step-invariant)
        f32 = q_ref.dtype
        ls = []
        for b in range(bg):
            L = l_ref[b]
            L_hi = L.astype(jnp.bfloat16)
            ls.append((L_hi, (L - L_hi.astype(f32)).astype(jnp.bfloat16)))

        def body(_, qs):
            splits = []
            for q in qs:
                q_hi = q.astype(jnp.bfloat16)
                splits.append(
                    (q_hi, (q - q_hi.astype(f32)).astype(jnp.bfloat16)))
            return tuple(
                jnp.dot(L_hi, q_hi, preferred_element_type=f32)
                + jnp.dot(L_hi, q_lo, preferred_element_type=f32)
                + jnp.dot(L_lo, q_hi, preferred_element_type=f32)
                for (L_hi, L_lo), (q_hi, q_lo) in zip(ls, splits)
            )
    else:

        def body(_, qs):
            return tuple(
                jnp.dot(l_ref[b], q, precision=precision,
                        preferred_element_type=q.dtype)
                for b, q in enumerate(qs)
            )

    # manual 4x unroll amortizes the scalar loop bookkeeping across steps
    # (Mosaic's fori_loop only supports unroll=1 or full unroll) — at the
    # shipped size the whole problem is one grid cell and the per-step
    # loop overhead is a measurable slice of the ~3 us step; nsteps is
    # static, so the remainder unrolls at trace time
    UNROLL = 4
    qs = tuple(q_ref[b] for b in range(bg))
    k, r = divmod(nsteps, UNROLL)

    def body_u(i, qs):
        for _ in range(UNROLL):
            qs = body(i, qs)
        return qs

    if k:
        qs = jax.lax.fori_loop(0, k, body_u, qs)
    for _ in range(r):
        qs = body(0, qs)
    for b in range(bg):
        out_ref[b] = qs[b]


@functools.partial(jax.jit, static_argnames=("nsteps", "precision",
                                             "interpret"))
def apply_bd8_resident(lbd, qg, nsteps: int, precision: str = "high",
                       interpret: bool = False):
    """qg: (eg, g*npts, ncol) grouped tracer blocks; lbd: (eg, gn, gn)
    grouped operator.  Runs nsteps chained applications in-kernel."""
    eg, gn, ncol = qg.shape
    # ~3 MB of tracer block per grid cell: enough that even the shipped
    # size (1.47 MB/group) gets bg >= 2 interleaved chains per cell — the
    # cross-group ILP that overlaps VPU splits with MXU passes needs at
    # least two independent chains in the loop body.  The live set
    # (~7x the block: in/out double-buffered + carry + hi/lo splits)
    # rides the raised scoped-VMEM limit below.
    bg = max(1, (3 * 2**20) // (gn * ncol * qg.dtype.itemsize))
    bg = min(bg, eg)
    while eg % bg:
        bg -= 1
    blk = lambda a: pl.BlockSpec((bg, *a.shape[1:]), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_resident_kernel, nsteps=nsteps,
                          precision=precision),
        out_shape=jax.ShapeDtypeStruct(qg.shape, qg.dtype),
        grid=(eg // bg,),
        in_specs=[blk(lbd), blk(qg)],
        out_specs=blk(qg),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2**20),
        interpret=interpret,
    )(lbd, qg)


def _bd8_resident_forms(cfg, precision: str):
    rr = cfg.np_dtype(cfg.rrearth)
    g = 8
    while cfg.nelemd % g:
        g -= 1
    npts, ncol = cfg.npts, cfg.ncol
    interpret = pallas_interpret()

    def _build(data):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        return blockdiag_group_operator(L, g)

    @jax.jit
    def prepare(data: BiharmonicData):
        return (_build(data),)

    def _run(lbd, qtens, n):
        eg = lbd.shape[0]
        qg = to_lane_layout(qtens).reshape(eg, g * npts, ncol)
        out = apply_bd8_resident(lbd, qg, n, precision=precision,
                                 interpret=interpret)
        return from_lane_layout(out.reshape(cfg.nelemd, npts, ncol), cfg)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        (lbd,) = aux
        return _run(lbd, data.qtens, 1)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        return _run(_build(data), data.qtens, n)

    return {"prepare": prepare, "step": step, "loop": loop}


@register(
    "biharmonic",
    "fused_operator_bd8_resident",
    "bd8 with the nIters chain in-kernel: each 8-element group's (128, "
    "ncol) tracer block stays VMEM-resident across all n applications "
    "(HBM traffic once per run, not per step) — beats the full-field "
    "streaming bound the XLA bd8 scan is pinned to",
)
def make_fused_operator_bd8_resident(cfg):
    return _bd8_resident_forms(cfg, "highest")


@register(
    "biharmonic",
    "fused_operator_bd8_resident_x3",
    "resident bd8 chain with manual 3-pass bf16 f32-emulation matmuls "
    "(the einsum variants' 'high' precision, which Mosaic's dot doesn't "
    "expose) — half the MXU passes of the 'highest' resident form",
    supports_f64=False,
)
def make_fused_operator_bd8_resident_x3(cfg):
    return _bd8_resident_forms(cfg, "bf16x3")

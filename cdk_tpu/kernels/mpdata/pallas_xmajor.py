"""x-major packed MPDATA: x on a FREE leading axis, 16 slices per
(8-sublane x 128-lane) vreg tile, time loop resident in the kernel.

The slice-major packed layout (pallas_packed / pallas_resident) puts x on
sublanes, so every x-offset stencil slice (`f[:, a:b]`, and the stage
chain takes dozens of them per step) forces a sublane-realignment
shuffle.  Production profiling showed ~160 vector-op-equivalents per
element against ~110 ops of actual stage math — the delta is relayout
traffic.

This layout removes it.  Arrays are stored (g, X, 8, 2*SEG) with

    orig[(g*8 + sub)*2 + c, x, z]  ->  xm[g, x, sub, c*SEG + z]

so a vreg tile holds 8 sublane-slices x 2 lane-segment-slices = 16
mutually independent CRM columns at one x:

  - x-direction stencil slices select vreg ROWS along the untiled axis 1
    — pure addressing, zero shuffles;
  - z-direction shifts stay lane rolls with the same per-segment clamp
    fixups as pallas_packed (advect_scalar2D…F90:477-642 k-clamping);
  - the sublane axis is never shifted at all.

The stage math is shared verbatim with pallas_resident (make_invariants /
advect_packed_hoisted are rank-agnostic); only pack/unpack and the
pallas_call plumbing differ.  Slice counts are padded up to a multiple of
16 with neutral fields (rho=rhow=adz=1, f=u=w=0 — the same pad hygiene
the lane segments already use), and the pad slices are dropped on unpack.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdk_tpu.core.platform import pallas_interpret
from cdk_tpu.core.registry import register
from cdk_tpu.kernels.mpdata.problem import MpdataData
from cdk_tpu.kernels.mpdata.pallas_packed import SEG, _packed_kspan
from cdk_tpu.kernels.mpdata.pallas_resident import (
    advect_packed_hoisted,
    make_invariants,
)

GRP = 16  # slices per vreg tile: 8 sublanes x 2 lane segments


def window_vmem_bytes(b, X, itemsize):
    """Geometry-sized scoped-VMEM request for the x-major in-kernel-loop
    kernels: ~16 live window arrays (f/u/w + carry + hoisted invariants
    + out) of (b, X, 8, 2*SEG), x2.5 for double-buffering + Mosaic's
    value stack.  The 16 MB floor keeps every production geometry at
    the default that measured best (a blanket 64 MB request cost ~60%
    on the dist kloop at production — round-5 A/B, the dss2d
    blanket-120MB finding writ large); wide-x windows that crash the
    compile helper at 16 MB (single-chip nx=256: X=262 needs 18.1M;
    dist nx=128/k=8: X=182 needs 16.9M) get exactly the unlock they
    need."""
    est = int(2.5 * 16 * b * X * 8 * 2 * SEG * itemsize)
    if est <= 24 * 2**20:
        # near-default estimates keep the 16 MB default: every geometry
        # that compiled there measured best there (shipped b=3 estimates
        # 18.6M but has always fit and timed well at the default)
        return 16 * 2**20
    return min(100 * 2**20, est)


def _pad_slices(a: jnp.ndarray, pad: float) -> jnp.ndarray:
    s = a.shape[0]
    r = (-s) % GRP
    if r == 0:
        return a
    return jnp.pad(a, ((0, r),) + ((0, 0),) * (a.ndim - 1),
                   constant_values=pad)


def pack3x(a: jnp.ndarray, pad: float = 0.0) -> jnp.ndarray:
    """(S, X, Z) -> (ceil(S/16), X, 8, 2*SEG)."""
    a = _pad_slices(a, pad)
    s, x, z = a.shape
    assert z <= SEG
    ap = jnp.pad(a, ((0, 0), (0, 0), (0, SEG - z)), constant_values=pad)
    b = ap.reshape(s // GRP, 8, 2, x, SEG)
    return b.transpose(0, 3, 1, 2, 4).reshape(s // GRP, x, 8, 2 * SEG)


def pack2x(a: jnp.ndarray, pad: float = 0.0) -> jnp.ndarray:
    """(S, Z) -> (ceil(S/16), 8, 2*SEG)."""
    a = _pad_slices(a, pad)
    s, z = a.shape
    assert z <= SEG
    ap = jnp.pad(a, ((0, 0), (0, SEG - z)), constant_values=pad)
    return ap.reshape(s // GRP, 8, 2, SEG).reshape(s // GRP, 8, 2 * SEG)


def unpack3x(xm: jnp.ndarray, s: int, z: int) -> jnp.ndarray:
    g, x, _, _ = xm.shape
    b = xm.reshape(g, x, 8, 2, SEG).transpose(0, 2, 3, 1, 4)
    return b.reshape(g * GRP, x, SEG)[:s, :, :z]


def unpack2x(xm: jnp.ndarray, s: int, z: int) -> jnp.ndarray:
    g = xm.shape[0]
    return xm.reshape(g * GRP, SEG)[:s, :z]


def pack_data_x(data: MpdataData):
    f_p = pack3x(data.f)
    u_p = pack3x(data.u)
    w_p = pack3x(data.w)
    rho_p = pack2x(data.rho, pad=1.0)
    rhow_p = pack2x(data.rhow, pad=1.0)
    adz_p = pack2x(data.adz, pad=1.0)
    flux_p = pack2x(data.flux)
    return f_p, flux_p, (u_p, w_p, rho_p, rhow_p, adz_p)


def _kernel(kspan_ref, f_ref, u_ref, w_ref, rho_ref, rhow_ref, adz_ref,
            flux_ref, fout_ref, fluxout_ref, *, nzm, nsteps):
    nx = f_ref.shape[1] - 6
    inv = make_invariants(u_ref[...], w_ref[...], rho_ref[...],
                          rhow_ref[...], adz_ref[...], kspan_ref[...],
                          nzm, nx)

    def body(_, carry):
        f_c, flux_c = carry
        return advect_packed_hoisted(f_c, flux_c, inv, nx, nzm)

    f_o, flux_o = jax.lax.fori_loop(
        0, nsteps, body, (f_ref[...], flux_ref[...])
    )
    fout_ref[...] = f_o
    fluxout_ref[...] = flux_o


@functools.partial(
    jax.jit, static_argnames=("nzm", "nsteps", "block", "interpret")
)
def _run_xmajor(f, u, w, rho, rhow, adz, flux, kspan, nzm, nsteps, block,
                interpret):
    g = f.shape[0]
    b = min(block, g)
    assert g % b == 0
    blk4 = lambda a: pl.BlockSpec((b, a.shape[1], 8, 2 * SEG),
                                  lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    blk3 = pl.BlockSpec((b, 8, 2 * SEG), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, nzm=nzm, nsteps=nsteps),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, f.dtype),
            jax.ShapeDtypeStruct(flux.shape, flux.dtype),
        ),
        grid=(g // b,),
        in_specs=[
            pl.BlockSpec((1, 2 * SEG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            blk4(f), blk4(u), blk4(w), blk3, blk3, blk3, blk3,
        ],
        out_specs=(blk4(f), blk3),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=window_vmem_bytes(b, f.shape[1],
                                               f.dtype.itemsize)),
        interpret=interpret,
    )(kspan, f, u, w, rho, rhow, adz, flux)


def pick_block_x(g: int) -> int:
    # Measured (production g=512): block=1 601 us/step vs block=2 654 —
    # the pipeline wants small blocks when there are many. Tiny grids
    # (shipped g=3) invert: one whole-problem invocation avoids per-grid-
    # step overhead (5.64 vs 28.7 us/step).
    return g if g <= 8 else 1


@register(
    "mpdata",
    "pallas_xmajor",
    "x-major resident kernel: x on a free leading axis (stencil slices "
    "cost zero shuffles), 16 slices per 8x128 vreg tile, hoisted "
    "invariants, n-step time loop inside the kernel.  Production "
    "601-613 us/step = 94-106% of the dual-issue VPU roofline "
    "(committed floor model: scripts/mpdata_roofline.py, "
    "round4-summary.txt §1c)",
)
def make_pallas_xmajor(cfg):
    interpret = pallas_interpret()
    nzm, nz = cfg.nzm, cfg.nz
    if nz > SEG:
        from cdk_tpu.core.registry import UnsupportedConfigError

        raise UnsupportedConfigError(f"pallas_xmajor needs nz <= {SEG} (got {nz})")
    nsl = cfg.nslices

    def prepare(data: MpdataData):
        kspan = _packed_kspan(nzm, data.f.dtype)
        _, _, aux = pack_data_x(data)
        return aux + (kspan,)

    def _run(aux, f_p, flux_p, n):
        u_p, w_p, rho_p, rhow_p, adz_p, kspan = aux
        b = pick_block_x(f_p.shape[0])
        f_o, flux_o = _run_xmajor(f_p, u_p, w_p, rho_p, rhow_p, adz_p,
                                  flux_p, kspan, nzm, n, b, interpret)
        return unpack3x(f_o, nsl, nzm), unpack2x(flux_o, nsl, nz)

    def step2(aux, data: MpdataData):
        f_p, flux_p, _ = pack_data_x(data)
        return _run(aux, f_p, flux_p, 1)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: MpdataData, n: int):
        """n steps entirely inside the kernel (timed path)."""
        kspan = _packed_kspan(nzm, data.f.dtype)
        f_p, flux_p, aux = pack_data_x(data)
        return _run(aux + (kspan,), f_p, flux_p, n)

    return {"step": step2, "prepare": prepare, "loop": loop}

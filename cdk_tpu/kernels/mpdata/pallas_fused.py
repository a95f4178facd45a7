"""Fully-fused Pallas MPDATA kernel: all 7 algorithm stages in one
VMEM-resident kernel.

This is the hand-tiled TPU analog of the reference's OpenACC variants
(advect_scalar2D…F90:72-474): where openacc_1 launches one device kernel per
stage (each round-tripping f/uuu/www through GPU DRAM) and openacc_2 fuses
stages into 7 regions, this kernel fuses ALL stages — every intermediate
(mx, mn, uuu, www) lives its whole life in VMEM registers/tiles and HBM
traffic is exactly the inputs once in, outputs once out.  Fusing across the
stage-3→4→5 sequential dependence is safe here (unlike the reference's buggy
openacc_2, see SURVEY §4) because each grid program owns entire (x, z)
planes for a block of slices — there is no inter-program halo.

Layout: (nslices, x, z) with x on sublanes and the contiguous z column on
lanes — the TPU analog of the reference's "pushncols" batched-slice layout
(advect…F90:30-46).  Grid over slice blocks; per-program working set at
f64, block=8: ≈ 8 slices × ~12 arrays × 40×64 × 8 B ≈ 2 MB — VMEM resident.

The staged math itself is `reference.advect_scalar2d`, called inside the
kernel on the full-precision block values: one shared implementation keeps
the Pallas variant semantically identical to the trusted reference by
construction (kspan is passed in because 1-D iota cannot be built on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdk_tpu.core.platform import pallas_interpret
from cdk_tpu.core.registry import register
from cdk_tpu.kernels.mpdata.problem import MpdataData
from cdk_tpu.kernels.mpdata.reference import advect_scalar2d


def _kernel(kspan_ref, f_ref, u_ref, w_ref, rho_ref, rhow_ref, adz_ref,
            flux_ref, fout_ref, fluxout_ref):
    f_out, flux_out = advect_scalar2d(
        f_ref[...],
        u_ref[...],
        w_ref[...],
        rho_ref[...],
        rhow_ref[...],
        adz_ref[...],
        flux_ref[...],
        kspan=kspan_ref[...],
    )
    fout_ref[...] = f_out
    fluxout_ref[...] = flux_out


def _block2(shape, b):
    """BlockSpec for a (S, Z) array blocked to (b, Z) along slices."""
    return pl.BlockSpec((b, shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _block3(shape, b):
    return pl.BlockSpec((b, shape[1], shape[2]), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def auto_block(nslices: int, nx: int, nzm: int, itemsize: int) -> int:
    """Slice block: 16 when it divides nslices (v5e sweep at the shipped
    size: block 16 → 10.1 µs/step vs 13.0 at 8 and 12.7 at 24/48 — a
    multi-step grid lets Mosaic pipeline block DMA against compute, which
    a single whole-batch program cannot), else 8, else the whole batch
    (Mosaic 2-D blocks must be 8-divisible on the sublane dim or
    whole-array). Clamped so the working set stays within ~60% of VMEM."""
    per_slice = 12 * (nx + 6) * (-(-nzm // 128) * 128) * itemsize
    cap = max(1, int(16 * 2**20 * 0.6) // per_slice)
    for b in (16, 8):
        if nslices % b == 0 and b <= cap:
            return b
    return min(nslices, cap) if nslices <= 8 else nslices


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _run(f, u, w, rho, rhow, adz, flux, block, interpret):
    s, _, nzm = f.shape
    b = min(block, s)
    assert s % b == 0, f"nslices={s} not divisible by slice block={b}"
    kspan_np = np.minimum(nzm - 1, np.arange(nzm) + 1) - np.maximum(
        0, np.arange(nzm) - 1
    )
    kspan = jnp.asarray(kspan_np, f.dtype)[None, :]
    return pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, f.dtype),
            jax.ShapeDtypeStruct(flux.shape, flux.dtype),
        ),
        grid=(s // b,),
        in_specs=[
            pl.BlockSpec((1, nzm), lambda i: (0, 0), memory_space=pltpu.VMEM),
            _block3(f.shape, b),
            _block3(u.shape, b),
            _block3(w.shape, b),
            _block2(rho.shape, b),
            _block2(rhow.shape, b),
            _block2(adz.shape, b),
            _block2(flux.shape, b),
        ],
        out_specs=(
            _block3(f.shape, b),
            _block2(flux.shape, b),
        ),
        interpret=interpret,
    )(kspan, f, u, w, rho, rhow, adz, flux)


def advect_scalar2d_pallas(data: MpdataData, block: int | None = None):
    """One fused-Pallas MPDATA step; returns (f, flux)."""
    s, fx, nzm = data.f.shape
    if block is None:
        block = auto_block(s, fx - 6, nzm, data.f.dtype.itemsize)
    return _run(
        data.f, data.u, data.w, data.rho, data.rhow, data.adz, data.flux,
        block, pallas_interpret(),
    )


@register(
    "mpdata",
    "pallas_fused",
    "single fused Pallas kernel: all 7 MPDATA stages VMEM-resident per "
    "slice block; hand-tiled analog of the reference openacc variants "
    "(advect_scalar2D…F90:72-474) without openacc_2's fusion bug",
)
def make_pallas_fused(cfg):
    interpret = pallas_interpret()
    block = auto_block(cfg.nslices, cfg.nx, cfg.nzm,
                       4 if cfg.dtype != "float64" else 8)

    @jax.jit
    def step(data: MpdataData):
        return _run(
            data.f, data.u, data.w, data.rho, data.rhow, data.adz, data.flux,
            block, interpret,
        )

    return step

"""Lanes-on-slices Pallas MPDATA kernel: layout (x, z, slice).

The default fused kernel (pallas_fused) keeps the reference-shaped
(slice, x, z) layout: z on lanes. nzm=57 fills 57/128 lanes and x=38 rides
sublanes — every VPU op runs ~40% occupied. This variant instead puts the
SLICE batch on lanes (it is the one axis no stencil ever crosses — the
deepest version of the reference's "pushncols" batching trick,
advect…F90:30-46):

    (x, z, s): x leading (stencil shifts become block-offset reads),
               z on sublanes (57→64, 89% occupied),
               slices on lanes in blocks of 128 (100% occupied).

The staged math is STILL reference.advect_scalar2d — applied per-slice via
`jax.vmap` over the trailing slice axis, so the batching rules retarget
every op to the (x, z, s) layout with zero semantic divergence from the
trusted core.

STATUS: design study, `experimental=True`. Mosaic requires the lane block
to be a full 128, and at (38, 64, 128) f32 the fully-fused staged core
carries ~25 live intermediates ≈ 30 MB — past VMEM, and the remote Mosaic
compile aborts. Making this layout work needs either a 2-3 way split of the
stage chain (re-introducing HBM round-trips) or z-blocking with vertical
halos; both trade away the single-kernel fusion that motivates the variant.
The kernel is correct (validated in interpreter mode / CPU tests) and kept
as the record of that design point.

RESOLUTION (round 2): the lane-occupancy follow-up shipped as
`pallas_packed` (pallas_packed.py) — instead of slices-on-lanes (which
needs 128 slices resident and overflows VMEM when fused), it packs TWO
slices' z-columns per 128-lane register (89% fill) while keeping the
proven (slice, x, z) architecture; no stage split, no vertical halos.
This study stays experimental; `pallas_packed` is the production form."""

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


def _single(f, u, w, rho, rhow, adz, flux, kspan):
    """One slice, (x, z) arrays — the trusted core at S=1."""
    f_out, flux_out = advect_scalar2d(
        f[None], u[None], w[None], rho[None], rhow[None], adz[None],
        flux[None], kspan=kspan,
    )
    return f_out[0], flux_out[0]


def _kernel(kspan_ref, f_ref, u_ref, w_ref, rho_ref, rhow_ref, adz_ref,
            flux_ref, fout_ref, fluxout_ref, *, nzm):
    """Blocks carry the z axis padded to a sublane multiple (Mosaic block
    shapes must have their last-two dims divisible by (8, 128)); the valid
    z extent is sliced out here and the core runs on exact sizes."""
    nz = nzm + 1
    kspan = kspan_ref[:1, :nzm]
    run = jax.vmap(
        functools.partial(_single, kspan=kspan),
        in_axes=-1, out_axes=-1,
    )
    f_out, flux_out = run(
        f_ref[:, :nzm], u_ref[:, :nzm], w_ref[:, :nz], rho_ref[:nzm],
        rhow_ref[:nz], adz_ref[:nzm], flux_ref[:nz],
    )
    fout_ref[:, :nzm] = f_out
    fluxout_ref[:nz] = flux_out


@functools.partial(jax.jit, static_argnames=("block", "interpret", "nzm"))
def _run_zs(f, u, w, rho, rhow, adz, flux, block, interpret, nzm):
    """Inputs in (x, zp, s) / (zp, s) layout with z PADDED to a multiple of
    8 (true extents: f/u/rho/adz nzm, w/rhow/flux nz); s divisible by
    block."""
    s = f.shape[-1]
    assert s % block == 0
    kspan_np = np.ones((8, -(-nzm // 64) * 64))
    kspan_np[0, :nzm] = np.minimum(nzm - 1, np.arange(nzm) + 1) - np.maximum(
        0, np.arange(nzm) - 1
    )
    kspan = jnp.asarray(kspan_np, f.dtype)  # (8, 64k) tile-aligned
    b3 = lambda a: pl.BlockSpec((a.shape[0], a.shape[1], block),
                                lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    b2 = lambda a: pl.BlockSpec((a.shape[0], block), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, nzm=nzm),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, f.dtype),
            jax.ShapeDtypeStruct(flux.shape, flux.dtype),
        ),
        grid=(s // block,),
        in_specs=[
            pl.BlockSpec(kspan.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            b3(f), b3(u), b3(w), b2(rho), b2(rhow), b2(adz), b2(flux),
        ],
        out_specs=(b3(f), b2(flux)),
        interpret=interpret,
    )(kspan, f, u, w, rho, rhow, adz, flux)


def _to_zs(a, zp=None, one_pad=False):
    """(s, ..., z) -> (..., zp, s): move the slice axis last, padding z to
    `zp` (ones for divided-by profiles, zeros otherwise)."""
    if zp is not None and zp != a.shape[-1]:
        pad = [(0, 0)] * a.ndim
        pad[-1] = (0, zp - a.shape[-1])
        a = jnp.pad(a, pad, constant_values=1.0 if one_pad else 0.0)
    return jnp.moveaxis(a, 0, -1)


def _lane_block(nslices: int, nx: int, nzm: int, itemsize: int) -> int:
    """Slice-lane block: Mosaic requires the lane (last) block dim to be a
    multiple of 128, so the block is always 128 and the slice batch is
    padded up to a multiple of it (_step/_loop pad; sub-128 batches waste
    lanes — this variant targets production slice counts)."""
    return 128


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _step(f, u, w, rho, rhow, adz, flux, block, interpret):
    s = f.shape[0]
    pad = (-s) % block
    if pad:
        # pad the slice batch; rho/rhow/adz pad with ones (divided by)
        zpad3 = lambda a: jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
        opad2 = lambda a: jnp.pad(a, ((0, pad), (0, 0)),
                                  constant_values=1.0)
        f, u, w = zpad3(f), zpad3(u), zpad3(w)
        rho, rhow, adz = opad2(rho), opad2(rhow), opad2(adz)
        flux = jnp.pad(flux, ((0, pad), (0, 0)))
    nzm = f.shape[-1]
    zp = -(-(nzm + 1) // 8) * 8
    f_out, flux_out = _run_zs(
        _to_zs(f, zp), _to_zs(u, zp), _to_zs(w, zp), _to_zs(rho, zp, True),
        _to_zs(rhow, zp, True), _to_zs(adz, zp, True), _to_zs(flux, zp),
        block, interpret, nzm,
    )
    f_out = jnp.moveaxis(f_out, -1, 0)[:s, :, :nzm]
    flux_out = jnp.moveaxis(flux_out, -1, 0)[:s, :nzm + 1]
    return f_out, flux_out


@register(
    "mpdata",
    "pallas_lanes",
    "fused Pallas kernel with the slice batch on VPU lanes ((x, z, s) "
    "layout, 128-slice blocks): full lane occupancy for large batched-CRM "
    "slice counts; same staged core via vmap over the trailing axis "
    "(design study: exceeds VMEM on TPU, see module docstring)",
    experimental=True,
)
def make_pallas_lanes(cfg):
    interpret = pallas_interpret()
    block = _lane_block(cfg.nslices, cfg.nx, cfg.nzm,
                        4 if cfg.dtype != "float64" else 8)

    @jax.jit
    def step(data: MpdataData):
        return _step(
            data.f, data.u, data.w, data.rho, data.rhow, data.adz,
            data.flux, block, interpret,
        )

    def loop(data: MpdataData, n: int):
        return _loop(
            data.f, data.u, data.w, data.rho, data.rhow, data.adz,
            data.flux, block, interpret, n,
        )

    return {"step": step, "loop": loop}


@functools.partial(jax.jit, static_argnames=("block", "interpret", "n"))
def _loop(f, u, w, rho, rhow, adz, flux, block, interpret, n):
    """n steps with state resident in the (x, z, s) layout."""
    from jax import lax

    s = f.shape[0]
    pad = (-s) % block
    if pad:
        zpad3 = lambda a: jnp.pad(a, ((0, pad), (0, 0), (0, 0)))
        opad2 = lambda a: jnp.pad(a, ((0, pad), (0, 0)), constant_values=1.0)
        f, u, w = zpad3(f), zpad3(u), zpad3(w)
        rho, rhow, adz = opad2(rho), opad2(rhow), opad2(adz)
        flux = jnp.pad(flux, ((0, pad), (0, 0)))
    nzm = f.shape[-1]
    zp = -(-(nzm + 1) // 8) * 8
    uz, wz = _to_zs(u, zp), _to_zs(w, zp)
    rhoz, rhowz, adzz = (_to_zs(rho, zp, True), _to_zs(rhow, zp, True),
                         _to_zs(adz, zp, True))

    def body(carry, _):
        fz, fluxz = carry
        return _run_zs(fz, uz, wz, rhoz, rhowz, adzz, fluxz, block,
                       interpret, nzm), None

    (fz, fluxz), _ = lax.scan(body, (_to_zs(f, zp), _to_zs(flux, zp)), None,
                              length=n)
    return (jnp.moveaxis(fz, -1, 0)[:s, :, :nzm],
            jnp.moveaxis(fluxz, -1, 0)[:s, :nzm + 1])

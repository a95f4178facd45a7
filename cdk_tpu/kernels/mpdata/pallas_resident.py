"""VMEM-resident multi-step packed MPDATA: the time loop runs INSIDE the
Pallas kernel.

Round-2 decomposition (scripts/mpdata_dma_decomposition.py, production
8,192 slices): the per-step packed pipeline costs 470 us of DMA + 670 us
of VPU stage math, and the two do NOT overlap (full step = 1140 us = the
exact sum).  Every scan step re-streams the step-invariant u/w/rho/rhow/
adz fields from HBM.

But MPDATA slices are mutually independent (each is a closed 2-D x-z
problem — advect_scalar2D…F90:477-642 loops over independent crm columns),
so the grid's slice blocks never exchange data ACROSS time steps either.
This kernel exploits that: the grid stays (s2/block,), and each block runs
the FULL n-step time loop (`lax.fori_loop`) on VMEM-resident values —
u/w/aux are DMA'd once per run instead of once per step, and f/flux make
one HBM round trip total.  Per-step DMA cost drops from 470 us to
~470/n us; the step cost approaches the pure-compute floor.

Math is byte-identical to `pallas_packed` (same `advect_scalar2d_packed`
body, same packed layout, same clamp fixups); only the loop placement
moves.  The reference's own timed region is the device-resident
`do n = 1, nIters` loop (mpdata/driver…F90 pattern, nested.F90:191-199),
so timing the in-kernel loop is the same contract.
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
from cdk_tpu.kernels.mpdata.pallas_packed import (
    SEG,
    _packed_kspan,
    advect_scalar2d_packed,
    pack_data,
    pick_block,
    unpack2,
    unpack3,
)


def _kernel(kspan_ref, f_ref, u_ref, w_ref, rho_ref, rhow_ref, adz_ref,
            flux_ref, fout_ref, fluxout_ref, *, nzm, nsteps):
    u = u_ref[...]
    w = w_ref[...]
    rho = rho_ref[...]
    rhow = rhow_ref[...]
    adz = adz_ref[...]
    kspan = kspan_ref[...]

    def body(_, carry):
        f_c, flux_c = carry
        return advect_scalar2d_packed(
            f_c, u, w, rho, rhow, adz, flux_c, kspan, nzm
        )

    f_o, flux_o = jax.lax.fori_loop(
        0, nsteps, body, (f_ref[...], flux_ref[...])
    )
    fout_ref[...] = f_o
    fluxout_ref[...] = flux_o


# ----------------------------------------------- hoisted-invariant step
def make_invariants(u, w, rho, rhow, adz, kspan, nzm, nx):
    """Everything in the MPDATA step that depends only on the velocity /
    density / grid fields (all step-invariant — the reference reuses u, w,
    rho, rhow, adz unchanged across its nIters loop).  Computed once per
    resident-kernel invocation, amortized over the whole time loop.

    The big wins are stage 2's upwind splits (_pp/_pn of u and w) and
    stage 4, where the *entire* antidiffusive coefficient structure is
    f-independent: _andiff's (|a| - a*a*b)/2 factor and _across's
    0.03125 * a1 * a2 (folded with dd / irho / irhow) collapse to one
    multiply per step each.  Factorization note: combining the four
    stage-4 z-shift terms via shift-linearity (kc(x)+kc(y) == kc(x+y)
    exactly) reassociates a couple of additions — a ~1 ulp/step
    perturbation vs the reference ordering (measured ~1e-15 rel at f64,
    ~1e-7 at f32), far inside every verification gate."""
    from cdk_tpu.kernels.mpdata.pallas_packed import _kbp, _kcp

    # rank-agnostic: u is (block, X, 2*SEG) in the slice-major layout or
    # (block, X, 8, 2*SEG) in the x-major layout (pallas_xmajor); the 2-D
    # fields (rho, ...) carry one fewer X axis and are expanded at X.
    nd = u.ndim
    lane = jax.lax.broadcasted_iota(jnp.int32, (1,) * (nd - 1) + (2 * SEG,),
                                    nd - 1)
    bx = lambda a: jnp.expand_dims(a, 1)  # 2-D field -> broadcast over X
    zk = lane % SEG
    m_z0 = zk == 0
    m_kc = zk == nzm - 1
    valid = zk < nzm
    valid_f = valid.astype(u.dtype)
    kb = lambda a: _kbp(a, m_z0)
    kc = lambda a: _kcp(a, m_kc)

    irho = bx(1.0 / rho)
    iadz = bx(1.0 / adz)
    dd = 2.0 / kspan[None] / bx(adz)
    irhow = bx(1.0 / (rhow * adz))
    rho_b = bx(rho)

    up = jnp.maximum(0.0, u)
    un = -jnp.minimum(0.0, u)
    wp = jnp.maximum(0.0, w)
    wn = -jnp.minimum(0.0, w)

    # stage 4a (x-direction pseudo-velocity): coefA*(f_i - f_ib)
    #   - acrossA*(kc(f_ib+f_i) - kb(f_ib+f_i))
    a_u = u[:, 1:nx + 4]
    a_wib = w[:, 0:nx + 3]
    a_wi = w[:, 1:nx + 4]
    coefA = (jnp.abs(a_u) - a_u * a_u * irho) * 0.5
    wsumA = a_wib + kc(a_wib) + a_wi + kc(a_wi)
    acrossA = ((0.03125 * a_u) * wsumA) * dd * irho

    # stage 4b (z-direction): coefB*(f_i - kb(f_i))
    #   - acrossB*(kb(dfc) + dfc),  dfc = f_ic - f_ib
    b_w = w[:, 1:nx + 3]
    b_u = u[:, 1:nx + 3]
    b_uic = u[:, 2:nx + 4]
    coefB = (jnp.abs(b_w) - b_w * b_w * irhow) * 0.5
    usumB = kb(b_u) + b_u + b_uic + kb(b_uic)
    acrossB = ((0.03125 * b_w) * usumB) * irho

    return dict(
        m_z0=m_z0, m_kc=m_kc, valid=valid, valid_f=valid_f,
        m_wzero=m_z0 | ~valid,
        irho=irho, iadz=iadz, rho_b=rho_b,
        up=up, un=un, wp=wp, wn=wn,
        coefA=coefA, acrossA=acrossA, coefB=coefB, acrossB=acrossB,
    )


def advect_packed_hoisted(f, flux_in, inv, nx, nzm):
    """One packed MPDATA step with all step-invariant math pre-folded
    (see make_invariants).  Stage structure mirrors
    pallas_packed.advect_scalar2d_packed / the reference's
    advect_scalar2D…F90:477-642 exactly; only invariant factors moved."""
    from cdk_tpu.kernels.mpdata.pallas_packed import _kbp, _kcp, _shl
    from cdk_tpu.kernels.mpdata.reference import EPS, _min3, _pn, _pp

    one = jnp.asarray(1.0, f.dtype)
    m_z0, m_kc = inv["m_z0"], inv["m_kc"]
    valid, valid_f = inv["valid"], inv["valid_f"]
    irho, iadz, rho_b = inv["irho"], inv["iadz"], inv["rho_b"]
    kb = lambda a: _kbp(a, m_z0)
    kc = lambda a: _kcp(a, m_kc)

    # -- stage 1: FCT extrema
    f_c = f[:, 2:nx + 4]
    f_ib = f[:, 1:nx + 3]
    f_ic = f[:, 3:nx + 5]
    mx = jnp.maximum(
        jnp.maximum(jnp.maximum(f_ib, f_ic), jnp.maximum(kb(f_c), kc(f_c))),
        f_c,
    )
    mn = jnp.minimum(
        jnp.minimum(jnp.minimum(f_ib, f_ic), jnp.minimum(kb(f_c), kc(f_c))),
        f_c,
    )

    # -- stage 2: first-order upwind fluxes (upwind splits hoisted)
    uuu = inv["up"] * f[:, 0:nx + 5] - inv["un"] * f[:, 1:nx + 6]
    f_w = f[:, 1:nx + 5]
    www = (inv["wp"] * kb(f_w) - inv["wn"] * f_w) * valid_f
    flux = jnp.sum(www[:, 2:nx + 2], axis=1)

    # -- stage 3: upwind update
    upd = (
        uuu[:, 1:nx + 5] - uuu[:, 0:nx + 4] + (_shl(www) - www) * iadz
    ) * irho
    f1 = jnp.concatenate(
        [f[:, :1], f[:, 1:nx + 5] - upd, f[:, nx + 5:]], axis=1
    )

    # -- stage 4: antidiffusive pseudo-velocities (coefficients hoisted).
    # uuu2/www2/uuu3/www3 live in BODY coordinates from here on: their
    # full-array concat edges (uuu[:, :1] etc.) are never read by stages
    # 5-6, so the per-step edge concats of the packed kernel are dropped.
    # U2[:, j-1] == uuu2[:, j] (j in 1..nx+3); W2[:, j-1] == www2[:, j]
    # (j in 1..nx+2).
    a_fib = f1[:, 1:nx + 4]
    a_fi = f1[:, 2:nx + 5]
    tmpA = a_fib + a_fi
    U2 = inv["coefA"] * (a_fi - a_fib) - inv["acrossA"] * (
        kc(tmpA) - kb(tmpA)
    )
    b_fi = f1[:, 2:nx + 4]
    dfc = f1[:, 3:nx + 5] - f1[:, 1:nx + 3]
    W2 = inv["coefB"] * (b_fi - kb(b_fi)) - inv["acrossB"] * (
        kb(dfc) + dfc
    )
    # bottom BC www(:,:,1)=0 + keep pad lanes at 0
    W2 = jnp.where(inv["m_wzero"], jnp.asarray(0.0, f.dtype), W2)

    # -- stage 5a: second extrema
    f1_c = f1[:, 2:nx + 4]
    f1_ib = f1[:, 1:nx + 3]
    f1_ic = f1[:, 3:nx + 5]
    mx = jnp.maximum(
        jnp.maximum(jnp.maximum(f1_ib, f1_ic),
                    jnp.maximum(kb(f1_c), kc(f1_c))),
        jnp.maximum(f1_c, mx),
    )
    mn = jnp.minimum(
        jnp.minimum(jnp.minimum(f1_ib, f1_ic),
                    jnp.minimum(kb(f1_c), kc(f1_c))),
        jnp.minimum(f1_c, mn),
    )

    # -- stage 5b: in/out flux ratios (U2/W2 body coords: full j-1)
    r_ui = U2[:, 0:nx + 2]
    r_uic = U2[:, 1:nx + 3]
    r_wi = W2[:, 0:nx + 2]
    r_wkc = kc(r_wi)
    mxr = rho_b * (mx - f1_c) / (
        _pn(r_uic) + _pp(r_ui) + iadz * (_pn(r_wkc) + _pp(r_wi)) + EPS
    )
    mnr = rho_b * (f1_c - mn) / (
        _pp(r_uic) + _pn(r_ui) + iadz * (_pp(r_wkc) + _pn(r_wi)) + EPS
    )

    # -- stage 5c: limit fluxes (U3[:, j-2] == uuu3[:, j], j in 2..nx+2;
    #    W3[:, j-2] == www3[:, j], j in 2..nx+1)
    l_u = U2[:, 1:nx + 2]
    U3 = (
        _pp(l_u) * _min3(one, mxr[:, 1:nx + 2], mnr[:, 0:nx + 1])
        - _pn(l_u) * _min3(one, mxr[:, 0:nx + 1], mnr[:, 1:nx + 2])
    )
    l_w = W2[:, 1:nx + 1]
    mx_i = mxr[:, 1:nx + 1]
    mn_i = mnr[:, 1:nx + 1]
    W3 = _pp(l_w) * _min3(one, mx_i, kb(mn_i)) - _pn(l_w) * _min3(
        one, kb(mx_i), mn_i
    )
    flux = flux + jnp.sum(W3, axis=1)

    # -- stage 6: final update
    f6 = f1[:, 3:nx + 3]
    upd6 = (
        U3[:, 1:nx + 1] - U3[:, 0:nx]
        + (_shl(W3) - W3) * iadz
    ) * irho
    f_out = jnp.concatenate(
        [f1[:, :3], jnp.maximum(0.0, f6 - upd6) * valid_f, f1[:, nx + 3:]],
        axis=1,
    )
    flux_out = jnp.where(valid[0], flux, flux_in)
    return f_out, flux_out


def _kernel_hoisted(kspan_ref, f_ref, u_ref, w_ref, rho_ref, rhow_ref,
                    adz_ref, flux_ref, fout_ref, fluxout_ref, *, nzm,
                    nsteps):
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
    jax.jit,
    static_argnames=("nzm", "nsteps", "block", "interpret", "hoisted"),
)
def _run_resident(f, u, w, rho, rhow, adz, flux, kspan, nzm, nsteps, block,
                  interpret, hoisted=False):
    s2 = f.shape[0]
    b = min(block, s2)
    assert s2 % b == 0
    blk3 = lambda a: pl.BlockSpec((b, a.shape[1], 2 * SEG),
                                  lambda i: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((b, 2 * SEG), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    kern = _kernel_hoisted if hoisted else _kernel
    return pl.pallas_call(
        functools.partial(kern, nzm=nzm, nsteps=nsteps),
        out_shape=(
            jax.ShapeDtypeStruct(f.shape, f.dtype),
            jax.ShapeDtypeStruct(flux.shape, flux.dtype),
        ),
        grid=(s2 // b,),
        in_specs=[
            pl.BlockSpec((1, 2 * SEG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            blk3(f), blk3(u), blk3(w), blk2, blk2, blk2, blk2,
        ],
        out_specs=(blk3(f), blk2),
        interpret=interpret,
    )(kspan, f, u, w, rho, rhow, adz, flux)


def _make_resident_forms(cfg, hoisted: bool):
    interpret = pallas_interpret()
    nzm, nz = cfg.nzm, cfg.nz
    if nz > SEG or cfg.nslices % 2:
        from cdk_tpu.core.registry import UnsupportedConfigError

        raise UnsupportedConfigError(
            f"pallas_resident needs nz <= {SEG} and even nslices "
            f"(got nz={nz}, nslices={cfg.nslices})"
        )

    def prepare(data: MpdataData):
        kspan = _packed_kspan(nzm, data.f.dtype)
        _, _, aux = pack_data(data)
        return aux + (kspan,)

    def step2(aux, data: MpdataData):
        u_p, w_p, rho_p, rhow_p, adz_p, kspan = aux
        f_p, flux_p, _ = pack_data(data)
        b = pick_block(f_p.shape[0])
        f_o, flux_o = _run_resident(f_p, u_p, w_p, rho_p, rhow_p, adz_p,
                                    flux_p, kspan, nzm, 1, b, interpret,
                                    hoisted)
        return unpack3(f_o, nzm), unpack2(flux_o, nz)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: MpdataData, n: int):
        """n steps entirely inside the kernel (timed path)."""
        kspan = _packed_kspan(nzm, data.f.dtype)
        f_p, flux_p, (u_p, w_p, rho_p, rhow_p, adz_p) = pack_data(data)
        b = pick_block(f_p.shape[0])
        f_o, flux_o = _run_resident(f_p, u_p, w_p, rho_p, rhow_p, adz_p,
                                    flux_p, kspan, nzm, n, b, interpret,
                                    hoisted)
        return unpack3(f_o, nzm), unpack2(flux_o, nz)

    return {"step": step2, "prepare": prepare, "loop": loop}


@register(
    "mpdata",
    "pallas_resident",
    "packed kernel with the n-step time loop inside the Pallas body: each "
    "slice block is DMA'd once and iterated in VMEM (u/w/aux streamed once "
    "per run, not once per step); same stage-exact math as pallas_packed",
)
def make_pallas_resident(cfg):
    return _make_resident_forms(cfg, hoisted=False)


@register(
    "mpdata",
    "pallas_hoisted",
    "resident kernel with all step-invariant math pre-folded before the "
    "in-kernel time loop (upwind splits of u/w, antidiffusion + cross-term "
    "coefficients with dd/irho/irhow absorbed) — roughly halves the "
    "per-step VPU op count; ~1 ulp/step reassociation vs the reference "
    "ordering",
)
def make_pallas_hoisted(cfg):
    return _make_resident_forms(cfg, hoisted=True)

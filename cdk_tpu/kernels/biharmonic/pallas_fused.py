"""Structured Pallas biharmonic kernel: gradient → tensorVisc → divergence
fused in one VMEM-resident kernel.

This is the hand-tiled analog of the reference's GPU variants: like the
push-loop form (biharmonic_wk_kernel.F90:369-536) it fuses the
(nlev, qsize) batch into one 2880-wide axis; like the compiler-inline form's
`!$acc cache` staging (:331,345) every intermediate lives in VMEM. Unlike
both, the np-point contractions run as 16×16 constant-matrix matmuls on the
MXU (see operator.stage_matrices) with the batch on lanes, and the
per-element 2×2 metric contractions are VPU elementwise ops broadcast from
16-point sublane vectors.

Grid: one program per spectral element. Per-element VMEM footprint at f32:
(16, 2880) ≈ 184 KiB per live buffer — everything stays on-chip; HBM traffic
is the speed-of-light 2 × qtens bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdk_tpu.core.platform import pallas_interpret
from cdk_tpu.core.registry import register
from cdk_tpu.kernels.biharmonic.problem import (
    BiharmonicData,
    from_lane_layout,
    to_lane_layout,
)


def _kernel(consts_ref, elem_ref, q_ref, out_ref, *, rrearth):
    dt = q_ref.dtype
    s = q_ref[0]  # (npts, ncol)
    a1, a2, b1, b2 = (consts_ref[i] for i in range(4))
    el = elem_ref[0]  # (9, npts): d00,d01,d10,d11, sp, t00,t01,t10,t11
    d00, d01, d10, d11 = (el[i][:, None] for i in range(4))
    sp = el[4][:, None]
    t00, t01, t10, t11 = (el[5 + i][:, None] for i in range(4))

    # gradient_sphere: x/y derivatives as constant-matrix MXU matmuls.
    # precision="highest" keeps f32 verification grade (default MXU f32 is
    # bf16 passes, ~1e-3 relative error at these contractions).
    v1 = rrearth * jnp.dot(a1, s, preferred_element_type=dt,
                           precision="highest")
    v2 = rrearth * jnp.dot(a2, s, preferred_element_type=dt,
                           precision="highest")
    ds1 = d00 * v1 + d10 * v2
    ds2 = d01 * v1 + d11 * v2
    # tensorVisc contraction
    g1 = ds1 * t00 + ds2 * t01
    g2 = ds1 * t10 + ds2 * t11
    # divergence_sphere_wk
    vt1 = d00 * g1 + d01 * g2
    vt2 = d10 * g1 + d11 * g2
    x = sp * vt1
    y = sp * vt2
    out_ref[0] = -rrearth * (
        jnp.dot(b1, x, preferred_element_type=dt, precision="highest")
        + jnp.dot(b2, y, preferred_element_type=dt, precision="highest")
    )


def pack_element_fields(dinv, spheremp, tensorvisc) -> jnp.ndarray:
    """-> (nelemd, 9, npts) stacked per-point element vectors, flattened
    C-order p = i*np + j to match operator.stage_matrices."""
    e = dinv.shape[0]
    npts = dinv.shape[1] * dinv.shape[2]
    rows = [
        dinv[..., 0, 0], dinv[..., 0, 1], dinv[..., 1, 0], dinv[..., 1, 1],
        spheremp,
        tensorvisc[..., 0, 0], tensorvisc[..., 0, 1],
        tensorvisc[..., 1, 0], tensorvisc[..., 1, 1],
    ]
    return jnp.stack([r.reshape(e, npts) for r in rows], axis=1)


def stage_matrices_jnp(dvv: jnp.ndarray) -> jnp.ndarray:
    """(4, npts, npts) stacked [A1, A2, B1, B2] built on-device (see
    operator.stage_matrices for the derivation)."""
    n = dvv.shape[0]
    eye = jnp.eye(n, dtype=dvv.dtype)
    return jnp.stack(
        [
            jnp.kron(dvv.T, eye),
            jnp.kron(eye, dvv.T),
            jnp.kron(dvv, eye),
            jnp.kron(eye, dvv),
        ]
    )


def _run(consts, elem_packed, q_lane, rrearth, interpret):
    nelemd, npts, ncol = q_lane.shape
    return pl.pallas_call(
        functools.partial(_kernel, rrearth=rrearth),
        out_shape=jax.ShapeDtypeStruct(q_lane.shape, q_lane.dtype),
        grid=(nelemd,),
        in_specs=[
            pl.BlockSpec((4, npts, npts), lambda e: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, npts), lambda e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, npts, ncol), lambda e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, npts, ncol), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(consts, elem_packed, q_lane)


@functools.partial(jax.jit, static_argnames=("rrearth", "interpret"))
def _step(data: BiharmonicData, rrearth: float, interpret: bool) -> jnp.ndarray:
    """One fused executable: setup (stage matrices, element packing, layout
    transform) + the Pallas kernel, traced once per shape/dtype."""
    dt = data.qtens.dtype
    consts = stage_matrices_jnp(data.dvv).astype(dt)
    elem_packed = pack_element_fields(
        data.dinv, data.spheremp, data.tensorvisc
    ).astype(dt)
    q_lane = to_lane_layout(data.qtens)
    return _run(consts, elem_packed, q_lane, rrearth, interpret)


def biharmonic_pallas(data: BiharmonicData, rrearth: float) -> jnp.ndarray:
    """Apply the fused Pallas weak Laplacian; returns lane-layout output."""
    return _step(data, float(rrearth), pallas_interpret())


@functools.partial(jax.jit, static_argnames=("rrearth", "interpret", "n"))
def _loop(data: BiharmonicData, rrearth: float, interpret: bool,
          n: int) -> jnp.ndarray:
    """n chained Pallas applications with qtens resident in lane layout."""
    import jax.lax as lax

    dt = data.qtens.dtype
    consts = stage_matrices_jnp(data.dvv).astype(dt)
    elem_packed = pack_element_fields(
        data.dinv, data.spheremp, data.tensorvisc
    ).astype(dt)

    def body(q, _):
        return _run(consts, elem_packed, q, rrearth, interpret), None

    out, _ = lax.scan(body, to_lane_layout(data.qtens), None, length=n)
    return out


@register(
    "biharmonic",
    "pallas_fused",
    "single fused Pallas kernel (gradient->visc->divergence) with "
    "VMEM-resident intermediates and MXU stage matmuls; analog of the "
    "reference GPU push-loop + cache variants",
    supports_f64=False,
)
def make_pallas_fused(cfg):
    rr = float(cfg.rrearth)
    interpret = pallas_interpret()

    @jax.jit
    def step(data: BiharmonicData) -> jnp.ndarray:
        return from_lane_layout(_step(data, rr, interpret), cfg)

    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        return from_lane_layout(_loop(data, rr, interpret, n), cfg)

    return {"step": step, "loop": loop}

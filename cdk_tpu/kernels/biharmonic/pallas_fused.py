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

Grid: one program per BLOCK of elements. The np-point stage matrices are
element-independent, so a block of B elements contracts as ONE
(B·16, B·16) block-diagonal constant matrix (kron(I_B, A)) against the
(B·16, ncol) stacked element states. B is chosen empirically per precision
(see _eblock): block-diag MACs scale ∝ B, and on v5e that FLOP cost beats
the systolic-utilization gain of wide tiles, so small B wins. All
intermediates are VMEM-resident; HBM traffic is the speed-of-light
2 × qtens bytes.
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


def _kernel(consts_ref, elem_ref, q_ref, out_ref, *, rrearth,
            precision="highest"):
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
                           precision=precision)
    v2 = rrearth * jnp.dot(a2, s, preferred_element_type=dt,
                           precision=precision)
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
        jnp.dot(b1, x, preferred_element_type=dt, precision=precision)
        + jnp.dot(b2, y, preferred_element_type=dt, precision=precision)
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


def stage_matrices_jnp(dvv: jnp.ndarray, eblock: int = 1) -> jnp.ndarray:
    """(4, B·npts, B·npts) stacked block-diagonal [A1, A2, B1, B2]: the
    per-point stage matrices (see operator.stage_matrices) replicated
    kron(I_B, ·) so a block of B elements contracts in one MXU-shaped
    matmul."""
    n = dvv.shape[0]
    eye = jnp.eye(n, dtype=dvv.dtype)
    mats = jnp.stack(
        [
            jnp.kron(dvv.T, eye),
            jnp.kron(eye, dvv.T),
            jnp.kron(dvv, eye),
            jnp.kron(eye, dvv),
        ]
    )
    if eblock > 1:
        beye = jnp.eye(eblock, dtype=dvv.dtype)
        mats = jax.vmap(lambda m: jnp.kron(beye, m))(mats)
    return mats


def _run(consts, elem_packed, q_lane, rrearth, interpret,
         precision="highest"):
    """consts (4, P, P), elem_packed (G, 9, P), q_lane (G, P, ncol) with
    P = eblock·npts and G = nelemd//eblock element groups."""
    g, p, ncol = q_lane.shape
    return pl.pallas_call(
        functools.partial(_kernel, rrearth=rrearth, precision=precision),
        out_shape=jax.ShapeDtypeStruct(q_lane.shape, q_lane.dtype),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((4, p, p), lambda e: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 9, p), lambda e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, ncol), lambda e: (e, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, ncol), lambda e: (e, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(consts, elem_packed, q_lane)


def _eblock(nelemd: int, precision: str) -> int:
    """Element block per the v5e sweep at the shipped size: the
    block-diagonal stage matmul costs FLOPs ∝ B (kron(I_B, A) is B× the
    MACs of B separate 16-wide dots), and that outweighs the systolic-tile
    utilization gain of large B — measured best: B=2 at "highest"
    (20.9 µs vs 26.4 at B=8), B=1 at bf16 (4.1 µs vs 7.9 at B=8)."""
    b = min(2 if precision == "highest" else 1, nelemd)
    while nelemd % b:
        b -= 1
    return b


def _group(elem_packed, q_lane, b):
    """(e, 9, npts), (e, npts, ncol) -> grouped (e/b, 9, b·npts),
    (e/b, b·npts, ncol)."""
    e, _, npts = elem_packed.shape
    ncol = q_lane.shape[-1]
    g = e // b
    ep = elem_packed.reshape(g, b, 9, npts).transpose(0, 2, 1, 3)
    return ep.reshape(g, 9, b * npts), q_lane.reshape(g, b * npts, ncol)


@functools.partial(
    jax.jit, static_argnames=("rrearth", "interpret", "precision")
)
def _step(data: BiharmonicData, rrearth: float, interpret: bool,
          precision: str = "highest") -> jnp.ndarray:
    """One fused executable: setup (stage matrices, element packing, layout
    transform) + the Pallas kernel, traced once per shape/dtype."""
    dt = data.qtens.dtype
    e = data.dinv.shape[0]
    b = _eblock(e, precision)
    consts = stage_matrices_jnp(data.dvv, b).astype(dt)
    elem_packed = pack_element_fields(
        data.dinv, data.spheremp, data.tensorvisc
    ).astype(dt)
    ep, ql = _group(elem_packed, to_lane_layout(data.qtens), b)
    out = _run(consts, ep, ql, rrearth, interpret, precision)
    return out.reshape(e, -1, out.shape[-1])


def biharmonic_pallas(data: BiharmonicData, rrearth: float) -> jnp.ndarray:
    """Apply the fused Pallas weak Laplacian; returns lane-layout output."""
    return _step(data, float(rrearth), pallas_interpret())


@functools.partial(
    jax.jit, static_argnames=("rrearth", "interpret", "n", "precision")
)
def _loop(data: BiharmonicData, rrearth: float, interpret: bool,
          n: int, precision: str = "highest") -> jnp.ndarray:
    """n chained Pallas applications with qtens resident in grouped lane
    layout."""
    import jax.lax as lax

    dt = data.qtens.dtype
    e = data.dinv.shape[0]
    b = _eblock(e, precision)
    consts = stage_matrices_jnp(data.dvv, b).astype(dt)
    elem_packed = pack_element_fields(
        data.dinv, data.spheremp, data.tensorvisc
    ).astype(dt)
    ep, ql = _group(elem_packed, to_lane_layout(data.qtens), b)

    def body(q, _):
        return _run(consts, ep, q, rrearth, interpret, precision), None

    out, _ = lax.scan(body, ql, None, length=n)
    return out.reshape(e, -1, out.shape[-1])


@register(
    "biharmonic",
    "pallas_fused",
    "single fused Pallas kernel (gradient->visc->divergence) with "
    "VMEM-resident intermediates and MXU stage matmuls; analog of the "
    "reference GPU push-loop + cache variants",
    supports_f64=False,
)
def make_pallas_fused(cfg):
    # Mosaic supports only DEFAULT/HIGHEST dot precision in kernels
    # ("Unsupported dot precision: HIGH"), so the Pallas path keeps
    # "highest"; the XLA fused_operator path uses the cheaper bf16x3
    # "high" (see operator.apply_operator).
    return _make_pallas(cfg, "highest")


def _make_pallas(cfg, precision):
    rr = float(cfg.rrearth)
    interpret = pallas_interpret()

    @jax.jit
    def step(data: BiharmonicData) -> jnp.ndarray:
        return from_lane_layout(_step(data, rr, interpret, precision), cfg)

    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        return from_lane_layout(_loop(data, rr, interpret, n, precision),
                                cfg)

    return {"step": step, "loop": loop}


@register(
    "biharmonic",
    "pallas_fused_bf16",
    "fused Pallas kernel with single-pass bf16 MXU stage matmuls: at "
    "8-element blocks the (128, 128) block-diagonal dots hit full systolic "
    "tiles (speed point)",
    supports_f64=False,
    fast_math=True,
)
def make_pallas_fused_bf16(cfg):
    return _make_pallas(cfg, "default")

"""biharmonic_dss2d: two-application biharmonic with a TWO-DIMENSIONAL
element-grid DSS — edges in both GLL directions plus 4-way corner dofs.

The ring-DSS family (dss.py) supplies the deferred exchange capability on
the minimal 1-D topology; real HOMME elements live on a 2-D quadrilateral
mesh (the cube sphere) where every element shares EDGES with 4 neighbors
and CORNER dofs with (generically) 4 elements, and the DSS sums over all
sharers of each dof (biharmonic_wk_kernel.F90:186-200 extracts one
application of exactly this structure; SURVEY §5 names the exchange as the
deferred capability).  This module supplies the 2-D structure with a
defined synthetic topology:

  TOPOLOGY — periodic (ex, ey) torus of elements, flattened row-major
  e = a*ey + b.  Element (a, b):
    * its j = np-1 GLL column is the same physical dof column as element
      (a, b+1 mod ey)'s j = 0 column        (x / intra-row direction);
    * its i = np-1 GLL row is the same physical dof row as element
      (a+1 mod ex, b)'s i = 0 row           (y / inter-row direction);
    * each corner dof is shared by FOUR elements (e.g. (i,j)=(np-1,np-1)
      of (a,b) ≡ (0,np-1) of (a+1,b) ≡ (np-1,0) of (a,b+1) ≡ (0,0) of
      (a+1,b+1)) — the torus is the minimal topology with HOMME's 4-way
      corner multiplicity (cube-sphere corners of valence 3 differ only
      in the sharer count, not in the assembly algebra).

  DSS — assembled(s)[dof] = Σ_sharers s / Σ_sharers spheremp, evaluated
  as TWO passes: a j-direction edge sum (full columns, corners included)
  followed by an i-direction edge sum OF THE ALREADY j-SUMMED rows.  The
  second pass's boundary rows carry the first pass's corner partial sums,
  so the 4-way corner total emerges from two nearest-neighbor exchanges —
  no diagonal communication is ever needed.  This two-pass identity is
  what makes the distributed form ppermute-only on a 2-D device mesh
  (dist/biharmonic.make_dist_step_dss2d).

  biharmonic_dss2d(q) = laplace_wk( dss2d( laplace_wk(q) ) )

Variants follow the house discipline: a trusted jnp reference plus
MXU fused-operator forms (the apply is element-local and identical to the
ring family's; only the assembly differs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cdk_tpu.core.registry import register
from cdk_tpu.kernels.biharmonic.problem import (
    BiharmonicData,
    from_lane_layout,
    to_lane_layout,
)
from cdk_tpu.kernels.biharmonic.reference import laplace_sphere_wk


def torus_shape(nelemd: int) -> tuple[int, int]:
    """Most-square (ex, ey) factorization with ey <= ex (shipped nelemd=16
    -> 4x4; production 5400 -> 75x72).  ey is the fast (element-row)
    direction the flattening e = a*ey + b keeps contiguous — giving it the
    smaller, more-composite factor lets the grouped bd8 apply tile rows
    with g=8 element groups (75x72: ey % 8 == 0 where 72x75 would not be).
    Prime counts degenerate to the 1-D ring topology (ey=1: the
    j-direction pairs an element with itself through the wrap, which the
    assembly handles but tests avoid)."""
    ey = int(nelemd**0.5)
    while nelemd % ey:
        ey -= 1
    return nelemd // ey, ey


def _edge_pair_sum(s: jnp.ndarray, eax: int, gax: int) -> jnp.ndarray:
    """One direction's shared-edge sum: along GLL axis `gax`, boundary
    slice 0 gains the `eax`-rolled(+1) neighbor's boundary slice n-1 and
    slice n-1 gains the rolled(-1) neighbor's slice 0.  Only the two
    boundary slices are rolled (rolling the full field materializes it
    twice more — the dss_ring_lane lesson).  Axis-parameterized so the
    same pass serves both the (…, i, j) reference layout and the
    (…, i, j, ncol) lane layout."""
    from jax import lax

    n = s.shape[gax]
    lo0 = lax.slice_in_dim(s, 0, 1, axis=gax)
    hi0 = lax.slice_in_dim(s, n - 1, n, axis=gax)
    mid = lax.slice_in_dim(s, 1, n - 1, axis=gax)
    lo = lo0 + jnp.roll(hi0, 1, axis=eax)
    hi = hi0 + jnp.roll(lo0, -1, axis=eax)
    return jnp.concatenate([lo, mid, hi], axis=gax)


def dss2d_sum(s5: jnp.ndarray, iax: int = -2, jax_: int = -1) -> jnp.ndarray:
    """Σ_sharers over the torus: j pass then i pass of the j-summed field
    (corners get all four sharers through the two-pass composition).
    s5: (ex, ey, ...) with the GLL i/j axes at iax/jax_."""
    return _edge_pair_sum(_edge_pair_sum(s5, 1, jax_), 0, iax)


def dss2d_weights(spheremp: jnp.ndarray, ex: int, ey: int) -> jnp.ndarray:
    """Inverse assembled mass W (e, np, np): 1/spheremp at interior dofs,
    1/(2-sum) on shared edges, 1/(4-sum) at corners — the same two-pass
    sum applied to spheremp itself (HOMME's rspheremp).  Static per
    problem; the dist path shards the precomputed field so no spheremp
    dofs ever travel at step time."""
    n = spheremp.shape[-1]
    sp5 = spheremp.reshape(ex, ey, n, n)
    return (1.0 / dss2d_sum(sp5)).reshape(spheremp.shape)


def dss_torus(s: jnp.ndarray, w: jnp.ndarray, ex: int, ey: int) -> jnp.ndarray:
    """Single-device DSS on (e, ..., i, j): assemble shared dofs over the
    torus and project back with the inverse assembled mass.  Both (all
    four, at corners) sharers compute the identical assembled value — the
    defining DSS property the parity tests pin down."""
    s5 = s.reshape(ex, ey, *s.shape[1:])
    return (dss2d_sum(s5).reshape(s.shape)) * w


def biharmonic_wk_dss2d_reference(qtens, dvv, dinv, spheremp, tensorvisc,
                                  rrearth, ex: int, ey: int) -> jnp.ndarray:
    """laplace → torus-DSS → laplace on (e, q, k, i, j) qtens."""
    bc = lambda a: a[:, None, None]
    lap = lambda x: laplace_sphere_wk(
        x, dvv, bc(dinv), bc(spheremp), bc(tensorvisc), rrearth
    )
    w = bc(dss2d_weights(spheremp, ex, ey))
    return lap(dss_torus(lap(qtens), w, ex, ey))


@register(
    "biharmonic_dss2d",
    "reference_jnp",
    "trusted jnp form: weak Laplacian twice with the 2-D torus DSS between "
    "(edge + 4-way corner assembly — the full HOMME DSS structure; the "
    "ring family's 1-D topology is the j-direction subcase)",
)
def make_reference(cfg):
    rr = cfg.np_dtype(cfg.rrearth)
    ex, ey = torus_shape(cfg.nelemd)

    @jax.jit
    def step(data: BiharmonicData) -> jnp.ndarray:
        return biharmonic_wk_dss2d_reference(
            data.qtens, data.dvv, data.dinv, data.spheremp, data.tensorvisc,
            rr, ex, ey,
        )

    return step


def dss2d_lane(s_lane: jnp.ndarray, w_lane: jnp.ndarray, ex: int, ey: int,
               npg: int) -> jnp.ndarray:
    """Torus DSS in the (e, npts, ncol) lane layout (p = i*np + j): the
    j-direction boundary columns are the p % np ∈ {0, np-1} sublane rows,
    the i-direction boundary rows the p ∈ [0,np) / [npts-np, npts) slices.
    w_lane: (e, npts, 1) inverse assembled mass in the same layout."""
    e, npts, ncol = s_lane.shape
    s5 = s_lane.reshape(ex, ey, npg, npg, ncol)
    summed = dss2d_sum(s5, iax=2, jax_=3)
    return (summed.reshape(e, npts, ncol)) * w_lane


def _fused_dss2d_forms(cfg, precision):
    from cdk_tpu.kernels.biharmonic.operator import (
        apply_operator,
        build_element_operator,
    )

    rr = cfg.np_dtype(cfg.rrearth)
    npg = cfg.np_gll
    ex, ey = torus_shape(cfg.nelemd)
    if cfg.dtype == "float64":
        # precision=None alone is NOT enough: in the composed step XLA:TPU
        # still picked the ~6e-9 bf16-emulated MXU path for the second
        # apply (measured, f64-on-chip-round4.txt) — apply_operator now
        # takes a no-dot exact-f64 VPU path at this dtype; None here just
        # avoids requesting an MXU precision that can never apply
        precision = None

    def _build(data):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        w = dss2d_weights(data.spheremp, ex, ey)
        return L, w.reshape(cfg.nelemd, cfg.npts, 1)

    @jax.jit
    def prepare(data: BiharmonicData):
        return _build(data)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        L, w = aux
        q = to_lane_layout(data.qtens)
        s = apply_operator(L, q, precision)
        s = dss2d_lane(s, w, ex, ey, npg)
        return from_lane_layout(apply_operator(L, s, precision), cfg)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        # lane-layout carry: the qtens↔lane conversion is hoisted out of
        # the scan body (the dss.py loop's measured lesson)
        L, w = _build(data)

        def body(q, _):
            s = apply_operator(L, q, precision)
            return apply_operator(L, dss2d_lane(s, w, ex, ey, npg),
                                  precision), None

        out, _ = jax.lax.scan(body, to_lane_layout(data.qtens), None,
                              length=n)
        return from_lane_layout(out, cfg)

    return {"prepare": prepare, "step": step, "loop": loop}


@register(
    "biharmonic_dss2d",
    "fused_operator",
    "two probed 16x16-operator MXU applications with the torus-DSS "
    "assembly between (bf16x3 'high' passes; exact within the f32 gate)",
    verify_tol=5e-5,  # measured bf16x3 double-application compounding 2.4e-5
)
def make_fused_dss2d(cfg):
    return _fused_dss2d_forms(cfg, "high")


@register(
    "biharmonic_dss2d",
    "fused_operator_f32",
    "fused-operator torus-DSS form at precision='highest' (6-pass exact f32)",
)
def make_fused_dss2d_f32(cfg):
    return _fused_dss2d_forms(cfg, "highest")


@register(
    "biharmonic_dss2d",
    "fused_operator_bf16",
    "fused-operator torus-DSS form with plain bf16 MXU passes (speed point)",
    supports_f64=False,
    fast_math=True,
)
def make_fused_dss2d_bf16(cfg):
    return _fused_dss2d_forms(cfg, "default")


def dss2d_grouped(s_g: jnp.ndarray, w6: jnp.ndarray, g: int, npg: int,
                  ex: int, ey: int) -> jnp.ndarray:
    """Torus DSS in the bd8 GROUPED (e/g, g*npts, ncol) layout, g
    elements per group contiguous along the ey (row) direction — the
    zero-relayout companion of operator.apply_operator_grouped (reshaping
    to the per-element lane layout inside a scan body forces a physical
    relayout of the whole field every step; the dss.dss_ring_grouped
    lesson, here in two directions):

      * j pass: in-group static slices on the element axis; group-edge
        elements read the mod-(ey/g) rolled neighbor group (the roll on
        the within-row group axis carries the periodic b-wrap, since
        groups tile each row exactly);
      * i pass: whole rows are ±1 rolls on the leading row axis of the
        j-summed field (corner partials ride along, as in dss2d_sum).

    w6: (ex, ey/g, g, npg, npg, 1) inverse assembled mass (precompute with
    `w.reshape(ex, ey//g, g, npg, npg)[..., None]`).  Identical arithmetic
    to dss2d_lane — bitwise-equal outputs (tested)."""
    ngrp, gn, ncol = s_g.shape
    r = ey // g
    s6 = s_g.reshape(ex, r, g, npg, npg, ncol)   # (a, r, m, i, j, c)

    # ---- pass 1: j-direction (within rows, mostly in-group) -----------
    j0 = s6[:, :, :, :, 0]                        # (a, r, m, i, c)
    jl = s6[:, :, :, :, -1]
    left = jnp.concatenate(
        [jnp.roll(jl, 1, axis=1)[:, :, -1:], jl[:, :, :-1]], axis=2
    )
    right = jnp.concatenate(
        [j0[:, :, 1:], jnp.roll(j0, -1, axis=1)[:, :, :1]], axis=2
    )
    t6 = jnp.concatenate(
        [
            jnp.expand_dims(j0 + left, 4),
            s6[:, :, :, :, 1:-1],
            jnp.expand_dims(jl + right, 4),
        ],
        axis=4,
    )

    # ---- pass 2: i-direction (across rows) of the j-summed field ------
    i0 = t6[:, :, :, 0]                           # (a, r, m, j, c)
    il = t6[:, :, :, -1]
    up = jnp.roll(il, 1, axis=0)
    down = jnp.roll(i0, -1, axis=0)
    u6 = jnp.concatenate(
        [
            jnp.expand_dims(i0 + up, 3),
            t6[:, :, :, 1:-1],
            jnp.expand_dims(il + down, 3),
        ],
        axis=3,
    )
    return (u6 * w6).reshape(ngrp, gn, ncol)


@register(
    "biharmonic_dss2d",
    "fused_operator_bd8",
    "two grouped block-diagonal (full-MXU-tile) operator applications with "
    "the torus-DSS assembly run IN the grouped layout (dss2d_grouped) — "
    "the production apply form; groups tile element rows, so torus_shape "
    "gives ey the 8-divisible factor",
    verify_tol=5e-5,  # bf16x3 'high' dots at f32 (see make_fused_dss2d_bd8)
)
def make_fused_dss2d_bd8(cfg):
    from cdk_tpu.kernels.biharmonic.operator import (
        apply_operator_grouped,
        blockdiag_group_operator,
        build_element_operator,
    )

    rr = cfg.np_dtype(cfg.rrearth)
    npg = cfg.np_gll
    npts = cfg.npts
    ex, ey = torus_shape(cfg.nelemd)
    g = 8
    while ey % g:
        g -= 1
    precision = "highest" if cfg.dtype == "float64" else "high"

    def _build(data):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        w = dss2d_weights(data.spheremp, ex, ey)
        w6 = w.reshape(ex, ey // g, g, npg, npg)[..., None]
        return blockdiag_group_operator(L, g), w6

    @jax.jit
    def prepare(data: BiharmonicData):
        return _build(data)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        lbd, w6 = aux
        q = to_lane_layout(data.qtens)
        s = apply_operator_grouped(lbd, q, precision)
        eg, gn, _ = lbd.shape
        ncol = q.shape[-1]
        s = dss2d_grouped(s.reshape(eg, gn, ncol), w6, g, npg, ex, ey)
        out = apply_operator_grouped(lbd, s.reshape(q.shape), precision)
        return from_lane_layout(out, cfg)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        lbd, w6 = _build(data)
        eg, gn, _ = lbd.shape
        q_lane = to_lane_layout(data.qtens)
        ncol = q_lane.shape[-1]

        # grouped-layout carry: apply and assembly both run in (e/g,
        # g*npts, ncol), so the scan body never relayouts the field
        def body(qg, _):
            s = jnp.einsum("bop,bpc->boc", lbd, qg,
                           preferred_element_type=qg.dtype,
                           precision=precision)
            s = dss2d_grouped(s, w6, g, npg, ex, ey)
            out = jnp.einsum("bop,bpc->boc", lbd, s,
                             preferred_element_type=qg.dtype,
                             precision=precision)
            return out, None

        qg0 = q_lane.reshape(eg, gn, ncol)
        out, _ = jax.lax.scan(body, qg0, None, length=n)
        return from_lane_layout(out.reshape(q_lane.shape), cfg)

    return {"prepare": prepare, "step": step, "loop": loop}

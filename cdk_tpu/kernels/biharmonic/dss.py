"""biharmonic_dss: the TWO-application biharmonic with the DSS
element-boundary exchange the miniapp dropped.

The extracted reference kernel applies the weak Laplacian ONCE per
(element, tracer, level) (biharmonic_wk_kernel.F90:186-200) and is therefore
element-local; real HOMME applies it twice with a DSS (direct stiffness
summation) exchange between applications, which couples neighboring
elements — SURVEY §5 names this the deferred capability ("scales
embarrassingly until the real DSS exchange is added").  This module supplies
that capability with a defined synthetic topology:

  TOPOLOGY — periodic 1-D ring of elements along the j GLL axis: element
  e's j=np-1 GLL column is the SAME physical degree of freedom as element
  e+1's j=0 column (wrapping at nelemd).  The miniapp's elements carry no
  mesh, so the ring is the minimal topology that makes DSS a real
  neighbor exchange (ppermute-shaped, like the reference's deferred MPI
  plan, nested_loops/README.md:29-31).

  DSS — the weak-Laplacian output is a spheremp-weighted (mass-weighted)
  residual; assembly sums the contributions of all sharers of a dof and
  projects back with the assembled inverse mass:

      assembled(s)[dof] = Σ_sharers s / Σ_sharers spheremp
      interior dofs:      s / spheremp

  (HOMME's rspheremp ≙ 1/Σ spheremp.)  Both sharers compute the identical
  assembled value — the defining DSS property, which the N-device parity
  tests pin down.

  biharmonic_dss(q) = laplace_wk( dss( laplace_wk(q) ) )

Variants follow the house discipline (one trusted jnp form + MXU-optimized
forms): the fused-operator forms apply the probed per-element 16×16
Laplacian matrix (operator.py:59-75) twice with the elementwise DSS between.
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


def dss_weights(spheremp: jnp.ndarray) -> jnp.ndarray:
    """Per-dof inverse assembled mass W (e, i, j): 1/spheremp at interior
    points, 1/(spheremp_e + spheremp_neighbor) on the shared j=0 / j=np-1
    columns of the periodic element ring.  Static per problem — computed
    once and reused every step (and precomputed per shard in the dist
    path so no spheremp columns ever travel)."""
    sp = spheremp
    mass = sp
    # right edge (j = np-1) pairs with right neighbor's j = 0 column
    m_r = sp[..., -1] + jnp.roll(sp, -1, axis=0)[..., 0]
    # left edge (j = 0) pairs with left neighbor's j = np-1 column
    m_l = sp[..., 0] + jnp.roll(sp, 1, axis=0)[..., -1]
    mass = jnp.concatenate(
        [m_l[..., None], sp[..., 1:-1], m_r[..., None]], axis=-1
    )
    return 1.0 / mass


def dss_apply(s, w, left_col, right_col):
    """Assemble with explicit neighbor columns (the dist building block).

    s:         (..., i, j) weak-form contributions
    w:         inverse assembled mass, broadcastable to s
    left_col:  (..., i) — LEFT neighbor's j=np-1 contribution column
    right_col: (..., i) — RIGHT neighbor's j=0 contribution column
    """
    summed = jnp.concatenate(
        [
            (s[..., 0] + left_col)[..., None],
            s[..., 1:-1],
            (s[..., -1] + right_col)[..., None],
        ],
        axis=-1,
    )
    return summed * w


def dss_ring(s: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Single-device DSS over the periodic element ring (roll = the
    zero-communication form of the neighbor exchange)."""
    left_col = jnp.roll(s, 1, axis=0)[..., -1]
    right_col = jnp.roll(s, -1, axis=0)[..., 0]
    return dss_apply(s, w, left_col, right_col)


def biharmonic_wk_dss_reference(qtens, dvv, dinv, spheremp, tensorvisc,
                                rrearth) -> jnp.ndarray:
    """laplace → DSS → laplace on (e, q, k, i, j) qtens."""
    bc = lambda a: a[:, None, None]
    lap = lambda x: laplace_sphere_wk(
        x, dvv, bc(dinv), bc(spheremp), bc(tensorvisc), rrearth
    )
    w = bc(dss_weights(spheremp))
    return lap(dss_ring(lap(qtens), w))


@register(
    "biharmonic_dss",
    "reference_jnp",
    "trusted jnp form: weak Laplacian twice with ring-DSS assembly between "
    "(the HOMME structure the miniapp extracts one application of, "
    "biharmonic_wk_kernel.F90:186-200 + SURVEY §5 deferred DSS)",
)
def make_reference(cfg):
    rr = cfg.np_dtype(cfg.rrearth)

    @jax.jit
    def step(data: BiharmonicData) -> jnp.ndarray:
        return biharmonic_wk_dss_reference(
            data.qtens, data.dvv, data.dinv, data.spheremp, data.tensorvisc,
            rr,
        )

    return step


def dss_ring_lane(s_lane: jnp.ndarray, w: jnp.ndarray, npg: int):
    """DSS in the (e, npts, ncol) lane layout (p = i*np + j flattened):
    the j=0 / j=np-1 GLL columns are the p % np == 0 / np-1 sublane rows.
    w: (e, np, np) inverse assembled mass."""
    e, npts, ncol = s_lane.shape
    s4 = s_lane.reshape(e, npg, npg, ncol)        # (e, i, j, col)
    # roll only the boundary-column SLICES: rolling the full s4 twice
    # materializes the whole field twice more per step (measured
    # production: ~1.5 ms of the fused_operator loop's 9.0 ms)
    left = jnp.roll(s4[:, :, -1], 1, axis=0)      # (e, i, col)
    right = jnp.roll(s4[:, :, 0], -1, axis=0)
    summed = jnp.concatenate(
        [
            (s4[:, :, 0] + left)[:, :, None],
            s4[:, :, 1:-1],
            (s4[:, :, -1] + right)[:, :, None],
        ],
        axis=2,
    )
    return (summed * w[..., None]).reshape(e, npts, ncol)


def dss_ring_grouped(s_g: jnp.ndarray, w5: jnp.ndarray, g: int, npg: int):
    """DSS in the bd8 GROUPED (e/g, g*npts, ncol) layout — same assembly
    as dss_ring_lane without leaving the grouped apply's layout (reshaping
    to the per-element lane layout inside a scan body forces a physical
    relayout of the whole tracer field every step).  The element index
    becomes (group b, in-group ge): the in-group neighbor shift is a
    static slice on the ge axis and only the group-edge elements read the
    rolled neighbor group.  w5: (e/g, g, npg, npg, 1) inverse assembled
    mass (precompute with `w.reshape(e//g, g, npg, npg)[..., None]`)."""
    b, gn, ncol = s_g.shape
    s5 = s_g.reshape(b, g, npg, npg, ncol)
    src_j0 = s5[:, :, :, 0]          # (b, ge, i, c): each element's j=0
    src_jl = s5[:, :, :, -1]         # j=np-1 columns
    left = jnp.concatenate(
        [jnp.roll(src_jl, 1, axis=0)[:, -1:], src_jl[:, :-1]], axis=1
    )
    right = jnp.concatenate(
        [src_j0[:, 1:], jnp.roll(src_j0, -1, axis=0)[:, :1]], axis=1
    )
    summed = jnp.concatenate(
        [
            (s5[:, :, :, 0] + left)[:, :, :, None],
            s5[:, :, :, 1:-1],
            (s5[:, :, :, -1] + right)[:, :, :, None],
        ],
        axis=3,
    )
    return (summed * w5).reshape(b, gn, ncol)


def _fused_dss_forms(cfg, precision):
    from cdk_tpu.kernels.biharmonic.operator import (
        apply_operator,
        build_element_operator,
    )

    rr = cfg.np_dtype(cfg.rrearth)
    npg = cfg.np_gll
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
        return L, dss_weights(data.spheremp)  # (e,16,16), (e, i, j)

    @jax.jit
    def prepare(data: BiharmonicData):
        return _build(data)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        L, w = aux
        q = to_lane_layout(data.qtens)
        s = apply_operator(L, q, precision)
        s = dss_ring_lane(s, w, npg)
        out = apply_operator(L, s, precision)
        return from_lane_layout(out, cfg)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        # carry the scan state in the lane layout: the qtens↔lane
        # conversion inside the body relayouts the whole field twice per
        # step (measured production: 11.3 ms/step chained vs 5.9 for the
        # same math with the conversions hoisted)
        L, w = _build(data)

        def body(q, _):
            s = apply_operator(L, q, precision)
            return apply_operator(L, dss_ring_lane(s, w, npg),
                                  precision), None

        out, _ = jax.lax.scan(body, to_lane_layout(data.qtens), None,
                              length=n)
        return from_lane_layout(out, cfg)

    return {"prepare": prepare, "step": step, "loop": loop}


@register(
    "biharmonic_dss",
    "fused_operator",
    "two probed 16x16-operator MXU applications with the elementwise DSS "
    "assembly between (bf16x3 'high' passes; exact within the f32 gate)",
    verify_tol=5e-5,  # measured bf16x3 double-application compounding 2.4e-5
)
def make_fused_dss(cfg):
    return _fused_dss_forms(cfg, "high")


@register(
    "biharmonic_dss",
    "fused_operator_f32",
    "fused-operator DSS form at precision='highest' (6-pass exact f32)",
)
def make_fused_dss_f32(cfg):
    return _fused_dss_forms(cfg, "highest")


@register(
    "biharmonic_dss",
    "fused_operator_bf16",
    "fused-operator DSS form with plain bf16 MXU passes (speed point)",
    supports_f64=False,
    fast_math=True,
)
def make_fused_dss_bf16(cfg):
    return _fused_dss_forms(cfg, "default")


@register(
    "biharmonic_dss",
    "fused_operator_bd8",
    "two grouped block-diagonal (full-MXU-tile) operator applications with "
    "the DSS assembly between — the production apply form (see "
    "operator.blockdiag_group_operator)",
    verify_tol=5e-5,  # bf16x3 'high' dots (apply_operator_grouped default)
)
def make_fused_dss_bd8(cfg):
    from cdk_tpu.kernels.biharmonic.operator import (
        apply_operator_grouped,
        blockdiag_group_operator,
        build_element_operator,
    )

    rr = cfg.np_dtype(cfg.rrearth)
    npg = cfg.np_gll
    g = 8
    while cfg.nelemd % g:
        g -= 1

    @jax.jit
    def prepare(data: BiharmonicData):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        return (blockdiag_group_operator(L, g),
                dss_weights(data.spheremp))

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        lbd, w = aux
        q = to_lane_layout(data.qtens)
        s = apply_operator_grouped(lbd, q)
        s = dss_ring_lane(s, w, npg)
        return from_lane_layout(apply_operator_grouped(lbd, s), cfg)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        from cdk_tpu.kernels.biharmonic.operator import (
            blockdiag_group_operator as bdg,
            build_element_operator as beo,
        )

        L = beo(data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr)
        lbd = bdg(L, g)
        eg, gn, _ = lbd.shape
        w = dss_weights(data.spheremp)
        w5 = w.reshape(eg, g, npg, npg)[..., None]
        q_lane = to_lane_layout(data.qtens)
        ncol = q_lane.shape[-1]

        # carry the scan state in the GROUPED (e/g, g*16, ncol) layout and
        # run the DSS there too (dss_ring_grouped): a lane-layout carry
        # would relayout the whole field around every apply (on the
        # grouped carry apply_operator_grouped's reshapes are identity
        # no-ops)
        def body(qg, _):
            s = apply_operator_grouped(lbd, qg)
            s = dss_ring_grouped(s, w5, g, npg)
            return apply_operator_grouped(lbd, s), None

        out, _ = jax.lax.scan(body, q_lane.reshape(eg, gn, ncol), None,
                              length=n)
        return from_lane_layout(out.reshape(q_lane.shape), cfg)

    return {"prepare": prepare, "step": step, "loop": loop}

"""Fused-operator biharmonic variant: per-element 16×16 Laplacian matrix.

TPU-first observation: for fixed element matrices (Dvv, Dinv, spheremp,
tensorVisc), `laplace_sphere_wk` is a LINEAR map on the 16 GLL points of a
level. So the whole kernel collapses to one batched matmul

    qtens[e, :, col] = L[e] @ qtens[e, :, col],   L[e] ∈ R^{16×16}

with the fused (qsize*nlev) = 2880-column batch on TPU lanes — pure MXU
work, the highest-throughput formulation possible on this hardware. L[e] is
built ONCE by probing the trusted reference with the 16 identity basis
fields (exact, since the operator is linear); the per-step cost is then
16×16×2880 MACs per element with zero wasted elementwise traffic.

This is the TPU-native analog (and strict improvement) of the reference's
push-loop restructuring (biharmonic_wk_kernel.F90:369-536), which fuses
(nlev, qsize) into len=2880 but still walks gradient → visc → divergence as
three directive kernels.

Also exported: the constant 16×16 stage matrices (A1, A2, B1, B2) of the
flattened-point formulation used by the structured Pallas kernel. With GLL
points flattened C-order p = i*np + j:
    v1 = rr·(Dvvᵀ ⊗ I) s      [gradient x]
    v2 = rr·(I ⊗ Dvvᵀ) s      [gradient y]
    out = -rr·[ (Dvv ⊗ I)(sp·vt1) + (I ⊗ Dvv)(sp·vt2) ]  [weak divergence]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cdk_tpu.core.registry import register
from cdk_tpu.kernels.biharmonic.problem import (
    BiharmonicData,
    from_lane_layout,
    to_lane_layout,
)
from cdk_tpu.kernels.biharmonic.reference import laplace_sphere_wk


def stage_matrices(dvv: np.ndarray):
    """Constant 16×16 matrices for the flattened-point (p = i*np + j)
    formulation of gradient/divergence. Returns (A1, A2, B1, B2)."""
    n = dvv.shape[0]
    eye = np.eye(n, dtype=np.float64)
    dvv = np.asarray(dvv, dtype=np.float64)
    a1 = np.kron(dvv.T, eye)  # v1 flat = A1 @ s_flat
    a2 = np.kron(eye, dvv.T)  # v2 flat (stored at [j,l] position)
    b1 = np.kron(dvv, eye)    # div term 1 on sp*vt1
    b2 = np.kron(eye, dvv)    # div term 2 on sp*vt2
    return a1, a2, b1, b2


def build_element_operator(dvv, dinv, spheremp, tensorvisc, rrearth) -> jnp.ndarray:
    """L: (nelemd, npts, npts) with out_flat = L[e] @ s_flat, built by
    applying the trusted reference to the identity basis (exact for a
    linear operator)."""
    n = dvv.shape[0]
    npts = n * n
    basis = jnp.eye(npts, dtype=dvv.dtype).reshape(npts, n, n)

    def probe(e_dinv, e_sp, e_tv):
        # out[b] = laplace applied to basis vector b -> (npts, n, n)
        out = laplace_sphere_wk(
            basis, dvv, e_dinv[None], e_sp[None], e_tv[None], rrearth
        )
        # L[p_out, p_in] = out[p_in] at flattened p_out
        return out.reshape(npts, npts).T

    return jax.vmap(probe)(dinv, spheremp, tensorvisc)


def apply_operator(L: jnp.ndarray, q_lane: jnp.ndarray,
                   precision="high") -> jnp.ndarray:
    """q_lane: (e, npts, ncol) -> L[e] @ q_lane[e] batched on MXU.

    Precision policy (measured on v5e at the shipped size): default bf16
    passes cost 8.9e-4 relative L2; "high" (bf16x3) 8.6e-6 — inside the
    5e-5 f32 verification gate at half the passes of "highest" (7.9e-8);
    the bf16 variant opts down explicitly.

    f64 never touches a dot: XLA:TPU can silently select the ~6e-9
    bf16-emulated MXU path for a dot inside a larger composition even
    with precision=None (measured on chip: the fused DSS step's first
    apply lands at 1e-15 but its second at 6.4e-9 — the SAME einsum;
    results/tpu-v5e/f64-on-chip-round4.txt), so the f64 parity path is a
    16-term FMA chain in a FIXED left-to-right order: f64 adds are never
    reassociated by XLA, so TPU and the host oracle compute the
    identical sequence (a reduce() lowered as a tree still differed
    ~2.5e-13 between backends at this operator's dynamic range)."""
    if q_lane.dtype == jnp.float64:
        out = L[:, :, 0, None] * q_lane[:, None, 0, :]
        for p in range(1, L.shape[2]):
            out = out + L[:, :, p, None] * q_lane[:, None, p, :]
        return out
    return jnp.einsum(
        "eop,epc->eoc", L, q_lane, preferred_element_type=q_lane.dtype,
        precision=precision,
    )


def blockdiag_operator(L: jnp.ndarray) -> jnp.ndarray:
    """Assemble the per-element 16×16 operators into one dense block-diagonal
    (nelemd*npts, nelemd*npts) matrix. A single large MXU matmul beats
    nelemd tiny batched matmuls on TPU (M=K=16 leaves the 128×128 systolic
    array ~1% utilized; the block-diagonal form trades nelemd× redundant
    zero-FLOPs for full MXU occupancy — a winning trade at these sizes)."""
    e, npts, _ = L.shape
    eye = jnp.eye(e, dtype=L.dtype)
    # (e, o, e', p) with L[e] on the diagonal
    bd = jnp.einsum("eop,ef->eofp", L, eye)
    return bd.reshape(e * npts, e * npts)


def apply_operator_blockdiag(Lbd: jnp.ndarray, q_flat: jnp.ndarray,
                             precision="highest") -> jnp.ndarray:
    """q_flat: (e*npts, ncol) -> Lbd @ q_flat, one dense MXU matmul."""
    return jnp.dot(Lbd, q_flat, preferred_element_type=q_flat.dtype,
                   precision=precision)


def _fused_operator_forms(cfg, precision):
    rr = cfg.np_dtype(cfg.rrearth)

    @jax.jit
    def step(data: BiharmonicData) -> jnp.ndarray:
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        out = apply_operator(L, to_lane_layout(data.qtens),
                             precision=precision)
        return from_lane_layout(out, cfg)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        """n chained applications with qtens resident in lane layout —
        the reference's nIters loop over device-resident push-loop data;
        layout conversion happens once at each end, not per step."""
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )

        def body(q, _):
            return apply_operator(L, q, precision=precision), None

        out, _ = lax.scan(body, to_lane_layout(data.qtens), None, length=n)
        return from_lane_layout(out, cfg)

    return {"step": step, "loop": loop}


@register(
    "biharmonic",
    "fused_operator",
    "per-element 16x16 fused Laplacian matrix applied as one batched MXU "
    "matmul over the 2880-wide lane batch (TPU-native fusion of the "
    "reference push-loop, biharmonic_wk_kernel.F90:369-536)",
)
def make_fused_operator(cfg):
    return _fused_operator_forms(cfg, "high")


@register(
    "biharmonic",
    "fused_operator_bd",
    "block-diagonal dense assembly of the per-element operators: the whole "
    "timestep is ONE (e*16, e*16) x (e*16, 2880) MXU matmul",
)
def make_fused_operator_bd(cfg):
    rr = cfg.np_dtype(cfg.rrearth)
    e, npts, ncol = cfg.nelemd, cfg.npts, cfg.ncol
    # the dense block-diagonal operator is (e·16)^2 — a demonstration
    # variant for miniapp sizes only (5400 elements would need a 30 GB
    # matrix and crashes the chip)
    if (e * npts) ** 2 * 4 > 2 * 2**30:
        # typed unsupported-at-this-config skip (driver reports it as a
        # skip with this reason; crashes still FAIL)
        from cdk_tpu.core.registry import UnsupportedConfigError

        raise UnsupportedConfigError(
            f"fused_operator_bd: dense operator would be "
            f"{(e * npts) ** 2 * 4 / 2**30:.1f} GiB; use fused_operator"
        )

    @jax.jit
    def step(data: BiharmonicData) -> jnp.ndarray:
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        q_flat = to_lane_layout(data.qtens).reshape(e * npts, ncol)
        out = apply_operator_blockdiag(blockdiag_operator(L), q_flat)
        return from_lane_layout(out.reshape(e, npts, ncol), cfg)

    return step


@register(
    "biharmonic",
    "fused_operator_bf16",
    "fused-operator matmul in bf16 MXU passes: the explicit speed-of-light "
    "point of the precision/throughput trade (use fused_operator for "
    "verification-grade f32)",
    supports_f64=False,
    fast_math=True,
)
def make_fused_operator_bf16(cfg):
    return _fused_operator_forms(cfg, "default")


def blockdiag_group_operator(L: jnp.ndarray, g: int) -> jnp.ndarray:
    """Group g per-element 16×16 operators into (e/g, g*16, g*16)
    block-diagonal tiles.  With g=8 each tile is exactly one (128, 128)
    MXU block — the apply becomes full-tile batched matmuls instead of
    5400 tiny 16-row ones (measured at production: the plain batched
    einsum runs at ~2% MXU / 198 GB/s, bound by neither — per-tiny-matmul
    overhead; full tiles trade 8× redundant zero-FLOPs for full systolic
    occupancy, the same trade blockdiag_operator makes globally)."""
    e, npts, _ = L.shape
    eg = e // g
    lg = L.reshape(eg, g, npts, npts)
    eye = jnp.eye(g, dtype=L.dtype)
    bd = jnp.einsum("bgop,gh->bgohp", lg, eye)
    return bd.reshape(eg, g * npts, g * npts)


def apply_operator_grouped(Lbd: jnp.ndarray, q_lane: jnp.ndarray,
                           precision="high") -> jnp.ndarray:
    eg, gn, _ = Lbd.shape
    ncol = q_lane.shape[-1]
    qg = q_lane.reshape(eg, gn, ncol)
    # (f64 on-chip parity routes through apply_operator's no-dot path;
    # this grouped form's gn-wide blocks are an f32/bf16 MXU shape and a
    # 128-term unrolled chain would be unreasonable — CPU f64 einsum is
    # already exact)
    out = jnp.einsum("bop,bpc->boc", Lbd, qg,
                     preferred_element_type=q_lane.dtype,
                     precision=precision)
    return out.reshape(q_lane.shape)


def _bd8_forms(cfg, precision: str):
    rr = cfg.np_dtype(cfg.rrearth)
    g = 8
    while cfg.nelemd % g:
        g -= 1

    def _build(data):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        return blockdiag_group_operator(L, g)

    @jax.jit
    def prepare(data: BiharmonicData):
        return (_build(data),)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        (lbd,) = aux
        out = apply_operator_grouped(lbd, to_lane_layout(data.qtens),
                                     precision=precision)
        return from_lane_layout(out, cfg)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        lbd = _build(data)
        eg, gn, _ = lbd.shape
        q_lane = to_lane_layout(data.qtens)
        ncol = q_lane.shape[-1]

        # carry the scan state in the grouped (e/g, g*16, ncol) layout so
        # the body is a pure batched matmul: reshaping to/from the
        # per-element (e, 16, ncol) layout inside the body forces a
        # physical relayout of the whole tracer field every step (the
        # (16-sublane vs 128-row) tilings differ), which measured as 2.5x
        # the kernel's pure-traffic bound
        def body(qg, _):
            out = jnp.einsum("bop,bpc->boc", lbd, qg,
                             preferred_element_type=qg.dtype,
                             precision=precision)
            return out, None

        qg0 = q_lane.reshape(eg, gn, ncol)
        out, _ = lax.scan(body, qg0, None, length=n)
        return from_lane_layout(out.reshape(q_lane.shape), cfg)

    return {"prepare": prepare, "step": step, "loop": loop}


@register(
    "biharmonic",
    "fused_operator_bd8",
    "8-element block-diagonal operator apply: each matmul is one full "
    "(128,128)x(128,ncol) MXU tile (8x zero-FLOP redundancy for full "
    "systolic occupancy; the production-scale apply form)",
)
def make_fused_operator_bd8(cfg):
    return _bd8_forms(cfg, "high")


@register(
    "biharmonic",
    "fused_operator_bd8_bf16",
    "grouped full-tile apply in single bf16 MXU passes — measured NULL "
    "result at production (1.555 ms, == f32 'high'): bd8 is "
    "bandwidth-bound at ~350 GB/s effective, not MXU-pass-bound, so "
    "cutting passes 3x changes nothing; kept as the recorded design point",
    supports_f64=False,
    fast_math=True,
    experimental=True,
)
def make_fused_operator_bd8_bf16(cfg):
    return _bd8_forms(cfg, "default")


def make_fused_operator_prebuilt(cfg, blockdiag: bool = False):
    """Two-phase form for benchmarking: setup() builds L once (analog of the
    reference's untimed data staging), step applies it."""
    rr = cfg.np_dtype(cfg.rrearth)
    e, npts, ncol = cfg.nelemd, cfg.npts, cfg.ncol

    @jax.jit
    def setup(data: BiharmonicData):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        q_lane = to_lane_layout(data.qtens)
        if blockdiag:
            return blockdiag_operator(L), q_lane.reshape(e * npts, ncol)
        return L, q_lane

    @jax.jit
    def step(L, q_lane):
        if blockdiag:
            return apply_operator_blockdiag(L, q_lane)
        return apply_operator(L, q_lane)

    return setup, step


def _pallas_apply_kernel(L_ref, q_ref, out_ref):
    # out[e,o,c] = Σ_p L[e,o,p] · q[e,p,c]: 16 unrolled broadcast-FMAs on
    # VMEM-resident data. In XLA this formulation re-reads q 16× from HBM
    # (measured 2.3× WORSE than the batched einsum at production scale);
    # here the block is loaded once, so HBM traffic is exactly in+out and
    # the FMAs run on-chip.
    L = L_ref[...]
    q = q_ref[...]
    npts = L.shape[-1]
    out_ref[...] = sum(
        L[:, :, p:p + 1] * q[:, p:p + 1, :] for p in range(npts)
    )


def apply_operator_pallas(L, q_lane, eblock: int | None = None):
    """Blocked Pallas operator apply: grid over element blocks, q loaded
    once per block, exact-f32 VPU FMAs (no MXU precision trade at all).
    The block is sized to ~2 MB of q so the 16-term FMA chain's live
    temporaries stay well inside VMEM (larger blocks crashed the Mosaic
    compile at production ncol)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cdk_tpu.core.platform import pallas_interpret

    e, npts, ncol = q_lane.shape
    if eblock is None:
        eblock = max(1, (2 * 2**20) // (npts * ncol * q_lane.dtype.itemsize))
    b = min(eblock, e)
    while e % b:
        b -= 1
    blk = lambda a: pl.BlockSpec((b, *a.shape[1:]), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _pallas_apply_kernel,
        out_shape=jax.ShapeDtypeStruct(q_lane.shape, q_lane.dtype),
        grid=(e // b,),
        in_specs=[blk(L), blk(q_lane)],
        out_specs=blk(q_lane),
        interpret=pallas_interpret(),
    )(L, q_lane)


@register(
    "biharmonic",
    "fused_operator_pallas",
    "prebuilt per-element operator applied by a blocked Pallas kernel: "
    "exact-f32 VPU FMAs on VMEM-resident blocks, HBM traffic = in+out "
    "only (the production-scale apply path; no MXU precision trade)",
)
def make_fused_operator_pallas(cfg):
    rr = cfg.np_dtype(cfg.rrearth)

    @jax.jit
    def prepare(data: BiharmonicData):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        return (L,)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        (L,) = aux
        out = apply_operator_pallas(L, to_lane_layout(data.qtens))
        return from_lane_layout(out, cfg)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )

        def body(q, _):
            return apply_operator_pallas(L, q), None

        out, _ = lax.scan(body, to_lane_layout(data.qtens), None, length=n)
        return from_lane_layout(out, cfg)

    return {"prepare": prepare, "step": step, "loop": loop}

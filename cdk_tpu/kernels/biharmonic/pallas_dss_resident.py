"""VMEM-resident k-step DSS-biharmonic: the communication-avoiding deep-
halo chain applied to the element ring.

The plain bd8 resident chain (pallas_bd8.py) keeps each 8-element group's
tracer block in VMEM across all n applications because groups are fully
independent.  The DSS family breaks that: every step couples element e to
e±1 through the assembly (dss.py topology), so a resident chain needs the
mpdata-kloop argument instead (pallas_masked.masked_kloop_xmajor): load a
WINDOW of B center groups plus hg halo groups per side, run k full
steps (apply → DSS → apply) in VMEM, and keep the center — each step
consumes one element of halo validity per side, so the center stays exact
while k ≤ hg*g.  HBM traffic drops from (read+write the field) per step —
the binding cost of the XLA grouped-carry loop, 5.53 ms/step at
production — to once per k steps, and the applies run as the measured
128-TFLOPS-effective x3 MXU chain (pallas_bd8.py numbers).

The in-kernel DSS needs no reshape out of the (rows, ncol) layout: with
lane-layout rows p = 4*i + j (problem.to_lane_layout; dss.py docstring)
concatenated across elements, an element's j=0 row r pairs with its LEFT
neighbor's j=3 row at exactly r-13 (r = 16*ge + 4i → r-13 =
16*(ge-1) + 4i + 3), and its j=np-1 row with r+13.  So the whole assembly
is two static sublane shifts + masked adds + the inverse-mass multiply:

    d = (s + (j==0)*shift_down13(s) + (j==3)*shift_up13(s)) * w

with window edges receiving garbage that the validity argument absorbs.
The ring's global periodicity lives in the halo-window gather indices
(mod nelemd), not in the kernel.

Precision: Mosaic exposes only DEFAULT/HIGHEST dot precision; the exact
form runs "highest" (bf16x6) and the x3 form the manual hi/lo-bf16
3-pass split — identical to pallas_bd8, with the operator split hoisted
out of the k-step loop.  The DSS-family gate is 5e-5 (specs.py); the x3
chain measures ~1e-6-grade L2 (see results/tpu-v5e/round2-summary.txt).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdk_tpu.core.platform import pallas_interpret
from cdk_tpu.core.registry import register
from cdk_tpu.kernels.biharmonic.dss import dss_weights
from cdk_tpu.kernels.biharmonic.operator import (
    blockdiag_group_operator,
    build_element_operator,
)
from cdk_tpu.kernels.biharmonic.problem import (
    BiharmonicData,
    from_lane_layout,
    to_lane_layout,
)

# steps per kernel call (halo elements per side = hg*g >= KMAX).
# Round-4 production sweep of the precomposed x3 champion (all legs
# driver-verified in one window, results/tpu-v5e/dss1d-k16-20260820.txt):
#   B=27/k=8 (round-3 geometry)  542.2 us/step
#   B=45/k=8                     574.2   (bigger window alone LOSES)
#   B=27/k=16                    518.7
#   B=45/k=16                    485.6   (-10.4% -> the default)
# k=16 halves the per-call field round trip AND cuts the bridge applies
# (k+1)/k; the larger window only pays when k=16's halo (hg=2 groups per
# side) raises the overcompute it amortizes.
# Round-5 re-sweep AFTER the pad-hoist/carry-copy fixes shifted the
# balance deeper (per-call costs shrank, so amortizing the remainder
# further wins; one window, control re-measured alongside —
# /tmp probe log committed in round5-summary §11):
#   KMAX=16 (control)  403.9 us/step      KMAX=64  405.8 (hg=8 window
#   KMAX=32            394.4  <- default   overcompute takes it back)
# Driver-verified ok at production (435.1, window noise) and shipped
# (10.59 — the _pick_k model keeps k=8 on the tiny ring, unchanged).
KMAX = int(os.environ.get("CDK_DSS_KMAX", "32"))

# Requested scoped-VMEM limit and the geometry predicate budget (probe
# hooks, same pattern as pallas_dss2d_resident: the predicate under-counts
# Mosaic's real accounting by ~2.5-4x, so budget ~ limit/2.7; the k=16/
# B=45 geometry is a 40.7 MB predicate live set, measured to compile and
# run at the 100 MB request)
VMEM_LIMIT = int(os.environ.get("CDK_DSS_VMEM_MB", "100")) * 2**20
GEOM_BUDGET = int(os.environ.get("CDK_DSS_BUDGET_MB", "42")) * 2**20


def _shift_down(a, n):
    """out[r] = a[r-n] (rows below n get zeros — garbage-absorbed edges)."""
    return jnp.concatenate([jnp.zeros_like(a[:n]), a[:-n]], axis=0)


def _shift_up(a, n):
    """out[r] = a[r+n]."""
    return jnp.concatenate([a[n:], jnp.zeros_like(a[:n])], axis=0)


def _dss_resident_kernel(*refs, nsteps, precision, gn, hg_rows, npg,
                         precomposed=False):
    if precomposed:
        l_ref, l2_ref, w_ref, ql_ref, qc_ref, qr_ref, out_ref = refs
    else:
        l_ref, w_ref, ql_ref, qc_ref, qr_ref, out_ref = refs
        l2_ref = None
    W = l_ref.shape[1]

    def _2d(a):
        # split-operand callers (apply_dss_resident_windowed_split) hand
        # the halo strips as (1, hg*gn, ncol_blk) blocks of a per-window
        # strip array; the padded-window caller hands 2-D blocks
        return a.reshape(a.shape[-2], a.shape[-1]) if a.ndim == 3 else a

    q2 = jnp.concatenate([_2d(ql_ref[...]), qc_ref[...],
                          _2d(qr_ref[...])], axis=0)
    rows = q2.shape[0]
    w2 = w_ref[0]
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    j = r % npg
    m0 = (j == 0).astype(q2.dtype)
    m3 = (j == npg - 1).astype(q2.dtype)
    # element ge's j=0 row r = npg^2*ge + npg*i pairs with its left
    # neighbor's j=npg-1 row r - (npg^2 - npg + 1); 13 at np=4
    shift = npg * npg - npg + 1

    f32 = q2.dtype

    def make_apply(lr):
        if precision == "bf16x3":
            # hoist the step-invariant operator splits out of the k-loop
            ls = []
            for b in range(W):
                L = lr[0, b]
                L_hi = L.astype(jnp.bfloat16)
                L_lo = (L - L_hi.astype(f32)).astype(jnp.bfloat16)
                ls.append((L_hi, L_lo))

            def apply_all(q):
                outs = []
                for b in range(W):
                    L_hi, L_lo = ls[b]
                    x = q[b * gn:(b + 1) * gn]
                    x_hi = x.astype(jnp.bfloat16)
                    x_lo = (x - x_hi.astype(f32)).astype(jnp.bfloat16)
                    outs.append(
                        jnp.dot(L_hi, x_hi, preferred_element_type=f32)
                        + jnp.dot(L_hi, x_lo, preferred_element_type=f32)
                        + jnp.dot(L_lo, x_hi, preferred_element_type=f32)
                    )
                return jnp.concatenate(outs, axis=0)

            return apply_all

        def apply_all(q):
            return jnp.concatenate(
                [
                    jnp.dot(lr[0, b], q[b * gn:(b + 1) * gn],
                            precision=precision,
                            preferred_element_type=f32)
                    for b in range(W)
                ],
                axis=0,
            )

        return apply_all

    apply_all = make_apply(l_ref)

    def asm(s):
        return (s + m0 * _shift_down(s, shift)
                + m3 * _shift_up(s, shift)) * w2

    if precomposed:
        # d-carry chain: (A D A)^n = A D (A² D)^{n-1} A with D the
        # assembly — the two applications adjacent across in-kernel step
        # boundaries collapse into ONE apply of the squared operator:
        # nsteps+1 bd8 applies per call instead of 2·nsteps (k=8: 9 vs
        # 16).  Same halo-validity consumption (one element per asm).
        apply2 = make_apply(l2_ref)
        d = asm(apply_all(q2))
        d = jax.lax.fori_loop(0, nsteps - 1,
                              lambda _, dd: asm(apply2(dd)), d)
        q2 = apply_all(d)
    else:
        def body(_, q):
            return apply_all(asm(apply_all(q)))

        q2 = jax.lax.fori_loop(0, nsteps, body, q2)
    out_ref[...] = q2[hg_rows:rows - hg_rows]


def _pick_geometry(eg, gn, ncol, g, itemsize, ops_values=7, kmax=None):
    """-> (B center groups per window, hg halo groups per side, ncol
    block).  The kernel requests vmem_limit_bytes=VMEM_LIMIT (the 16 MB
    scoped-VMEM wall is a compiler default, not hardware — round-3
    finding), so B is sized by the actual per-c-block live set at the
    128-lane block floor: ~4 double-buffered center blocks + ~7
    window-sized values (ops x2, carry, shift temps), each gn x 128.
    Bigger B cuts the 2*hg/B halo overcompute the compute-bound chain
    pays directly (production: B=9 -> 27 drops it 1.22x -> 1.07x)."""
    hg = -(-(KMAX if kmax is None else kmax) // g)
    blk = gn * 128 * itemsize
    B = 1
    for cand in sorted({d for d in range(1, eg + 1) if eg % d == 0},
                       reverse=True):
        B = cand
        if (4 * cand + ops_values * (cand + 2 * hg)) * blk <= GEOM_BUDGET:
            break
    return B, hg, _pick_ncol_blk(B + 2 * hg, gn, ncol, itemsize)


def _pick_ncol_blk(w_groups, gn, ncol, itemsize):
    """Largest multiple-of-128 divisor of (the 128-padded) ncol whose
    window working set (carry + dot temp + center in/out, ~3x the window)
    fits a ~5 MB budget.  Mosaic requires lane-dim blocks be multiples of
    128; 128 always divides the padded ncol."""
    m = ncol // 128
    ncol_blk = 128
    for d in sorted((d for d in range(1, m + 1) if m % d == 0),
                    reverse=True):
        if w_groups * gn * d * 128 * itemsize * 3 <= 5 * 2**20:
            ncol_blk = d * 128
            break
    return ncol_blk


@functools.partial(
    jax.jit,
    static_argnames=("nsteps", "precision", "g", "npg", "interpret",
                     "precomposed", "kmax"),
)
def apply_dss_resident(lbd, w2, qg, nsteps: int, *, g: int, npg: int,
                       precision: str = "highest",
                       interpret: bool = False,
                       precomposed: bool = False,
                       kmax: int | None = None):
    """k chained DSS-biharmonic steps in-kernel.

    lbd: (eg, gn, gn) grouped operators; w2: (eg*gn, 1) inverse assembled
    DSS mass in lane-row order; qg: (eg, gn, ncol) grouped tracer.
    Returns qg after nsteps steps (exact on every element: the halo
    windows carry the ring's periodicity via mod-eg gather indices)."""
    eg, gn, ncol0 = qg.shape
    kmax = KMAX if kmax is None else kmax
    assert nsteps <= kmax
    # pad the column batch to a lane-block multiple (zero columns are
    # fixed points of apply and DSS; sliced off at the end)
    ncol = -(-ncol0 // 128) * 128
    if ncol != ncol0:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, ncol - ncol0)))
    B, hg, ncol_blk = _pick_geometry(eg, gn, ncol, g, qg.dtype.itemsize,
                                     ops_values=9 if precomposed else 7,
                                     kmax=kmax)
    nb = eg // B
    W = B + 2 * hg

    # pre-windowed halo gathers (static indices; mod eg = the ring wrap)
    idx_l = np.array([(i * B - hg + j) % eg
                      for i in range(nb) for j in range(hg)])
    idx_r = np.array([((i + 1) * B + j) % eg
                      for i in range(nb) for j in range(hg)])
    ql = jnp.take(qg, idx_l, axis=0).reshape(nb * hg * gn, ncol)
    qr = jnp.take(qg, idx_r, axis=0).reshape(nb * hg * gn, ncol)
    q2 = qg.reshape(eg * gn, ncol)

    # windowed operators and weights (static per problem; built per call —
    # cheap next to the field, and hoisted by XLA out of caller scans)
    idx_w = np.array([(i * B - hg + j) % eg
                      for i in range(nb) for j in range(W)])
    lw = jnp.take(lbd, idx_w, axis=0).reshape(nb, W, gn, gn)
    ww = jnp.take(w2.reshape(eg, gn, 1), idx_w, axis=0).reshape(
        nb, W * gn, 1)

    lop = pl.BlockSpec((1, W, gn, gn), lambda i, c: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    operands, op_specs = [lw], [lop]
    if precomposed:
        # squared operator (one apply of A² per inner d-carry step);
        # formed from the grouped operator, windowed like lw
        lbd2 = jnp.einsum("bij,bjk->bik", lbd, lbd, precision="highest",
                          preferred_element_type=lbd.dtype)
        operands.append(jnp.take(lbd2, idx_w, axis=0).reshape(
            nb, W, gn, gn))
        op_specs.append(lop)

    out = pl.pallas_call(
        functools.partial(_dss_resident_kernel, nsteps=nsteps,
                          precision=precision, gn=gn, hg_rows=hg * gn,
                          npg=npg, precomposed=precomposed),
        out_shape=jax.ShapeDtypeStruct((eg * gn, ncol), qg.dtype),
        grid=(nb, ncol // ncol_blk),
        in_specs=op_specs + [
            pl.BlockSpec((1, W * gn, 1), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg * gn, ncol_blk), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B * gn, ncol_blk), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hg * gn, ncol_blk), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B * gn, ncol_blk), lambda i, c: (i, c),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(*operands, ww, ql, q2, qr)
    return out.reshape(eg, gn, ncol)[:, :, :ncol0]


def _pick_k(eg, gn, ncol, g, itemsize, precomposed):
    """Model-choose the in-kernel chain depth among {8, KMAX}: effective
    cost per owned-row-step = applies × window-overcompute + window DMA
    priced at ~one apply-equivalent per window row.  Deeper k cuts the
    bridge applies ((k+1)/k, precomposed) and halves the per-call field
    round trip, but its larger hg = ceil(k/g) halo inflates overcompute —
    ruinously on small rings (shipped eg=2: the k=16 window is 3 rings
    wide).  Both regimes agree with the round-4 measurements: production
    eg=675 picks k=16 (485 vs 574 µs/step measured) and the shipped eg=2
    ring picks k=8 (10.7 vs 13.5 µs/step)."""
    best_k, best_cost = None, None
    # candidates clamped to the KMAX probe cap: with CDK_DSS_KMAX below 8
    # the model must not hand back a depth past the requested cap
    for k in sorted({min(8, KMAX), KMAX}):
        hg = -(-k // g)
        B, _, _ = _pick_geometry(eg, gn, ncol, g, itemsize,
                                 ops_values=9 if precomposed else 7,
                                 kmax=k)
        w_over = (B + 2 * hg) / B
        applies = (1 + 1 / k) if precomposed else 2.0
        cost = applies * w_over + 2 * (B + 2 * hg) / (k * B)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k


def _dss_resident_forms(cfg, precision: str, precomposed: bool = False):
    rr = cfg.np_dtype(cfg.rrearth)
    g = 8
    while cfg.nelemd % g:
        g -= 1
    npts, ncol, npg = cfg.npts, cfg.ncol, cfg.np_gll
    interpret = pallas_interpret()

    def _build(data):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        lbd = blockdiag_group_operator(L, g)
        w2 = dss_weights(data.spheremp).reshape(cfg.nelemd * npts, 1)
        return lbd, w2

    @jax.jit
    def prepare(data: BiharmonicData):
        return _build(data)

    def _to_grouped(qtens, eg):
        return to_lane_layout(qtens).reshape(eg, g * npts, ncol)

    def _from_grouped(qg):
        return from_lane_layout(qg.reshape(cfg.nelemd, npts, ncol), cfg)

    eg0 = cfg.nelemd // g
    ncol_pad = -(-ncol // 128) * 128
    k_pick = _pick_k(eg0, g * npts, ncol_pad, g,
                     cfg.np_dtype(0).itemsize, precomposed)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        lbd, w2 = aux
        qg = _to_grouped(data.qtens, lbd.shape[0])
        out = apply_dss_resident(lbd, w2, qg, 1, g=g, npg=npg,
                                 precision=precision, interpret=interpret,
                                 precomposed=precomposed, kmax=k_pick)
        return _from_grouped(out)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        lbd, w2 = _build(data)
        qg = _to_grouped(data.qtens, lbd.shape[0])
        # lane-pad ONCE outside the scan: carrying the unpadded layout
        # made every apply_dss_resident call re-pad the whole field and
        # slice it back (~0.9 ms of pure copy per k=16 call at
        # production, ~56 us/step) — the same per-call-materialization
        # tax the round-5 dist kstep split removed (round5-summary §7).
        # apply_dss_resident's own pad/slice are no-ops on the padded
        # carry (ncol % 128 == 0 branch).
        if ncol_pad != ncol:
            qg = jnp.pad(qg, ((0, 0), (0, 0), (0, ncol_pad - ncol)))
        k = min(k_pick, n)
        run_k = lambda q, steps: apply_dss_resident(
            lbd, w2, q, steps, g=g, npg=npg, precision=precision,
            interpret=interpret, precomposed=precomposed, kmax=k_pick)
        if n // k:
            qg, _ = jax.lax.scan(lambda q, _: (run_k(q, k), None), qg,
                                 None, length=n // k, unroll=2)
        if n % k:
            qg = run_k(qg, n % k)
        return _from_grouped(qg[:, :, :ncol])

    return {"prepare": prepare, "step": step, "loop": loop}


@register(
    "biharmonic_dss",
    "fused_operator_bd8_resident",
    "communication-avoiding resident DSS chain: k full steps (apply-DSS-"
    "apply) in-kernel over deep-halo element-ring windows; HBM traffic "
    "once per k steps ('highest' dots)",
)
def make_dss_bd8_resident(cfg):
    return _dss_resident_forms(cfg, "highest")


@register(
    "biharmonic_dss",
    "fused_operator_bd8_resident_x3",
    "resident DSS chain with manual 3-pass bf16 f32-emulation dots (the "
    "einsum variants' 'high'; half the MXU passes of 'highest')",
    supports_f64=False,
    verify_tol=5e-5,  # bf16x3 compounding over the chained applications
)
def make_dss_bd8_resident_x3(cfg):
    return _dss_resident_forms(cfg, "bf16x3")


@register(
    "biharmonic_dss",
    "fused_operator_bd8_resident_sq",
    "d-carry resident DSS chain with the PRECOMPOSED squared operator: "
    "(A·DSS·A)^n = A·DSS·(A²·DSS)^(n-1)·A, so a k-step kernel call runs "
    "k+1 bd8 applies instead of 2k (k=16 default: 1.88x less MXU work "
    "on the compute-bound chain; 'highest' dots)",
)
def make_dss_bd8_resident_sq(cfg):
    return _dss_resident_forms(cfg, "highest", precomposed=True)


@register(
    "biharmonic_dss",
    "fused_operator_bd8_resident_sq_x3",
    "precomposed-A² d-carry resident DSS chain with 3-pass bf16 "
    "f32-emulation dots (see fused_operator_bd8_resident_sq)",
    supports_f64=False,
    verify_tol=5e-5,  # bf16x3 compounding over the chained applications
)
def make_dss_bd8_resident_sq_x3(cfg):
    return _dss_resident_forms(cfg, "bf16x3", precomposed=True)

@functools.partial(
    jax.jit,
    static_argnames=("nsteps", "b_groups", "hg", "gn", "npg", "precision",
                     "interpret"),
)
def apply_dss_resident_windowed(lw, ww, q_ext, nsteps: int, *,
                                b_groups: int, hg: int, gn: int, npg: int,
                                precision: str = "highest",
                                interpret: bool = False, lw2=None):
    """Dist form of the resident chain: the caller supplies q_ext with hg
    EXCHANGED halo groups per side (ring ppermute across shards — the
    global periodicity lives there, not in gather indices) and
    pre-windowed operators/weights lw (nb, B+2hg, gn, gn) /
    ww (nb, (B+2hg)*gn, 1).  Windows are pure block offsets: q_ext is
    left/right padded by B-hg garbage groups so the B-group centers land
    on block boundaries while the hg-group halo refs index in hg-units
    (requires hg | B).  Validity: nsteps <= hg * g elements of halo per
    side (g = gn / npg^2 elements per group).  Returns the owned
    (eg_loc, gn, ncol).

    With `lw2` (the pre-windowed per-group squared operator A², same
    shape as lw) the kernel runs the d-carry precomposed chain — nsteps+1
    bd8 applies per call instead of 2·nsteps, the same algebra as the
    single-chip `fused_operator_bd8_resident_sq*` champions."""
    egx, gn_, ncol0 = q_ext.shape
    eg = egx - 2 * hg
    B = b_groups
    assert B % hg == 0 and eg % B == 0
    nb = eg // B
    ncol = -(-ncol0 // 128) * 128
    if ncol != ncol0:
        q_ext = jnp.pad(q_ext, ((0, 0), (0, 0), (0, ncol - ncol0)))
    pad = B - hg
    if pad:
        q_ext = jnp.pad(q_ext, ((pad, pad), (0, 0), (0, 0)))
    W = B + 2 * hg
    ncol_blk = _pick_ncol_blk(W, gn, ncol, q_ext.dtype.itemsize)
    q2 = q_ext.reshape((eg + 2 * B) * gn, ncol)
    r = B // hg  # halo-ref block stride in hg-units
    hspec = lambda off: pl.BlockSpec(
        (hg * gn, ncol_blk), lambda i, c, o=off: ((i + 1) * r + o, c),
        memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, W, gn, gn), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    precomposed = lw2 is not None
    operands = (lw, lw2) if precomposed else (lw,)
    # geometry-sized scoped-VMEM request (the dss2d discipline): small
    # windows keep the 64 MB request, deep-window geometries get the
    # measured VMEM_LIMIT unlock
    blk = gn * 128 * q_ext.dtype.itemsize
    need = (4 * B + (9 if precomposed else 7) * W) * blk
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=(VMEM_LIMIT if need > 24 * 2**20
                          else min(VMEM_LIMIT, 64 * 2**20)))
    out = pl.pallas_call(
        functools.partial(_dss_resident_kernel, nsteps=nsteps,
                          precision=precision, gn=gn,
                          hg_rows=hg * gn, npg=npg,
                          precomposed=precomposed),
        out_shape=jax.ShapeDtypeStruct((eg * gn, ncol), q_ext.dtype),
        grid=(nb, ncol // ncol_blk),
        in_specs=[lspec] * len(operands) + [
            pl.BlockSpec((1, W * gn, 1), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            hspec(-1),                                       # left halo
            pl.BlockSpec((B * gn, ncol_blk), lambda i, c: (i + 1, c),
                         memory_space=pltpu.VMEM),           # center
            hspec(r),                                        # right halo
        ],
        out_specs=pl.BlockSpec((B * gn, ncol_blk),
                               lambda i, c: (i, c),
                               memory_space=pltpu.VMEM),
        compiler_params=cparams,
        interpret=interpret,
    )(*operands, ww, q2, q2, q2)
    return out.reshape(eg, gn, ncol)[:, :, :ncol0]


@functools.partial(
    jax.jit,
    static_argnames=("nsteps", "b_groups", "hg", "gn", "npg", "precision",
                     "interpret"),
)
def apply_dss_resident_windowed_split(lw, ww, q2, hl, hr, nsteps: int, *,
                                      b_groups: int, hg: int, gn: int,
                                      npg: int, precision: str = "highest",
                                      interpret: bool = False, lw2=None):
    """Split-operand form of apply_dss_resident_windowed: the owned field
    q2 ((eg_loc*gn, ncol), ncol ALREADY lane-padded) is the center
    operand — its B-group blocks are naturally aligned — and the
    per-window halo strips arrive as small separate arrays
    hl/hr (nb, hg*gn, ncol) built by the caller from the ppermuted
    neighbor strips + the local block tails/heads.

    This removes the padded-window form's per-call field materializations
    (the _exg concat of the WHOLE field plus the B-hg alignment pad —
    ~1.0 GB of HBM traffic per kstep call at production, ~110 us/step at
    kstep=8, which was the entire measured dist-vs-single-chip gap on
    the 1-D DSS kstep loop; round5-summary §7).  Same kernel, same
    arithmetic: the in-kernel concat assembles the identical window."""
    rows, ncol = q2.shape
    B = b_groups
    eg = rows // gn
    assert B % hg == 0 and eg % B == 0 and ncol % 128 == 0
    nb = eg // B
    assert hl.shape == (nb, hg * gn, ncol) and hr.shape == hl.shape
    W = B + 2 * hg
    ncol_blk = _pick_ncol_blk(W, gn, ncol, q2.dtype.itemsize)
    hspec = pl.BlockSpec((1, hg * gn, ncol_blk), lambda i, c: (i, 0, c),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, W, gn, gn), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    precomposed = lw2 is not None
    operands = (lw, lw2) if precomposed else (lw,)
    blk = gn * 128 * q2.dtype.itemsize
    need = (4 * B + (9 if precomposed else 7) * W) * blk
    cparams = pltpu.CompilerParams(
        vmem_limit_bytes=(VMEM_LIMIT if need > 24 * 2**20
                          else min(VMEM_LIMIT, 64 * 2**20)))
    out = pl.pallas_call(
        functools.partial(_dss_resident_kernel, nsteps=nsteps,
                          precision=precision, gn=gn,
                          hg_rows=hg * gn, npg=npg,
                          precomposed=precomposed),
        out_shape=jax.ShapeDtypeStruct((rows, ncol), q2.dtype),
        grid=(nb, ncol // ncol_blk),
        in_specs=[lspec] * len(operands) + [
            pl.BlockSpec((1, W * gn, 1), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            hspec,                                           # left halo
            pl.BlockSpec((B * gn, ncol_blk), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),           # center
            hspec,                                           # right halo
        ],
        out_specs=pl.BlockSpec((B * gn, ncol_blk),
                               lambda i, c: (i, c),
                               memory_space=pltpu.VMEM),
        compiler_params=cparams,
        interpret=interpret,
    )(*operands, ww, hl, q2, hr)
    return out

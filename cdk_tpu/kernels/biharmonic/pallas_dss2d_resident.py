"""VMEM-resident k-step torus-DSS biharmonic: the deep-halo chain on the
2-D element grid.

The 2-D DSS couples element (a,b) to its four neighbors per step, so the
1-D ring chain (pallas_dss_resident.py) does not apply directly.  The
trick that recovers it: make the window unit a FULL ELEMENT ROW (a
complete j-ring of ey elements).  Then

  * the j-direction assembly is fully window-local — in the concatenated
    lane-row layout (L = ey·np² sublane rows per element row, p = 4i+j
    within an element), element b's j=0 row r pairs with its left
    neighbor's j=np-1 row at r-13, and the row's periodic wrap (b=0 ↔
    b=ey-1) is the SAME shift taken at distance L-13 on the first
    element's rows — so the whole pass is four masked static sublane
    shifts, no gather, no reshape;
  * the i-direction pairs (a,b,i=0) with (a-1,b,i=np-1) at exactly
    r-(L-12): two more masked shifts OF THE j-SUMMED field (the corner
    partials ride along — the dss2d_sum two-pass identity), and it is the
    ONLY direction that consumes halo: k in-kernel steps need k halo
    element rows per side, the mpdata-kloop argument on the row axis.

HBM traffic drops from (read+write the field) per step — the binding cost
of both XLA loop forms, 8.6-9.3 ms/step at production — to once per k
steps; the applies run as the bd8 grouped MXU dots (groups tile rows:
torus_shape gives ey the 8-divisible factor).  The i-ring's global
periodicity lives in the mod-ex halo-window gather indices, exactly where
the 1-D chain keeps its ring wrap.

Precision: "highest" (bf16x6 dots) for the exact form, the manual
hi/lo-bf16 3-pass split for the x3 speed form — identical policy to
pallas_dss_resident.py.
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
from cdk_tpu.kernels.biharmonic.dss2d import dss2d_weights, torus_shape
from cdk_tpu.kernels.biharmonic.operator import (
    blockdiag_group_operator,
    build_element_operator,
)
from cdk_tpu.kernels.biharmonic.pallas_dss_resident import (
    _pick_ncol_blk,
    _shift_down,
    _shift_up,
)
from cdk_tpu.kernels.biharmonic.problem import (
    BiharmonicData,
    from_lane_layout,
    to_lane_layout,
)

KMAX = 4  # request cap; the geometry picker clamps further by VMEM


def _dss2d_resident_kernel(l_ref, w_ref, ql_ref, qc_ref, qr_ref, out_ref, *,
                           nsteps, precision, gn, hg_rows, npg, row_rows):
    """Window = (B + 2k) element rows; l_ref (1, Wg, gn, gn) grouped
    operators, w_ref (1, Wg*gn, 1) 2-D inverse assembled mass, q refs =
    k-row halos + B-row center; row_rows = L = ey*np² sublane rows per
    element row.  The j pass (incl. its row wrap) and the apply builders
    are the shared _jpass/_masks_j/_make_apply helpers; only the i pass
    differs from the rowchain kernels — here it is a full-window ±si
    shift (the halo rows are in-window), there a ±12-row shift into the
    neighbor refs."""
    Wg = l_ref.shape[1]
    q2 = jnp.concatenate([ql_ref[...], qc_ref[...], qr_ref[...]], axis=0)
    rows = q2.shape[0]
    w2 = w_ref[0]
    L = row_rows
    dt = q2.dtype
    masks = _masks_j(rows, npg, L, dt)
    p = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % (npg * npg)
    m_i0 = (p < npg).astype(dt)
    m_i3 = (p >= npg * (npg - 1)).astype(dt)
    si = L - npg * (npg - 1)        # partner row distance across rows
    apply_all = _make_apply(l_ref, Wg, gn, precision, dt)

    def body(_, q):
        s = apply_all(q)
        t = _jpass(s, masks, npg, L)
        # i pass of the j-summed field (consumes one halo row per side)
        d = (t
             + m_i0 * _shift_down(t, si)
             + m_i3 * _shift_up(t, si)) * w2
        return apply_all(d)

    q2 = jax.lax.fori_loop(0, nsteps, body, q2)
    out_ref[...] = q2[hg_rows:rows - hg_rows]


def _geometry(ex, ey, g, gn, ncol, itemsize, nsteps):
    """-> (k steps per call, B center rows, ncol_blk).  Window = B + 2k
    element rows of gb = ey/g groups each.  The budget is deliberately
    tight (6 MB for field×3 + ops×2 against the 16 MB scoped-VMEM limit):
    the kernel's 6 masked-shift temporaries roughly double the live set,
    and an over-budget compile crashes the Mosaic helper AND wedges the
    remote tunnel for ~20 min (measured at production 75x72, where the
    full-row window is 3456 sublane rows).  Configs that cannot fit even
    k=1 raise NotImplementedError — use the rowchain forms there."""
    gb = ey // g
    B = 1
    for k in range(min(nsteps, KMAX), 0, -1):
        wg = (B + 2 * k) * gb
        ncol_blk = _pick_ncol_blk(wg, gn, ncol, itemsize)
        field = wg * gn * ncol_blk * itemsize * 3
        ops = wg * gn * gn * itemsize * 2
        if field + ops <= 6 * 2**20:
            return k, B, ncol_blk
    from cdk_tpu.core.registry import UnsupportedConfigError

    raise UnsupportedConfigError(
        f"torus-DSS full-row window ({(B + 2) * gb * gn} sublane rows) "
        f"exceeds the VMEM budget at this size; use the rowchain forms"
    )


@functools.partial(
    jax.jit,
    static_argnames=("nsteps", "precision", "g", "npg", "interpret"),
)
def apply_dss2d_resident(lbd, w2, qg, nsteps: int, *, g: int, npg: int,
                         precision: str = "highest",
                         interpret: bool = False):
    """nsteps chained torus-DSS-biharmonic steps in-kernel.

    lbd: (eg, gn, gn) grouped operators (groups tile element rows);
    w2: (eg*gn, 1) 2-D inverse assembled mass in lane-row order;
    qg: (eg, gn, ncol) grouped tracer.  nsteps must be <= the geometry's
    per-call k (callers chain via scan; see the loop form)."""
    eg, gn, ncol0 = qg.shape
    ex, ey = _torus_of(eg, gn, npg, g)
    gb = ey // g
    ncol = -(-ncol0 // 128) * 128  # lane-pad (zero columns are fixed points)
    k, B, ncol_blk = _geometry(ex, ey, g, gn, ncol, qg.dtype.itemsize,
                               nsteps)
    assert nsteps <= k, (nsteps, k)
    if ncol != ncol0:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, ncol - ncol0)))
    nb = ex // B
    Wg = (B + 2 * k) * gb

    # halo/window gathers in GROUP units (rows of gb groups; mod-ex wrap)
    def row_groups(i0, nrows):
        return [((a % ex) * gb + t)
                for a in range(i0, i0 + nrows) for t in range(gb)]

    idx_l = np.array(sum((row_groups(i * B - k, k) for i in range(nb)), []))
    idx_r = np.array(sum((row_groups((i + 1) * B, k) for i in range(nb)),
                         []))
    idx_w = np.array(sum((row_groups(i * B - k, B + 2 * k)
                          for i in range(nb)), []))
    ql = jnp.take(qg, idx_l, axis=0).reshape(nb * k * gb * gn, ncol)
    qr = jnp.take(qg, idx_r, axis=0).reshape(nb * k * gb * gn, ncol)
    q2 = qg.reshape(eg * gn, ncol)
    lw = jnp.take(lbd, idx_w, axis=0).reshape(nb, Wg, gn, gn)
    ww = jnp.take(w2.reshape(eg, gn, 1), idx_w, axis=0).reshape(
        nb, Wg * gn, 1)

    out = pl.pallas_call(
        functools.partial(_dss2d_resident_kernel, nsteps=nsteps,
                          precision=precision, gn=gn,
                          hg_rows=k * gb * gn, npg=npg,
                          row_rows=gb * gn),
        out_shape=jax.ShapeDtypeStruct((eg * gn, ncol), qg.dtype),
        grid=(nb, ncol // ncol_blk),
        in_specs=[
            pl.BlockSpec((1, Wg, gn, gn), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wg * gn, 1), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * gb * gn, ncol_blk), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B * gb * gn, ncol_blk), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * gb * gn, ncol_blk), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B * gb * gn, ncol_blk),
                               lambda i, c: (i, c),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lw, ww, ql, q2, qr)
    return out.reshape(eg, gn, ncol)[:, :, :ncol0]


def _torus_of(eg, gn, npg, g):
    nelemd = eg * (gn // (npg * npg))
    return torus_shape(nelemd)


def _dss2d_resident_forms(cfg, precision: str):
    rr = cfg.np_dtype(cfg.rrearth)
    ex, ey = torus_shape(cfg.nelemd)
    g = 8
    while ey % g:
        g -= 1
    npts, ncol, npg = cfg.npts, cfg.ncol, cfg.np_gll
    interpret = pallas_interpret()

    def _build(data):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        lbd = blockdiag_group_operator(L, g)
        w2 = dss2d_weights(data.spheremp, ex, ey).reshape(
            cfg.nelemd * npts, 1)
        return lbd, w2

    @jax.jit
    def prepare(data: BiharmonicData):
        return _build(data)

    def _to_grouped(qtens, eg):
        return to_lane_layout(qtens).reshape(eg, g * npts, ncol)

    def _from_grouped(qg):
        return from_lane_layout(qg.reshape(cfg.nelemd, npts, ncol), cfg)

    k_geom, _, _ = _geometry(ex, ey, g, g * npts, -(-ncol // 128) * 128,
                             cfg.np_dtype(0).itemsize, KMAX)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        lbd, w2 = aux
        qg = _to_grouped(data.qtens, lbd.shape[0])
        out = apply_dss2d_resident(lbd, w2, qg, 1, g=g, npg=npg,
                                   precision=precision,
                                   interpret=interpret)
        return _from_grouped(out)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        lbd, w2 = _build(data)
        qg = _to_grouped(data.qtens, lbd.shape[0])
        # lane-pad ONCE outside the scan (the round-5 pad-hoist: carrying
        # the unpadded layout made every chain call re-pad + slice the
        # whole field — pallas_dss_resident.py loop, round5-summary §3
        # revision); apply's own pad/slice are no-ops on the padded carry
        ncolp = -(-ncol // 128) * 128
        if ncolp != ncol:
            qg = jnp.pad(qg, ((0, 0), (0, 0), (0, ncolp - ncol)))
        k = min(k_geom, n)
        run_k = lambda q, steps: apply_dss2d_resident(
            lbd, w2, q, steps, g=g, npg=npg, precision=precision,
            interpret=interpret)
        if n // k:
            qg, _ = jax.lax.scan(lambda q, _: (run_k(q, k), None), qg,
                                 None, length=n // k, unroll=2)
        if n % k:
            qg = run_k(qg, n % k)
        return _from_grouped(qg[:, :, :ncol])

    return {"prepare": prepare, "step": step, "loop": loop}


@register(
    "biharmonic_dss2d",
    "fused_operator_bd8_resident",
    "communication-avoiding resident torus-DSS chain: k full steps "
    "(apply - 2-D DSS - apply) in-kernel over deep-halo element-ROW "
    "windows; j assembly is window-local masked shifts, i halos amortize "
    "k-fold ('highest' dots)",
)
def make_dss2d_bd8_resident(cfg):
    return _dss2d_resident_forms(cfg, "highest")


@register(
    "biharmonic_dss2d",
    "fused_operator_bd8_resident_x3",
    "resident torus-DSS chain with manual 3-pass bf16 f32-emulation dots "
    "(half the MXU passes of 'highest')",
    supports_f64=False,
    verify_tol=5e-5,  # bf16x3 compounding over the chained applications
)
def make_dss2d_bd8_resident_x3(cfg):
    return _dss2d_resident_forms(cfg, "bf16x3")


# ---------------------------------------------------------------------------
# The t-carry ROWCHAIN: production-scale fused chain with single-row windows.
#
# At production (75x72) the full-row window above is 3456 sublane rows and
# cannot fit VMEM.  Carrying t = jpass(apply(q)) between steps instead of q
# recovers the fused chain's steady-state HBM traffic (read 3 rows + write 1
# per step) with 1-row windows:
#
#     t_0     = jpass(apply(q_0))                       [bridge-in kernel]
#     t_{n+1} = jpass(apply(apply(ipass(t_n)·w)))       [step kernel ×(n-1)]
#     q_N     = apply(ipass(t_{N-1})·w)                 [bridge-out kernel]
#
# The step kernel reads its own t row plus the two neighbor rows (1-row
# BlockSpecs at i, i+1, i+2 on a wrap-padded array — the torus's i
# periodicity is two row copies in XLA per step), and the i-pass partners
# sit at fixed ±12-row offsets inside those neighbors, so the assembly is
# three small masked shifts; the j-pass stays window-local as above.
# ---------------------------------------------------------------------------


def _masks_j(rows, npg, L, dt):
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    rl = r % L
    j0 = (r % npg == 0)
    j3 = (r % npg == npg - 1)
    first_e = rl < npg * npg
    last_e = rl >= L - npg * npg
    return ((j0 & ~first_e).astype(dt), (j0 & first_e).astype(dt),
            (j3 & ~last_e).astype(dt), (j3 & last_e).astype(dt))


def _make_apply(l_ref, gb, gn, precision, dt, row=0):
    if precision == "bf16x3":
        ls = []
        for b in range(gb):
            Lb = l_ref[row, b]
            L_hi = Lb.astype(jnp.bfloat16)
            ls.append((L_hi, (Lb - L_hi.astype(dt)).astype(jnp.bfloat16)))

        def apply_all(q):
            outs = []
            for b in range(gb):
                L_hi, L_lo = ls[b]
                x = q[b * gn:(b + 1) * gn]
                x_hi = x.astype(jnp.bfloat16)
                x_lo = (x - x_hi.astype(dt)).astype(jnp.bfloat16)
                outs.append(
                    jnp.dot(L_hi, x_hi, preferred_element_type=dt)
                    + jnp.dot(L_hi, x_lo, preferred_element_type=dt)
                    + jnp.dot(L_lo, x_hi, preferred_element_type=dt)
                )
            return jnp.concatenate(outs, axis=0)

        return apply_all

    def apply_all(q):
        return jnp.concatenate(
            [
                jnp.dot(l_ref[row, b], q[b * gn:(b + 1) * gn],
                        precision=precision, preferred_element_type=dt)
                for b in range(gb)
            ],
            axis=0,
        )

    return apply_all


def _make_fused_apply(l_ref, gb, gn, precision, dt, row=0,
                      precomposed=False):
    """The t-carry step's two operator applications are ADJACENT in its
    dataflow (t' = jpass(A(A(ipass(t)·w)))): with `precomposed` the caller
    passes the per-row-per-group matrix square A² (same shape, computed
    once at prepare) and the step runs ONE bd8 application instead of two
    — halving the per-step MXU passes.  Roofline motivation (production
    75x72, ncol 720→768 padded, x3 dots): 2 applications = 2·3 passes of
    75·9 (128,128)@(128,128·6) dots = 95.6 GFLOP/step ≈ 485 µs at the
    197 TFLOPS bf16 peak, vs the blocked k=3 DMA bound ~0.43 GB/step ≈
    750 µs at the measured 570 GB/s — the measured 1196 µs/step steady
    state ≈ DMA + MXU with no overlap, so MXU passes are the closable
    half (VERDICT r3 weak #2)."""
    a = _make_apply(l_ref, gb, gn, precision, dt, row=row)
    if precomposed:
        return a
    return lambda q: a(a(q))


def precompose_operator(lrow: jnp.ndarray, precision="highest"):
    """Per-(element-row, group) matrix square A² of the block-diagonal
    operator (ex, gb, gn, gn).  A is block-diagonal per element inside
    each (gn, gn) group block, so A² keeps the same shape and sparsity;
    formed once at prepare (the untimed-staging discipline,
    nested.F90:400-403) in 'highest' precision."""
    return jnp.einsum("xbij,xbjk->xbik", lrow, lrow, precision=precision,
                      preferred_element_type=lrow.dtype)


def _jpass(y, masks, npg, L):
    m_j0_in, m_j0_wr, m_j3_in, m_j3_wr = masks
    sj = npg * npg - npg + 1
    return (y
            + m_j0_in * _shift_down(y, sj)
            + m_j0_wr * _shift_up(y, L - sj)
            + m_j3_in * _shift_up(y, sj)
            + m_j3_wr * _shift_down(y, L - sj))


def _ipass_w(t_up, t_c, t_dn, w, npg, dt):
    """i-direction edge sum of the j-assembled field + inverse-mass
    multiply.  The partner rows sit at fixed small offsets inside the
    NEIGHBOR rows: center row r with i=0 (p < npg) pairs with t_up's row
    r + npg(npg−1) (the up-neighbor's i=np−1 row of the same element
    column and j), and i=np−1 rows with t_dn's row r − npg(npg−1) — so
    the whole pass is two masked ±12-row shifts (np=4), no concatenated
    3-row window ever materializes."""
    rows = t_c.shape[0]
    p = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % (npg * npg)
    m_i0 = (p < npg).astype(dt)
    m_i3 = (p >= npg * (npg - 1)).astype(dt)
    s = npg * (npg - 1)
    return (t_c + m_i0 * _shift_up(t_up, s)
            + m_i3 * _shift_down(t_dn, s)) * w


def _rowchain_bridge_in_kernel(l_ref, q_ref, t_ref, *, precision, gb, gn,
                               npg):
    dt = q_ref.dtype
    L = gb * gn
    apply_all = _make_apply(l_ref, gb, gn, precision, dt)
    masks = _masks_j(L, npg, L, dt)
    t_ref[...] = _jpass(apply_all(q_ref[...]), masks, npg, L)


def _rowchain_step_kernel(l_ref, w_ref, tu_ref, tc_ref, td_ref, out_ref, *,
                          precision, gb, gn, npg, precomposed=False):
    dt = tc_ref.dtype
    L = gb * gn
    fused = _make_fused_apply(l_ref, gb, gn, precision, dt,
                              precomposed=precomposed)
    d = _ipass_w(tu_ref[...], tc_ref[...], td_ref[...], w_ref[0], npg, dt)
    out_ref[...] = _jpass(fused(d), _masks_j(L, npg, L, dt), npg, L)


def _rowchain_bridge_out_kernel(l_ref, w_ref, tu_ref, tc_ref, td_ref,
                                out_ref, *, precision, gb, gn, npg):
    dt = tc_ref.dtype
    apply_all = _make_apply(l_ref, gb, gn, precision, dt)
    out_ref[...] = apply_all(
        _ipass_w(tu_ref[...], tc_ref[...], td_ref[...], w_ref[0], npg, dt)
    )


def _rowchain_stepk_blocked_kernel(*refs, precision, gb, gn, npg, bi, k,
                                   precomposed=False):
    """k chained t-steps per invocation over Bi owned element rows — the
    one kernel behind the k=1 spatially-blocked step and its temporal
    k=2/3/4 deepenings (they were three hand-specialized kernels through
    round 4; same algebra, same memo order, float-identical).

    Ref layout (positional, mirroring the in_specs the call builders
    construct): 2(k-1)+1 operator refs (k-1 one-row halo refs per side
    around the Bi-row center block), the same count of weight refs, then
    2k+1 t refs (k one-row halo refs per side around the Bi-row center),
    then out.

    Traffic/validity: read Bi+2k t rows, write Bi — each in-kernel step
    consumes one halo row per side (the deep-halo argument of the k-step
    chains).  Level-m intermediate rows t^(m)_j are valid for j in
    [-(k-m), Bi+k-m-1] and need operators at the same j, hence the k-1
    operator halo refs per side.  Motivation: the round-3 DMA
    decomposition (scripts/dss2d_rowchain_probe.py) measured the
    unblocked step >95% memory-bound at the ~570 GB/s streaming ceiling,
    so per-owned-row-step traffic ((2Bi+2k) t rows + (Bi+2(k-1)) operator
    blocks per k·Bi row-steps) is the lever; with the precomposed-A² step
    the MXU half no longer masks the k=3→4 DMA saving.

    Each row is processed as a row-sized value (never a concatenated
    multi-row array — the resident form's 3456-row window values are what
    crashed Mosaic at production); intermediate rows are memoized helper
    values retired by Mosaic's SSA liveness after their last consumer, so
    at most ~3 rows per level are live."""
    nl = 2 * (k - 1) + 1
    l_refs = refs[:nl]
    w_refs = refs[nl:2 * nl]
    t_refs = refs[2 * nl:2 * nl + 2 * k + 1]
    out_ref = refs[2 * nl + 2 * k + 1]
    c_ref = t_refs[k]
    dt = c_ref.dtype
    L = gb * gn
    masks = _masks_j(L, npg, L, dt)
    lc = k - 1  # center-block index in l_refs/w_refs

    def t_row(j):
        if j < 0:
            return t_refs[k + j][...]
        if j >= bi:
            return t_refs[k + 1 + j - bi][...]
        return c_ref[j * L:(j + 1) * L]

    def ops_w(j):
        if j < 0:
            return l_refs[lc + j], 0, w_refs[lc + j][0]
        if j >= bi:
            o = lc + 1 + j - bi
            return l_refs[o], 0, w_refs[o][0]
        return l_refs[lc], j, w_refs[lc][j]

    def fused_step(j, row_of):
        l_ref, row, w = ops_w(j)
        fused = _make_fused_apply(l_ref, gb, gn, precision, dt, row=row,
                                  precomposed=precomposed)
        d = _ipass_w(row_of(j - 1), row_of(j), row_of(j + 1), w, npg, dt)
        return _jpass(fused(d), masks, npg, L)

    row_of = t_row
    for _ in range(k - 1):
        prev, memo = row_of, {}

        def row_of(j, prev=prev, memo=memo):
            if j not in memo:
                memo[j] = fused_step(j, prev)
            return memo[j]

    for r in range(bi):
        out_ref[r * L:(r + 1) * L] = fused_step(r, row_of)


# The Mosaic scoped-VMEM limit defaults to 16 MB on a chip with 128 MB of
# VMEM; the blocked kernels request a higher limit explicitly
# (CompilerParams.vmem_limit_bytes) instead of shrinking their geometry to
# the default — round 2 treated the 16 MB default as a hard wall (every
# "scoped-VMEM OOM" skip in results/), which it is not.  Budgets below are
# sized so 2x double-buffered windows + the kernel value stack stay well
# under the requested limit.
#   100 MB (of the v5e's 128 MB VMEM): the k=4/bi=5 production rowchain
#   (21.9 MB predicate live set) crashes the Mosaic compile helper at the
#   round-3 64 MB request and compiles + runs at 100 MB (measured round 4:
#   878.9 µs/step verified, vs 924.3 at k=3) — Mosaic's real accounting
#   (double-buffered windows + per-level value stack) runs ~3-4.6× the
#   predicate, which is what the 24 MB budget in step_budget_ok encodes.
VMEM_LIMIT = int(os.environ.get("CDK_DSS2D_VMEM_MB", "120")) * 2**20

# Temporal-blocking request cap for the rowchain loop forms; each k is
# still gated by step_budget_ok at the actual geometry.  Env overrides
# (KMAX, VMEM_MB) are probe hooks for A/B-ing depths on the real chip.
ROWCHAIN_KMAX = int(os.environ.get("CDK_ROWCHAIN_KMAX", "4"))


def step_budget_ok(k: int, bi: int, row_b: int) -> bool:
    """Live-set budget gate for the temporal k-step blocked rowchain:
    (bi+2k) input t rows + bi output rows + bi operator blocks + ~(6(k-1))
    intermediate rows, all (L, ncol_blk) of row_b bytes, admitted while
    under STEP_BUDGET (default 36 MB) for kernels compiled at the
    VMEM_LIMIT request (default 120 MB).  The budget encodes the measured
    ~3-4.6× gap between this predicate and Mosaic's real accounting
    (double-buffered windows + per-level value stack) against the round-4
    VMEM frontier: it admits exactly the measured-feasible set (k<=3 at
    bi=15 — 35.4 MB predicate, runs at the 120 MB request — and k<=4 at
    bi=5 — 21.9 MB), and excludes the geometries measured to crash the
    Mosaic compile helper (bi=15/k=4: 38.8 MB; see the STEP_BUDGET
    comment below).  Single source of truth shared by this kernel's
    per-depth gates and the dist loop's bi_d selection
    (dist/biharmonic.py) so the two cannot drift apart."""
    return bi > 1 and (3 * bi + 6 * k) * row_b <= STEP_BUDGET


# Round-4 VMEM frontier at production (75x72, ncol_blk=128, all legs
# driver-verified; results/tpu-v5e/dss2d-bi15-20260820.txt):
#   bi=5 /k=4 @100 MB  878.9 us/step   (predicate 21.9 MB)
#   bi=15/k=3 @120 MB  851.2           (35.4 MB)  <- production default
#   bi=15/k=4 @120 MB  Mosaic helper crash (38.8 MB — past the frontier)
# The 36 MB budget encodes that frontier: it admits k<=3 at bi=15 and
# k<=4 at bi=5, and excludes exactly the geometries measured to crash.
STEP_BUDGET = int(os.environ.get("CDK_DSS2D_BUDGET_MB", "36")) * 2**20
BI_CAP = int(os.environ.get("CDK_DSS2D_BI_CAP", "15"))


def _pick_bi(ex, L, ncol_blk, itemsize, budget=None, cap=None):
    """Largest divisor of ex (<= cap) whose blocked-step live set —
    (Bi+2) input rows + Bi output rows + Bi operator blocks + ~5 temp rows,
    all (L, ncol_blk), double-buffered windows included via the margin —
    fits the budget (vs the VMEM_LIMIT the kernel requests)."""
    budget = STEP_BUDGET if budget is None else budget
    cap = BI_CAP if cap is None else cap
    row = L * ncol_blk * itemsize
    for bi in range(cap, 1, -1):
        if ex % bi == 0 and (3 * bi + 7) * row <= budget:
            return bi
    return 1


def _rowchain_calls(cfg, precision, interpret, precomposed=False):
    """Build the rowchain pallas calls.  The *_padded entry points derive
    their grid from the operand shapes at trace time, so they run
    unchanged inside shard_map on local (ex/pi) rows with ppermuted halo
    padding.  The blocked single-chip steps ("step_t" when bi > 1,
    "step2_t") are GLOBAL-ONLY: their mod-ex wrap indices bake in the
    full torus row count — dist callers must use the padded forms
    (step_t_padded / step2_padded_factory).

    With `precomposed`, the STEP calls expect the squared operator
    (precompose_operator(lrow)) as their lrow operand and run one bd8
    application per t-step; the bridge calls keep the plain operator."""
    ex, ey = torus_shape(cfg.nelemd)
    g = 8
    while ey % g:
        g -= 1
    gb, gn, npg = ey // g, g * cfg.npts, cfg.np_gll
    L = gb * gn
    ncol0 = cfg.ncol
    ncol = -(-ncol0 // 128) * 128
    itemsize = cfg.np_dtype(0).itemsize
    ncol_blk = _pick_ncol_blk(3 * gb, gn, ncol, itemsize)
    kw = dict(precision=precision, gb=gb, gn=gn, npg=npg)
    # bridge kernels always run the plain single application; only the
    # t-step kernels take the precomposed flag
    kw_step = dict(kw, precomposed=precomposed)

    lspec = pl.BlockSpec((1, gb, gn, gn), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, L, 1), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    row = lambda off: pl.BlockSpec((L, ncol_blk),
                                   lambda i, c, o=off: (i + o, c),
                                   memory_space=pltpu.VMEM)

    def pad_cols(q2):
        if ncol != ncol0 and q2.shape[1] == ncol0:
            return jnp.pad(q2, ((0, 0), (0, ncol - ncol0)))
        return q2

    def bridge_in(lrow, q2):
        exl = lrow.shape[0]
        return pl.pallas_call(
            functools.partial(_rowchain_bridge_in_kernel, **kw),
            out_shape=jax.ShapeDtypeStruct((exl * L, ncol), q2.dtype),
            grid=(exl, ncol // ncol_blk),
            in_specs=[lspec, row(0)],
            out_specs=row(0),
            interpret=interpret,
        )(lrow, pad_cols(q2))

    def _padded_call(kernel, lrow, wrow, tp, kkw=kw):
        exl = lrow.shape[0]
        return pl.pallas_call(
            functools.partial(kernel, **kkw),
            out_shape=jax.ShapeDtypeStruct((exl * L, ncol), tp.dtype),
            grid=(exl, ncol // ncol_blk),
            in_specs=[lspec, wspec, row(0), row(1), row(2)],
            out_specs=row(0),
            interpret=interpret,
        )(lrow, wrow, tp, tp, tp)

    def step_t_padded(lrow, wrow, tp):
        return _padded_call(_rowchain_step_kernel, lrow, wrow, tp,
                            kkw=kw_step)

    def bridge_out_padded(lrow, wrow, tp):
        return _padded_call(_rowchain_bridge_out_kernel, lrow, wrow, tp)

    def _mod_call(kernel, lrow, wrow, t, kkw=kw):
        # Single-chip form: the torus wrap lives in mod-ex block index
        # maps (the 1-D chain's trick), so the step never materializes
        # the wrap-padded copy of t — wrap_rows costs a full-field
        # read+write per step, ~1/3 of the rowchain's steady-state HBM
        # traffic.  The dist path keeps the *_padded entry points (its
        # halo rows arrive by ppermute, not by wraparound indexing).
        exl = lrow.shape[0]
        rowm = lambda off: pl.BlockSpec(
            (L, ncol_blk), lambda i, c, o=off: ((i + o) % exl, c),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(kernel, **kkw),
            out_shape=jax.ShapeDtypeStruct((exl * L, ncol), t.dtype),
            grid=(exl, ncol // ncol_blk),
            in_specs=[lspec, wspec, rowm(-1), rowm(0), rowm(1)],
            out_specs=row(0),
            interpret=interpret,
        )(lrow, wrow, t, t, t)

    def step_t(lrow, wrow, t):
        return _mod_call(_rowchain_step_kernel, lrow, wrow, t, kkw=kw_step)

    def bridge_out(lrow, wrow, t):
        return _mod_call(_rowchain_bridge_out_kernel, lrow, wrow, t)

    bi = _pick_bi(ex, L, ncol_blk, itemsize)
    row_b = L * ncol_blk * itemsize

    def _cparams_for(bi_, kk):
        # Size the scoped-VMEM request to the geometry ACTUALLY compiled
        # (bi_ owned rows, kk chained steps — dist callers pass bi_d<=8
        # and per-precision kk, not the single-chip worst case): only
        # live sets past the old 24 MB predicate budget need the 120 MB
        # unlock — a blanket 120 MB request costs ~7% at the shipped
        # size (measured 15.9 vs 17.1 µs/step, sq_x3, iters=50), where
        # Mosaic otherwise buffers more aggressively than the tiny
        # problem wants.
        need = (3 * bi_ + 6 * kk) * row_b
        return pltpu.CompilerParams(
            vmem_limit_bytes=(VMEM_LIMIT if need > 24 * 2**20
                              else min(VMEM_LIMIT, 64 * 2**20)))

    def stepk_blocked(kk):
        """Temporal-k spatially-blocked step call: Bi owned rows per grid
        cell, kk halo t rows and kk-1 operator halo blocks per side as
        separate one-row refs (mod-ex wrap in the index maps, like
        _mod_call).  Each kk is gated by step_budget_ok at the caller."""
        nl = 2 * (kk - 1) + 1
        cparams = _cparams_for(bi, kk)
        lrow1 = lambda o: pl.BlockSpec(
            (1, gb, gn, gn), lambda i, c, o=o: ((i * bi + o) % ex, 0, 0, 0),
            memory_space=pltpu.VMEM)
        w1 = lambda o: pl.BlockSpec(
            (1, L, 1), lambda i, c, o=o: ((i * bi + o) % ex, 0, 0),
            memory_space=pltpu.VMEM)
        trow = lambda o: pl.BlockSpec(
            (L, ncol_blk), lambda i, c, o=o: ((i * bi + o) % ex, c),
            memory_space=pltpu.VMEM)
        in_specs = (
            [lrow1(o) for o in range(-(kk - 1), 0)]
            + [pl.BlockSpec((bi, gb, gn, gn), lambda i, c: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)]
            + [lrow1(bi + o) for o in range(kk - 1)]
            + [w1(o) for o in range(-(kk - 1), 0)]
            + [pl.BlockSpec((bi, L, 1), lambda i, c: (i, 0, 0),
                            memory_space=pltpu.VMEM)]
            + [w1(bi + o) for o in range(kk - 1)]
            + [trow(o) for o in range(-kk, 0)]
            + [pl.BlockSpec((bi * L, ncol_blk), lambda i, c: (i, c),
                            memory_space=pltpu.VMEM)]
            + [trow(bi + o) for o in range(kk)]
        )

        def call(lrow, wrow, t):
            return pl.pallas_call(
                functools.partial(_rowchain_stepk_blocked_kernel, bi=bi,
                                  k=kk, **kw_step),
                out_shape=jax.ShapeDtypeStruct((ex * L, ncol), t.dtype),
                grid=(ex // bi, ncol // ncol_blk),
                in_specs=in_specs,
                out_specs=pl.BlockSpec((bi * L, ncol_blk),
                                       lambda i, c: (i, c),
                                       memory_space=pltpu.VMEM),
                compiler_params=cparams,
                interpret=interpret,
            )(*([lrow] * nl + [wrow] * nl + [t] * (2 * kk + 1)))

        return call

    def stepk_padded_factory(kk, bi_d, padded_out=False):
        """Padded k-step for the dist loop: t padded with
        P = bi_d·ceil(kk/bi_d) rows per side (innermost kk valid,
        ppermuted), lrow/w2 padded likewise with the innermost kk-1 rows
        valid (the halo-level intermediate rows need the NEIGHBOR shard's
        operators).  P keeps the center blocks aligned to bi_d-row block
        units; the outer pad rows are zeros and never read.  Index maps
        are offset, not mod — the torus wrap rides the ppermute like the
        other *_padded entry points.

        padded_out=True writes the owned rows INTO the same padded
        ((exl+2P)*L, ncol) shape (halo rows left unwritten) so the dist
        loop can CARRY the padded layout and refresh only the 2*kk halo
        rows per call — removing the whole-field _padk_t concat per call
        (round-5 padded-carry form; round5-summary §10)."""
        kw_d = dict(kw_step, bi=bi_d, k=kk)
        nl = 2 * (kk - 1) + 1
        cparams = _cparams_for(bi_d, kk)
        pn = -(-kk // bi_d)  # pad blocks per side
        P = pn * bi_d

        def call(lrow_p, wrow_p, tp):
            exl = lrow_p.shape[0] - 2 * P
            lrow1 = lambda o: pl.BlockSpec(
                (1, gb, gn, gn),
                lambda i, c, o=o: (P + i * bi_d + o, 0, 0, 0),
                memory_space=pltpu.VMEM)
            w1 = lambda o: pl.BlockSpec(
                (1, L, 1), lambda i, c, o=o: (P + i * bi_d + o, 0, 0),
                memory_space=pltpu.VMEM)
            trow = lambda o: pl.BlockSpec(
                (L, ncol_blk), lambda i, c, o=o: (P + i * bi_d + o, c),
                memory_space=pltpu.VMEM)
            cblk = lambda shp: pl.BlockSpec(
                shp, lambda i, c: ((i + pn,) + (0,) * (len(shp) - 1)),
                memory_space=pltpu.VMEM)
            in_specs = (
                [lrow1(o) for o in range(-(kk - 1), 0)]
                + [cblk((bi_d, gb, gn, gn))]
                + [lrow1(bi_d + o) for o in range(kk - 1)]
                + [w1(o) for o in range(-(kk - 1), 0)]
                + [cblk((bi_d, L, 1))]
                + [w1(bi_d + o) for o in range(kk - 1)]
                + [trow(o) for o in range(-kk, 0)]
                + [pl.BlockSpec((bi_d * L, ncol_blk),
                                lambda i, c: (i + pn, c),
                                memory_space=pltpu.VMEM)]
                + [trow(bi_d + o) for o in range(kk)]
            )
            if padded_out:
                out_shape = jax.ShapeDtypeStruct(
                    ((exl + 2 * P) * L, ncol), tp.dtype)
                out_spec = pl.BlockSpec((bi_d * L, ncol_blk),
                                        lambda i, c: (i + pn, c),
                                        memory_space=pltpu.VMEM)
            else:
                out_shape = jax.ShapeDtypeStruct((exl * L, ncol),
                                                 tp.dtype)
                out_spec = pl.BlockSpec((bi_d * L, ncol_blk),
                                        lambda i, c: (i, c),
                                        memory_space=pltpu.VMEM)
            return pl.pallas_call(
                functools.partial(_rowchain_stepk_blocked_kernel, **kw_d),
                out_shape=out_shape,
                grid=(exl // bi_d, ncol // ncol_blk),
                in_specs=in_specs,
                out_specs=out_spec,
                compiler_params=cparams,
                interpret=interpret,
            )(*([lrow_p] * nl + [wrow_p] * nl + [tp] * (2 * kk + 1)))

        return call

    # temporal k-step deepenings: k halo rows per side; each depth's live
    # set ((bi+2k) t refs + (bi+2(k-1)) operator blocks + out + ~3 rows
    # per intermediate level) is gated by the shared budget predicate.
    # Depth k trades DMA (t-halo amortization) for MXU (halo-level
    # recompute: (k+1)(bi+k)/2 fused applies per k·bi row-steps — 8 vs 7
    # applies/step at k=4 vs 3, bi=5), so k=4 pays ONLY where the apply
    # is cheap — the precomposed-A² bf16x3 form (measured production:
    # sq_x3 925→879 µs/step, but sq 'highest' 1206→1474 REGRESSION);
    # every other form caps at k=3.
    kmax = (ROWCHAIN_KMAX if precomposed and precision == "bf16x3"
            else min(ROWCHAIN_KMAX, 3))
    steps_k = {1: stepk_blocked(1) if bi > 1 else step_t}
    for kk in range(2, kmax + 1):
        if step_budget_ok(kk, bi, row_b):
            steps_k[kk] = stepk_blocked(kk)

    calls = {
        "bridge_in": bridge_in,
        "step_t": steps_k[1],
        "step2_t": steps_k.get(2),
        "step3_t": steps_k.get(3),
        "steps_k": steps_k,
        "bridge_out": bridge_out,
        "step_t_padded": step_t_padded,
        "bridge_out_padded": bridge_out_padded,
        "step2_padded_factory": functools.partial(stepk_padded_factory, 2),
        "step3_padded_factory": functools.partial(stepk_padded_factory, 3),
        "stepk_padded_factory": stepk_padded_factory,
        "step_t_unblocked": step_t,
        "bi": bi,
        "ncol_blk": ncol_blk,
        "kmax": kmax,
    }
    return calls, (ex, ey, g, gb, gn, L, ncol, ncol0)


def _rowchain_forms(cfg, precision: str, precomposed: bool = False):
    rr = cfg.np_dtype(cfg.rrearth)
    ex, ey = torus_shape(cfg.nelemd)
    g = 8
    while ey % g:
        g -= 1
    npts, ncol0, npg = cfg.npts, cfg.ncol, cfg.np_gll
    interpret = pallas_interpret()
    calls, geom = _rowchain_calls(cfg, precision, interpret, precomposed)
    bridge_in, step_t, bridge_out = (
        calls["bridge_in"], calls["step_t"], calls["bridge_out"])
    steps_k = calls["steps_k"]
    _, _, _, gb, gn, L, ncol, _ = geom

    def _build(data):
        Lop = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        lbd = blockdiag_group_operator(Lop, g)
        lrow = lbd.reshape(ex, gb, gn, gn)
        w2 = dss2d_weights(data.spheremp, ex, ey).reshape(ex, L, 1)
        return lrow, w2

    @jax.jit
    def prepare(data: BiharmonicData):
        return _build(data)

    def _q2(qtens):
        return to_lane_layout(qtens).reshape(ex * L, ncol0)

    def _from_q2(q2):
        return from_lane_layout(
            q2[:, :ncol0].reshape(cfg.nelemd, npts, ncol0), cfg)

    @jax.jit
    def step(aux, data: BiharmonicData) -> jnp.ndarray:
        lrow, w2 = aux
        t = bridge_in(lrow, _q2(data.qtens))
        return _from_q2(bridge_out(lrow, w2, t))

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data: BiharmonicData, n: int) -> jnp.ndarray:
        lrow, w2 = _build(data)
        # precomposed: the t-step kernels apply the squared operator ONCE
        # per step (the step's two applications are adjacent in the
        # t-carry dataflow); bridges keep the plain operator
        lstep = precompose_operator(lrow) if precomposed else lrow
        t = bridge_in(lrow, _q2(data.qtens))
        nt = max(n - 1, 0)
        # deepest available temporal block first, remainders with the
        # shallower depths (each depth is a distinct compiled kernel)
        for kk in sorted((k for k in steps_k if k > 1), reverse=True):
            if nt >= kk:
                t, _ = jax.lax.scan(
                    lambda tt, _, s=steps_k[kk]: (s(lstep, w2, tt), None),
                    t, None, length=nt // kk, unroll=2)
                nt %= kk
        if nt:
            t, _ = jax.lax.scan(
                lambda tt, _: (step_t(lstep, w2, tt), None), t, None,
                length=nt)
        return _from_q2(bridge_out(lrow, w2, t))

    return {"prepare": prepare, "step": step, "loop": loop}


@register(
    "biharmonic_dss2d",
    "fused_operator_rowchain",
    "t-carry rowchain: carry the j-assembled first-apply output between "
    "steps so each fused kernel needs only row-local windows (production-"
    "scale; loop steps run spatially BLOCKED — Bi owned rows + 1 halo row "
    "per side per grid cell, cutting the memory-bound steady state 1.29x: "
    "2484 -> 1931 us/step at production, probe-decomposed as >95% DMA; "
    "'highest' dots)",
)
def make_dss2d_rowchain(cfg):
    return _rowchain_forms(cfg, "highest")


@register(
    "biharmonic_dss2d",
    "fused_operator_rowchain_x3",
    "t-carry rowchain with manual 3-pass bf16 f32-emulation dots (loop "
    "steps spatially blocked like fused_operator_rowchain)",
    supports_f64=False,
    verify_tol=5e-5,  # bf16x3 compounding over the chained applications
)
def make_dss2d_rowchain_x3(cfg):
    return _rowchain_forms(cfg, "bf16x3")


@register(
    "biharmonic_dss2d",
    "fused_operator_rowchain_sq",
    "rowchain with the PRECOMPOSED squared operator: the t-carry step's "
    "two adjacent bd8 applications (t' = jp(A(A(ip(t)w)))) collapse into "
    "one apply of A² (computed once at prepare, same shape/traffic) — "
    "half the per-step MXU passes.  Roofline: the blocked k=3 step's "
    "measured 1196 us/step ~ 750 us DMA bound + 485 us x3-MXU with no "
    "overlap; A² puts the MXU half at 243 us ('highest' here: 970 -> "
    "485 us).  Caps at the k=3 temporal block: the deeper k=4's halo "
    "recompute regresses the MXU-heavier 'highest' apply (measured "
    "1206 -> 1474 us/step at production)",
)
def make_dss2d_rowchain_sq(cfg):
    return _rowchain_forms(cfg, "highest", precomposed=True)


@register(
    "biharmonic_dss2d",
    "fused_operator_rowchain_sq_x3",
    "precomposed-A² rowchain with 3-pass bf16 f32-emulation dots (see "
    "fused_operator_rowchain_sq; the production MXU floor halves to "
    "~243 us/step).  Production champion: 851-867 us/step verified at "
    "the bi=15/k=3 VMEM-frontier geometry (was 879 at bi=5/k=4, 925 at "
    "bi=5/k=3, 1540 pre-A²)",
    supports_f64=False,
    verify_tol=5e-5,  # bf16x3 compounding over the chained applications
)
def make_dss2d_rowchain_sq_x3(cfg):
    return _rowchain_forms(cfg, "bf16x3", precomposed=True)

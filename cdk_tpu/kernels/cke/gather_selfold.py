"""Sign-folded single-accumulator CKE gather: one FMA per gathered row.

The champion `gather_peradv` consumes every gathered tracer row TWICE —
once into the 2nd-order accumulator s1 and once into the 3rd-order s3 —
because the reference's weight (nested.F90:533-552)

    w(e,i,k) = ntf·advMask · (advCoefs(i,e) + coef3rdOrder·advCoefs3rd(i,e)
                              · sign(1, ntf(k,e)))

couples a per-(e,i) coefficient pair with a per-(e,k) sign.  But the sign
only ever takes two values, so the coefficient pair collapses to a
per-(e,i) PRECOMBINED pair selected per (e,k):

    cp(e,i) = c1 + C·c3          (used where ntf ≥ 0)
    cm(e,i) = c1 − C·c3          (used where ntf < 0)
    flx(e,k) = ntf·advMask · Σ_i select(ntf ≥ 0, cp_i, cm_i) · T[cells_i]

This is BIT-identical arithmetic to the reference's per-term value
(fl(c1 ± fl(C·c3)) is exactly what fl(c1 + fl(C·c3)·(±1)) computes — a sign
flip is exact), while halving the accumulator work: ONE running sum of
shape (nedges, nvert) instead of two, each gathered row used once.

MEASURED NULL RESULT (TPU v5e, round 3): 755.9 µs/iter shipped and
7.439 ms/iter production vs gather_peradv's 750.4 µs / 7.436 ms — a dead
heat at both scales.  XLA already fuses both accumulator chains into the
gather consumers, so the two-accumulator form pays no extra HBM traffic;
the random-row gather issue rate is 100% of the cost, confirming round 2's
floor analysis (results/tpu-v5e/round2-summary.txt "gather design space").
Kept registered as an exact same-speed design point: it documents that
accumulator-count reduction is NOT a lever on this kernel.

cp/cm are built once, untimed, in `prepare` — the analog of the reference's
untimed staging (nested.F90:400-403); they are the same (nedges, nadv) size
as the coefficient inputs they replace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cdk_tpu.core.registry import register
from cdk_tpu.kernels.cke.problem import CkeData


def edge_flux_selfold(adv_cells, cp, cm, tracer, cell_mask, ntf, adv_mask):
    t = tracer * cell_mask
    e, a = adv_cells.shape
    pos = ntf >= 0  # (nedges, nvert) — Fortran sign(1,·): +1 at ±0
    s = jnp.zeros(ntf.shape, t.dtype)
    for i in range(a):  # static unroll over contributing-cell slots
        g = jnp.take(t, adv_cells[:, i], axis=0)  # (nedges, nvert)
        coef = jnp.where(pos, cp[:, i:i + 1], cm[:, i:i + 1])
        s = s + coef * g
    return ntf * adv_mask * s


@register(
    "cke",
    "gather_selfold",
    "sign-folded per-slot gathers: the per-(e,k) sign select moved into a "
    "precombined coefficient pair so each gathered row feeds ONE "
    "accumulator (half of gather_peradv's accumulator traffic), exact "
    "arithmetic",
)
def make_gather_selfold(cfg):
    c3 = cfg.np_dtype(cfg.coef3rdorder)

    def prepare(data: CkeData):
        return (data.adv_coefs + c3 * data.adv_coefs3,
                data.adv_coefs - c3 * data.adv_coefs3)

    @jax.jit
    def step2(aux, data: CkeData) -> jnp.ndarray:
        cp, cm = aux
        return edge_flux_selfold(
            data.adv_cells, cp, cm, data.tracer, data.cell_mask, data.ntf,
            data.adv_mask,
        )

    return prepare, step2

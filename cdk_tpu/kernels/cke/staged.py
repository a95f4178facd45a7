"""Staged-gather CKE variant: XLA does the irregular gather ONCE into a
stacked (nAdv, nedges, K) buffer; a Pallas kernel consumes it in a single
fused pass.

Why this split wins over `gather_peradv` (the round-1 best exact form):
in the fused XLA graph each of the 10 per-slot gathers feeds TWO running
accumulators (s1, s3), so every slot costs a gather-read PLUS two
read-modify-write sweeps of (E, K) — ~3x the slot's useful traffic.  Here
the gather writes each slot's rows exactly once (no accumulator traffic),
and the Pallas consumer reads the staged buffer exactly once, keeping both
accumulators in VMEM registers: total HBM traffic ≈ gather-writes (1x E·A·K)
+ consumer reads (1x E·A·K + edge fields) — the form's bandwidth floor.

Accumulation runs in slot order i = 0..nAdv-1 inside the consumer —
identical arithmetic to the Fortran inner loop (nested.F90:533-552), so
the variant verifies at the exact tier.

Production note: the staged buffer is E·A·K·4 B (1.3 GB at the production
preset) — this variant is registered for miniapp-scale runs; production
stays on `gather_peradv` (the registry keeps both honest, the reference's
own N-forms discipline).
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


def _consumer(c1_ref, c3_ref, ntf_ref, advm_ref, *rest, coef3):
    *g_refs, out_ref = rest
    dt = out_ref.dtype
    c1 = c1_ref[...]
    c3 = c3_ref[...]
    s1 = jnp.zeros(out_ref.shape, dt)
    s3 = jnp.zeros(out_ref.shape, dt)
    for i, g_ref in enumerate(g_refs):  # slot order (exactness contract)
        g = g_ref[...]
        s1 = s1 + c1[:, i:i + 1] * g
        s3 = s3 + c3[:, i:i + 1] * g
    ntf = ntf_ref[...]
    sgn = jnp.where(ntf >= 0, jnp.asarray(1, dt), jnp.asarray(-1, dt))
    out_ref[...] = ntf * advm_ref[...] * (s1 + coef3 * s3 * sgn)


@functools.partial(jax.jit,
                   static_argnames=("coef3", "edge_block", "interpret"))
def _run(adv_cells, adv_coefs, adv_coefs3, tracer, cell_mask, ntf, adv_mask,
         coef3, edge_block, interpret):
    e, a = adv_cells.shape
    c, kv = tracer.shape
    t = tracer * cell_mask
    # stage: one 1-D-indexed gather per slot (the fastest XLA gather form),
    # each fed to the consumer as its OWN input — measured: a slot-major
    # single flat gather costs 1136 us and jnp.stack-of-gathers 863 us
    # (the stack is an extra full materialization); separate buffers write
    # each gathered row exactly once with no restacking
    gs = [jnp.take(t, adv_cells[:, i], axis=0) for i in range(a)]
    eb = min(edge_block, e)
    assert e % eb == 0
    eblk = lambda d: pl.BlockSpec((eb, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_consumer, coef3=coef3),
        out_shape=jax.ShapeDtypeStruct((e, kv), t.dtype),
        grid=(e // eb,),
        in_specs=[eblk(a), eblk(a), eblk(kv), eblk(kv)]
        + [eblk(kv) for _ in range(a)],
        out_specs=eblk(kv),
        interpret=interpret,
    )(adv_coefs, adv_coefs3, ntf, adv_mask, *gs)


@register(
    "cke",
    "staged_consume",
    "XLA per-slot gathers staged once into (nAdv, E, K) + single-pass "
    "Pallas consumer with VMEM-register accumulators (exact; cuts the "
    "accumulator round-trips the fused XLA form pays)",
)
def make_staged_consume(cfg):
    c3 = float(cfg.coef3rdorder)
    interpret = pallas_interpret()
    # staging applicability: the (nAdv, E, Kpad) gather buffer plus XLA's
    # per-slot gather temporaries OOM the chip at the production 256k-edge
    # size (measured RESOURCE_EXHAUSTED); typed skip past ~512 MiB staged
    kpad = -(-cfg.nvertlevels // 128) * 128
    if cfg.nadv * cfg.nedges * kpad * 4 > 512 * 2**20:
        from cdk_tpu.core.registry import UnsupportedConfigError

        raise UnsupportedConfigError(
            f"staged_consume: (nAdv, E, K) staging would be "
            f"{cfg.nadv * cfg.nedges * kpad * 4 / 2**30:.2f} GiB; "
            f"use gather_peradv at this scale"
        )

    @jax.jit
    def step(data: CkeData) -> jnp.ndarray:
        e = data.ntf.shape[0]
        eb = e
        for cand in (512, 256, 128, 64, 32, 16, 8):
            if e % cand == 0 and cand <= e:
                eb = cand
                break
        return _run(
            data.adv_cells, data.adv_coefs, data.adv_coefs3, data.tracer,
            data.cell_mask, data.ntf, data.adv_mask, c3, eb, interpret,
        )

    return step

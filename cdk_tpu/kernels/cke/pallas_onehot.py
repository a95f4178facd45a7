"""Fused Pallas CKE kernel: connectivity one-hot built in VMEM, applied on
the MXU, nothing dense ever touching HBM.

Relation to the other variants (the reference ships N forms of this kernel,
nested.F90:191-439; we do the same TPU-natively):

  - `reference_jnp` gathers tracer columns with an XLA gather (form-1/2
    analog).
  - `onehot_mxu` prebuilds dense (nedges × ncells) connectivity matrices in
    HBM; each iteration then streams ~2 × 287 MB through the MXU — compute-
    dense but bandwidth-bound at scale.
  - THIS kernel rebuilds the one-hot weights per edge-block inside VMEM each
    iteration from the raw (edge, i) → cell indices (1 MB total), so per-
    iteration HBM traffic is just the small physical arrays.  It is the
    analog of cke_impl2's team-scratch staging (cke_impl2.cpp:21-64): the
    per-edge-block working set (two (EB, ncells) weight tiles + the whole
    masked tracer field) lives in VMEM scratch for the duration of the
    block.

Per-program VMEM at f32, EB=128, shipped size (ncells=2800, nvert=100):
  2 × (128, 2800) weights ≈ 2.9 MB, tracer+mask (2800, 100) ≈ 2.2 MB,
  in/out edge tiles ≈ 0.2 MB — comfortably resident.

Scaling envelope: the in-kernel one-hot build costs O(nedges · ncells ·
nadv) VPU compares per ITERATION, independent of the useful gather work
O(nedges · nadv · nvert). It wins at miniapp cell counts (≤ a few thousand
cells: measured 0.85–1.5 ms vs 1.7 ms XLA gather at the shipped
nested.nml size) and loses badly at production ncells=28000 (measured
143 ms vs 17.8 ms gather) — there the XLA-gather reference variant is the
right production form, and the registry keeps both honest.

The one-hot build is A (=nAdv) unrolled VPU select-accumulate passes over
(EB, ncells); the apply is one stacked (2·EB, ncells) @ (ncells, nvert)
MXU matmul.
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


def _kernel(cells_ref, c1_ref, c3_ref, ntf_ref, advm_ref, t_ref, mask_ref,
            out_ref, acc_ref, *, coef3rdorder, precision, cell_block):
    """Grid (edge_blocks, cell_blocks), cell blocks innermost: each step
    builds the one-hot weights for its (EB, CB) window and accumulates the
    partial matmul into VMEM scratch; the last cell block applies the edge
    factors and writes out.  Cell blocking bounds VMEM at production ncells
    (28k cells would need 2x14 MB of weights unblocked)."""
    cj = pl.program_id(1)
    ncb = pl.num_programs(1)
    cells = cells_ref[...]            # (EB, A) int32
    t = t_ref[...] * mask_ref[...]    # (CB, K) masked tracer block
    dt = t.dtype
    eb, a = cells.shape

    base = cj * cell_block
    cell_ids = base + jax.lax.broadcasted_iota(
        jnp.int32, (eb, cell_block), 1
    )
    w1 = jnp.zeros((eb, cell_block), dt)
    w3 = jnp.zeros((eb, cell_block), dt)
    c1 = c1_ref[...]
    c3 = c3_ref[...]
    for i in range(a):  # static unroll over contributing cells
        eq = cell_ids == cells[:, i:i + 1]
        w1 = w1 + jnp.where(eq, c1[:, i:i + 1], jnp.asarray(0, dt))
        w3 = w3 + jnp.where(eq, c3[:, i:i + 1], jnp.asarray(0, dt))

    partial = jnp.dot(
        jnp.concatenate([w1, w3], axis=0), t, preferred_element_type=dt,
        precision=precision,
    )

    @pl.when(cj == 0)
    def _():
        acc_ref[...] = partial

    @pl.when(cj > 0)
    def _():
        acc_ref[...] = acc_ref[...] + partial

    @pl.when(cj == ncb - 1)
    def _():
        s = acc_ref[...]
        s1, s3 = s[:eb], s[eb:]
        ntf = ntf_ref[...]
        sgn = jnp.where(ntf >= 0, jnp.asarray(1, dt), jnp.asarray(-1, dt))
        out_ref[...] = ntf * advm_ref[...] * (
            s1 + coef3rdorder * s3 * sgn
        )


@functools.partial(
    jax.jit,
    static_argnames=("coef3rdorder", "edge_block", "cell_block", "interpret",
                     "precision"),
)
def _run(adv_cells, adv_coefs, adv_coefs3, tracer, cell_mask, ntf, adv_mask,
         coef3rdorder, edge_block, interpret, precision="highest",
         cell_block=4096):
    e, a = adv_cells.shape
    c, kv = tracer.shape
    eb = min(edge_block, e)
    assert e % eb == 0, f"nedges={e} not divisible by edge block={eb}"
    cb = min(cell_block, c)
    ncb = -(-c // cb)
    cp = ncb * cb
    if cp != c:  # zero-pad cells (padded cells match no adv index)
        tracer = jnp.pad(tracer, ((0, cp - c), (0, 0)))
        cell_mask = jnp.pad(cell_mask, ((0, cp - c), (0, 0)))

    eblk = lambda d1: pl.BlockSpec((eb, d1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
    cblk = pl.BlockSpec((cb, kv), lambda i, j: (j, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, coef3rdorder=coef3rdorder,
                          precision=precision, cell_block=cb),
        out_shape=jax.ShapeDtypeStruct((e, kv), tracer.dtype),
        grid=(e // eb, ncb),
        in_specs=[
            eblk(a),            # adv_cells
            eblk(a),            # adv_coefs
            eblk(a),            # adv_coefs3
            eblk(kv),           # ntf
            eblk(kv),           # adv_mask
            cblk,               # tracer cell block
            cblk,               # cell_mask cell block
        ],
        out_specs=eblk(kv),
        scratch_shapes=[pltpu.VMEM((2 * eb, kv), tracer.dtype)],
        interpret=interpret,
    )(adv_cells, adv_coefs, adv_coefs3, ntf, adv_mask, tracer, cell_mask)


def edge_flux_pallas(data: CkeData, coef3rdorder: float,
                     edge_block: int = 128) -> jnp.ndarray:
    return _run(
        data.adv_cells, data.adv_coefs, data.adv_coefs3, data.tracer,
        data.cell_mask, data.ntf, data.adv_mask, float(coef3rdorder),
        edge_block, pallas_interpret(),
    )


def _make_pallas(cfg, precision):
    c3 = float(cfg.coef3rdorder)
    interpret = pallas_interpret()
    # in-kernel one-hot applicability: the kernel keeps the whole
    # (ncells, K) tracer field VMEM-resident and does O(E*C*A) rebuild
    # compares per iteration — the docstring's own measurement shows it
    # losing 8x at production ncells, and at 256k x 28k the run OOMs;
    # typed skip (gather_peradv is the production exact form)
    if cfg.nedges * cfg.ncells > 200_000_000:
        from cdk_tpu.core.registry import UnsupportedConfigError

        raise UnsupportedConfigError(
            f"pallas_onehot: O(nedges*ncells) one-hot rebuild infeasible "
            f"at {cfg.nedges}x{cfg.ncells}; use gather_peradv"
        )

    @jax.jit
    def step(data: CkeData) -> jnp.ndarray:
        return _run(
            data.adv_cells, data.adv_coefs, data.adv_coefs3, data.tracer,
            data.cell_mask, data.ntf, data.adv_mask, c3, 128, interpret,
            precision,
        )

    return step


@register(
    "cke",
    "pallas_onehot",
    "fused Pallas kernel: per-edge-block one-hot connectivity built in VMEM "
    "each iteration + stacked MXU matmul against the VMEM-resident tracer "
    "field (analog of cke_impl2's team-scratch staging)",
)
def make_pallas_onehot(cfg):
    return _make_pallas(cfg, "highest")


@register(
    "cke",
    "pallas_onehot_bf16",
    "fused Pallas one-hot kernel with bf16 MXU passes (speed point)",
    supports_f64=False,
    fast_math=True,
)
def make_pallas_onehot_bf16(cfg):
    return _make_pallas(cfg, "default")

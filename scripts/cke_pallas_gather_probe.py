"""Probe: can Mosaic execute a fast in-kernel row gather for CKE?

Mosaic's only vectorized gather is `tpu.dynamic_gather` via
jnp.take_along_axis with input, indices and output ALL the same 2-D shape
(jax/_src/pallas/mosaic/lowering.py:2465-2524): out[r, l] = x[idx[r, l], l]
— a per-lane sublane gather.  To use it for CKE we pad the cell table to
the edge-block height and broadcast each slot's cell index across lanes.

Strategies at the shipped nested.nml size (25600 edges x 2800 cells x 100
levels, f32), vs gather_peradv's 743 us/iter (round 1):

  A. take  — EB = padded ncells (2816); per block, A unrolled
     take_along_axis gathers of (2816, 128) + FMA accumulate.
  B. rows  — scalar fori_loop of per-(edge,slot) dynamic single-row reads
     (cells/coefs in SMEM); lower bound on scalar-loop overhead, run at a
     reduced edge count.

Each phase runs under its own subprocess timeout in the worker script so a
Mosaic crash cannot wedge the session.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_take(cells_ref, c1_ref, c3_ref, ntf_ref, advm_ref, t_ref,
                 out_ref, *, coef3):
    cells = cells_ref[...]           # (EB, A) int32
    t = t_ref[...]                   # (EB, K) padded cell table (VMEM)
    eb, a = cells.shape
    k = t.shape[1]
    dt = t.dtype
    s1 = jnp.zeros((eb, k), dt)
    s3 = jnp.zeros((eb, k), dt)
    c1 = c1_ref[...]
    c3 = c3_ref[...]
    for i in range(a):
        idx = jnp.broadcast_to(cells[:, i:i + 1], (eb, k))
        g = jnp.take_along_axis(t, idx, axis=0, mode="promise_in_bounds")
        s1 = s1 + c1[:, i:i + 1] * g
        s3 = s3 + c3[:, i:i + 1] * g
    ntf = ntf_ref[...]
    sgn = jnp.where(ntf >= 0, jnp.asarray(1, dt), jnp.asarray(-1, dt))
    out_ref[...] = ntf * advm_ref[...] * (s1 + coef3 * s3 * sgn)


@functools.partial(jax.jit, static_argnames=("coef3",))
def run_take(cells, c1, c3, ntf, advm, t, coef3):
    """cells/c1/c3 (E, A); ntf/advm (E, K); t (EB, K) padded table with
    EB == edge block == padded table height (the same-shape constraint)."""
    e, a = cells.shape
    eb, k = t.shape
    assert e % eb == 0
    eblk = lambda d: pl.BlockSpec((eb, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_take, coef3=coef3),
        out_shape=jax.ShapeDtypeStruct((e, k), t.dtype),
        grid=(e // eb,),
        in_specs=[eblk(a), eblk(a), eblk(a), eblk(k), eblk(k),
                  pl.BlockSpec((eb, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=eblk(k),
    )(cells, c1, c3, ntf, advm, t)


def _kernel_rows(cells_ref, c1_ref, c3_ref, ntf_ref, advm_ref, t_ref,
                 out_ref, acc_ref, *, coef3):
    eb = out_ref.shape[0]
    a = cells_ref.shape[1]
    dt = out_ref.dtype

    def body(e, _):
        s1 = jnp.zeros((1, t_ref.shape[1]), dt)
        s3 = jnp.zeros((1, t_ref.shape[1]), dt)
        for i in range(a):
            idx = cells_ref[e, i]          # SMEM scalar read
            g = t_ref[pl.ds(idx, 1), :]
            s1 = s1 + c1_ref[e, i] * g
            s3 = s3 + c3_ref[e, i] * g
        acc_ref[pl.ds(e, 1), :] = s1
        acc_ref[pl.ds(e + eb, 1), :] = s3
        return 0

    jax.lax.fori_loop(0, eb, body, 0)
    s = acc_ref[...]
    s1, s3 = s[:eb], s[eb:]
    ntf = ntf_ref[...]
    sgn = jnp.where(ntf >= 0, jnp.asarray(1, dt), jnp.asarray(-1, dt))
    out_ref[...] = ntf * advm_ref[...] * (s1 + coef3 * s3 * sgn)


@functools.partial(jax.jit, static_argnames=("eb", "coef3"))
def run_rows(cells, c1, c3, ntf, advm, t, eb, coef3):
    e, a = cells.shape
    c, k = t.shape
    vblk = lambda d: pl.BlockSpec((eb, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((eb, a), lambda i: (i, 0),
                        memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_kernel_rows, coef3=coef3),
        out_shape=jax.ShapeDtypeStruct((e, k), t.dtype),
        grid=(e // eb,),
        in_specs=[sblk,
                  pl.BlockSpec((eb, a), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((eb, a), lambda i: (i, 0),
                               memory_space=pltpu.SMEM),
                  vblk(k), vblk(k),
                  pl.BlockSpec((c, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=vblk(k),
        scratch_shapes=[pltpu.VMEM((2 * eb, k), jnp.float32)],
    )(cells, c1, c3, ntf, advm, t)


def main(strategy: str, eb: int, nedges: int) -> int:
    from cdk_tpu.core.config import CkeConfig, with_overrides
    from cdk_tpu.core.platform import enable_compilation_cache
    from cdk_tpu.core.timer import slope_time
    from cdk_tpu.kernels.cke import problem
    from cdk_tpu.kernels.cke.reference import edge_flux

    enable_compilation_cache()
    cfg = with_overrides(CkeConfig(), dtype="float32", nedges=nedges)
    data = problem.init_data(cfg)
    t = jnp.asarray(data.tracer * data.cell_mask)
    kpad = 128
    coef3 = float(cfg.coef3rdorder)

    if strategy == "take":
        # pad the table to a sublane multiple; edges to a multiple of it
        ebh = -(-t.shape[0] // 8) * 8
        ep = -(-cfg.nedges // ebh) * ebh
        tp = jnp.pad(t, ((0, ebh - t.shape[0]), (0, kpad - t.shape[1])))
        cells = jnp.pad(data.adv_cells, ((0, ep - cfg.nedges), (0, 0)))
        c1 = jnp.pad(data.adv_coefs, ((0, ep - cfg.nedges), (0, 0)))
        c3 = jnp.pad(data.adv_coefs3, ((0, ep - cfg.nedges), (0, 0)))
        ntf = jnp.pad(data.ntf, ((0, ep - cfg.nedges),
                                 (0, kpad - t.shape[1])))
        advm = jnp.pad(data.adv_mask, ((0, ep - cfg.nedges),
                                       (0, kpad - t.shape[1])))
        run = lambda c, a1, a3, n, m, tt: run_take(c, a1, a3, n, m, tt,
                                                   coef3)
        args = (cells, c1, c3, ntf, advm, tp)
        out_rows = cfg.nedges
    else:
        tp = jnp.pad(t, ((0, 0), (0, kpad - t.shape[1])))
        ntf = jnp.pad(data.ntf, ((0, 0), (0, kpad - t.shape[1])))
        advm = jnp.pad(data.adv_mask, ((0, 0), (0, kpad - t.shape[1])))
        run = lambda c, a1, a3, n, m, tt: run_rows(c, a1, a3, n, m, tt, eb,
                                                   coef3)
        args = (data.adv_cells, data.adv_coefs, data.adv_coefs3, ntf, advm,
                tp)
        out_rows = cfg.nedges

    out = np.asarray(run(*args))[:out_rows, :t.shape[1]]
    ref = np.asarray(edge_flux(
        data.adv_cells, data.adv_coefs, data.adv_coefs3, data.tracer,
        data.cell_mask, data.ntf, data.adv_mask, coef3))
    err = np.abs(out - ref).sum() / np.abs(ref).sum()
    print(f"[{strategy} eb={eb} E={nedges}] rel L1 = {err:.3e}", flush=True)

    def make_runner(n):
        @jax.jit
        def f(cells, c1, c3, ntf, advm, tp):
            def body(carry, _):
                tcur = carry
                o = run(cells, c1, c3, ntf, advm, tcur)
                return jnp.maximum(tcur, 0.0), o
            _, outs = jax.lax.scan(body, tp, None, length=n)
            return outs[-1]
        return lambda d: f(*args)

    sec = slope_time(make_runner, None, n1=10, n2=40, trials=3)
    print(f"[{strategy} eb={eb} E={nedges}] {sec * 1e6:.1f} us/iter",
          flush=True)
    return 0


if __name__ == "__main__":
    strat = sys.argv[1] if len(sys.argv) > 1 else "take"
    eb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    ne = int(sys.argv[3]) if len(sys.argv) > 3 else 25600
    sys.exit(main(strat, eb, ne))

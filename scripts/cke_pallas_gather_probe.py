"""Probe: can Mosaic execute a fast in-kernel row gather for CKE?

Strategies measured at the shipped nested.nml size (25600 edges x 2800
cells x 100 levels, f32), against the best known exact form
(gather_peradv, 743 us/iter r1):

  A. vmem_take  — tracer fully VMEM-resident; per edge-block, A unrolled
     `jnp.take(t, cells[:, i], axis=0)` vectorized gathers (tests whether
     Mosaic lowers lax.gather on the sublane axis; round-1 note says a
     take_along_axis attempt crashed the remote compile helper — this is
     the controlled retry with timeout).
  B. loop_rows  — scalar fori_loop of dynamic single-row reads
     t[pl.ds(idx,1), :] with accumulate (lower bound on per-row overhead;
     run at a reduced edge count and extrapolated).

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
    t = t_ref[...]                   # (C, K) full tracer (VMEM)
    eb, a = cells.shape
    dt = t.dtype
    s1 = jnp.zeros((eb, t.shape[1]), dt)
    s3 = jnp.zeros((eb, t.shape[1]), dt)
    c1 = c1_ref[...]
    c3 = c3_ref[...]
    for i in range(a):
        g = jnp.take(t, cells[:, i], axis=0)   # (EB, K) row gather
        s1 = s1 + c1[:, i:i + 1] * g
        s3 = s3 + c3[:, i:i + 1] * g
    ntf = ntf_ref[...]
    sgn = jnp.where(ntf >= 0, jnp.asarray(1, dt), jnp.asarray(-1, dt))
    out_ref[...] = ntf * advm_ref[...] * (s1 + coef3 * s3 * sgn)


@functools.partial(jax.jit, static_argnames=("eb", "coef3"))
def run_take(cells, c1, c3, ntf, advm, t, eb, coef3):
    e, a = cells.shape
    c, k = t.shape
    eblk = lambda d: pl.BlockSpec((eb, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_take, coef3=coef3),
        out_shape=jax.ShapeDtypeStruct((e, k), t.dtype),
        grid=(e // eb,),
        in_specs=[eblk(a), eblk(a), eblk(a), eblk(k), eblk(k),
                  pl.BlockSpec((c, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=eblk(k),
    )(cells, c1, c3, ntf, advm, t)


def _kernel_rows(cells_ref, c1_ref, c3_ref, ntf_ref, advm_ref, t_ref,
                 out_ref, acc_ref, *, coef3):
    cells = cells_ref[...]
    eb, a = cells.shape
    t = t_ref
    dt = out_ref.dtype

    def body(e, _):
        s1 = jnp.zeros((1, t.shape[1]), dt)
        s3 = jnp.zeros((1, t.shape[1]), dt)
        for i in range(a):
            g = t[pl.ds(cells[e, i], 1), :]
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
    eblk = lambda d: pl.BlockSpec((eb, d), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_rows, coef3=coef3),
        out_shape=jax.ShapeDtypeStruct((e, k), t.dtype),
        grid=(e // eb,),
        in_specs=[eblk(a), eblk(a), eblk(a), eblk(k), eblk(k),
                  pl.BlockSpec((c, k), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=eblk(k),
        scratch_shapes=[pltpu.VMEM((2 * eb, k), jnp.float32)],
    )(cells, c1, c3, ntf, advm, t)


def main(strategy: str, eb: int, nedges: int) -> int:
    from cdk_tpu.core.config import CkeConfig, with_overrides
    from cdk_tpu.core.platform import enable_compilation_cache
    from cdk_tpu.core.timer import fetch_sync, slope_time
    from cdk_tpu.kernels.cke import problem
    from cdk_tpu.kernels.cke.reference import edge_flux

    enable_compilation_cache()
    cfg = with_overrides(CkeConfig(), dtype="float32", nedges=nedges)
    data = problem.init_data(cfg)
    t = jnp.asarray(data.tracer * data.cell_mask)
    kpad = 128
    tp = jnp.pad(t, ((0, 0), (0, kpad - t.shape[1])))
    ntf = jnp.pad(data.ntf, ((0, 0), (0, kpad - t.shape[1])))
    advm = jnp.pad(data.adv_mask, ((0, 0), (0, kpad - t.shape[1])))
    coef3 = float(cfg.coef3rdorder)
    run = {"take": run_take, "rows": run_rows}[strategy]

    out = run(data.adv_cells, data.adv_coefs, data.adv_coefs3, ntf, advm,
              tp, eb, coef3)
    out = np.asarray(out)[:, :t.shape[1]]
    ref = np.asarray(edge_flux(
        data.adv_cells, data.adv_coefs, data.adv_coefs3, data.tracer,
        data.cell_mask, data.ntf, data.adv_mask, coef3))
    err = np.abs(out - ref).sum() / np.abs(ref).sum()
    print(f"[{strategy} eb={eb} E={nedges}] rel L1 = {err:.3e}", flush=True)

    def make_runner(n):
        @jax.jit
        def f(cells, c1, c3, ntf, advm, tp):
            def body(carry, _):
                # clip is value-idempotent (tracer >= 0) but a real data
                # dependence — the loop body cannot be hoisted (the
                # _scan_cke idiom, harness/specs.py)
                tcur = carry
                o = run(cells, c1, c3, ntf, advm, tcur, eb, coef3)
                return jnp.maximum(tcur, 0.0), o
            _, outs = jax.lax.scan(body, tp, None, length=n)
            return outs[-1]
        return lambda d: f(data.adv_cells, data.adv_coefs, data.adv_coefs3,
                           ntf, advm, tp)

    sec = slope_time(make_runner, None, n1=10, n2=40, trials=3)
    print(f"[{strategy} eb={eb} E={nedges}] {sec * 1e6:.1f} us/iter",
          flush=True)
    return 0


if __name__ == "__main__":
    strat = sys.argv[1] if len(sys.argv) > 1 else "take"
    eb = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    ne = int(sys.argv[3]) if len(sys.argv) > 3 else 25600
    sys.exit(main(strat, eb, ne))

"""dss2d rowchain bottleneck decomposition at production (75x72 torus).

Same grid/BlockSpecs as the t-carry rowchain step kernel, with the body
progressively reduced:

  full      — the shipped _rowchain_step_kernel (x3 dots)     [baseline]
  dma_only  — body = copy of the center row (all refs touched): the
              3-read-1-write row pipeline's memory floor
  dots_only — two x3 applies of the center row, no shifts/masks: adds the
              MXU + conversion cost
  shifts    — ipass+jpass masked shifts, no applies: adds the VPU
              assembly cost

Decides whether a spatially-blocked (multi-row) step kernel is worth the
VMEM risk: if full − dma_only >> 0 the kernel is compute-bound and row
blocking (which only cuts reads) won't pay.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
from cdk_tpu.core.platform import enable_compilation_cache

enable_compilation_cache()
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cdk_tpu.core.config import production_config
from cdk_tpu.core.timer import fetch_sync
from cdk_tpu.harness.specs import all_specs
from cdk_tpu.kernels.biharmonic import pallas_dss2d_resident as pdr
from cdk_tpu.kernels.biharmonic.dss2d import dss2d_weights, torus_shape
from cdk_tpu.kernels.biharmonic.operator import (
    blockdiag_group_operator,
    build_element_operator,
)
from cdk_tpu.kernels.biharmonic.problem import to_lane_layout

PRECISION = "bf16x3"

CPU_SMOKE = "--cpu" in sys.argv
if CPU_SMOKE:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

cfg = production_config("biharmonic_dss2d")
if CPU_SMOKE:
    from cdk_tpu.core.config import with_overrides

    cfg = with_overrides(cfg, nelemd=48, qsize=2, device_init=False)
spec = all_specs()["biharmonic_dss2d"]
data = spec.init(cfg)

ex, ey = torus_shape(cfg.nelemd)
g = 8
while ey % g:
    g -= 1
gb, gn, npg = ey // g, g * cfg.npts, cfg.np_gll
L = gb * gn
ncol0 = cfg.ncol
ncol = -(-ncol0 // 128) * 128
rr = cfg.np_dtype(cfg.rrearth)

Lop = build_element_operator(data.dvv, data.dinv, data.spheremp,
                             data.tensorvisc, rr)
lrow = blockdiag_group_operator(Lop, g).reshape(ex, gb, gn, gn)
w2 = dss2d_weights(data.spheremp, ex, ey).reshape(ex, L, 1)
q2 = to_lane_layout(data.qtens).reshape(ex * L, ncol0)
q2 = jnp.pad(q2, ((0, 0), (0, ncol - ncol0)))

calls, geom = pdr._rowchain_calls(cfg, PRECISION, CPU_SMOKE)
ncol_blk = pdr._pick_ncol_blk(3 * gb, gn, ncol, q2.dtype.itemsize)
print(f"ex={ex} ey={ey} L={L} ncol={ncol} ncol_blk={ncol_blk}", flush=True)
kw = dict(precision=PRECISION, gb=gb, gn=gn, npg=npg)


def _dma_kernel(l_ref, w_ref, tu_ref, tc_ref, td_ref, out_ref, **_kw):
    touch = (jnp.sum(tu_ref[...]) + jnp.sum(td_ref[...])
             + jnp.sum(l_ref[...]) + jnp.sum(w_ref[...])) * 0.0
    out_ref[...] = tc_ref[...] + touch


def _dots_kernel(l_ref, w_ref, tu_ref, tc_ref, td_ref, out_ref, *,
                 precision, gb, gn, npg):
    dt = tc_ref.dtype
    apply_all = pdr._make_apply(l_ref, gb, gn, precision, dt)
    touch = (jnp.sum(tu_ref[...]) + jnp.sum(td_ref[...])) * 0.0
    out_ref[...] = apply_all(apply_all(tc_ref[...] * w_ref[0])) + touch


def _shifts_kernel(l_ref, w_ref, tu_ref, tc_ref, td_ref, out_ref, *,
                   precision, gb, gn, npg):
    dt = tc_ref.dtype
    Lr = gb * gn
    d = pdr._ipass_w(tu_ref[...], tc_ref[...], td_ref[...], w_ref[0], npg, dt)
    touch = jnp.sum(l_ref[...]) * 0.0
    out_ref[...] = pdr._jpass(d, pdr._masks_j(Lr, npg, Lr, dt), npg, Lr) + touch


def mod_call(kernel, t):
    lspec = pl.BlockSpec((1, gb, gn, gn), lambda i, c: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, L, 1), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    rowm = lambda off: pl.BlockSpec(
        (L, ncol_blk), lambda i, c, o=off: ((i + o) % ex, c),
        memory_space=pltpu.VMEM)
    row0 = pl.BlockSpec((L, ncol_blk), lambda i, c: (i, c),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        out_shape=jax.ShapeDtypeStruct((ex * L, ncol), t.dtype),
        grid=(ex, ncol // ncol_blk),
        in_specs=[lspec, wspec, rowm(-1), rowm(0), rowm(1)],
        out_specs=row0,
        interpret=CPU_SMOKE,
    )(lrow, w2, t, t, t)


def make_loop(stepper):
    @functools.partial(jax.jit, static_argnames="n")
    def loop(t, n):
        out, _ = jax.lax.scan(lambda tt, _: (stepper(tt), None), t, None,
                              length=n)
        return out

    return loop


print(f"bi={calls['bi']} step2={'yes' if calls['step2_t'] else 'no'}",
      flush=True)
steppers = {
    "full": lambda t: calls["step_t_unblocked"](lrow, w2, t),
    "blocked": lambda t: calls["step_t"](lrow, w2, t),
    # NOTE: one blocked2/blocked3 invocation = TWO/THREE t-steps; the
    # printed slope is per-invocation — divide for the per-step figure
    "blocked2": lambda t: calls["step2_t"](lrow, w2, t),
    "blocked3": lambda t: calls["step3_t"](lrow, w2, t),
    "dma_only": lambda t: mod_call(_dma_kernel, t),
    "dots_only": lambda t: mod_call(_dots_kernel, t),
    "shifts": lambda t: mod_call(_shifts_kernel, t),
}

which = sys.argv[1:] or list(steppers)
for name in which:
    if (name in ("blocked2", "blocked3")
            and calls[{"blocked2": "step2_t", "blocked3": "step3_t"}[name]]
            is None):
        print(f"{name}: skipped (budget not met at this geometry)",
              flush=True)
        continue
    loop = make_loop(steppers[name])
    fetch_sync(loop(q2, 4))
    fetch_sync(loop(q2, 36))

    def best(n, trials=5):
        v = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fetch_sync(loop(q2, n))
            v = min(v, time.perf_counter() - t0)
        return v

    sl = (best(36) - best(4)) / 32
    print(f"{name}: {sl * 1e6:.1f} us/step", flush=True)

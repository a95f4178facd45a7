"""Additive floor models for the two unpriced production legs
(VERDICT r4 #3): plain biharmonic (fused_operator_bd8_resident_x3,
290.7 us/step vs a bare ~242 us 3-pass-MXU number) and the 1-D DSS
chain (fused_operator_bd8_resident_sq_x3, 466.9-479.5 us/step).

Method — measured decomposition, not hand-waving: the resident chains
run p MXU passes per application where p is set by the precision mode
(DEFAULT=1 bf16 pass, bf16x3=3, 'highest'=6 on f32 TPU dots), with the
SAME per-step VPU work (hi/lo splits, adds, chain bookkeeping) and the
SAME DMA.  Timing the chain slope at p in {1, 3, 6} therefore separates

    s(p) = overhead_v + p * m        (per bd8 application)

with m = one MXU pass over the field and overhead_v = everything that
is not an MXU pass.  m is then compared against the 128x128x(ncol)
matmul capacity (197 TFLOPS bf16 on v5e) and overhead_v against the
counted split/add op stream at the measured VPU rates
(scripts/mpdata_roofline.py vpurate).  For the DSS chain the same
p-sweep runs through the windowed d-carry kernel, and the CDK_DSS_KMAX
hook varies the chain depth k to expose the window-DMA term
(per-step window traffic ~ ((B+2hg)+B)/(kB) field round trips).

phases:
  bd8    — plain biharmonic resident chain p-sweep (direct
           apply_bd8_resident calls, production grouped layout)
  dss1d  — DSS chain p-sweep via the registered variants (sq_x3 = 3
           passes, sq 'highest' = 6) at the default k and at
           CDK_DSS_KMAX=8 (set by the caller; read from env here)

Reference idiom: the per-kernel nvprof attribution,
/root/reference/atmosphere/results/atm.pgiacc.17.7-nvprof:11-15."""

from __future__ import annotations

import os
import sys
import time


def _slope_nsteps(call, n1, n2, trials=3):
    """call(n) runs an n-step chain under one dispatch; slope = per-step."""
    from cdk_tpu.core.timer import fetch_sync

    def run(n):
        fetch_sync(call(n))

    run(n1)
    run(n2)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        run(n1)
        t1 = time.perf_counter()
        run(n2)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return best


def bd8():
    from cdk_tpu.core.config import production_config
    from cdk_tpu.kernels.biharmonic import problem
    from cdk_tpu.kernels.biharmonic.operator import (
        blockdiag_group_operator,
        build_element_operator,
    )
    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.biharmonic.pallas_bd8 import apply_bd8_resident
    from cdk_tpu.kernels.biharmonic.problem import to_lane_layout

    interpret = pallas_interpret()
    cfg = production_config("biharmonic")
    data = problem.init_data(cfg)
    rr = cfg.np_dtype(cfg.rrearth)
    L = build_element_operator(data.dvv, data.dinv, data.spheremp,
                               data.tensorvisc, rr)
    g = 8
    lbd = blockdiag_group_operator(L, g)
    q = to_lane_layout(data.qtens)
    eg = cfg.nelemd // g
    qg = q.reshape(eg, g * cfg.npts, cfg.ncol)

    res = {}
    for prec, p in (
        (None, 1),          # single bf16 pass (speed point, slope only)
        ("bf16x3", 3),      # the champion's emulation
        ("highest", 6),     # Mosaic f32 highest = bf16x6
    ):
        s = _slope_nsteps(
            lambda n, pr=prec: apply_bd8_resident(lbd, qg, n, precision=pr,
                                                  interpret=interpret),
            n1=64, n2=256)
        res[p] = s
        print(f"[bd8 p={p} prec={prec}] {s * 1e6:9.2f} us/application",
              flush=True)
    # least-squares s = v + p*m over the three points
    ps = sorted(res)
    n = len(ps)
    sp = sum(ps)
    sv = sum(res[p] for p in ps)
    spp = sum(p * p for p in ps)
    spv = sum(p * res[p] for p in ps)
    m = (n * spv - sp * sv) / (n * spp - sp * sp)
    v = (sv - m * sp) / n
    gn = g * cfg.npts
    flop_pass = 2 * eg * gn * gn * cfg.ncol
    print(f"[bd8 fit] m = {m * 1e6:8.2f} us/MXU-pass "
          f"({flop_pass / m / 1e12:6.1f} TFLOPS eff; "
          f"capacity floor {flop_pass / 197e12 * 1e6:6.2f} us at 197 T)")
    print(f"[bd8 fit] v = {v * 1e6:8.2f} us/application non-MXU residue")
    print(f"[bd8 fit] champion model v + 3m = {(v + 3 * m) * 1e6:8.2f} "
          f"us/step vs measured {res[3] * 1e6:8.2f}")


def dss1d():
    from cdk_tpu.core.config import production_config
    from cdk_tpu.core.registry import _materialize, get
    from cdk_tpu.kernels.biharmonic import problem

    kmax = os.environ.get("CDK_DSS_KMAX", "(default)")
    cfg = production_config("biharmonic_dss")
    data = problem.init_data(cfg)
    for name in ("fused_operator_bd8_resident_sq_x3",
                 "fused_operator_bd8_resident_sq"):
        _, _, vloop = _materialize(get("biharmonic_dss", name), cfg, data)
        s = _slope_nsteps(lambda n, lo=vloop: lo(data, n), n1=32, n2=96)
        print(f"[dss1d KMAX={kmax} {name}] {s * 1e6:9.2f} us/step",
              flush=True)


def main(phase: str) -> int:
    from cdk_tpu.core.platform import enable_compilation_cache

    enable_compilation_cache()
    import cdk_tpu.kernels  # noqa: F401

    {"bd8": bd8, "dss1d": dss1d}[phase]()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))

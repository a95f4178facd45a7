"""Round-5 dist-mpdata campaign probes (VERDICT r4 #1).

The x-decomposed dist loop has run its round-2 number (983 us/step at
production, 1-dev mesh) since round 2; the comm-avoiding kloop measured
WORSE (k=4 1398, k=8 1784) and was never re-run after the x-major
hoisted-invariant in-kernel loop, the 100-120 MB VMEM unlock, or the
shared-window-budget discipline.  This script re-measures everything at
current defaults and adds the two missing perspectives:

  baseline  — hoisted split-kernel per-step loop (the 983 incumbent),
              plus a scan-unroll=2 variant (scan-boundary bubble probe)
  kloop     — the comm-avoiding k-step loop at k=2/4/8 (k=2 is new: the
              distcount op model says deep halos are ruinous at nx=32,
              so the shallowest k is the only candidate)
  slices    — the slice-batch data-parallel loop (dist/mpdata.py
              make_dist_loop_slices): the REFERENCE'S own scaling axis,
              zero exchange — expected at the single-chip champion
  nxscale   — equal-work geometry probe (same total points, nx grown,
              nslices shrunk): the masked-form op inflation is
              per-column and the window overcompute is halo/nx, so the
              dist:single ratio must fall as nx grows — demonstrating
              the 1.6x at production is a toy-x-extent artifact, not a
              defect of the decomposition

Op-count context (scripts/mpdata_roofline.py distcount, committed):
the per-step masked kernel's counted arith stream is 1.923x the
single-chip champion's (gi-mask selects + per-step invariant recompute
+ 44/38 window), while measured time is 1.61x — the dist kernel already
issues its inflated stream FASTER than the champion's 94-106%-of-
roofline rate, i.e. the per-step form has no schedule slack left; the
inflation itself is the structural cost of per-step exchange at nx=32.
"""

from __future__ import annotations

import sys
import time


def _time_loop(loop, args, n1, n2, trials=5):
    """MEDIAN of two-point slopes.  min-of-3 is one-sidedly fragile: a
    tunnel stall during the n1 run biases the slope LOW, and min() then
    records an impossible number (this script's first nxscale run logged
    the champion at 246.8 us/step — 0.4x its committed 577-642 us VPU
    floor; the kloop k=4 'win' at 842.7 implied a VPU rate above the
    dual-issue ceiling and evaporated in a paired re-run at 1392)."""
    from cdk_tpu.core.timer import fetch_sync

    def run(n):
        out = loop(*args, n)
        fetch_sync(out)

    run(n1)
    run(n2)
    slopes = []
    for _ in range(trials):
        t0 = time.perf_counter()
        run(n1)
        t1 = time.perf_counter()
        run(n2)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    slopes.sort()
    return slopes[len(slopes) // 2]


def _cfg(production=True, **over):
    from cdk_tpu.core.config import MpdataConfig, production_config, \
        with_overrides

    cfg = production_config("mpdata") if production else MpdataConfig()
    return with_overrides(cfg, dtype="float32", **over) if over else cfg


def baseline():
    from cdk_tpu.dist import mesh as meshmod, mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    cfg = _cfg()
    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    si, _, _ = dist_mp.make_dist_step(cfg, m, kernel="xmajor")
    args = si(data)
    for unroll in (1, 2):
        loop = dist_mp.make_dist_loop(cfg, m, kernel="xmajor",
                                      unroll=unroll)
        sec = _time_loop(lambda a0, a1, a2, a3, n: loop(a0, a1, a2, a3, n),
                         args, n1=20, n2=120)
        print(f"[dist mpdata 1dev hoisted unroll={unroll}] "
              f"{sec * 1e6:9.2f} us/step", flush=True)


def kloop():
    from cdk_tpu.dist import mesh as meshmod, mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    cfg = _cfg()
    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    si, _, _ = dist_mp.make_dist_step(cfg, m, kernel="xmajor")
    args = si(data)
    for k in (2, 4, 8):
        loop = dist_mp.make_dist_loop(cfg, m, kernel="xmajor", kstep=k)
        sec = _time_loop(lambda a0, a1, a2, a3, n: loop(a0, a1, a2, a3, n),
                        args, n1=16, n2=80)
        print(f"[dist mpdata 1dev kloop k={k}] {sec * 1e6:9.2f} us/step",
              flush=True)


def kloop2():
    """Split-halo kloop (in-kernel deep-halo assembly, owned-only
    writeback) sweep: depth ladder + outer-scan unroll at the winner."""
    from cdk_tpu.dist import mesh as meshmod, mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    cfg = _cfg()
    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    si, _, _ = dist_mp.make_dist_step(cfg, m, kernel="xmajor")
    args = si(data)
    for k in (2, 3, 4, 5, 6):
        loop = dist_mp.make_dist_loop(cfg, m, kernel="xmajor", kstep=k,
                                      split=True)
        n1 = 4 * k
        sec = _time_loop(lambda a0, a1, a2, a3, n: loop(a0, a1, a2, a3, n),
                         args, n1=n1, n2=5 * n1)
        print(f"[dist mpdata 1dev kloop-split k={k}] "
              f"{sec * 1e6:9.2f} us/step", flush=True)
    for k, u in ((4, 2), (4, 4)):
        loop = dist_mp.make_dist_loop(cfg, m, kernel="xmajor", kstep=k,
                                      split=True, unroll=u)
        sec = _time_loop(lambda a0, a1, a2, a3, n: loop(a0, a1, a2, a3, n),
                         args, n1=16, n2=80)
        print(f"[dist mpdata 1dev kloop-split k={k} unroll={u}] "
              f"{sec * 1e6:9.2f} us/step", flush=True)


def slices():
    from cdk_tpu.dist import mesh as meshmod, mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    cfg = _cfg()
    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    si, loop, _ = dist_mp.make_dist_loop_slices(cfg, m)
    args = si(data)
    sec = _time_loop(lambda a0, a1, a2, a3, n: loop(a0, a1, a2, a3, n),
                     args, n1=20, n2=120)
    print(f"[dist mpdata 1dev slices] {sec * 1e6:9.2f} us/step", flush=True)


def nxscale():
    """Equal-work ladder: production has 8192 x 32 x 57 points; keep
    nslices*nx constant while growing nx.  nz/nzm fixed."""
    from cdk_tpu.core.registry import _materialize, get
    from cdk_tpu.dist import mesh as meshmod, mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    m = meshmod.make_mesh(1)
    for nx, nsl in ((32, 8192), (128, 2048), (256, 1024)):
        cfg = _cfg(production=False, nx=nx, nslices=nsl, nz=58)
        data = problem.init_data(cfg)
        _, _, vloop = _materialize(get("mpdata", "pallas_xmajor"), cfg,
                                   data)
        sec_c = _time_loop(lambda d, n: vloop(d, n), (data,), n1=20,
                           n2=120)
        si, _, _ = dist_mp.make_dist_step(cfg, m, kernel="xmajor")
        args = si(data)
        loop = dist_mp.make_dist_loop(cfg, m, kernel="xmajor")
        sec_d = _time_loop(
            lambda a0, a1, a2, a3, n: loop(a0, a1, a2, a3, n), args,
            n1=20, n2=120)
        line = (f"[nxscale nx={nx:<4d} nsl={nsl:<5d}] champion "
                f"{sec_c * 1e6:8.2f}  dist {sec_d * 1e6:8.2f} us/step  "
                f"ratio {sec_d / sec_c:5.2f}")
        if nx >= 128:
            # wide-x: the deep-halo overcompute (6k/nx) is small — the
            # comm-avoiding form should close on the champion here
            try:
                loop_k = dist_mp.make_dist_loop(cfg, m, kernel="xmajor",
                                                kstep=8)
                sec_k = _time_loop(
                    lambda a0, a1, a2, a3, n: loop_k(a0, a1, a2, a3, n),
                    args, n1=16, n2=80)
                line += (f"  kloop8 {sec_k * 1e6:8.2f} "
                         f"(ratio {sec_k / sec_c:5.2f})")
            except Exception as e:  # a VMEM-frontier crash ends one ROW
                line += f"  kloop8 <{type(e).__name__}>"
        print(line, flush=True)


def main(phase: str) -> int:
    from cdk_tpu.core.platform import enable_compilation_cache

    enable_compilation_cache()
    import cdk_tpu.kernels  # noqa: F401

    {"baseline": baseline, "kloop": kloop, "kloop2": kloop2,
     "slices": slices, "nxscale": nxscale}[phase]()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))

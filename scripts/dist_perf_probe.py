"""Real-chip probe: production-size dist-step throughput on a 1-device
mesh vs the best single-chip variant (VERDICT r1 #1 'done' criterion:
within ~15%), plus the packed-lanes mpdata kernel at shipped + production
sizes (VERDICT r1 #3: >= 2x over the 2.58 ms round-1 figure).

Phases (run one per invocation; the worker script sequences them):
  mpdata_prod     — production mpdata: pallas_fused vs pallas_packed loops
  mpdata_shipped  — shipped mpdata: pallas_fused vs pallas_packed loops
  dist_mpdata     — production mpdata dist loop (pallas core, 1-dev mesh)
  dist_cke        — shipped cke: gather_peradv vs dist step (1-dev mesh)
  dss             — shipped biharmonic_dss fused_operator + dist DSS step
"""

from __future__ import annotations

import sys




def _time_loop(loop, args, n1=10, n2=40, trials=3):
    """Two-point slope timing of loop(*args, n) (device-side n-step run)."""
    import time

    from cdk_tpu.core.timer import fetch_sync

    def run(n):
        out = loop(*args, n)
        fetch_sync(out)

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


def mpdata_variant(production: bool, variant: str):
    from cdk_tpu.core.config import MpdataConfig, production_config, \
        with_overrides
    from cdk_tpu.core.registry import _materialize, get
    from cdk_tpu.harness.specs import get_spec
    from cdk_tpu.kernels.mpdata import problem

    cfg = production_config("mpdata") if production else with_overrides(
        MpdataConfig(), dtype="float32")
    data = problem.init_data(cfg)
    var = get("mpdata", variant)
    step2, aux, vloop = _materialize(var, cfg, data)
    if vloop is not None:
        loop = lambda d, n: vloop(d, n)
    else:
        spec = get_spec("mpdata")
        loop = lambda d, n: spec.scan_runner(step2, aux, n)(d)
    sec = _time_loop(loop, (data,), n1=20, n2=120)
    pts = cfg.grid_points / sec
    print(f"[mpdata {'prod' if production else 'shipped'} {variant}] "
          f"{sec * 1e6:9.2f} us/step  {pts / 1e9:7.2f} G pts/s", flush=True)


def dist_mpdata(production: bool):
    from cdk_tpu.core.config import MpdataConfig, production_config, \
        with_overrides
    from cdk_tpu.dist import mesh as meshmod, mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    cfg = production_config("mpdata") if production else with_overrides(
        MpdataConfig(), dtype="float32")
    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    for kern in ("xmajor", "packed", "pallas", "jnp"):
        # shard layout differs per kernel (packed travels packed)
        shard_inputs, _, _ = dist_mp.make_dist_step(cfg, m, kernel=kern)
        args = shard_inputs(data)
        loop = dist_mp.make_dist_loop(cfg, m, kernel=kern)
        sec = _time_loop(lambda a0, a1, a2, a3, n: loop(a0, a1, a2, a3, n),
                         args, n1=20, n2=120)
        pts = cfg.grid_points / sec
        print(f"[dist mpdata 1dev {kern}] {sec * 1e6:9.2f} us/step  "
              f"{pts / 1e9:7.2f} G pts/s", flush=True)


def dist_kloop(production: bool):
    from cdk_tpu.core.config import MpdataConfig, production_config, \
        with_overrides
    from cdk_tpu.dist import mesh as meshmod, mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    cfg = production_config("mpdata") if production else with_overrides(
        MpdataConfig(), dtype="float32")
    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    shard_inputs, _, _ = dist_mp.make_dist_step(cfg, m, kernel="xmajor")
    args = shard_inputs(data)
    # k=16's deep-halo window exceeds the 16 MB scoped-vmem limit on v5e
    # (measured: 16.14M at the default block) — and its compile-helper
    # crash wedges the tunnel; stay at k<=8 here.
    for k in (4, 8):
        loop = dist_mp.make_dist_loop(cfg, m, kernel="xmajor", kstep=k)
        sec = _time_loop(lambda a0, a1, a2, a3, n: loop(a0, a1, a2, a3, n),
                         args, n1=16, n2=80)
        pts = cfg.grid_points / sec
        print(f"[dist mpdata 1dev kloop k={k}] {sec * 1e6:9.2f} us/step  "
              f"{pts / 1e9:7.2f} G pts/s", flush=True)


def dist_cke():
    from cdk_tpu.core.config import CkeConfig, with_overrides
    from cdk_tpu.core.timer import fetch_sync
    from cdk_tpu.dist import cke as dist_cke_mod, mesh as meshmod
    from cdk_tpu.kernels.cke import problem

    import time

    cfg = with_overrides(CkeConfig(), dtype="float32")
    m = meshmod.make_mesh(1)
    data = dist_cke_mod.shard_data(problem.init_data(cfg), m)
    for name, run in (("all_gather", dist_cke_mod.make_dist_step(cfg, m)),
                      ("ring", dist_cke_mod.make_dist_step_ring(cfg, m))):
        fetch_sync(run(data))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = None
            for _ in range(20):
                out = run(data)
            fetch_sync(out)
            best = min(best, (time.perf_counter() - t0) / 20)
        print(f"[dist cke 1dev {name}] {best * 1e6:9.2f} us/iter "
              f"(incl. dispatch)", flush=True)
    # one-dispatch scan loops (the production dispatch shape): slope-timed,
    # so the ~0.6 ms/dispatch tunnel cost above is removed
    for name, ring in (("all_gather", False), ("ring", True)):
        loop = dist_cke_mod.make_dist_loop(cfg, m, ring=ring)
        sec = _time_loop(lambda d, n: loop(d, n), (data,), n1=20, n2=120)
        print(f"[dist cke 1dev loop {name}] {sec * 1e6:9.2f} us/iter",
              flush=True)


def dss():
    from cdk_tpu.core.config import BiharmonicConfig, with_overrides
    from cdk_tpu.core.timer import fetch_sync
    from cdk_tpu.dist import biharmonic as dist_bi, mesh as meshmod
    from cdk_tpu.harness import driver

    cfg = with_overrides(BiharmonicConfig(), dtype="float32")
    res = driver.run_kernel("biharmonic_dss", cfg, iters=50, trials=3,
                            quiet=True)
    for r in res:
        print(f"[biharmonic_dss {r.variant}] {r.seconds_per_call * 1e6:9.2f}"
              f" us/step ok={r.ok}", flush=True)

    import time

    m = meshmod.make_mesh(1)
    from cdk_tpu.kernels.biharmonic import problem
    data = problem.init_data(cfg)
    for overlap in (False, True):
        shard_inputs, step, _ = dist_bi.make_dist_step_dss(cfg, m,
                                                           overlap=overlap)
        q_s, aux = shard_inputs(data)
        fetch_sync(step(q_s, aux))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q = q_s
            for _ in range(50):
                q = step(q, aux)
            fetch_sync(q)
            best = min(best, (time.perf_counter() - t0) / 50)
        print(f"[dist dss 1dev overlap={overlap}] {best * 1e6:9.2f} us/step"
              f" (incl. dispatch)", flush=True)


def dss_prod():
    """Production-scale DSS-biharmonic: single-chip variants (driver) +
    the one-dispatch dist DSS scan loop on a 1-device mesh, slope-timed —
    the biharmonic leg of the north-star decomposition metric at a size
    where per-dispatch tunnel latency (~0.6 ms) no longer dominates."""
    from cdk_tpu.core.config import production_config
    from cdk_tpu.dist import biharmonic as dist_bi, mesh as meshmod
    from cdk_tpu.harness import driver
    from cdk_tpu.kernels.biharmonic import problem

    cfg = production_config("biharmonic_dss")
    res = driver.run_kernel("biharmonic_dss", cfg, iters=24, trials=3,
                            quiet=True)
    for r in res:
        pts = cfg.grid_points / r.seconds_per_call
        print(f"[dss prod {r.variant:<24s}] {r.seconds_per_call * 1e6:9.2f}"
              f" us/step  {pts / 1e9:7.2f} G pts/s ok={r.ok}", flush=True)

    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    for overlap in (False, True):
        shard_inputs, _, _ = dist_bi.make_dist_step_dss(cfg, m,
                                                        overlap=overlap)
        q_s, aux = shard_inputs(data)
        loop = dist_bi.make_dist_loop_dss(cfg, m, overlap=overlap)
        sec = _time_loop(lambda q, a, n: loop(q, a, n), (q_s, aux),
                         n1=10, n2=60)
        pts = cfg.grid_points / sec
        print(f"[dist dss prod 1dev overlap={overlap}] {sec * 1e6:9.2f} "
              f"us/step  {pts / 1e9:7.2f} G pts/s", flush=True)


def dss_kstep():
    """Production 1-D ring DSS: the communication-avoiding kstep dist
    loop on a 1-device mesh, slope-timed (n multiples of kstep)."""
    from cdk_tpu.core.config import production_config
    from cdk_tpu.dist import biharmonic as dist_bi, mesh as meshmod
    from cdk_tpu.kernels.biharmonic import problem

    cfg = production_config("biharmonic_dss")
    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    si, loop, _ = dist_bi.make_dist_loop_dss_kstep(cfg, m, kstep=8)
    q, aux = si(data)
    sec = _time_loop(lambda q, a, n: loop(q, a, n), (q, aux),
                     n1=16, n2=48)
    pts = cfg.grid_points / sec
    print(f"[dist dss kstep=8 1dev] {sec * 1e6:9.2f} us/step  "
          f"{pts / 1e9:7.2f} G pts/s", flush=True)


def dss2d_dist():
    """Production 2-D torus DSS: the distributed rowchain loop on a
    1-device mesh, slope-timed — round 3 runs the blocked DOUBLE-step
    kernel inside shard_map (one 2-row exchange per two t-steps)."""
    from cdk_tpu.core.config import production_config
    from cdk_tpu.dist import biharmonic as dist_bi, mesh as meshmod
    from cdk_tpu.kernels.biharmonic import problem

    cfg = production_config("biharmonic_dss2d")
    m = meshmod.make_mesh(1)
    data = problem.init_data(cfg)
    shard_inputs, loop, gather = dist_bi.make_dist_loop_dss2d_rowchain(
        cfg, m)
    q2, aux = shard_inputs(data)
    sec = _time_loop(lambda q, a, n: loop(q, a, n), (q2, aux), n1=10,
                     n2=60)
    pts = cfg.grid_points / sec
    print(f"[dist dss2d rowchain 1dev] {sec * 1e6:9.2f} us/step  "
          f"{pts / 1e9:7.2f} G pts/s", flush=True)


def main(phase: str) -> int:
    from cdk_tpu.core.platform import enable_compilation_cache

    enable_compilation_cache()
    import cdk_tpu.kernels  # noqa: F401

    if phase == "mpdata_prod":
        mpdata_variant(True, "pallas_fused")
        mpdata_variant(True, "pallas_packed")
    elif phase == "mpdata_shipped":
        mpdata_variant(False, "pallas_fused")
        mpdata_variant(False, "pallas_packed")
    elif phase == "mpdata_bf16":
        mpdata_variant(False, "pallas_packed_bf16")
        mpdata_variant(True, "pallas_packed_bf16")
    elif phase == "dist_mpdata":
        dist_mpdata(True)
    elif phase == "dist_kloop":
        dist_kloop(True)
    elif phase == "dist_cke":
        dist_cke()
    elif phase == "dss":
        dss()
    elif phase == "dss_prod":
        dss_prod()
    elif phase == "dss_kstep":
        dss_kstep()
    elif phase == "dss2d_dist":
        dss2d_dist()
    else:
        raise SystemExit(f"unknown phase {phase}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))

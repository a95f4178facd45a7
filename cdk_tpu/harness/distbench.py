"""Gated distributed production legs for bench.py (VERDICT r4 #2).

Before round 5 the five distributed production numbers (dist DSS kstep
471.6, dist dss2d rowchain 883.5, dist mpdata 983 us/step, dist cke)
lived only in hand-run probe logs (results/tpu-v5e/dist-dss-kstep-
20260820.txt, round2-summary.txt) and could silently regress with RC=0.
This module turns each into a first-class bench leg: built on a 1-device
mesh (the measurable multi-chip proxy this environment allows — the
north star names multi-host scaling as a first-class config; anchor:
the deferred MPI parallelism, /root/reference/nested_loops/README.md:
27-35), slope-timed with the same two-point device-side-loop semantics
as the shipped legs, VERIFIED against the same-config single-chip
production champion (itself driver-verified against the family reference
in the same bench run), and failures propagate to the bench exit status.

Each leg also reports grid-points/s — the BASELINE.json north-star
metric (derived pts/s rows idiom: /root/reference/atmosphere/results/
summary.txt)."""

from __future__ import annotations

import time
from dataclasses import dataclass

import numpy as np


@dataclass
class DistLegResult:
    family: str
    path: str          # which dist formulation ran
    seconds_per_call: float
    slope_min: float
    slope_median: float
    slope_max: float
    grid_points_per_s: float
    err: float
    tol: float
    ok: bool
    note: str = ""


def _slope_loop(run_n, n1: int, n2: int, trials: int = 3):
    """Two-point slope timing of run_n(n) (one-dispatch n-step device
    loop, fetch-synced inside run_n) -> (min, median, max) s/step.

    The recorded leg value is the MEDIAN: a stall during the n1 run
    biases one slope LOW (observed: a sub-floor 246.8 us reading on a
    614 us kernel, and a negative slope on a loaded CPU host), so a
    min-of-trials value records artifacts.  If even the median is
    non-positive (degenerate timing under extreme load), fall back to
    the bulk rate of the longer run — an upper bound, but positive."""
    run_n(n1)  # compile + warm both step counts
    run_n(n2)
    slopes = []
    for _ in range(trials):
        t0 = time.perf_counter()
        run_n(n1)
        t1 = time.perf_counter()
        run_n(n2)
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    s = sorted(slopes)
    med = s[len(s) // 2]
    if med <= 0:
        t0 = time.perf_counter()
        run_n(n2)
        bulk = (time.perf_counter() - t0) / n2
        return bulk, bulk, bulk
    return s[0], med, s[-1]


def _champion_loop(kernel: str, champ: str, cfg, data):
    """Materialized single-chip champion loop(data, n) in the family's
    canonical output layout (the dist gather target)."""
    from cdk_tpu.core.registry import _materialize, get
    from cdk_tpu.harness.specs import get_spec

    step2, aux, vloop = _materialize(get(kernel, champ), cfg, data)
    if vloop is not None:
        return vloop
    spec = get_spec(kernel)
    return lambda d, n: spec.scan_runner(step2, aux, n)(d)


def _leg_mpdata(cfg, m, champ, trials):
    from cdk_tpu.core.norms import rel_l1
    from cdk_tpu.dist import mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    data = problem.init_data(cfg)
    si, _, gather_f = dist_mp.make_dist_step(cfg, m, kernel="xmajor")
    args = si(data)
    loop = dist_mp.make_dist_loop(cfg, m, kernel="xmajor")

    def run_n(n):
        from cdk_tpu.core.timer import fetch_sync
        out = loop(*args, n)
        fetch_sync(out)
        return out

    # verify: 5 dist steps vs 5 champion steps — both exact-f32 forms of
    # the same staged arithmetic; masked-global vs positional ordering
    # differs only in FP reassociation of identical stencils
    nv = 5
    f_d, flux_d = loop(*args, nv)
    f_r, flux_r = _champion_loop("mpdata", champ, cfg, data)(data, nv)
    err = max(rel_l1(gather_f(f_d), np.asarray(f_r)),
              rel_l1(np.asarray(flux_d), np.asarray(flux_r)))
    lo, med, hi = _slope_loop(run_n, 20, 120, trials)
    return "xmajor_split_hoisted_loop", lo, med, hi, float(err), 1e-5


def _leg_dss(cfg, m, champ, trials):
    from cdk_tpu.core.norms import rel_l2
    from cdk_tpu.dist import biharmonic as dist_bi
    from cdk_tpu.kernels.biharmonic import problem

    data = problem.init_data(cfg)
    si, loop, gather = dist_bi.make_dist_loop_dss_kstep(cfg, m, kstep=8)
    q, aux = si(data)

    def run_n(n):
        from cdk_tpu.core.timer import fetch_sync
        out = loop(q, aux, n)
        fetch_sync(out)
        return out

    nv = 8
    out_d = gather(loop(q, aux, nv))
    out_r = _champion_loop("biharmonic_dss", champ, cfg, data)(data, nv)
    err = rel_l2(out_d, np.asarray(out_r))
    lo, med, hi = _slope_loop(run_n, 16, 80, trials)
    # two independently-grouped bf16x3 chains: per-step 2.4e-5 rounding
    # compounds over nv steps — 5e-4 still catches any structural bug
    return "dss_kstep8_ring", lo, med, hi, float(err), 5e-4


def _leg_dss2d(cfg, m, champ, trials):
    from cdk_tpu.core.norms import rel_l2
    from cdk_tpu.dist import biharmonic as dist_bi
    from cdk_tpu.kernels.biharmonic import problem

    data = problem.init_data(cfg)
    si, loop, gather = dist_bi.make_dist_loop_dss2d_rowchain(cfg, m)
    q2, aux = si(data)

    def run_n(n):
        from cdk_tpu.core.timer import fetch_sync
        out = loop(q2, aux, n)
        fetch_sync(out)
        return out

    nv = 4
    out_d = gather(loop(q2, aux, nv))
    out_r = _champion_loop("biharmonic_dss2d", champ, cfg, data)(data, nv)
    err = rel_l2(out_d, np.asarray(out_r))
    lo, med, hi = _slope_loop(run_n, 10, 60, trials)
    return "dss2d_rowchain_padk", lo, med, hi, float(err), 5e-4


def _leg_cke(cfg, m, champ, trials):
    from cdk_tpu.core.norms import rel_l1
    from cdk_tpu.dist import cke as dist_cke
    from cdk_tpu.kernels.cke import problem

    data = problem.init_data(cfg)
    sdata = dist_cke.shard_data(data, m)
    loop = dist_cke.make_dist_loop(cfg, m, ring=False)

    def run_n(n):
        from cdk_tpu.core.timer import fetch_sync
        out = loop(sdata, n)
        fetch_sync(out)
        return out

    nv = 2
    flx_d = loop(sdata, nv)
    flx_r = _champion_loop("cke", champ, cfg, data)(data, nv)
    # identical local kernel (edge_flux_peradv) on the all_gathered field:
    # same arithmetic, same order — near-bitwise
    err = rel_l1(np.asarray(flx_d), np.asarray(flx_r))
    lo, med, hi = _slope_loop(run_n, 4, 10, trials)
    return "allgather_loop", lo, med, hi, float(err), 1e-6


def _leg_mpdata_slices(cfg, m, champ, trials):
    """The slice-batch data-parallel loop — the REFERENCE's own scaling
    axis (per-node slice batches, zero exchange): each device runs the
    unmodified single-chip champion kernel on its own slice groups, so
    this leg gates 'dist form == champion' at ratio ~1.0 by design."""
    from cdk_tpu.core.norms import rel_l1
    from cdk_tpu.dist import mpdata as dist_mp
    from cdk_tpu.kernels.mpdata import problem

    data = problem.init_data(cfg)
    si, loop, (gather_f, gather_flux) = dist_mp.make_dist_loop_slices(
        cfg, m)
    args = si(data)

    def run_n(n):
        from cdk_tpu.core.timer import fetch_sync
        out = loop(*args, n)
        fetch_sync(out)
        return out

    nv = 3
    f_d, flux_d = loop(*args, nv)
    f_r, flux_r = _champion_loop("mpdata", champ, cfg, data)(data, nv)
    err = max(rel_l1(gather_f(f_d)[:, :, :cfg.nzm], np.asarray(f_r)),
              rel_l1(gather_flux(flux_d), np.asarray(flux_r)))
    lo, med, hi = _slope_loop(run_n, 20, 120, trials)
    return "slice_batch_loop", lo, med, hi, float(err), 1e-5


# leg name -> (kernel family, builder).  The slice-batch mpdata leg is
# a second dist formulation of the same family (zero-exchange data
# parallelism — the reference's own scaling axis).
LEGS = {
    "mpdata": ("mpdata", _leg_mpdata),
    "mpdata_slices": ("mpdata", _leg_mpdata_slices),
    "biharmonic_dss": ("biharmonic_dss", _leg_dss),
    "biharmonic_dss2d": ("biharmonic_dss2d", _leg_dss2d),
    "cke": ("cke", _leg_cke),
    # plain biharmonic is deliberately absent: element-sharded it has NO
    # exchange (the DSS-free kernel is embarrassingly parallel), so its
    # "dist" number is the single-chip kernel under shard_map — nothing a
    # regression gate on top of the production leg would catch.
}


def run_dist_legs(champions: dict, production: bool = True,
                  trials: int = 3, quiet: bool = False,
                  configs: dict | None = None):
    """Run all dist production legs on a 1-device mesh.

    champions: {kernel: single-chip champion variant name} (the bench's
    PRODUCTION_CHAMPIONS dict) — each leg verifies against its family's
    champion loop output.  configs overrides the per-family config
    (tests pass reduced shapes; the bench passes nothing and gets the
    production presets)."""
    from cdk_tpu.core.config import production_config, with_overrides
    from cdk_tpu.dist import mesh as meshmod
    from cdk_tpu.harness.specs import get_spec

    say = (lambda *a: None) if quiet else print
    m = meshmod.make_mesh(1)
    results = []
    for leg, (family, build) in LEGS.items():
        spec = get_spec(family)
        if configs is not None:
            if leg not in configs:
                continue  # explicit config set = explicit leg set
            cfg = configs[leg]
        else:
            cfg = (production_config(family) if production
                   else with_overrides(spec.default_config(),
                                       dtype="float32", device_init=True))
        try:
            path, lo, med, hi, err, tol = build(cfg, m, champions[family],
                                                trials)
        except Exception as e:  # a crashed leg must gate, not kill, bench
            results.append(DistLegResult(
                leg, "<error>", 0.0, 0.0, 0.0, 0.0, 0.0,
                float("nan"), 0.0, False,
                note=f"{type(e).__name__}: {e}"))
            say(f"[dist] {leg:<16s} ERROR {type(e).__name__}: {e}")
            continue
        ok = bool(np.isfinite(err) and err < tol)
        results.append(DistLegResult(
            leg, path, med, lo, med, hi,
            spec.grid_points(cfg) / med, err, tol, ok,
        ))
        say(f"[dist] {leg:<16s} {path:<24s} {med * 1e6:9.2f} us/step "
            f"{spec.grid_points(cfg) / med / 1e9:7.2f} G pts/s "
            f"err={err:.2e} (tol {tol:g}) {'ok' if ok else 'VERIFY FAILED'}")
    return results

"""Headline benchmark: all three co-design kernels on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

PRIMARY headline = geometric-mean speedup of the best VERIFIED-PARITY
variant (fast-math/bf16 speed points excluded) over the reference's best
published per-kernel numbers, using figures that match our steady-state
(transfer-free) timing semantics:

  biharmonic_wk : GPU2 device-kernel compute 1.033 ms/call → 716 M pts/s
                  (K20X nvprof split, atm.pgiacc.17.7-nvprof:11-15; the
                  3.074 ms headline includes H2D/D2H which a resident-data
                  TPU run never pays per step)
  MPDATA        : OpenACC-2 warm 294 µs/step, transfers excluded →
                  298 M pts/s (advect.pgiacc.17.7:12)
  nested (CKE)  : no committed reference results (BASELINE.md) — baselined
                  against our own committed native C++ scalar driver,
                  12.141 ms/iter → 210.9 M pts/s
                  (results/cpu-native/cdk_bench.txt, cpp/cdk_bench.cpp)

SECONDARY (stderr only): the same geomean over the best variant including
fast-math bf16 forms — a speed point, not a parity claim — plus one line
per beyond-reference family (the DSS-coupled biharmonics), which have no
baseline row and stay out of the geomean but still gate the exit status.

The JSON line also carries:
  "band"       — geomean lo/hi: hi = the headline (best-window slopes),
                 lo = the same geomean at each leg's MEDIAN trial slope
                 (the same code read 71.8-74.3x across round-3 windows;
                 a round-over-round delta inside the band is noise, not
                 a regression or a win)
  "legs"       — per-leg us/step min/median/max
  "production" — the five families' production-scale champions
                 (BASELINE.json config "all three kernels at production
                 E3SM scale"), slope-timed and VERIFIED; a failure here
                 sets RC!=0 like the shipped legs (pre-round-4 these
                 lived only in hand-run logs and could regress silently)
  "dist"       — the distributed production paths on a 1-device mesh
                 (dist DSS kstep ring, dist dss2d rowchain, dist mpdata
                 halo loop + slice-batch loop, dist cke all_gather loop
                 — harness/distbench.py),
                 slope-timed and verified against the same-run production
                 champions; failures set RC!=0 (pre-round-5 these lived
                 only in hand-run probe logs)
  per-leg "gpts_per_s" — grid-points/s, the BASELINE.json north-star
                 metric (pts/step ÷ s/step)

Exit status: non-zero if any exact (non-fast-math) variant fails
verification or crashes — a regression turns the bench red instead of
silently shrinking it.

Per-kernel detail goes to stderr; timing is fetch-synced two-point-slope
over device-side scan loops (see cdk_tpu/core/timer.py)."""

from __future__ import annotations

import contextlib
import json
import signal
import sys


@contextlib.contextmanager
def _deadline(seconds: int):
    """Best-effort per-kernel timeout: the remote-dispatch tunnel can stall
    for minutes; one stuck kernel must not zero the whole benchmark."""

    def _raise(signum, frame):
        raise TimeoutError(f"kernel exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


BASELINES_PTS_S = {
    "biharmonic": 737_280 / 1.033e-3,   # ≈ 716 M pts/s (K20X compute)
    "mpdata": 87_552 / 294e-6,          # ≈ 298 M pts/s (K20X, excl. copies)
    "cke": 2_560_000 / 12.141e-3,       # ≈ 211 M pts/s (native C++ serial)
}
BASELINE_KIND = {"biharmonic": "K20X", "mpdata": "K20X", "cke": "C++"}

# Production-scale champions (measured winners from the committed
# results/tpu-v5e/ sweeps); champions-only keeps the sweep bounded — the
# full-variant production sweep stays a hand-run artifact.
# PROMOTION RULE: a variant is promoted here only after a hand-run
# production sweep (scripts/dist_perf_probe.py or the driver at
# production_config) shows it beating the incumbent by more than the
# leg's recorded dispersion band in the same tunnel window, with the
# measurement committed to results/tpu-v5e/ — the pin is deliberate so a
# noise-level flip cannot silently change what the regression gate times.
PRODUCTION_CHAMPIONS = {
    "biharmonic": "fused_operator_bd8_resident_x3",
    "biharmonic_dss": "fused_operator_bd8_resident_sq_x3",
    "biharmonic_dss2d": "fused_operator_rowchain_sq_x3",
    "mpdata": "pallas_xmajor",
    "cke": "gather_peradv",
}

# Legs whose shipped size swings across tunnel windows for identical code
# (dss2d: ±30%, 15.9-21.7 µs — round4-summary §12) record the MEDIAN of
# this many measurement windows; all other legs measure once.
NOISY_LEG_WINDOWS = {"biharmonic_dss2d": 3}


def _geomean(xs):
    g = 1.0
    for x in xs:
        g *= x
    return g ** (1.0 / len(xs)) if xs else 0.0


def _best(pool, pin=None):
    """Deterministic champion pick: 2% throughput buckets, then the
    PINNED production champion name, then name — variants measured
    identical within timing noise (gather_peradv vs gather_selfold are a
    dead heat) keep a stable BENCH_r* row across rounds instead of
    flip-flopping on the noise, and a dead heat resolves to the SAME
    name in the shipped and production sections (round-4 BENCH carried
    gather_selfold in legs but gather_peradv in production for the same
    kernel — two names for one champion)."""
    import math

    def key(r):
        gps = r.grid_points_per_s
        bucket = (int(math.log(gps) / math.log(1.02))
                  if gps > 0 else -(10 ** 9))
        return (bucket, r.variant == pin, r.variant)

    return max(pool, key=key)


def _leg_band_us(best):
    """{min,median,max} us/step from the driver's slope dispersion
    metrics (empty when the timer had no resolvable samples)."""
    m = best.metrics
    if "slope_min" not in m:
        return {}
    return {
        "min_us": round(m["slope_min"] * 1e6, 3),
        "median_us": round(m["slope_median"] * 1e6, 3),
        "max_us": round(m["slope_max"] * 1e6, 3),
    }


def main() -> int:
    from cdk_tpu.core.platform import enable_compilation_cache

    enable_compilation_cache()
    import cdk_tpu.kernels  # noqa: F401
    from cdk_tpu.core.config import with_overrides
    from cdk_tpu.harness import driver
    from cdk_tpu.harness.specs import all_specs

    err = lambda *a: print(*a, file=sys.stderr, flush=True)

    exact_ratios, fm_ratios = [], []
    exact_lo, exact_hi = [], []  # per-leg ratio band endpoints
    exact_failures = []
    extra_lines = []
    legs = {}
    for kernel, spec in all_specs().items():
        if kernel not in BASELINES_PTS_S:
            # kernels beyond the reference's extracted set (the DSS-coupled
            # biharmonic families) have no baseline row and stay out of the
            # geomean — but their best verified figure is still reported as
            # a secondary line so a regression is visible in the bench log
            try:
                cfg = with_overrides(spec.default_config(), dtype="float32",
                                     device_init=True)
                with _deadline(600):
                    results = driver.run_kernel(kernel, cfg, iters=50,
                                                trials=3, quiet=True,
                                                min_delta=20e-3)
                ok = [r for r in results if r.ok and not r.fast_math]
                exact_failures += [
                    f"{kernel}:{r.variant}" for r in results
                    if not r.ok and not r.fast_math
                ]
                if ok:
                    best = _best(ok, PRODUCTION_CHAMPIONS.get(kernel))
                    win_us = [best.seconds_per_call * 1e6]
                    # noisy legs (NOISY_LEG_WINDOWS): re-time the CHAMPION
                    # only in N-1 extra windows and record the MEDIAN, so
                    # back-to-back runs of identical code land inside
                    # each other's recorded spread (VERDICT r4 weak #5);
                    # a failed extra window gates instead of poisoning
                    # the median with inf
                    for _ in range(NOISY_LEG_WINDOWS.get(kernel, 1) - 1):
                        with _deadline(600):
                            extra = driver.run_kernel(
                                kernel, cfg, variants=[best.variant],
                                iters=50, trials=3, quiet=True,
                                min_delta=20e-3)
                        r = next((r for r in extra
                                  if r.variant == best.variant), None)
                        if r is None or not r.ok:
                            exact_failures.append(
                                f"{kernel}:{best.variant}:window")
                            continue
                        win_us.append(r.seconds_per_call * 1e6)
                    win_us.sort()
                    med_win = win_us[len(win_us) // 2]
                    legs[kernel] = {
                        "variant": best.variant,
                        "us_per_step": round(med_win, 3),
                        "gpts_per_s": round(
                            spec.grid_points(cfg) / (med_win * 1e-6), 0),
                        **({"windows_us": [round(w, 3) for w in win_us]}
                           if len(win_us) > 1 else {}),
                        **_leg_band_us(best),
                    }
                    extra_lines.append(
                        f"[bench] {kernel:<16s} exact best="
                        f"{best.variant:<22s} "
                        f"{best.seconds_per_call * 1e6:9.2f} us/step "
                        f"{best.grid_points_per_s / 1e6:10.1f} M pts/s "
                        f"(no reference baseline; not in geomean)"
                    )
            except Exception as e:
                err(f"[bench] {kernel}: ERROR {type(e).__name__}: {e}")
                exact_failures.append(f"{kernel}:<all>")
            continue
        # device-side init: the tunnel's host->device upload is 0.5-20 MB/s
        # and was observed to add 11 min of staging for CKE's ~25 MB of
        # host arrays; jax.random generation on device has the same
        # shapes/distributions and verification runs against the same data
        cfg = with_overrides(spec.default_config(), dtype="float32",
                             device_init=True)
        try:
            # min_delta=20 ms: the measured slope must clear the tunnel's
            # ±2 ms dispatch jitter by 10x, not the default 5 ms's 2.5x —
            # the shipped-size biharmonic leg (~2 us/step) otherwise reads
            # anywhere in 2.1-4.1 us across windows, a ~20% swing on the
            # recorded geomean (BENCH_r02 vs session-6 logs)
            with _deadline(900):
                results = driver.run_kernel(kernel, cfg, iters=100,
                                            trials=5, quiet=True,
                                            min_delta=20e-3)
        except Exception as e:  # one kernel failing must not zero the bench
            err(f"[bench] {kernel}: ERROR {type(e).__name__}: {e}")
            exact_failures.append(f"{kernel}:<all>")
            continue
        exact_failures += [
            f"{kernel}:{r.variant}" for r in results
            if not r.ok and not r.fast_math
        ]
        ok = [r for r in results if r.ok]
        base = BASELINES_PTS_S[kernel]
        kind = BASELINE_KIND[kernel]
        for tag, pool, ratios in (
            ("exact", [r for r in ok if not r.fast_math], exact_ratios),
            ("fast ", ok, fm_ratios),
        ):
            if not pool:
                err(f"[bench] {kernel}: NO PASSING {tag.strip()} VARIANT")
                continue
            best = _best(pool, PRODUCTION_CHAMPIONS.get(kernel))
            ratio = best.grid_points_per_s / base
            ratios.append(ratio)
            if tag == "exact":
                legs[kernel] = {
                    "variant": best.variant,
                    "us_per_step": round(best.seconds_per_call * 1e6, 3),
                    "gpts_per_s": round(best.grid_points_per_s, 0),
                    **_leg_band_us(best),
                }
                # ratio band endpoints from the slope dispersion: hi =
                # the headline's best-window slope, lo = the MEDIAN
                # trial slope (typical window).  Per-pair extremes are
                # excluded from the geomean band — single tunnel stalls
                # (a 34 us pair on a 3.6 us kernel) and sub-floor pair
                # minima are measurement artifacts, while the median/best
                # spread reproduces the observed 71.8-74.3x round-3
                # window spread.  Raw min/max stay in the per-leg rows.
                m = best.metrics
                if "slope_median" in m and m["slope_median"] > 0:
                    exact_lo.append(
                        ratio * best.seconds_per_call / m["slope_median"])
                    exact_hi.append(ratio)
                else:
                    exact_lo.append(ratio)
                    exact_hi.append(ratio)
            err(
                f"[bench] {kernel:<11s} {tag} best={best.variant:<20s} "
                f"{best.seconds_per_call * 1e6:9.2f} us/step "
                f"{best.grid_points_per_s / 1e6:10.1f} M pts/s "
                f"{ratio:8.1f}x vs {kind}"
            )

    for line in extra_lines:
        err(line)

    # ---- production-scale sweep: champions only, verified + gated ----
    from cdk_tpu.core.config import production_config

    production = {}
    for kernel, champ in PRODUCTION_CHAMPIONS.items():
        try:
            with _deadline(900):
                results = driver.run_kernel(
                    kernel, production_config(kernel), variants=[champ],
                    iters=50, trials=3, quiet=True, min_delta=20e-3)
        except Exception as e:
            err(f"[bench] production {kernel}: ERROR "
                f"{type(e).__name__}: {e}")
            exact_failures.append(f"production:{kernel}:<all>")
            continue
        r = next((r for r in results if r.variant == champ), None)
        if r is None or not r.ok:
            err(f"[bench] production {kernel}: {champ} "
                f"{'missing' if r is None else 'VERIFY FAILED'}")
            exact_failures.append(f"production:{kernel}:{champ}")
            continue
        production[kernel] = {
            "variant": champ,
            "us_per_step": round(r.seconds_per_call * 1e6, 2),
            "gpts_per_s": round(r.grid_points_per_s, 0),
            **_leg_band_us(r),
        }
        err(f"[bench] production {kernel:<16s} {champ:<28s} "
            f"{r.seconds_per_call * 1e6:9.2f} us/step "
            f"{r.grid_points_per_s / 1e9:7.2f} G pts/s")

    # ---- distributed production paths: 1-dev mesh, verified + gated ----
    # (VERDICT r4 #2: pre-round-5 these lived only in hand-run probe logs
    # and could silently regress with RC=0)
    from cdk_tpu.harness.distbench import run_dist_legs

    dist_rows = {}
    try:
        with _deadline(1800):
            dlegs = run_dist_legs(PRODUCTION_CHAMPIONS, production=True,
                                  trials=3, quiet=True)
    except Exception as e:
        err(f"[bench] dist: ERROR {type(e).__name__}: {e}")
        exact_failures.append("dist:<all>")
        dlegs = []
    for d in dlegs:
        if not d.ok:
            why = d.note or f"VERIFY FAILED err={d.err:.3e}"
            err(f"[bench] dist {d.family}: {d.path} {why}")
            exact_failures.append(f"dist:{d.family}:{d.path}")
            continue
        dist_rows[d.family] = {
            "path": d.path,
            "us_per_step": round(d.seconds_per_call * 1e6, 2),
            "gpts_per_s": round(d.grid_points_per_s, 0),
            "min_us": round(d.slope_min * 1e6, 3),
            "median_us": round(d.slope_median * 1e6, 3),
            "max_us": round(d.slope_max * 1e6, 3),
            "err": d.err,
        }
        err(f"[bench] dist       {d.family:<16s} {d.path:<28s} "
            f"{d.seconds_per_call * 1e6:9.2f} us/step "
            f"{d.grid_points_per_s / 1e9:7.2f} G pts/s")

    if exact_failures:
        err(f"[bench] FAILED exact variants: {', '.join(exact_failures)}")

    gm = _geomean(exact_ratios)
    gm_lo, gm_hi = _geomean(exact_lo), _geomean(exact_hi)
    err(f"[bench] verified-parity geomean {gm:.1f}x "
        f"[band {gm_lo:.1f}-{gm_hi:.1f}x] "
        f"(fast-math speed point: {_geomean(fm_ratios):.1f}x)")
    print(json.dumps({
        "metric": "verified_kernel_geomean_speedup",
        "value": round(gm, 3),
        "unit": "x",
        "vs_baseline": round(gm, 3),
        "band": {"lo": round(gm_lo, 3), "hi": round(gm_hi, 3)},
        "legs": legs,
        "production": production,
        "dist": dist_rows,
    }))
    if not exact_ratios or exact_failures:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

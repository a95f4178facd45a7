"""Headline benchmark: all three co-design kernels on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline = geometric-mean speedup over the reference's best published
accelerator numbers (BASELINE.md; Titan K20X, 2017), using the
compute-kernel figures that match our steady-state (transfer-free) timing
semantics:

  biharmonic_wk : GPU2 device-kernel compute 1.033 ms/call → 716 M pts/s
                  (nvprof split, atm.pgiacc.17.7-nvprof:11-15; the 3.074 ms
                  headline includes H2D/D2H which a resident-data TPU run
                  never pays per step)
  MPDATA        : OpenACC-2 warm 294 µs/step, transfers excluded →
                  298 M pts/s (advect.pgiacc.17.7:12)
  nested (CKE)  : no committed baseline (BASELINE.md) — reported on stderr,
                  excluded from the geomean.

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
}


def main() -> int:
    from cdk_tpu.core.platform import enable_compilation_cache

    enable_compilation_cache()
    import cdk_tpu.kernels  # noqa: F401
    from cdk_tpu.core.config import with_overrides
    from cdk_tpu.harness import driver
    from cdk_tpu.harness.specs import all_specs

    err = lambda *a: print(*a, file=sys.stderr, flush=True)

    speedups = []
    detail = {}
    for kernel, spec in all_specs().items():
        cfg = with_overrides(spec.default_config(), dtype="float32")
        try:
            with _deadline(900):
                results = driver.run_kernel(kernel, cfg, iters=100,
                                            trials=5, quiet=True)
        except Exception as e:  # one kernel failing must not zero the bench
            err(f"[bench] {kernel}: ERROR {type(e).__name__}: {e}")
            continue
        ok = [r for r in results if r.ok]
        if not ok:
            err(f"[bench] {kernel}: NO PASSING VARIANT")
            continue
        best = max(ok, key=lambda r: r.grid_points_per_s)
        detail[kernel] = best
        base = BASELINES_PTS_S.get(kernel)
        ratio = best.grid_points_per_s / base if base else None
        err(
            f"[bench] {kernel:<11s} best={best.variant:<18s} "
            f"{best.seconds_per_call * 1e6:9.2f} us/step "
            f"{best.grid_points_per_s / 1e6:10.1f} M pts/s"
            + (f"  {ratio:8.1f}x vs K20X" if ratio else "  (no baseline)")
        )
        if ratio:
            speedups.append(ratio)

    if not speedups:
        print(json.dumps({"metric": "kernel_geomean_speedup_vs_k20x",
                          "value": 0.0, "unit": "x", "vs_baseline": 0.0}))
        return 1

    geomean = 1.0
    for s in speedups:
        geomean *= s
    geomean **= 1.0 / len(speedups)
    print(json.dumps({
        "metric": "kernel_geomean_speedup_vs_k20x",
        "value": round(geomean, 3),
        "unit": "x",
        "vs_baseline": round(geomean, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Multi-scale slope cross-check for a variant's timed loop.

The harness times kernels via a two-point slope of device-side scan loops
(cdk_tpu/core/timer.py:slope_time).  This probe prints the slope at
SEVERAL widely-separated scales: a real per-step time is scale-invariant,
while a measurement artifact (optimistic window, dispatch leakage) shows
up as scale-dependent slopes.

Settled a round-2 discrepancy: shipped-size packed mpdata had an early
1.37 us/step reading vs the bench's 6.10; the slopes here read
6.05-6.33 us at every scale from n=100 to n=51200, and 6.10 is also
throughput-consistent with the production figure (14.3 vs 13.3 G pts/s)
-- so 6.10 is the true steady state (results/tpu-v5e/round2-summary.txt).

Usage (detached worker, one TPU process at a time):
    python scripts/slope_scale_check.py [kernel] [variant]
"""

import sys
import time

from cdk_tpu.core.platform import enable_compilation_cache

enable_compilation_cache()

import cdk_tpu.kernels  # noqa: F401,E402
from cdk_tpu.core import registry  # noqa: E402
from cdk_tpu.core.config import with_overrides  # noqa: E402
from cdk_tpu.core.timer import fetch_sync  # noqa: E402
from cdk_tpu.harness.specs import all_specs  # noqa: E402


def main(kernel: str = "mpdata", variant: str = "pallas_packed"):
    spec = all_specs()[kernel]
    cfg = with_overrides(spec.default_config(), dtype="float32",
                         device_init=True)
    data = spec.init(cfg)
    var = registry.get(kernel, variant)
    step2, aux, vloop = registry._materialize(var, cfg, data)
    if vloop is not None:
        make_runner = lambda n: (lambda d: vloop(d, n))  # noqa: E731
    else:
        make_runner = lambda n: spec.scan_runner(step2, aux, n)  # noqa: E731

    def best(n, trials=5):
        r = make_runner(n)
        fetch_sync(r(data))  # compile + warm
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            fetch_sync(r(data))
            b = min(b, time.perf_counter() - t0)
        return b

    for n1, n2 in [(100, 800), (800, 6400), (3200, 25600), (12800, 51200)]:
        t1, t2 = best(n1), best(n2)
        print(f"n1={n1} n2={n2}: t1={t1 * 1e3:.2f}ms t2={t2 * 1e3:.2f}ms "
              f"slope={(t2 - t1) / (n2 - n1) * 1e6:.3f} us/step", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])

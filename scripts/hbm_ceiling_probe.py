"""Measure the platform's REAL achievable HBM streaming bandwidth.

Times an n-step device-side scan of `y = 1.0001 * x` (read n + write n
floats per step) at several buffer sizes via two-point slope (cancels the
~24 ms tunnel dispatch+fetch round trip; see cdk_tpu/core/timer.py).

Measured on the v5e behind the axon tunnel (2026-08-17, worker30):

    buf =  64 MB   ~3 TB/s   -- fits the 128 MB VMEM: XLA keeps the scan
                                carry resident on-chip, never touching HBM
    buf = 256 MB   591 GB/s  -- true HBM streaming (r+w)
    buf =   1 GB   610 GB/s

So the real streaming ceiling is ~600 GB/s (73% of the 820 GB/s nominal),
and sub-~100 MB scan working sets ride VMEM at multi-TB/s.  Every
"speed-of-light" bound in results/ is calibrated against the 600 GB/s
figure, not the nominal one.

Run as a detached worker (never concurrently with another TPU process):
    setsid nohup python scripts/hbm_ceiling_probe.py > /tmp/hbm.log 2>&1 &
"""

import functools
import time

from cdk_tpu.core.platform import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from cdk_tpu.core.timer import fetch_sync  # noqa: E402


def main():
    key = jax.random.PRNGKey(0)

    for mb in (64, 256, 1024):
        n = mb * 2**20 // 4
        x = jax.random.normal(key, (n,), jnp.float32)

        @functools.partial(jax.jit, static_argnames="steps")
        def scale_loop(x, steps):
            def body(c, _):
                return c * jnp.float32(1.0001), None

            out, _ = jax.lax.scan(body, x, None, length=steps)
            return out

        fetch_sync(scale_loop(x, 4))  # compile + warm
        fetch_sync(scale_loop(x, 32))

        def best(steps, trials=5):
            b = float("inf")
            for _ in range(trials):
                t0 = time.perf_counter()
                fetch_sync(scale_loop(x, steps))
                b = min(b, time.perf_counter() - t0)
            return b

        n1, n2 = 8, 64
        sl = (best(n2) - best(n1)) / (n2 - n1)
        gbs = 2 * mb / 1024 / sl if sl > 0 else float("nan")
        print(f"scale buf={mb}MB: {sl * 1e3:.3f} ms/step -> "
              f"{gbs:.0f} GB/s stream (r+w)", flush=True)


if __name__ == "__main__":
    main()

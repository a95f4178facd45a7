"""CKE gather-rate perspective probe (VERDICT r4 #8, stretch).

The CKE exact leg is closed at the XLA random-row-gather issue rate
(176 GB/s / 2.9 ns/slot-row at the parity problem's 512 B rows —
round4-summary §2/§8, three measured alternatives).  All of that
closure evidence is at ONE row width.  This probe measures the same
random row-gather at 2x and 4x wider rows (multi-tracer lanes — a
capability question outside the parity problem definition) to document
whether the rate is per-row-overhead-bound (time/pick ~constant as
rows widen -> GB/s scales with width) or truly bandwidth-bound (GB/s
~constant -> time scales with width).

Shape mirrors the shipped gather: ncells=2800 cell rows, 25600 edges x
10 adv slots = 256k row-picks per step, f32.  K = lanes per row
(128 = the parity problem's padded nvert; 256/512 = 2x/4x).
Anchor: the gather loop, /root/reference/nested_loops/nested.F90:533-552.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _slope(call, n1, n2, trials=5):
    from cdk_tpu.core.timer import fetch_sync

    def run(n):
        fetch_sync(call(n))

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


def main() -> int:
    from cdk_tpu.core.platform import enable_compilation_cache

    enable_compilation_cache()
    ncells, nedges, nadv = 2800, 25600, 10
    rng = np.random.default_rng(7)
    idx = jnp.asarray(rng.integers(0, ncells, (nedges, nadv)),
                      jnp.int32)
    coef = jnp.asarray(rng.standard_normal((nedges, nadv)), jnp.float32)
    for K in (128, 256, 512):
        key = jax.random.PRNGKey(K)
        tracer = jax.random.uniform(key, (ncells, K), jnp.float32)

        @jax.jit
        def step(t, idx, coef):
            # slot-order accumulation over per-slot whole-table row
            # gathers — the gather_peradv structure (kernels/cke/
            # gather_peradv.py), minus the second coefficient stream
            s = jnp.zeros((idx.shape[0], t.shape[1]), t.dtype)
            for i in range(nadv):
                s = s + coef[:, i:i + 1] * jnp.take(t, idx[:, i], axis=0)
            return s

        def loop(t, idx, coef, n):
            def body(carry, _):
                # t + carry: the table depends on the carry, so the
                # gather cannot be hoisted out of the loop; sum(s)
                # consumes EVERY gathered element, so no column can be
                # dead-code-eliminated
                s = step(t + carry, idx, coef)
                return jnp.sum(s) * jnp.float32(1e-30), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
            return out

        import functools
        loopn = functools.partial(jax.jit, static_argnames="n")(
            lambda t, i, c, n: loop(t, i, c, n))
        sec = _slope(lambda n: loopn(tracer, idx, coef, n), 20, 80)
        picks = nedges * nadv
        gb = picks * K * 4 / sec / 1e9
        print(f"[widerow K={K:<4d} row={K * 4:>5d}B] "
              f"{sec * 1e6:9.2f} us/step  {sec / picks * 1e9:6.2f} "
              f"ns/pick  {gb:7.1f} GB/s gathered", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

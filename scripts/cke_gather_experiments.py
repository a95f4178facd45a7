"""Timing experiment: alternative XLA formulations of the CKE irregular
gather at the shipped size. Results inform which gather strategy the
reference variant should use (run on TPU).

Usage: python scripts/cke_gather_experiments.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    from cdk_tpu.core.platform import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cdk_tpu.core.config import CkeConfig
    from cdk_tpu.core.timer import slope_time
    from cdk_tpu.kernels.cke import problem

    cfg = CkeConfig(dtype="float32")
    data = problem.init_data(cfg)
    t = jax.device_put(data.tracer * data.cell_mask)
    cells = jax.device_put(data.adv_cells)
    c1 = jax.device_put(data.adv_coefs)
    e, a = cells.shape
    c, kv = t.shape

    def scan_runner(one_iter):
        def make(n):
            @jax.jit
            def run(t, cells, c1):
                def body(carry, _):
                    tr, _ = carry
                    out = one_iter(tr, cells, c1)
                    # carry the output, and feed a vanishing function of it
                    # back into the tracer so XLA cannot hoist the body out
                    # of the loop
                    tr_next = tr + out[0:1, 0:1] * 1e-30
                    return (tr_next, out), None

                (_, out), _ = lax.scan(
                    body, (t, jnp.zeros((e, kv), t.dtype)), None, length=n
                )
                return out

            return lambda d: run(t, cells, c1)

        return make

    def report(name, one_iter):
        try:
            sec = slope_time(scan_runner(one_iter), None, n1=20, n2=160,
                             trials=3)
            print(f" {name:<28s} {sec * 1e6:10.2f} us/iter", flush=True)
        except Exception as ex:
            print(f" {name:<28s} ERROR {type(ex).__name__}: {str(ex)[:100]}",
                  flush=True)

    # 1. row gather then weighted reduce (current reference formulation)
    def g_rows(tr, cells, c1):
        g = tr[cells]  # (e, a, kv)
        return jnp.einsum("ea,eak->ek", c1, g)

    # 2. flat row gather
    def g_flat(tr, cells, c1):
        g = jnp.take(tr, cells.reshape(-1), axis=0).reshape(e, a, kv)
        return jnp.einsum("ea,eak->ek", c1, g)

    # 3. transposed gather (lane-axis take)
    def g_T(tr, cells, c1):
        g = jnp.take(tr.T, cells.reshape(-1), axis=1)  # (kv, e*a)
        return jnp.einsum(
            "ea,kea->ek", c1, g.reshape(kv, e, a)
        )

    # 4. per-adv loop of single-index gathers (a gathers of e rows)
    def g_peradv(tr, cells, c1):
        acc = jnp.zeros((e, kv), t.dtype)
        for i in range(a):
            acc = acc + c1[:, i:i + 1] * jnp.take(tr, cells[:, i], axis=0)
        return acc

    # 5. sorted gather: indices presorted by cell (prepare-time argsort),
    #    inverse-permute after
    flat = cells.reshape(-1)
    order = jnp.argsort(flat)
    inv = jnp.argsort(order)
    sorted_idx = flat[order]

    def g_sorted(tr, cells, c1):
        g = jnp.take(tr, sorted_idx, axis=0, indices_are_sorted=True)
        g = jnp.take(g, inv, axis=0).reshape(e, a, kv)
        return jnp.einsum("ea,eak->ek", c1, g)

    print(f"CKE gather strategies, shipped size ({e}x{c}x{kv}, nadv={a}), "
          f"{jax.default_backend()}:", flush=True)
    for name, fn in [
        ("rows (t[cells])", g_rows),
        ("flat take axis0", g_flat),
        ("transposed take axis1", g_T),
        ("per-adv column gathers", g_peradv),
        ("presorted + unpermute", g_sorted),
    ]:
        report(name, fn)
    return 0


if __name__ == "__main__":
    sys.exit(main())

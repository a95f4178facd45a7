"""Experiment: does padding tracer rows to 128 lanes (512 B, sector-
aligned) BEFORE the irregular gather speed up the XLA row gather?

gather_peradv gathers (E,) rows of 100 f32 = 400 B — sub-sector,
unaligned.  If the gather engine pays per 512 B sector, padded rows are
the same sector count but aligned; measure both at shipped size.
Usage: python scripts/cke_padk_experiment.py [nedges]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp


def main(nedges: int) -> int:
    from cdk_tpu.core.config import CkeConfig, with_overrides
    from cdk_tpu.core.platform import enable_compilation_cache
    from cdk_tpu.core.timer import slope_time
    from cdk_tpu.kernels.cke import problem
    from cdk_tpu.kernels.cke.reference import fsign1

    enable_compilation_cache()
    cfg = with_overrides(CkeConfig(), dtype="float32", nedges=nedges,
                         device_init=True)
    data = problem.init_data(cfg)
    coef3 = jnp.float32(cfg.coef3rdorder)

    def form(kpad):
        kv = data.tracer.shape[1]
        def one(t, cells, c1, c3, ntf, advm):
            tp = jnp.pad(t, ((0, 0), (0, kpad - kv))) if kpad > kv else t
            s1 = jnp.zeros((cells.shape[0], tp.shape[1]), tp.dtype)
            s3 = jnp.zeros_like(s1)
            for i in range(cells.shape[1]):
                g = jnp.take(tp, cells[:, i], axis=0)
                s1 = s1 + c1[:, i:i + 1] * g
                s3 = s3 + c3[:, i:i + 1] * g
            ntf_p = (jnp.pad(ntf, ((0, 0), (0, kpad - kv)))
                     if kpad > kv else ntf)
            advm_p = (jnp.pad(advm, ((0, 0), (0, kpad - kv)))
                      if kpad > kv else advm)
            out = ntf_p * advm_p * (s1 + coef3 * s3 * fsign1(ntf_p))
            return out[:, :kv]
        return one

    for kpad in (100, 128):
        one = form(kpad)

        def make(n, one=one):
            @jax.jit
            def run(t, cells, c1, c3, ntf, advm):
                def body(carry, _):
                    tr = carry
                    o = one(tr, cells, c1, c3, ntf, advm)
                    return jnp.maximum(tr, 0.0), o
                _, outs = jax.lax.scan(body, t, None, length=n)
                return outs[-1]
            return lambda d: run(data.tracer * data.cell_mask,
                                 data.adv_cells, data.adv_coefs,
                                 data.adv_coefs3, data.ntf, data.adv_mask)

        sec = slope_time(make, None, n1=10, n2=40, trials=3)
        print(f"[padk kpad={kpad} E={nedges}] {sec * 1e6:.1f} us/iter",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(int(sys.argv[1]) if len(sys.argv) > 1 else 25600))

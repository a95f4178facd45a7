"""Pin the residual ~2.5e-13 in the f64 on-chip DSS-family rows.

f64_on_chip_probe round-4 rerun: after apply_operator's no-dot exact-f64
path, biharmonic_dss/dss2d `fused_operator_f32` still read 2.5e-13 vs the
host oracle (stable across tree-reduce AND fixed-order-chain apply
formulations, so the apply's reduction order is NOT the source).  This
probe decomposes the step: (a) compare the BUILT operator L on-chip vs
host; (b) run the apply+assembly+apply composition on both backends from
the SAME host-built L; (c) the full step (build on device) — attributing
the residual to build vs apply-chain vs their interaction.

Run with JAX_ENABLE_X64=1 on the axon tunnel.
"""

from __future__ import annotations

import jax
import numpy as np


def _run_on(device, fn, *args):
    args = jax.device_put(args, device)
    out = jax.jit(fn)(*args)
    return jax.device_get(out)


def main() -> int:
    assert jax.config.read("jax_enable_x64"), "run with JAX_ENABLE_X64=1"
    from cdk_tpu.core.config import BiharmonicConfig, with_overrides
    from cdk_tpu.core.norms import rel_l2
    from cdk_tpu.kernels.biharmonic import problem
    from cdk_tpu.kernels.biharmonic.dss import dss_ring_lane, dss_weights
    from cdk_tpu.kernels.biharmonic.operator import (
        apply_operator,
        build_element_operator,
    )
    from cdk_tpu.kernels.biharmonic.problem import to_lane_layout

    cpu = jax.devices("cpu")[0]
    tpu = jax.devices()[0]
    assert tpu.platform != "cpu"
    print(f"devices: oracle={cpu.platform} candidate={tpu.platform}",
          flush=True)

    cfg = with_overrides(BiharmonicConfig(), nelemd=2, nlev=4, qsize=4,
                         dtype="float64")
    data = problem.init_data(cfg)
    rr = cfg.np_dtype(cfg.rrearth)
    npg = cfg.np_gll

    def build(data):
        return build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr)

    def chain(L, w, q):
        s = apply_operator(L, q, None)
        return apply_operator(L, dss_ring_lane(s, w, npg), None)

    def full(data):
        L = build(data)
        w = dss_weights(data.spheremp)
        return chain(L, w, to_lane_layout(data.qtens))

    # (a) operator build alone
    L_cpu = _run_on(cpu, build, data)
    L_tpu = _run_on(tpu, build, data)
    print(f"[stage] build L          rel_l2 tpu-vs-cpu = "
          f"{rel_l2(L_tpu, L_cpu):.3e}", flush=True)

    # (b) apply+assembly+apply from the SAME host-built L
    w_cpu = _run_on(cpu, dss_weights, data.spheremp)
    q = np.asarray(jax.device_get(
        _run_on(cpu, lambda d: to_lane_layout(d.qtens), data)))
    c_cpu = _run_on(cpu, chain, L_cpu, w_cpu, q)
    c_tpu = _run_on(tpu, chain, L_cpu, w_cpu, q)
    print(f"[stage] chain(hostL)     rel_l2 tpu-vs-cpu = "
          f"{rel_l2(c_tpu, c_cpu):.3e}", flush=True)

    # (b') single apply from host L
    a_cpu = _run_on(cpu, lambda L, q: apply_operator(L, q, None), L_cpu, q)
    a_tpu = _run_on(tpu, lambda L, q: apply_operator(L, q, None), L_cpu, q)
    print(f"[stage] 1 apply(hostL)   rel_l2 tpu-vs-cpu = "
          f"{rel_l2(a_tpu, a_cpu):.3e}", flush=True)

    # (c) full step, build on device
    f_cpu = _run_on(cpu, full, data)
    f_tpu = _run_on(tpu, full, data)
    print(f"[stage] full (devL)      rel_l2 tpu-vs-cpu = "
          f"{rel_l2(f_tpu, f_cpu):.3e}", flush=True)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())

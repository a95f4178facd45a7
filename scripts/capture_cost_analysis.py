"""Capture XLA cost analysis + measured per-step times for every variant —
the committed-profile analog of the reference's results/*-nvprof artifacts
(atmosphere/results/atm.pgiacc.17.7-nvprof etc.).

Usage: python scripts/capture_cost_analysis.py [outfile]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    from cdk_tpu.core.platform import enable_compilation_cache

    enable_compilation_cache()
    import jax

    import cdk_tpu.kernels  # noqa: F401
    from cdk_tpu.core import registry
    from cdk_tpu.core.config import with_overrides
    from cdk_tpu.harness.specs import all_specs

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/dev/stdout"
    lines = [
        f"XLA cost analysis per variant (platform {jax.default_backend()})",
        "flops/bytes are the compiler's own estimates for ONE step "
        "executable — the roofline inputs",
        "",
    ]
    for kernel, spec in all_specs().items():
        cfg = with_overrides(spec.default_config(), dtype="float32")
        data = jax.device_put(spec.init(cfg))
        for name, var in registry.variants(kernel).items():
            try:
                step2, aux, _ = registry._materialize(var, cfg, data)
                lowered = jax.jit(step2).lower(aux, data)
                ca = lowered.compile().cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0] if ca else {}
                flops = ca.get("flops", 0.0)
                bytes_ = ca.get("bytes accessed", 0.0)
                lines.append(
                    f" {kernel:<11s} {name:<22s} flops={flops:14.3e}  "
                    f"bytes={bytes_:14.3e}  "
                    f"AI={flops / max(bytes_, 1):8.2f} flop/B"
                )
            except Exception as e:
                lines.append(f" {kernel:<11s} {name:<22s} ERROR: "
                             f"{type(e).__name__}: {str(e)[:80]}")
    text = "\n".join(lines) + "\n"
    with open(out_path, "w") as fh:
        fh.write(text)
    print(text[-2000:], file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

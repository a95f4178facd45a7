"""Kernel-variant registry.

The reference ships N implementation variants per kernel, dispatched by the
driver program (e.g. biharmonic CPU / gpu_compiler_inline / gpu_push_loop,
biharmonic_wk_kernel.F90:100-536; nested original / gpu-optimized / k-tiled /
cke_impl1 / cke_impl2, nested.F90:191-439).  Here variants register under
(kernel, variant-name) and the harness enumerates them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

_REGISTRY: dict[str, dict[str, "Variant"]] = {}


@dataclass(frozen=True)
class Variant:
    kernel: str
    name: str
    fn: Callable
    description: str = ""
    requires_tpu: bool = False
    supports_f64: bool = True
    fast_math: bool = False  # intentionally-lower-precision variant


def register(
    kernel: str,
    name: str,
    description: str = "",
    requires_tpu: bool = False,
    supports_f64: bool = True,
    fast_math: bool = False,
):
    def deco(fn):
        _REGISTRY.setdefault(kernel, {})[name] = Variant(
            kernel, name, fn, description, requires_tpu, supports_f64,
            fast_math
        )
        return fn

    return deco


def variants(kernel: str) -> dict[str, "Variant"]:
    return dict(_REGISTRY.get(kernel, {}))


def get(kernel: str, name: str) -> "Variant":
    return _REGISTRY[kernel][name]


def kernels() -> list[str]:
    return sorted(_REGISTRY)


def _materialize(variant: "Variant", cfg, data):
    """-> (step, loop_or_None).

    Variant factories return one of:
      step(data)
      (prepare, step2)            — prepare(data) builds untimed
                                    device-resident auxiliaries (the analog
                                    of the reference's untimed staging,
                                    nested.F90:400-403); step2(aux, data)
      {"step":…, "prepare":…, "loop":…}
                                  — `loop(data, n)` runs n steps with state
                                    kept in the variant's resident layout
                                    (the reference's `do n=1,nIters` over
                                    device-resident data, nested.F90:191-199
                                    — per-step layout conversion at the
                                    harness boundary is not part of the
                                    kernel)."""
    made = variant.fn(cfg)
    loop = None
    if isinstance(made, dict):
        loop = made.get("loop")
        prepare = made.get("prepare")
        step2 = made["step"]
        made = (prepare, step2) if prepare else step2
    if isinstance(made, tuple):
        prepare, step2 = made
        aux = prepare(data)

        def step(d, _aux=aux, _s=step2):
            return _s(_aux, d)

        return step, loop
    return made, loop


def make_step(variant: "Variant", cfg, data):
    """Materialize a variant into a plain step(data) callable."""
    return _materialize(variant, cfg, data)[0]

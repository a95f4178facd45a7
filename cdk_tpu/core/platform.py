"""Platform helpers: backend detection and Pallas interpret-mode fallback."""

from __future__ import annotations

import jax


def backend() -> str:
    return jax.default_backend()


def on_tpu() -> bool:
    # The axon tunnel reports platform 'axon' but devices are TPUs.
    if backend() in ("tpu", "axon"):
        return True
    try:
        return any(d.platform in ("tpu", "axon") for d in jax.devices())
    except RuntimeError:
        return False


def pallas_interpret() -> bool:
    """Pallas TPU kernels run compiled on TPU, interpreted elsewhere (so the
    same variant code is testable on the CPU test mesh)."""
    return not on_tpu()


def enable_compilation_cache(path: str = "/tmp/cdk_jax_cache") -> None:
    """Persistent compilation cache: compiles survive across processes, so
    short-lived benchmark invocations skip recompilation."""
    import os

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

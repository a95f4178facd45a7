"""Weak-scaling harness: grid-points/s and parallel efficiency as devices
grow with the domain (the BASELINE.json north-star metric: ≥80% weak-scaling
efficiency from 1 chip up).

On real multi-chip hardware the mesh spans chips/hosts; on a single-chip or
CPU session the same code runs against `xla_force_host_platform_device_count`
virtual devices (functional validation of the decomposition + collectives;
absolute numbers are only meaningful on real hardware)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from cdk_tpu.core.config import MpdataConfig, with_overrides
from cdk_tpu.core.timer import fetch_sync
from cdk_tpu.dist import mesh as meshmod
from cdk_tpu.dist import mpdata as dist_mpdata


@dataclass
class ScalePoint:
    n_devices: int
    nx_global: int
    seconds_per_step: float
    grid_points_per_s: float
    efficiency: float  # vs the 1-device point, weak scaling


def _time_steps(step, args, n_steps: int, trials: int = 3) -> float:
    """Best-of total seconds for n_steps chained dispatches (per-dispatch;
    the dist step is one XLA program per call)."""
    import time

    def run():
        f_s = args[0]
        out = None
        for _ in range(n_steps):
            out = step(f_s, *args[1:])
            f_s = out[0]
        fetch_sync(out)

    run()  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best / n_steps


def weak_scaling_mpdata(
    device_counts=(1, 2, 4, 8),
    nx_per_device: int = 64,
    nslices: int = 48,
    nz: int = 58,
    dtype: str = "float32",
    n_steps: int = 20,
    overlap: bool = True,
    quiet: bool = False,
) -> list[ScalePoint]:
    """Grow the global x domain proportionally to the device count and
    measure grid-points/s per step of the halo-exchange dist step."""
    say = (lambda *a: None) if quiet else print
    points: list[ScalePoint] = []
    base_pts_per_dev = None
    for n in device_counts:
        if n > len(jax.devices()):
            say(f" weak-scaling: skipping n={n} (only "
                f"{len(jax.devices())} devices)")
            continue
        nx = nx_per_device * n
        cfg = with_overrides(
            MpdataConfig(), nx=nx, nslices=nslices, nz=nz, dtype=dtype
        )
        m = meshmod.make_mesh(n)
        shard_inputs, step_plain, _ = dist_mpdata.make_dist_step(cfg, m)
        step = (dist_mpdata.make_dist_step_overlap(cfg, m)
                if overlap else step_plain)
        from cdk_tpu.kernels.mpdata import problem

        data = problem.init_data(cfg)
        f_s, u_s, w_s, aux = shard_inputs(data)
        sec = _time_steps(step, (f_s, u_s, w_s, aux), n_steps)
        pts = cfg.grid_points / sec
        per_dev = pts / n
        if base_pts_per_dev is None:
            base_pts_per_dev = per_dev
        eff = per_dev / base_pts_per_dev
        points.append(ScalePoint(n, nx, sec, pts, eff))
        say(
            f" weak-scaling mpdata n={n:<2d} nx={nx:<5d} "
            f"{sec * 1e6:9.2f} us/step {pts / 1e6:10.1f} M pts/s "
            f"eff={eff * 100:5.1f}%"
        )
    return points

"""Error norms used for variant-vs-reference verification.

Replicates the three verification idioms of the reference suite:
  - relative L2 norm (atmosphere `compute_l2norm`,
    biharmonic_wk_kernel.F90:69-73)
  - relative L1 error (mpdata `compare`, advect_scalar2D…F90:679-684)
  - per-point relative error with tolerance + violation reporting
    (nested_loops verification loops, nested.F90:267-287)
"""

from __future__ import annotations

import numpy as np


def rel_l2(x, ref) -> float:
    """sqrt( sum((x - ref)^2) / sum(ref^2) )."""
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    denom = float(np.sum(ref * ref))
    if denom == 0.0:
        return float(np.sqrt(np.sum((x - ref) ** 2)))
    return float(np.sqrt(np.sum((x - ref) ** 2) / denom))


def rel_l1(x, ref) -> float:
    """sum(|x - ref|) / sum(|ref|)."""
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    denom = float(np.sum(np.abs(ref)))
    if denom == 0.0:
        return float(np.sum(np.abs(x - ref)))
    return float(np.sum(np.abs(x - ref)) / denom)


def pointwise_check(
    x, ref, tol: float, max_report: int = 10
) -> tuple[int, float, list[str]]:
    """Per-point relative error check with violation reporting.

    Returns (num_violations, max_rel_err, report_lines). Relative error is
    |x - ref| / |ref| where ref != 0, else absolute — exactly the reference's
    check (nested.F90:269-275). NaNs count as violations (the reference's
    isnan guard, nested.F90:427)."""
    x = np.asarray(x, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    err = np.abs(x - ref)
    rel = np.where(ref != 0.0, err / np.where(ref != 0.0, np.abs(ref), 1.0), err)
    bad = np.isnan(rel) | (rel > tol)
    n_bad = int(bad.sum())
    max_err = float(np.nanmax(rel)) if rel.size else 0.0
    lines = []
    if n_bad:
        idxs = np.argwhere(bad)[:max_report]
        for idx in idxs:
            t = tuple(int(v) for v in idx)
            lines.append(
                f" Error computing result at {t}: got {x[tuple(idx)]!r}, "
                f"expected {ref[tuple(idx)]!r}"
            )
    return n_bad, max_err, lines


def device_host_consistency(device_tree, host_tree, tol: float = 0.0):
    """Elementwise device-vs-host buffer comparison — the analog of the
    reference's yakl_check (nested_yakl_c.cpp:237-264), which verifies that
    device copies of cellMask/tracerCur still match the host arrays.

    Returns (ok, report_lines). tol=0 demands bitwise equality (transfers
    must be lossless)."""
    import jax

    d_leaves = jax.tree_util.tree_leaves(device_tree)
    h_leaves = jax.tree_util.tree_leaves(host_tree)
    lines = []
    ok = True
    for i, (d, h) in enumerate(zip(d_leaves, h_leaves)):
        dv = np.asarray(jax.device_get(d))
        hv = np.asarray(h)
        if dv.shape != hv.shape:
            ok = False
            lines.append(f" leaf {i}: shape {dv.shape} != {hv.shape}")
            continue
        err = np.max(np.abs(dv.astype(np.float64) - hv.astype(np.float64))) \
            if dv.size else 0.0
        if err > tol:
            ok = False
            lines.append(f" leaf {i}: max abs device-host diff {err!r}")
    return ok, lines

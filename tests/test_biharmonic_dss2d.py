"""Two-application biharmonic with the 2-D torus DSS (edge + 4-way corner
assembly): assembly oracle, defining sharer-equality properties, variant
parity through the harness, and the 2-D-mesh ppermute decomposition vs the
single-device reference."""

import numpy as np
import pytest

from cdk_tpu.core.config import BiharmonicConfig, with_overrides
from cdk_tpu.core.norms import rel_l2
from cdk_tpu.dist import biharmonic as dist_bi
from cdk_tpu.dist import mesh as meshmod
from cdk_tpu.kernels.biharmonic import dss2d, problem

CFG = BiharmonicConfig()  # nelemd=16 -> 4x4 torus


def _oracle_sum(field, ex, ey, n):
    """Brute-force Σ_sharers via global dof identification on the torus:
    element (a,b)'s GLL point (i,j) is global dof ((a*(n-1)+i) mod
    ex*(n-1), (b*(n-1)+j) mod ey*(n-1))."""
    acc = {}
    for e in range(ex * ey):
        a, b = divmod(e, ey)
        for i in range(n):
            for j in range(n):
                k = ((a * (n - 1) + i) % (ex * (n - 1)),
                     (b * (n - 1) + j) % (ey * (n - 1)))
                acc[k] = acc.get(k, 0.0) + field[e, i, j]
    out = np.empty_like(field)
    for e in range(ex * ey):
        a, b = divmod(e, ey)
        for i in range(n):
            for j in range(n):
                k = ((a * (n - 1) + i) % (ex * (n - 1)),
                     (b * (n - 1) + j) % (ey * (n - 1)))
                out[e, i, j] = acc[k]
    return out


@pytest.mark.parametrize("exy", [(3, 4), (2, 2), (4, 4)])
def test_dss2d_sum_matches_bruteforce_oracle(exy):
    import jax.numpy as jnp

    ex, ey = exy
    n = 4
    rng = np.random.default_rng(0)
    field = rng.standard_normal((ex * ey, n, n))
    got = np.asarray(
        dss2d.dss2d_sum(jnp.asarray(field).reshape(ex, ey, n, n))
    ).reshape(ex * ey, n, n)
    np.testing.assert_allclose(got, _oracle_sum(field, ex, ey, n),
                               rtol=1e-13)


def test_dss2d_weights_multiplicity():
    """Constant spheremp exposes the sharer counts: interior 1, edges 2,
    corners 4."""
    import jax.numpy as jnp

    ex, ey = 3, 4
    w = np.asarray(dss2d.dss2d_weights(jnp.ones((ex * ey, 4, 4)), ex, ey))
    assert np.allclose(w[:, 1:-1, 1:-1], 1.0)      # interior
    assert np.allclose(w[:, 1:-1, 0], 0.5)         # j edges
    assert np.allclose(w[:, 0, 1:-1], 0.5)         # i edges
    corners = w[:, [0, 0, -1, -1], [0, -1, 0, -1]]
    assert np.allclose(corners, 0.25)              # 4-way corners


def test_dss2d_shared_dofs_agree():
    """The defining DSS property, 2-D: after assembly every edge sharer
    pair and every 4-way corner quadruple holds the identical value."""
    data = problem.init_data(CFG)
    ex, ey = dss2d.torus_shape(CFG.nelemd)
    w = dss2d.dss2d_weights(data.spheremp, ex, ey)[:, None, None]
    s = np.asarray(dss2d.dss_torus(data.qtens, w, ex, ey))
    s5 = s.reshape(ex, ey, *s.shape[1:])
    # j-direction edge columns
    np.testing.assert_array_equal(
        s5[..., -1], np.roll(s5, -1, axis=1)[..., 0]
    )
    # i-direction edge rows
    np.testing.assert_array_equal(
        s5[..., -1, :], np.roll(s5, -1, axis=0)[..., 0, :]
    )
    # 4-way corner: (a,b) at (n-1,n-1) == (a+1,b+1) at (0,0)
    np.testing.assert_array_equal(
        s5[..., -1, -1],
        np.roll(np.roll(s5, -1, axis=0), -1, axis=1)[..., 0, 0],
    )


def test_dss2d_interior_is_mass_projection():
    data = problem.init_data(CFG)
    ex, ey = dss2d.torus_shape(CFG.nelemd)
    w = dss2d.dss2d_weights(data.spheremp, ex, ey)[:, None, None]
    s = np.asarray(data.qtens)
    out = np.asarray(dss2d.dss_torus(data.qtens, w, ex, ey))
    sp = np.asarray(data.spheremp)[:, None, None]
    np.testing.assert_allclose(
        out[..., 1:-1, 1:-1], (s / sp)[..., 1:-1, 1:-1], rtol=1e-14
    )


def test_dss2d_lane_matches_full_field():
    """The lane-layout assembly (optimized variants' form) computes the
    identical bits through the layout transforms."""
    from cdk_tpu.kernels.biharmonic.problem import (
        from_lane_layout,
        to_lane_layout,
    )

    cfg = with_overrides(CFG, nelemd=12, nlev=3, qsize=2)
    data = problem.init_data(cfg)
    ex, ey = dss2d.torus_shape(cfg.nelemd)
    w = dss2d.dss2d_weights(data.spheremp, ex, ey)
    full = np.asarray(
        dss2d.dss_torus(data.qtens, w[:, None, None], ex, ey)
    )
    lane = from_lane_layout(
        dss2d.dss2d_lane(
            to_lane_layout(data.qtens), w.reshape(cfg.nelemd, cfg.npts, 1),
            ex, ey, cfg.np_gll,
        ),
        cfg,
    )
    np.testing.assert_array_equal(np.asarray(lane), full)


def test_dss2d_reduces_to_ring_when_ex_is_1():
    """A 1-row torus is exactly the ring family's topology in j (plus the
    self-paired i wrap): the j-direction assembly must agree with dss.py
    on interior i rows."""
    import jax.numpy as jnp

    from cdk_tpu.kernels.biharmonic import dss

    rng = np.random.default_rng(3)
    e, n = 6, 4
    s = jnp.asarray(rng.standard_normal((e, n, n)))
    sp = jnp.asarray(rng.uniform(0.5, 2.0, (e, n, n)))
    ring = np.asarray(
        dss.dss_ring(s, dss.dss_weights(sp))
    )
    torus = np.asarray(
        dss2d.dss_torus(s, dss2d.dss2d_weights(sp, 1, e), 1, e)
    )
    # i rows 1..n-2 have no i-direction sharing: identical to the ring
    np.testing.assert_allclose(torus[:, 1:-1, :], ring[:, 1:-1, :],
                               rtol=1e-14)


@pytest.mark.parametrize("exy,g", [((4, 4), 4), ((3, 8), 4), ((2, 6), 3)])
def test_dss2d_grouped_matches_lane(exy, g):
    """The grouped-layout torus assembly (bd8 loop's zero-relayout form)
    computes bitwise the same assembly as dss2d_lane."""
    import jax.numpy as jnp

    ex, ey = exy
    e, npg, ncol = ex * ey, 4, 10
    npts = npg * npg
    rng = np.random.default_rng(11)
    s_lane = jnp.asarray(rng.standard_normal((e, npts, ncol)),
                         dtype=jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 2.0, (ex * ey, npg, npg)),
                    dtype=jnp.float32)
    ref = dss2d.dss2d_lane(s_lane, w.reshape(e, npts, 1), ex, ey, npg)
    w6 = w.reshape(ex, ey // g, g, npg, npg)[..., None]
    out = dss2d.dss2d_grouped(
        s_lane.reshape(e // g, g * npts, ncol), w6, g, npg, ex, ey
    ).reshape(e, npts, ncol)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_dss2d_loops_match_chained_steps():
    from cdk_tpu.core.registry import _materialize, get

    cfg = with_overrides(CFG, nelemd=8, nlev=4, qsize=2)
    data = problem.init_data(cfg)
    for name in ("fused_operator", "fused_operator_bd8"):
        step2, aux, loop = _materialize(
            get("biharmonic_dss2d", name), cfg, data)
        assert loop is not None
        import dataclasses

        q = data.qtens
        for _ in range(3):
            q = step2(aux, dataclasses.replace(data, qtens=q))
        assert rel_l2(np.asarray(loop(data, 3)), np.asarray(q)) < 1e-6, name


@pytest.mark.parametrize("nelemd", [12, 16])  # (4,3) g=3 and (4,4) g=4
def test_dss2d_resident_chain_matches_chained_reference(nelemd):
    """The VMEM-resident torus-DSS chain (k in-kernel steps over element-
    ROW windows; j assembly window-local, i halos amortized) == chained
    reference steps at f64.  n=5 exercises the scan(k)+remainder path."""
    import dataclasses

    from cdk_tpu.core.registry import _materialize, get

    cfg = with_overrides(CFG, nelemd=nelemd, nlev=4, qsize=2,
                         dtype="float64")
    data = problem.init_data(cfg)
    ref_step, _, _ = _materialize(
        get("biharmonic_dss2d", "reference_jnp"), cfg, data)
    step2, aux, loop = _materialize(
        get("biharmonic_dss2d", "fused_operator_bd8_resident"), cfg, data)
    e1 = rel_l2(np.asarray(step2(aux, data)),
                np.asarray(ref_step((), data)))
    assert e1 < 1e-13, e1
    for n in (3, 5):
        q = data.qtens
        for _ in range(n):
            q = ref_step((), dataclasses.replace(data, qtens=q))
        assert rel_l2(np.asarray(loop(data, n)), np.asarray(q)) < 1e-13, n


@pytest.mark.parametrize("nelemd", [12, 16, 160])
def test_dss2d_rowchain_matches_chained_reference(nelemd):
    """The t-carry rowchain (bridge-in → (n-1) fused t-steps →
    bridge-out; 1-row windows) == chained reference steps at f64.  n=2
    exercises one fused t-step, n=5 the scan path.  nelemd=160 (16x10
    torus) runs the spatially-BLOCKED step (bi=8 < ex=16: two grid cells,
    so the halo rows cross block boundaries AND wrap); 12/16 run bi=ex
    single-cell wrap."""
    import dataclasses

    from cdk_tpu.core.registry import _materialize, get

    cfg = with_overrides(CFG, nelemd=nelemd, nlev=4, qsize=2,
                         dtype="float64")
    data = problem.init_data(cfg)
    ref_step, _, _ = _materialize(
        get("biharmonic_dss2d", "reference_jnp"), cfg, data)
    step2, aux, loop = _materialize(
        get("biharmonic_dss2d", "fused_operator_rowchain"), cfg, data)
    e1 = rel_l2(np.asarray(step2(aux, data)),
                np.asarray(ref_step((), data)))
    assert e1 < 1e-13, e1
    # n=2: single t-step; n=4: one TRIPLE step; n=5: triple + single;
    # n=6: triple + double; n=7: two triples
    for n in (2, 4, 5, 6, 7):
        q = data.qtens
        for _ in range(n):
            q = ref_step((), dataclasses.replace(data, qtens=q))
        assert rel_l2(np.asarray(loop(data, n)), np.asarray(q)) < 1e-13, n


@pytest.mark.parametrize("nelemd", [16, 160])
def test_dss2d_rowchain_sq_matches_chained_reference(nelemd):
    """The precomposed-A² rowchain (one apply of the squared operator per
    t-step instead of two adjacent applies) == chained reference at f64:
    proves the composition is exact algebra, not an approximation.  n
    values cover the single/double/triple-step scan paths like the plain
    rowchain test."""
    import dataclasses

    from cdk_tpu.core.registry import _materialize, get

    cfg = with_overrides(CFG, nelemd=nelemd, nlev=4, qsize=2,
                         dtype="float64")
    data = problem.init_data(cfg)
    ref_step, _, _ = _materialize(
        get("biharmonic_dss2d", "reference_jnp"), cfg, data)
    step2, aux, loop = _materialize(
        get("biharmonic_dss2d", "fused_operator_rowchain_sq"), cfg, data)
    e1 = rel_l2(np.asarray(step2(aux, data)),
                np.asarray(ref_step((), data)))
    assert e1 < 1e-13, e1
    for n in (2, 4, 5, 6, 7):
        q = data.qtens
        for _ in range(n):
            q = ref_step((), dataclasses.replace(data, qtens=q))
        assert rel_l2(np.asarray(loop(data, n)), np.asarray(q)) < 1e-13, n


def test_dss2d_rowchain_k4_gating_and_parity():
    """The temporal k=4 deepening is admitted ONLY for the precomposed
    bf16x3 form (measured round 4 at production: 925→879 µs/step there,
    but 1206→1474 REGRESSION for the MXU-heavier 'highest' apply whose
    halo-level recompute outweighs the DMA saving), and the k=4 blocked
    kernel itself matches chained f32 reference steps at the bf16x3
    tolerance."""
    import dataclasses

    from cdk_tpu.core.registry import _materialize, get
    from cdk_tpu.kernels.biharmonic import pallas_dss2d_resident as pr

    cfg = with_overrides(CFG, nlev=4, qsize=2, dtype="float32")
    calls_x3sq, _ = pr._rowchain_calls(cfg, "bf16x3", True,
                                       precomposed=True)
    calls_hisq, _ = pr._rowchain_calls(cfg, "highest", True,
                                       precomposed=True)
    calls_x3, _ = pr._rowchain_calls(cfg, "bf16x3", True,
                                     precomposed=False)
    assert calls_x3sq["kmax"] == 4 and 4 in calls_x3sq["steps_k"]
    assert calls_hisq["kmax"] == 3 and 4 not in calls_hisq["steps_k"]
    assert calls_x3["kmax"] == 3 and 4 not in calls_x3["steps_k"]

    data = problem.init_data(cfg)
    ref_step, _, _ = _materialize(
        get("biharmonic_dss2d", "reference_jnp"), cfg, data)
    _, _, loop = _materialize(
        get("biharmonic_dss2d", "fused_operator_rowchain_sq_x3"), cfg,
        data)
    n = 5  # nt=4 -> exactly one k=4 blocked call, no remainder
    q = data.qtens
    for _ in range(n):
        q = ref_step((), dataclasses.replace(data, qtens=q))
    e = rel_l2(np.asarray(loop(data, n)), np.asarray(q))
    assert e < 5e-5, e


def test_dss2d_variants_through_harness():
    from cdk_tpu.harness import driver

    cfg = with_overrides(CFG, nelemd=4, nlev=4, qsize=2)
    res = driver.run_kernel("biharmonic_dss2d", cfg, iters=2, trials=1,
                            quiet=True)
    names = {r.variant for r in res}
    assert names >= {"reference_jnp", "fused_operator", "fused_operator_f32"}
    assert all(r.ok for r in res), [(r.variant, r.metrics) for r in res]


@pytest.mark.parametrize("shape", [(2, 2), (1, 4), (4, 1), (2, 4), (4, 2)])
def test_dss2d_decomposed_matches_single(shape):
    from cdk_tpu.kernels.biharmonic.dss2d import make_reference

    data = problem.init_data(CFG)
    ref = np.asarray(make_reference(CFG)(data))
    m = meshmod.make_mesh2d(shape=shape)
    shard_inputs, step, gather = dist_bi.make_dist_step_dss2d(CFG, m)
    q_s, aux = shard_inputs(data)
    out = gather(step(q_s, aux))
    # probed-operator reassociation (f64), same bound as the ring family
    assert rel_l2(out, ref) < 1e-12


def test_dss2d_dist_loop_matches_chained():
    from dataclasses import replace

    from cdk_tpu.kernels.biharmonic.dss2d import make_reference

    data = problem.init_data(CFG)
    ref_step = make_reference(CFG)
    m = meshmod.make_mesh2d(shape=(2, 4))
    shard_inputs, step, gather = dist_bi.make_dist_step_dss2d(CFG, m)
    loop = dist_bi.make_dist_loop_dss2d(CFG, m)
    q_s, aux = shard_inputs(data)
    out_loop = gather(loop(q_s, aux, 3))
    d = data
    for _ in range(3):
        q_ref = ref_step(d)
        d = replace(d, qtens=q_ref)
    assert rel_l2(out_loop, np.asarray(q_ref)) < 1e-11


@pytest.mark.parametrize("ndev,n", [(2, 1), (2, 5), (2, 7), (4, 4)])
def test_dss2d_dist_rowchain_matches_chained_reference(ndev, n):
    """The distributed t-carry rowchain (rows sharded; one t row
    ppermuted per side per step; fused kernels inside shard_map) ==
    chained reference at f64."""
    import dataclasses

    from cdk_tpu.core.registry import _materialize, get

    cfg = with_overrides(CFG, nelemd=32, nlev=4, qsize=2, dtype="float64")
    data = problem.init_data(cfg)
    ref_step, _, _ = _materialize(
        get("biharmonic_dss2d", "reference_jnp"), cfg, data)
    m = meshmod.make_mesh(ndev)
    shard_inputs, loop, gather = dist_bi.make_dist_loop_dss2d_rowchain(
        cfg, m)
    q2, aux = shard_inputs(data)
    q = data.qtens
    for _ in range(n):
        q = ref_step((), dataclasses.replace(data, qtens=q))
    assert rel_l2(gather(loop(q2, aux, n)), np.asarray(q)) < 1e-13


@pytest.mark.parametrize(
    "ndev,kstep,n",
    [(2, 2, 5), (2, 4, 5), (4, 2, 9),
     # (n-1) % kstep != 0: the remainder chain (k < kstep) slices the
     # kstep-extended operator windows at an offset — regression cases
     # for the misaligned-slice bug the first cut shipped
     (2, 4, 4), (2, 2, 4), (2, 4, 2)],
)
def test_dss2d_dist_rowchain_kstep_matches_chained_reference(ndev, kstep, n):
    """Communication-avoiding rowchain (kstep t rows exchanged once per
    kstep sub-steps; shrinking-window local chain) == chained reference
    at f64, including the (n-1) % kstep remainder path."""
    import dataclasses

    from cdk_tpu.core.registry import _materialize, get

    cfg = with_overrides(CFG, nelemd=32, nlev=4, qsize=2, dtype="float64")
    data = problem.init_data(cfg)
    ref_step, _, _ = _materialize(
        get("biharmonic_dss2d", "reference_jnp"), cfg, data)
    m = meshmod.make_mesh(ndev)
    si, loop, gather = dist_bi.make_dist_loop_dss2d_rowchain_kstep(
        cfg, m, kstep=kstep)
    q2, aux = si(data)
    q = data.qtens
    for _ in range(n):
        q = ref_step((), dataclasses.replace(data, qtens=q))
    assert rel_l2(gather(loop(q2, aux, n)), np.asarray(q)) < 1e-13


def test_dss2d_dist_rowchain_kk4_f32_matches_reference():
    """The generic dist k-step path at kk=4 (stepk_padded_factory(4, bi_d),
    reachable only by the bf16x3-precomposed f32 form — the f64 depth cap
    is 3) == chained reference at the 5e-5 bf16x3 gate.  Guards the branch
    that replaced the hand-written k=2/3 kernels and is otherwise
    exercised only on the real TPU (ADVICE r4)."""
    import dataclasses

    from cdk_tpu.core.registry import _materialize, get
    from cdk_tpu.kernels.biharmonic import pallas_dss2d_resident as pr

    ndev, n = 2, 6  # nt = n-1 = 5 -> one kk=4 blocked call + 1 remainder
    cfg = with_overrides(CFG, nelemd=32, nlev=4, qsize=2, dtype="float32")
    # pin the preconditions that make the loop build AND use the kk=4
    # padded call — if the geometry or gates drift, fail loudly instead
    # of silently passing through shallower depths
    calls, geom = pr._rowchain_calls(cfg, "bf16x3", True, precomposed=True)
    ex, _, _, _, _, L, ncol, _ = geom
    exl_rows = ex // ndev
    assert calls["kmax"] >= 4 and exl_rows >= 4
    row_b = L * calls["ncol_blk"] * cfg.np_dtype(0).itemsize
    assert pr.step_budget_ok(4, 4, row_b)

    data = problem.init_data(cfg)
    ref_step, _, _ = _materialize(
        get("biharmonic_dss2d", "reference_jnp"), cfg, data)
    m = meshmod.make_mesh(ndev)
    shard_inputs, loop, gather = dist_bi.make_dist_loop_dss2d_rowchain(
        cfg, m)
    q2, aux = shard_inputs(data)
    q = data.qtens
    for _ in range(n):
        q = ref_step((), dataclasses.replace(data, qtens=q))
    assert rel_l2(gather(loop(q2, aux, n)), np.asarray(q)) < 5e-5


def test_dss2d_dist_rowchain_overlap_matches_serial_exactly():
    """Overlapped (full-batch-with-edge-patch) and serialized rowchain
    loops are the same arithmetic — bitwise-identical outputs."""
    cfg = with_overrides(CFG, nelemd=32, nlev=4, qsize=2, dtype="float64")
    data = problem.init_data(cfg)
    m = meshmod.make_mesh(4)
    si, loop_s, gather = dist_bi.make_dist_loop_dss2d_rowchain(cfg, m)
    _, loop_o, _ = dist_bi.make_dist_loop_dss2d_rowchain(cfg, m,
                                                         overlap=True)
    q2, aux = si(data)
    np.testing.assert_array_equal(gather(loop_s(q2, aux, 4)),
                                  gather(loop_o(q2, aux, 4)))


def test_dss2d_geometry_fuzz():
    """Resident chain + rowchain vs reference across random torus shapes
    (odd ey → non-8 group sizes, rectangular grids, prime-ish factors) —
    the window masks and shift distances must hold at every geometry, not
    just the shipped/production ones."""
    import dataclasses

    from cdk_tpu.core.registry import _materialize, get

    rng = np.random.default_rng(5)
    shapes = [(2, 3), (5, 4), (3, 6), (7, 2), (4, 10)]
    for ex, ey in [shapes[i] for i in rng.permutation(len(shapes))[:4]]:
        cfg = with_overrides(CFG, nelemd=ex * ey, nlev=3, qsize=2,
                             dtype="float64")
        if dss2d.torus_shape(cfg.nelemd) != (ex, ey):
            # torus_shape fixes the family topology per nelemd; only
            # shapes it actually produces are reachable
            ex, ey = dss2d.torus_shape(cfg.nelemd)
        data = problem.init_data(cfg)
        ref_step, _, _ = _materialize(
            get("biharmonic_dss2d", "reference_jnp"), cfg, data)
        q = data.qtens
        for _ in range(2):
            q = ref_step((), dataclasses.replace(data, qtens=q))
        for name in ("fused_operator_bd8_resident", "fused_operator_rowchain",
                     "fused_operator_bd8"):
            _, _, loop = _materialize(get("biharmonic_dss2d", name), cfg,
                                      data)
            e = rel_l2(np.asarray(loop(data, 2)), np.asarray(q))
            assert e < 1e-13, (name, ex, ey, e)


def test_dss2d_dist_rejects_indivisible_grid():
    m = meshmod.make_mesh2d(shape=(3, 2))
    with pytest.raises(ValueError, match="not divisible"):
        dist_bi.make_dist_step_dss2d(CFG, m)  # 4x4 grid, 3 does not divide

"""Distributed MPDATA: masked-global core parity (bitwise on f) and
N-device halo-exchange decomposition vs the single-device reference —
SURVEY §7 gate 6 (N-device run matches 1-device at f64)."""

import jax
import numpy as np
import pytest

from cdk_tpu.core.config import MpdataConfig, with_overrides
from cdk_tpu.core.norms import rel_l1
from cdk_tpu.dist import mesh as meshmod
from cdk_tpu.dist import mpdata as dist_mpdata
from cdk_tpu.kernels.mpdata import problem, reference

CFG = MpdataConfig()  # nx=32 across 8 devices -> chunk ~5 columns


def test_masked_global_matches_reference():
    """Same arithmetic per point; separately-jitted XLA programs may differ
    by compiler FMA/fusion choices (observed ≤1 ULP), so compare at tight
    tolerance rather than bitwise."""
    data = problem.init_data(CFG)
    f_ref, flux_ref = reference.make_reference(CFG)(data)
    f_m, flux_m = jax.jit(dist_mpdata.advect_masked_global)(data)
    assert rel_l1(np.asarray(f_m), np.asarray(f_ref)) < 1e-14
    assert rel_l1(np.asarray(flux_m), np.asarray(flux_ref)) < 1e-14


@pytest.mark.parametrize("ndev", [2, 8])
def test_decomposed_matches_global(ndev):
    data = problem.init_data(CFG)
    f_ref, flux_ref = reference.make_reference(CFG)(data)
    m = meshmod.make_mesh(ndev)
    shard_inputs, step, gather_f = dist_mpdata.make_dist_step(CFG, m)
    f_s, u_s, w_s, aux = shard_inputs(data)
    f_out, flux_out = step(f_s, u_s, w_s, aux)
    f_g = gather_f(f_out)
    assert rel_l1(f_g, np.asarray(f_ref)) < 1e-14
    # flux partial sums + psum reassociate the reduction: tolerance check
    assert rel_l1(np.asarray(flux_out), np.asarray(flux_ref)) < 1e-13


def test_decomposed_multistep():
    """Multi-step advection: exchange-step-exchange chains stay exact."""
    data = problem.init_data(CFG)
    ref_step = reference.make_reference(CFG)
    m = meshmod.make_mesh(8)
    shard_inputs, step, gather_f = dist_mpdata.make_dist_step(CFG, m)
    f_s, u_s, w_s, aux = shard_inputs(data)

    f_ref, flux_ref = data.f, data.flux
    d = data
    for _ in range(3):
        f_ref, flux_ref = ref_step(d)
        d = problem.MpdataData(f_ref, d.u, d.w, d.rho, d.rhow, d.adz, flux_ref)
        f_s, flux_s = step(f_s, u_s, w_s, aux)
    assert rel_l1(gather_f(f_s), np.asarray(f_ref)) < 1e-13


@pytest.mark.parametrize("ndev", [2, 8])
def test_overlap_step_matches_plain(ndev):
    """The overlapped (interior-first + boundary-strip) step produces the
    same owned values as the serialized exchange->compute step."""
    cfg = with_overrides(MpdataConfig(), nx=64)  # chunk >= strip width
    data = problem.init_data(cfg)
    f_ref, flux_ref = reference.make_reference(cfg)(data)
    m = meshmod.make_mesh(ndev)
    shard_inputs, step_plain, gather_f = dist_mpdata.make_dist_step(cfg, m)
    step_ov = dist_mpdata.make_dist_step_overlap(cfg, m)
    f_s, u_s, w_s, aux = shard_inputs(data)
    f_a, flux_a = step_plain(f_s, u_s, w_s, aux)
    f_b, flux_b = step_ov(f_s, u_s, w_s, aux)
    assert rel_l1(gather_f(f_b), gather_f(f_a)) < 1e-15
    assert rel_l1(np.asarray(flux_b), np.asarray(flux_a)) < 1e-14
    assert rel_l1(gather_f(f_b), np.asarray(f_ref)) < 1e-14


def test_weak_scaling_harness_runs():
    from cdk_tpu.harness import scaling

    pts = scaling.weak_scaling_mpdata(
        device_counts=(1, 2), nx_per_device=32, nslices=4, nz=10,
        n_steps=2, quiet=True,
    )
    assert len(pts) == 2 and pts[0].efficiency == 1.0
    assert all(p.grid_points_per_s > 0 for p in pts)


def test_overlap_multistep_matches_reference():
    cfg = with_overrides(MpdataConfig(), nx=64, nslices=4, nz=12)
    data = problem.init_data(cfg)
    ref_step = reference.make_reference(cfg)
    m = meshmod.make_mesh(4)
    shard_inputs, _, gather_f = dist_mpdata.make_dist_step(cfg, m)
    step_ov = dist_mpdata.make_dist_step_overlap(cfg, m)
    f_s, u_s, w_s, aux = shard_inputs(data)
    d = data
    f_ref = None
    for _ in range(4):
        f_ref, flux_ref = ref_step(d)
        d = problem.MpdataData(f_ref, d.u, d.w, d.rho, d.rhow, d.adz,
                               flux_ref)
        f_s, _ = step_ov(f_s, u_s, w_s, aux)
    assert rel_l1(gather_f(f_s), np.asarray(f_ref)) < 1e-13


@pytest.mark.parametrize("overlap", [False, True])
def test_dist_loop_scan_matches_chained(overlap):
    """One-jit scan over the shard_mapped step == per-dispatch chaining."""
    cfg = with_overrides(MpdataConfig(), nx=64, nslices=4, nz=12)
    data = problem.init_data(cfg)
    m = meshmod.make_mesh(4)
    shard_inputs, step, gather_f = dist_mpdata.make_dist_step(cfg, m)
    loop = dist_mpdata.make_dist_loop(cfg, m, overlap=overlap)
    f_s, u_s, w_s, aux = shard_inputs(data)
    f_l, flux_l = loop(f_s, u_s, w_s, aux, 3)
    f_c, flux_c = f_s, aux[3]
    rho, rhow, adz, _ = aux
    for _ in range(3):
        f_c, flux_c = step(f_c, u_s, w_s, (rho, rhow, adz, flux_c))
    assert rel_l1(gather_f(f_l), gather_f(f_c)) < 1e-15
    assert rel_l1(np.asarray(flux_l), np.asarray(flux_c)) < 1e-15


@pytest.mark.parametrize("kernel", ["pallas", "packed", "xmajor"])
@pytest.mark.parametrize("overlap", [False, True])
def test_pallas_dist_kernel_matches_jnp(overlap, kernel):
    """The Pallas-backed dist steps (VERDICT r1 #1: dist must run the tuned
    kernel; 'packed' = two-slices-per-register layout, 'xmajor' = x on the
    free leading axis, 16 slices per vreg tile — the AUTO choice) produce
    the same values as the jnp masked core on the mesh."""
    data = problem.init_data(CFG)
    m = meshmod.make_mesh(4)
    shard_inputs_j, _, gather_j = dist_mpdata.make_dist_step(
        CFG, m, kernel="jnp")
    shard_inputs_p, _, gather_p = dist_mpdata.make_dist_step(
        CFG, m, kernel=kernel)
    args_j = shard_inputs_j(data)
    args_p = shard_inputs_p(data)
    if overlap:
        step_j = dist_mpdata.make_dist_step_overlap(CFG, m, kernel="jnp")
        step_p = dist_mpdata.make_dist_step_overlap(CFG, m, kernel=kernel)
    else:
        _, step_j, _ = dist_mpdata.make_dist_step(CFG, m, kernel="jnp")
        _, step_p, _ = dist_mpdata.make_dist_step(CFG, m, kernel=kernel)
    f_j, flux_j = step_j(*args_j)
    f_p, flux_p = step_p(*args_p)
    assert rel_l1(gather_p(f_p), gather_j(f_j)) < 1e-14
    assert rel_l1(np.asarray(flux_p), np.asarray(flux_j)) < 1e-14


def test_split_halo_kernel_matches_concat_window():
    """masked_step_xmajor_split (in-kernel f-halo assembly, owned-only
    writeback) == masked_step_xmajor on the pre-concatenated window."""
    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.mpdata import pallas_xmajor as px
    from cdk_tpu.kernels.mpdata.pallas_masked import (
        masked_step_xmajor,
        masked_step_xmajor_split,
    )

    cfg = with_overrides(MpdataConfig(), nslices=16, nz=12)
    data = problem.init_data(cfg)
    f, u_g, w_g = dist_mpdata.to_collocated(data)
    h = dist_mpdata.HALO
    fx = px.pack3x(f)
    ux = px.pack3x(u_g)
    wx = px.pack3x(w_g)
    rho = px.pack2x(data.rho, pad=1.0)
    rhow = px.pack2x(data.rhow, pad=1.0)
    adz = px.pack2x(data.adz, pad=1.0)
    # extended window: zeros for the (global-edge) halo strips, gi0 shifts
    pad = jax.numpy.zeros_like(fx[:, :h])
    f_ext = jax.numpy.concatenate([pad, fx, pad], axis=1)
    u_ext = jax.numpy.concatenate([pad, ux, pad], axis=1)
    w_ext = jax.numpy.concatenate([pad, wx, pad], axis=1)
    interp = pallas_interpret()
    X = fx.shape[1]
    f_a, flux_a = masked_step_xmajor(
        f_ext, u_ext, w_ext, rho, rhow, adz, -2 - h,
        nx=cfg.nx, nzm=cfg.nzm, owned_lo=h, owned_hi=h + X,
        interpret=interp,
    )
    f_b, flux_b = masked_step_xmajor_split(
        fx, pad, pad, u_ext, w_ext, rho, rhow, adz, -2 - h,
        nx=cfg.nx, nzm=cfg.nzm, halo=h, interpret=interp,
    )
    np.testing.assert_array_equal(np.asarray(f_a[:, h:h + X]),
                                  np.asarray(f_b))
    np.testing.assert_array_equal(np.asarray(flux_a), np.asarray(flux_b))


@pytest.mark.parametrize("kstep", [2, 4])
def test_dist_kloop_matches_reference(kstep):
    """Communication-avoiding loop (deep halo exchanged once per kstep
    in-kernel masked steps, hoisted invariants) vs chained reference
    steps.  The hoisting reassociates ~1 ulp/step, hence the 1e-12 gate
    instead of the bit-exact one."""
    import dataclasses

    cfg = with_overrides(MpdataConfig(), nx=64, nslices=4, nz=12)
    data = problem.init_data(cfg)
    m = meshmod.make_mesh(4)
    shard_inputs, _, gather_f = dist_mpdata.make_dist_step(
        cfg, m, kernel="xmajor")
    loop = dist_mpdata.make_dist_loop(cfg, m, kernel="xmajor", kstep=kstep)
    f_s, u_s, w_s, aux = shard_inputs(data)
    n = 8
    f_l, flux_l = loop(f_s, u_s, w_s, aux, n)

    ref_step = reference.make_reference(cfg)
    d = data
    for _ in range(n):
        f_r, flux_r = ref_step(d)
        d = dataclasses.replace(d, f=f_r, flux=flux_r)
    assert rel_l1(gather_f(f_l), np.asarray(f_r)) < 1e-12
    assert rel_l1(np.asarray(flux_l), np.asarray(flux_r)) < 1e-12


def test_dist_step_and_loop_reject_chunk_below_halo():
    """Over-decomposed meshes must raise, not silently truncate halos
    (_exchange's x[:, -h:] would just yield fewer columns and misalign
    every global index — reproduced as rel-L1 ~0.9 garbage pre-guard)."""
    cfg = with_overrides(MpdataConfig(), nx=10, nslices=4, nz=12)
    m = meshmod.make_mesh(8)  # chunk = ceil(16/8) = 2 < HALO = 3
    with pytest.raises(ValueError):
        dist_mpdata.make_dist_step(cfg, m)
    with pytest.raises(ValueError):
        dist_mpdata.make_dist_loop(cfg, m)


def test_dist_kloop_rejects_bad_geometry():
    cfg = with_overrides(MpdataConfig(), nx=16, nslices=4, nz=12)
    m = meshmod.make_mesh(4)  # chunk = ceil(22/4) = 6 < 3*4
    with pytest.raises(ValueError):
        dist_mpdata.make_dist_loop(cfg, m, kernel="xmajor", kstep=4)


@pytest.mark.parametrize("ndev", [2, 8])
def test_dist_slices_matches_single_chip_bitwise(ndev):
    """Slice-batch (data-parallel) dist loop == the single-chip champion
    loop: sharding the packed group axis only splits the Pallas grid —
    every shard runs the identical kernel on identical slice data, with
    no exchange and no collective (the reference's own scaling axis,
    mmf-mpdata README per-node slice batch).  Tolerance, not bitwise:
    the per-shard block shape differs from the single-chip one and the
    CPU interpret path contracts FMAs shape-dependently (measured ~2e-6
    max abs at ndev=8)."""
    from cdk_tpu.core.registry import _materialize, get

    cfg = with_overrides(MpdataConfig(), nslices=48, nx=16, nz=12,
                         dtype="float32")
    data = problem.init_data(cfg)
    m = meshmod.make_mesh(ndev)
    si, loop, (gather_f, gather_flux) = dist_mpdata.make_dist_loop_slices(
        cfg, m)
    f_s, u_s, w_s, aux = si(data)
    f_d, flux_d = loop(f_s, u_s, w_s, aux, 3)

    _, _, vloop = _materialize(get("mpdata", "pallas_xmajor"), cfg, data)
    f_r, flux_r = vloop(data, 3)
    assert rel_l1(gather_f(f_d), np.asarray(f_r)) < 1e-5
    assert rel_l1(gather_flux(flux_d), np.asarray(flux_r)) < 1e-5


def test_dist_loop_unroll_matches_unrolled_1():
    """The promoted unroll=2 hoisted loop == unroll=1 bitwise on a
    multi-device mesh: scan unrolling duplicates the body without
    changing its arithmetic or exchange pattern."""
    cfg = with_overrides(MpdataConfig(), nslices=8, nx=32, nz=12,
                         dtype="float32")
    data = problem.init_data(cfg)
    m = meshmod.make_mesh(4)
    si, _, gather_f = dist_mpdata.make_dist_step(cfg, m, kernel="xmajor")
    args = si(data)
    loop1 = dist_mpdata.make_dist_loop(cfg, m, kernel="xmajor", unroll=1)
    loop2 = dist_mpdata.make_dist_loop(cfg, m, kernel="xmajor")  # def. 2
    f1, fx1 = loop1(*args, 5)   # odd n: exercises the unroll remainder
    f2, fx2 = loop2(*args, 5)
    np.testing.assert_array_equal(gather_f(f1), gather_f(f2))
    np.testing.assert_array_equal(np.asarray(fx1), np.asarray(fx2))

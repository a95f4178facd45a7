"""MPDATA kernel: jnp reference vs an independent scalar-loop numpy oracle
written directly from the staged algorithm semantics (Fortran-style 1-based
indexing with explicit offsets), then optimized variants vs the reference —
the reference driver's own protocol (advect_scalar2D…F90:48-67)."""

import numpy as np
import pytest

from cdk_tpu.core.config import MpdataConfig, with_overrides
from cdk_tpu.core.norms import rel_l1
from cdk_tpu.kernels.mpdata import problem, reference

SMALL = with_overrides(MpdataConfig(), nslices=3, nx=6, nz=9)


def oracle_advect(f, u, w, rho, rhow, adz, flux_in, bounds=None):
    """Scalar-loop MPDATA step, Fortran index conventions: f(i=-2..nx+3),
    u(i=-1..nx+3), w(i=-1..nx+2, k=1..nz), all k=1..nzm unless noted.
    If `bounds` is a pair of arrays shaped like mx/mn, the final FCT
    extrema are copied into it before stage 5b overwrites them."""
    s, fx, nzm = f.shape
    nx, nz = fx - 6, nzm + 1
    eps = 1.0e-10

    # Fortran-indexed accessors (python storage offsets: f:+2, u/w:+1, k:-1)
    F = lambda sl, i, k: f[sl, i + 2, k - 1]
    U = lambda sl, i, k: u[sl, i + 1, k - 1]
    W = lambda sl, i, k: w[sl, i + 1, k - 1]

    pp = lambda y: max(0.0, y)
    pn = lambda y: -min(0.0, y)
    andiff = lambda x1, x2, a, b: (abs(a) - a * a * b) * 0.5 * (x2 - x1)
    across = lambda x1, a1, a2: 0.03125 * a1 * a2 * x1

    f = f.copy()
    mx = np.zeros((s, nx + 2, nzm))
    mn = np.zeros((s, nx + 2, nzm))
    uuu = np.zeros((s, nx + 5, nzm))
    www = np.zeros((s, nx + 4, nz))
    flux = flux_in.copy()

    for sl in range(s):
        irho = 1.0 / rho[sl]
        iadz = 1.0 / adz[sl]
        # stage 1: extrema
        for k in range(1, nzm + 1):
            kc, kb = min(nzm, k + 1), max(1, k - 1)
            for i in range(0, nx + 2):
                vals = [F(sl, i - 1, k), F(sl, i + 1, k), F(sl, i, kb),
                        F(sl, i, kc), F(sl, i, k)]
                mx[sl, i, k - 1] = max(vals)
                mn[sl, i, k - 1] = min(vals)
        # stage 2: upwind fluxes
        for k in range(1, nzm + 1):
            kb = max(1, k - 1)
            for i in range(-1, nx + 4):
                uuu[sl, i + 1, k - 1] = (max(0.0, U(sl, i, k)) * F(sl, i - 1, k)
                                         + min(0.0, U(sl, i, k)) * F(sl, i, k))
            for i in range(-1, nx + 3):
                www[sl, i + 1, k - 1] = (max(0.0, W(sl, i, k)) * F(sl, i, kb)
                                         + min(0.0, W(sl, i, k)) * F(sl, i, k))
            flux[sl, k - 1] = sum(www[sl, i + 1, k - 1] for i in range(1, nx + 1))
        # www(:, nz) = 0 (set before stage 3 reads it)
        www[sl, :, nz - 1] = 0.0
        # stage 3: upwind update over i=-1..nx+2
        for k in range(1, nzm + 1):
            for i in range(-1, nx + 3):
                f[sl, i + 2, k - 1] -= (
                    uuu[sl, i + 2, k - 1] - uuu[sl, i + 1, k - 1]
                    + (www[sl, i + 1, k] - www[sl, i + 1, k - 1]) * iadz[k - 1]
                ) * irho[k - 1]
        # stage 4: antidiffusive velocities
        for k in range(1, nzm + 1):
            kc, kb = min(nzm, k + 1), max(1, k - 1)
            irhow_k = 1.0 / (rhow[sl, k - 1] * adz[sl, k - 1])
            dd = 2.0 / (kc - kb) / adz[sl, k - 1]
            for i in range(0, nx + 3):
                ib = i - 1
                uuu[sl, i + 1, k - 1] = andiff(
                    F(sl, ib, k), F(sl, i, k), U(sl, i, k), irho[k - 1]
                ) - across(
                    dd * (F(sl, ib, kc) + F(sl, i, kc)
                          - F(sl, ib, kb) - F(sl, i, kb)),
                    U(sl, i, k),
                    W(sl, ib, k) + W(sl, ib, kc) + W(sl, i, k) + W(sl, i, kc),
                ) * irho[k - 1]
            for i in range(0, nx + 2):
                ib, ic = i - 1, i + 1
                www[sl, i + 1, k - 1] = andiff(
                    F(sl, i, kb), F(sl, i, k), W(sl, i, k), irhow_k
                ) - across(
                    F(sl, ic, kb) + F(sl, ic, k) - F(sl, ib, kb) - F(sl, ib, k),
                    W(sl, i, k),
                    U(sl, i, kb) + U(sl, i, k) + U(sl, ic, k) + U(sl, ic, kb),
                ) * irho[k - 1]
        www[sl, :, 0] = 0.0
        # stage 5a: second extrema with updated f
        for k in range(1, nzm + 1):
            kc, kb = min(nzm, k + 1), max(1, k - 1)
            for i in range(0, nx + 2):
                vals = [F(sl, i - 1, k), F(sl, i + 1, k), F(sl, i, kb),
                        F(sl, i, kc), F(sl, i, k)]
                mx[sl, i, k - 1] = max(mx[sl, i, k - 1], max(vals))
                mn[sl, i, k - 1] = min(mn[sl, i, k - 1], min(vals))
        # snapshot the extrema bounds before they are overwritten by the
        # in/out ratios (used by the FCT-property test)
        if bounds is not None:
            bounds[0][sl] = mx[sl].copy()
            bounds[1][sl] = mn[sl].copy()
        # stage 5b: ratios
        for k in range(1, nzm + 1):
            kc = min(nzm, k + 1)
            for i in range(0, nx + 2):
                uo = pn(uuu[sl, i + 2, k - 1]) + pp(uuu[sl, i + 1, k - 1])
                wo = pn(www[sl, i + 1, kc - 1]) + pp(www[sl, i + 1, k - 1])
                mx[sl, i, k - 1] = (rho[sl, k - 1]
                                    * (mx[sl, i, k - 1] - F(sl, i, k))
                                    / (uo + iadz[k - 1] * wo + eps))
                ui = pp(uuu[sl, i + 2, k - 1]) + pn(uuu[sl, i + 1, k - 1])
                wi = pp(www[sl, i + 1, kc - 1]) + pn(www[sl, i + 1, k - 1])
                mn[sl, i, k - 1] = (rho[sl, k - 1]
                                    * (F(sl, i, k) - mn[sl, i, k - 1])
                                    / (ui + iadz[k - 1] * wi + eps))
        # stage 5c: limit fluxes
        for k in range(1, nzm + 1):
            kb = max(1, k - 1)
            for i in range(1, nx + 2):
                v = uuu[sl, i + 1, k - 1]
                uuu[sl, i + 1, k - 1] = (
                    pp(v) * min(1.0, mx[sl, i, k - 1], mn[sl, i - 1, k - 1])
                    - pn(v) * min(1.0, mx[sl, i - 1, k - 1], mn[sl, i, k - 1])
                )
            for i in range(1, nx + 1):
                v = www[sl, i + 1, k - 1]
                www[sl, i + 1, k - 1] = (
                    pp(v) * min(1.0, mx[sl, i, k - 1], mn[sl, i, kb - 1])
                    - pn(v) * min(1.0, mx[sl, i, kb - 1], mn[sl, i, k - 1])
                )
                flux[sl, k - 1] += www[sl, i + 1, k - 1]
        # stage 6: final update with clip
        for k in range(1, nzm + 1):
            for i in range(1, nx + 1):
                f[sl, i + 2, k - 1] = max(
                    0.0,
                    f[sl, i + 2, k - 1] - (
                        uuu[sl, i + 2, k - 1] - uuu[sl, i + 1, k - 1]
                        + (www[sl, i + 1, k] - www[sl, i + 1, k - 1])
                        * iadz[k - 1]
                    ) * irho[k - 1],
                )
    return f, flux


@pytest.fixture(scope="module")
def small_data():
    return problem.init_data(SMALL)


@pytest.fixture(scope="module")
def small_oracle(small_data):
    args = [np.asarray(a, np.float64) for a in (
        small_data.f, small_data.u, small_data.w, small_data.rho,
        small_data.rhow, small_data.adz, small_data.flux)]
    return oracle_advect(*args)


def test_shapes():
    d = problem.init_data(SMALL)
    nx, nz, nzm, s = SMALL.nx, SMALL.nz, SMALL.nzm, SMALL.nslices
    assert d.f.shape == (s, nx + 6, nzm)
    assert d.u.shape == (s, nx + 5, nzm)
    assert d.w.shape == (s, nx + 4, nz)
    assert d.flux.shape == (s, nz)


def test_reference_matches_oracle(small_data, small_oracle):
    f_ref, flux_ref = small_oracle
    step = reference.make_reference(SMALL)
    f_out, flux_out = step(small_data)
    assert rel_l1(np.asarray(f_out), f_ref) < 1e-14
    assert rel_l1(np.asarray(flux_out), flux_ref) < 1e-14


def test_reference_full_size_runs_and_is_positive():
    cfg = MpdataConfig()
    data = problem.init_data(cfg)
    f_out, flux_out = reference.make_reference(cfg)(data)
    f_out = np.asarray(f_out)
    # positive-definite advection: interior f stays non-negative (:630-637)
    assert (f_out[:, 3:cfg.nx + 3] >= 0.0).all()
    assert np.isfinite(f_out).all() and np.isfinite(np.asarray(flux_out)).all()


def test_flux_nz_passthrough(small_data):
    """The reference never writes flux(:,nz) (advect…F90:540-547)."""
    step = reference.make_reference(SMALL)
    _, flux_out = step(small_data)
    np.testing.assert_array_equal(
        np.asarray(flux_out)[:, -1], np.asarray(small_data.flux)[:, -1]
    )


def test_pallas_fused_matches_reference(small_data):
    from cdk_tpu.kernels.mpdata import pallas_fused

    f_ref, flux_ref = reference.make_reference(SMALL)(small_data)
    f_out, flux_out = pallas_fused.make_pallas_fused(SMALL)(small_data)
    assert rel_l1(np.asarray(f_out), np.asarray(f_ref)) < 1e-14
    assert rel_l1(np.asarray(flux_out), np.asarray(flux_ref)) < 1e-14


def test_pallas_fused_full_size_f32():
    cfg = MpdataConfig(dtype="float32")
    data = problem.init_data(cfg)
    from cdk_tpu.kernels.mpdata import pallas_fused

    f_ref, flux_ref = reference.make_reference(cfg)(data)
    f_out, flux_out = pallas_fused.make_pallas_fused(cfg)(data)
    assert rel_l1(np.asarray(f_out), np.asarray(f_ref)) < 1e-5
    assert rel_l1(np.asarray(flux_out), np.asarray(flux_ref)) < 1e-4


def test_pallas_lanes_matches_reference(small_data):
    from cdk_tpu.core import registry as _registry
    from cdk_tpu.kernels.mpdata import pallas_lanes  # noqa: F401

    f_ref, flux_ref = reference.make_reference(SMALL)(small_data)
    step = _registry.make_step(
        _registry.get("mpdata", "pallas_lanes"), SMALL, small_data
    )
    f_out, flux_out = step(small_data)
    assert rel_l1(np.asarray(f_out), np.asarray(f_ref)) < 1e-14
    assert rel_l1(np.asarray(flux_out), np.asarray(flux_ref)) < 1e-14


def test_pallas_lanes_loop_and_fullsize():
    from cdk_tpu.core import registry as _registry
    from cdk_tpu.kernels.mpdata import pallas_lanes

    cfg = MpdataConfig()
    data = problem.init_data(cfg)
    f1, flux1 = reference.make_reference(cfg)(data)
    d2 = problem.MpdataData(f1, data.u, data.w, data.rho, data.rhow,
                            data.adz, flux1)
    f2, flux2 = reference.make_reference(cfg)(d2)
    made = pallas_lanes.make_pallas_lanes(cfg)
    f_l, flux_l = made["loop"](data, 2)
    assert rel_l1(np.asarray(f_l), np.asarray(f2)) < 1e-13
    assert rel_l1(np.asarray(flux_l), np.asarray(flux2)) < 1e-13



def test_fct_limiter_non_oscillatory():
    """The non-oscillatory limiter's contract (advect…F90:588-628): the
    corrected interior solution stays within the local extrema bounds
    mx/mn accumulated from the input and upwind fields."""
    cfg = with_overrides(MpdataConfig(), nslices=4, nx=10, nz=12, seed=7)
    data = problem.init_data(cfg)
    args = [np.asarray(a, np.float64) for a in (
        data.f, data.u, data.w, data.rho, data.rhow, data.adz, data.flux)]
    s_, nx = cfg.nslices, cfg.nx
    mx_snap = np.zeros((s_, nx + 2, cfg.nzm))
    mn_snap = np.zeros((s_, nx + 2, cfg.nzm))
    f_ref, _ = oracle_advect(*args, bounds=(mx_snap, mn_snap))
    # interior i=1..nx maps to mx/mn index i and f python ix=i+2
    f_int = f_ref[:, 3:nx + 3]
    mx_int = mx_snap[:, 1:nx + 1]
    mn_int = mn_snap[:, 1:nx + 1]
    eps = 1e-9 * np.abs(mx_int).max()
    assert (f_int <= mx_int + eps).all(), "limiter exceeded upper bound"
    assert (f_int >= np.minimum(mn_int, 0.0) - eps).all(), \
        "limiter exceeded lower bound"
    # and the jnp reference's output obeys the same bounds
    f_jnp, _ = reference.make_reference(cfg)(data)
    f_jnp_int = np.asarray(f_jnp)[:, 3:nx + 3]
    assert (f_jnp_int <= mx_int + eps).all()
    assert (f_jnp_int >= np.minimum(mn_int, 0.0) - eps).all()


def test_long_integration_stable_uniform_advection():
    """Long-run stability in a physical regime: uniform advection at
    Courant 0.2 with unit density stays bounded and positive for 200 steps
    (the monotone scheme preserves the initial max). The miniapp's random
    static u/w/rho init is NOT a stable integration regime — persistent
    convergence zones grow f exponentially regardless of solver — which is
    why the reference only ever runs one step."""
    import dataclasses

    import jax.numpy as jnp

    cfg = with_overrides(MpdataConfig(), nslices=4, nx=12, nz=10)
    data = problem.init_data(cfg)
    d = dataclasses.replace(
        data,
        u=jnp.full_like(data.u, 0.2),
        w=jnp.zeros_like(data.w),
        rho=jnp.ones_like(data.rho),
        rhow=jnp.ones_like(data.rhow),
        adz=jnp.ones_like(data.adz),
    )
    step = reference.make_reference(cfg)
    m0 = float(np.asarray(d.f).max())
    for _ in range(200):
        f, flux = step(d)
        d = dataclasses.replace(d, f=f, flux=flux)
    fa = np.asarray(d.f)
    assert np.isfinite(fa).all()
    assert fa.min() >= 0.0
    assert fa.max() <= m0 + 1e-12


def test_pallas_packed_parity_and_loop():
    """Packed-lanes kernel (two slices per 128-lane register): stage-exact
    vs the reference at several geometries, incl. the resident-layout
    multi-step loop path."""
    from dataclasses import replace

    import numpy as np

    from cdk_tpu.core.registry import _materialize, get

    for kw in [dict(nslices=4, nx=8, nz=12), dict(nslices=2, nx=6, nz=58),
               dict(nslices=6, nx=5, nz=9)]:
        cfg = with_overrides(MpdataConfig(), **kw)
        data = problem.init_data(cfg)
        ref_step = reference.make_reference(cfg)
        step2, aux, loop = _materialize(get("mpdata", "pallas_packed"), cfg,
                                        data)
        f_r, flux_r = ref_step(data)
        f_o, flux_o = step2(aux, data)
        np.testing.assert_allclose(np.asarray(f_o), np.asarray(f_r),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(flux_o), np.asarray(flux_r),
                                   rtol=1e-13)
        d = data
        for _ in range(4):
            f_r, flux_r = ref_step(d)
            d = replace(d, f=f_r, flux=flux_r)
        f_l, flux_l = loop(data, 4)
        np.testing.assert_allclose(np.asarray(f_l), np.asarray(f_r),
                                   rtol=0, atol=1e-12)


def test_pallas_resident_parity_and_inkernel_loop():
    """VMEM-resident variant (time loop inside the Pallas body): single
    step and the in-kernel n-step loop must match chained reference steps
    exactly — the loop placement must not change a single bit of math."""
    from dataclasses import replace

    import numpy as np

    from cdk_tpu.core.registry import _materialize, get

    for kw in [dict(nslices=4, nx=8, nz=12), dict(nslices=2, nx=6, nz=58)]:
        cfg = with_overrides(MpdataConfig(), **kw)
        data = problem.init_data(cfg)
        ref_step = reference.make_reference(cfg)
        step2, aux, loop = _materialize(get("mpdata", "pallas_resident"),
                                        cfg, data)
        f_r, flux_r = ref_step(data)
        f_o, flux_o = step2(aux, data)
        np.testing.assert_allclose(np.asarray(f_o), np.asarray(f_r),
                                   rtol=0, atol=1e-13)
        np.testing.assert_allclose(np.asarray(flux_o), np.asarray(flux_r),
                                   rtol=1e-13)
        d = data
        for _ in range(5):
            f_r, flux_r = ref_step(d)
            d = replace(d, f=f_r, flux=flux_r)
        f_l, flux_l = loop(data, 5)
        np.testing.assert_allclose(np.asarray(f_l), np.asarray(f_r),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(flux_l), np.asarray(flux_r),
                                   rtol=1e-12)


def test_pallas_hoisted_parity():
    """Hoisted-invariant resident kernel vs reference: the coefficient
    pre-folding reassociates a couple of adds/muls (~1 ulp/step at f64),
    so the gate is slightly above the bit-exact variants' but still far
    below any physical tolerance."""
    from dataclasses import replace

    import numpy as np

    from cdk_tpu.core.registry import _materialize, get

    for kw in [dict(nslices=4, nx=8, nz=12), dict(nslices=2, nx=6, nz=58),
               dict(nslices=6, nx=5, nz=9)]:
        cfg = with_overrides(MpdataConfig(), **kw)
        data = problem.init_data(cfg)
        ref_step = reference.make_reference(cfg)
        step2, aux, loop = _materialize(get("mpdata", "pallas_hoisted"),
                                        cfg, data)
        f_r, flux_r = ref_step(data)
        f_o, flux_o = step2(aux, data)
        np.testing.assert_allclose(np.asarray(f_o), np.asarray(f_r),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(flux_o), np.asarray(flux_r),
                                   rtol=1e-12)
        d = data
        for _ in range(5):
            f_r, flux_r = ref_step(d)
            d = replace(d, f=f_r, flux=flux_r)
        f_l, flux_l = loop(data, 5)
        np.testing.assert_allclose(np.asarray(f_l), np.asarray(f_r),
                                   rtol=0, atol=1e-11)
        np.testing.assert_allclose(np.asarray(flux_l), np.asarray(flux_r),
                                   rtol=1e-11)


def test_pallas_xmajor_parity():
    """x-major layout (x on a free leading axis, 16 slices per vreg
    tile): single step + in-kernel loop vs chained reference steps,
    including slice counts that need padding to a multiple of 16."""
    from dataclasses import replace

    import numpy as np

    from cdk_tpu.core.registry import _materialize, get

    for kw in [dict(nslices=4, nx=8, nz=12),    # padded 4 -> 16
               dict(nslices=16, nx=6, nz=58),   # exact multiple
               dict(nslices=6, nx=5, nz=9),     # padded, odd nzm
               dict(nslices=48, nx=32, nz=58)]: # shipped geometry
        cfg = with_overrides(MpdataConfig(), **kw)
        data = problem.init_data(cfg)
        ref_step = reference.make_reference(cfg)
        step2, aux, loop = _materialize(get("mpdata", "pallas_xmajor"),
                                        cfg, data)
        f_r, flux_r = ref_step(data)
        f_o, flux_o = step2(aux, data)
        np.testing.assert_allclose(np.asarray(f_o), np.asarray(f_r),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(flux_o), np.asarray(flux_r),
                                   rtol=1e-12)
        d = data
        for _ in range(4):
            f_r, flux_r = ref_step(d)
            d = replace(d, f=f_r, flux=flux_r)
        f_l, flux_l = loop(data, 4)
        np.testing.assert_allclose(np.asarray(f_l), np.asarray(f_r),
                                   rtol=0, atol=1e-11)
        np.testing.assert_allclose(np.asarray(flux_l), np.asarray(flux_r),
                                   rtol=1e-11)


def test_pallas_packed_rejects_bad_geometry():
    import pytest as _pytest

    for kw in [dict(nslices=3), dict(nz=100)]:
        cfg = with_overrides(MpdataConfig(), **kw)
        from cdk_tpu.core.registry import get

        from cdk_tpu.core.registry import UnsupportedConfigError

        with _pytest.raises(UnsupportedConfigError):
            get("mpdata", "pallas_packed").fn(cfg)


def test_packed_z_helpers_match_plain():
    """kbp/kcp/pack round-trip: packed lane ops reproduce the plain
    clamped z-shifts segment-by-segment on random data."""
    import numpy as np

    import jax.numpy as jnp

    from cdk_tpu.kernels.mpdata import pallas_packed as pk
    from cdk_tpu.kernels.mpdata.reference import _kb, _kc

    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 5, 30))
    ap = pk.pack3(jnp.asarray(a))
    assert np.array_equal(pk.unpack3(ap, 30), a)

    import jax

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 2 * pk.SEG), 2)
    zk = lane % pk.SEG
    kbp = pk._kbp(ap, zk == 0)
    kcp = pk._kcp(ap, zk == 29)
    np.testing.assert_array_equal(pk.unpack3(kbp, 30), _kb(jnp.asarray(a)))
    np.testing.assert_array_equal(pk.unpack3(kcp, 30), _kc(jnp.asarray(a)))


def test_pallas_packed_geometry_fuzz():
    """Packed kernel vs reference across random small geometries (odd
    nzm, tiny nx, varying slices) — the segment-boundary fixups must hold
    everywhere, not just at the shipped shape."""
    import numpy as np

    from cdk_tpu.core.registry import _materialize, get

    rng = np.random.default_rng(7)
    for _ in range(6):
        ns = int(rng.choice([2, 4, 6, 8]))
        nx = int(rng.integers(4, 12))
        nzm = int(rng.integers(3, 63))
        cfg = with_overrides(MpdataConfig(), nslices=ns, nx=nx, nz=nzm + 1)
        data = problem.init_data(cfg)
        f_r, flux_r = reference.make_reference(cfg)(data)
        step2, aux, _ = _materialize(get("mpdata", "pallas_packed"), cfg,
                                     data)
        f_o, flux_o = step2(aux, data)
        np.testing.assert_allclose(np.asarray(f_o), np.asarray(f_r),
                                   rtol=0, atol=1e-12,
                                   err_msg=f"ns={ns} nx={nx} nzm={nzm}")
        np.testing.assert_allclose(np.asarray(flux_o), np.asarray(flux_r),
                                   rtol=1e-12,
                                   err_msg=f"ns={ns} nx={nx} nzm={nzm}")


def test_dist_packed_geometry_fuzz():
    """Packed masked dist step vs reference across random geometries and
    device counts (global-index masks + segment fixups together)."""
    import numpy as np

    from cdk_tpu.dist import mesh as meshmod
    from cdk_tpu.dist import mpdata as dist_mpdata

    rng = np.random.default_rng(11)
    for _ in range(4):
        ns = int(rng.choice([2, 4]))
        nx = int(rng.integers(8, 40))
        nzm = int(rng.integers(5, 60))
        ndev = int(rng.choice([2, 4]))
        cfg = with_overrides(MpdataConfig(), nslices=ns, nx=nx, nz=nzm + 1)
        data = problem.init_data(cfg)
        f_r, _ = reference.make_reference(cfg)(data)
        m = meshmod.make_mesh(ndev)
        si, step, gf = dist_mpdata.make_dist_step(cfg, m, kernel="packed")
        f_o, _ = step(*si(data))
        np.testing.assert_allclose(
            gf(f_o), np.asarray(f_r), rtol=0, atol=1e-12,
            err_msg=f"ns={ns} nx={nx} nzm={nzm} ndev={ndev}")

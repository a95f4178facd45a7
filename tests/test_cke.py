"""CKE kernel: jnp reference vs an independent scalar-loop oracle written
from the original-form semantics (kmin/kmax bounds, per-edge column temps,
nested.F90:495-564), then variants vs the reference at the reference's own
errTol=1e-10 per-point check (nested.F90:267-287)."""

import numpy as np
import pytest

from cdk_tpu.core.config import CkeConfig, with_overrides
from cdk_tpu.core.norms import pointwise_check
from cdk_tpu.core import registry as _registry
from cdk_tpu.kernels.cke import onehot_mxu, problem, reference


def _onehot_step(cfg, data):
    return _registry.make_step(_registry.get("cke", "onehot_mxu"), cfg, data)

SMALL = with_overrides(CkeConfig(), nedges=40, ncells=12, nvertlevels=7, nadv=4)


def oracle_edge_flux(data, coef3rdorder):
    """Scalar-loop original form: per-edge wgt/sgn column temps, gather over
    contributing cells, k restricted to the cell's [kmin, kmax]."""
    adv_cells = np.asarray(data.adv_cells)
    c1 = np.asarray(data.adv_coefs, np.float64)
    c3a = np.asarray(data.adv_coefs3, np.float64)
    tracer = np.asarray(data.tracer, np.float64)
    ntf = np.asarray(data.ntf, np.float64)
    adv_mask = np.asarray(data.adv_mask, np.float64)
    kmin = np.asarray(data.min_level)
    kmax = np.asarray(data.max_level)
    e, a = adv_cells.shape
    kv = tracer.shape[1]
    flx = np.zeros((e, kv))
    for ie in range(e):
        wgt = ntf[ie] * adv_mask[ie]
        sgn = np.where(ntf[ie] >= 0.0, 1.0, -1.0)
        for i in range(a):
            ic = adv_cells[ie, i]
            coef1 = c1[ie, i]
            coef3 = c3a[ie, i] * coef3rdorder
            for k in range(kmin[ic], kmax[ic] + 1):
                flx[ie, k] += tracer[ic, k] * wgt[k] * (coef1 + coef3 * sgn[k])
    return flx


@pytest.fixture(scope="module")
def small_data():
    return problem.init_data(SMALL)


@pytest.fixture(scope="module")
def small_oracle(small_data):
    return oracle_edge_flux(small_data, SMALL.coef3rdorder)


def test_init_topography():
    d = problem.init_data(SMALL)
    mx = np.asarray(d.max_level)
    assert (mx >= 2).all() and (mx <= SMALL.nvertlevels - 1).all()
    tr = np.asarray(d.tracer)
    cm = np.asarray(d.cell_mask)
    # tracer is zero exactly where the mask is zero (nested.F90:71-83)
    assert (tr[cm == 0.0] == 0.0).all()
    assert (tr[cm == 1.0] >= 0.0).all()


def test_reference_matches_oracle(small_data, small_oracle):
    step = reference.make_reference(SMALL)
    out = np.asarray(step(small_data))
    n_bad, max_err, lines = pointwise_check(out, small_oracle, SMALL.errtol)
    assert n_bad == 0, "\n".join(lines)


def test_onehot_matches_reference(small_data):
    ref = np.asarray(reference.make_reference(SMALL)(small_data))
    out = np.asarray(_onehot_step(SMALL, small_data)(small_data))
    n_bad, max_err, _ = pointwise_check(out, ref, SMALL.errtol)
    assert n_bad == 0


def test_duplicate_cells_accumulate():
    """Two identical (edge, i) entries must contribute twice (the reference
    accumulates, nested.F90:545-550)."""
    d = problem.init_data(SMALL)
    dup_cells = np.asarray(d.adv_cells).copy()
    dup_cells[:, 1] = dup_cells[:, 0]
    import jax.numpy as jnp

    d2 = problem.CkeData(
        jnp.asarray(dup_cells), d.adv_coefs, d.adv_coefs3, d.tracer,
        d.cell_mask, d.ntf, d.adv_mask, d.min_level, d.max_level,
    )
    ref = np.asarray(reference.make_reference(SMALL)(d2))
    oracle = oracle_edge_flux(d2, SMALL.coef3rdorder)
    onehot = np.asarray(_onehot_step(SMALL, d2)(d2))
    assert pointwise_check(ref, oracle, SMALL.errtol)[0] == 0
    assert pointwise_check(onehot, ref, SMALL.errtol)[0] == 0


def test_shipped_namelist_size():
    """Full nested.nml problem (nIters timing aside): variants agree at
    errTol on the shipped 25600x2800x100 size."""
    cfg = CkeConfig()
    data = problem.init_data(cfg)
    ref = np.asarray(reference.make_reference(cfg)(data))
    out = np.asarray(_onehot_step(cfg, data)(data))
    n_bad, max_err, lines = pointwise_check(out, ref, cfg.errtol)
    assert n_bad == 0, f"max_err={max_err}\n" + "\n".join(lines[:5])


def test_pallas_onehot_matches_reference(small_data):
    from cdk_tpu.kernels.cke import pallas_onehot

    ref = np.asarray(reference.make_reference(SMALL)(small_data))
    out = np.asarray(pallas_onehot.make_pallas_onehot(SMALL)(small_data))
    n_bad, max_err, lines = pointwise_check(out, ref, SMALL.errtol)
    assert n_bad == 0, f"max_err={max_err}"


def test_pallas_onehot_midsize_f32():
    cfg = with_overrides(
        CkeConfig(), nedges=512, ncells=300, nvertlevels=40, dtype="float32"
    )
    from cdk_tpu.kernels.cke import pallas_onehot

    data = problem.init_data(cfg)
    ref = np.asarray(reference.make_reference(cfg)(data))
    out = np.asarray(pallas_onehot.make_pallas_onehot(cfg)(data))
    # f32 variant vs f32 reference: same-dtype parity, looser than errTol
    from cdk_tpu.core.norms import rel_l1

    assert rel_l1(out, ref) < 1e-6


def test_pallas_onehot_cell_blocking():
    """Multiple cell blocks (accumulation path) match the reference."""
    from cdk_tpu.kernels.cke import pallas_onehot

    cfg = with_overrides(
        CkeConfig(), nedges=128, ncells=700, nvertlevels=12, dtype="float64"
    )
    data = problem.init_data(cfg)
    ref = np.asarray(reference.make_reference(cfg)(data))
    import jax

    out = np.asarray(
        pallas_onehot._run(
            data.adv_cells, data.adv_coefs, data.adv_coefs3, data.tracer,
            data.cell_mask, data.ntf, data.adv_mask, cfg.coef3rdorder,
            64, True, "highest", 256,
        )
    )
    n_bad, max_err, _ = pointwise_check(out, ref, cfg.errtol)
    assert n_bad == 0, f"max_err={max_err}"


def test_gather_peradv_matches_oracle(small_data, small_oracle):
    from cdk_tpu.kernels.cke import gather_peradv

    out = np.asarray(gather_peradv.make_gather_peradv(SMALL)(small_data))
    n_bad, max_err, lines = pointwise_check(out, small_oracle, SMALL.errtol)
    assert n_bad == 0, "\n".join(lines)


def test_pallas_rows_and_staged_exact_midsize():
    """New round-2 exact variants at a mid-size config: f64 pointwise at
    errTol vs the reference (slot-order accumulation contract)."""
    import numpy as np

    from cdk_tpu.core.norms import pointwise_check
    from cdk_tpu.core.registry import get

    cfg = with_overrides(CkeConfig(), nedges=512, ncells=96, nvertlevels=30,
                         nadv=7)
    data = problem.init_data(cfg)
    ref = np.asarray(reference.make_reference(cfg)(data))
    for name in ("pallas_rows", "staged_consume"):
        out = np.asarray(get("cke", name).fn(cfg)(data))
        n_bad, max_err, _ = pointwise_check(out, ref, cfg.errtol)
        assert n_bad == 0, (name, max_err)


def test_pallas_lanegather_exact_multigroup():
    """Lane-axis vectorized gather (transposed table, group select tree)
    at a config spanning several 128-cell lane groups and non-multiple
    edge/level counts: f64 pointwise at errTol vs the reference (the
    slot-order accumulation contract, nested.F90:533-552)."""
    import numpy as np

    from cdk_tpu.core.norms import pointwise_check
    from cdk_tpu.core.registry import _materialize, get

    cfg = with_overrides(CkeConfig(), nedges=300, ncells=400,
                         nvertlevels=21, nadv=6)
    data = problem.init_data(cfg)
    ref = np.asarray(reference.make_reference(cfg)(data))
    step2, aux, _ = _materialize(get("cke", "pallas_lanegather"), cfg, data)
    out = np.asarray(step2(aux, data))
    n_bad, max_err, _ = pointwise_check(out, ref, cfg.errtol)
    assert n_bad == 0, max_err

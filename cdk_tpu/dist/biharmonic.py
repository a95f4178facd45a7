"""Domain-decomposed biharmonic_wk: element decomposition over the mesh.

The extracted biharmonic kernel is ELEMENT-LOCAL (one weak Laplacian per
element; the DSS neighbor exchange of real HOMME is not part of the
extracted kernel — biharmonic_wk_kernel.F90:186-200, SURVEY §5), so the
element dimension decomposes embarrassingly: shard every per-element array
on its leading `nelemd` axis and let pjit/XLA keep all compute local with
zero communication.  This is the capability the reference's hard-coded
`nets..nete=16` single-node loop bounds (biharmonic:15-17) stand in for.

`make_dist_step_dss` supplies the COMMUNICATING leg (VERDICT r1 #4): the
two-application biharmonic with the ring-DSS assembly between Laplacians
(kernels/biharmonic/dss.py defines the topology and single-device form).
Per step each shard exchanges exactly two GLL boundary columns of the
first-Laplacian output with its ring neighbors via `lax.ppermute`; the
overlapped form computes the edge elements' Laplacian first, kicks off the
permutes, and runs everything independent of the halos (interior Laplacian,
interior DSS, interior second Laplacian) while they fly."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cdk_tpu.kernels.biharmonic.problem import (
    BiharmonicData,
    to_lane_layout,
)
from cdk_tpu.kernels.biharmonic.reference import biharmonic_wk_reference


def shard_data(data: BiharmonicData, mesh: Mesh) -> BiharmonicData:
    """Shard per-element arrays over the mesh domain axis; replicate Dvv.
    nelemd must be divisible by the mesh size."""
    ax = mesh.axis_names[0]
    elem = NamedSharding(mesh, P(ax))
    rep = NamedSharding(mesh, P())
    return BiharmonicData(
        jax.device_put(data.dvv, rep),
        jax.device_put(data.dinv, elem),
        jax.device_put(data.spheremp, elem),
        jax.device_put(data.tensorvisc, elem),
        jax.device_put(data.qtens, elem),
    )


def make_dist_step(cfg, mesh: Mesh):
    """jit-compiled element-sharded step; XLA partitions the einsum batch
    over elements with no collectives."""
    rr = cfg.np_dtype(cfg.rrearth)
    ax = mesh.axis_names[0]
    out_sharding = NamedSharding(mesh, P(ax))

    @jax.jit
    def step(data: BiharmonicData) -> jnp.ndarray:
        out = biharmonic_wk_reference(
            data.qtens, data.dvv, data.dinv, data.spheremp, data.tensorvisc,
            rr,
        )
        return jax.lax.with_sharding_constraint(out, out_sharding)

    return step


def make_dist_step_dss(cfg, mesh: Mesh, overlap: bool = False):
    """Element-sharded two-application biharmonic with the ring-DSS
    ppermute exchange.

    Returns (shard_inputs, step, gather):
      shard_inputs(data) -> (q_g sharded over element groups, aux) where
        q_g is the GROUPED (E/g, g*16, ncol) layout and aux = (lbd, w5):
        the grouped block-diagonal operators (E/g, g*16, g*16) and the
        inverse assembled DSS mass (E/g, g, np, np, 1) — both STATIC per
        problem, built once (untimed staging, the reference's discipline
        nested.F90:400-403) so no spheremp columns ever travel at step
        time;
      step(q_g, aux) -> next q_g (grouped layout, sharded);
      gather(q_g) -> full (e, q, k, np, np) qtens on host.

    The local compute is the TUNED form — the bd8 GROUPED block-diagonal
    operator apply (full 128x128 MXU tiles; groups never span shard
    boundaries), per the dist-runs-the-fast-kernel rule (VERDICT r1 #1).
    q travels and is carried in the GROUPED (E/g, g*16, ncol) layout: an
    element-major round trip inside the step measured +0.55 ms/step at
    production (XLA materializes the dim-split of the sublane-tiled dim),
    so the DSS assembly runs in grouped layout too — boundary-column
    extraction and the neighbor shift are leading-dim views, with the
    ppermuted shard-edge columns replacing the single-chip ring wrap."""
    from cdk_tpu.kernels.biharmonic.dss import dss_weights
    from cdk_tpu.kernels.biharmonic.operator import (
        apply_operator_grouped,
        blockdiag_group_operator,
        build_element_operator,
    )

    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    rr = cfg.np_dtype(cfg.rrearth)
    npg = cfg.np_gll
    npts = cfg.npts
    precision = "highest" if cfg.dtype == "float64" else "high"
    espec = P(axis)
    elem = NamedSharding(mesh, espec)
    if cfg.nelemd % nparts:
        raise ValueError(f"nelemd={cfg.nelemd} not divisible by {nparts}")
    e_loc = cfg.nelemd // nparts
    if overlap and e_loc < 2:
        raise ValueError("overlap form needs >= 2 elements per shard")
    # largest group size that divides the shard AND leaves >= 2 groups so
    # the overlap form's two edge-group patches stay disjoint (g is shared
    # by the serial and overlap builders — their aux must interoperate)
    g = 8
    while g > 1 and (e_loc % g or e_loc // g < 2):
        g -= 1

    def _apply_grouped(lbd, q_g):
        # on a grouped-layout operand apply_operator_grouped's lane<->
        # grouped reshapes are identity no-ops — one shared implementation
        return apply_operator_grouped(lbd, q_g, precision=precision)

    def shard_inputs(data: BiharmonicData):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        lbd = blockdiag_group_operator(L, g)
        w = dss_weights(data.spheremp)
        eg_all = cfg.nelemd // g
        w5 = w.reshape(eg_all, g, npg, npg)[..., None]
        q_g = to_lane_layout(data.qtens).reshape(eg_all, g * npts, cfg.ncol)
        return (
            jax.device_put(q_g, elem),
            (jax.device_put(lbd, elem), jax.device_put(w5, elem)),
        )

    perm_fwd = [(i, (i + 1) % nparts) for i in range(nparts)]
    perm_bwd = [(i, (i - 1) % nparts) for i in range(nparts)]

    def _edge_cols(s_g):
        """-> (j0, jl): every element's j=0 / j=np-1 boundary columns as
        element-major (E, np, ncol) views (leading-dim reshapes only)."""
        b, gn, ncol = s_g.shape
        s5 = s_g.reshape(b, g, npg, npg, ncol)
        j0 = s5[:, :, :, 0].reshape(b * g, npg, ncol)
        jl = s5[:, :, :, -1].reshape(b * g, npg, ncol)
        return j0, jl

    def _dss_grouped(s_g, w5_, from_left, from_right):
        """DSS assembly in the grouped layout; from_left/right (1, np,
        ncol) are the shard-edge contributions (ppermuted or zero)."""
        b, gn, ncol = s_g.shape
        s5 = s_g.reshape(b, g, npg, npg, ncol)
        j0, jl = _edge_cols(s_g)
        left = jnp.concatenate([from_left, jl[:-1]], axis=0).reshape(
            b, g, npg, ncol)
        right = jnp.concatenate([j0[1:], from_right], axis=0).reshape(
            b, g, npg, ncol)
        summed = jnp.concatenate(
            [
                (s5[:, :, :, 0] + left)[:, :, :, None],
                s5[:, :, :, 1:-1],
                (s5[:, :, :, -1] + right)[:, :, :, None],
            ],
            axis=3,
        )
        return (summed * w5_).reshape(b, gn, ncol)

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(espec, (espec, espec)),
        out_specs=espec,
        check_vma=False,
    )
    def step_serial(q_g, aux):
        lbd, w5 = aux
        s = _apply_grouped(lbd, q_g)
        j0, jl = _edge_cols(s)
        # ring exchange: our first element's j=0 column goes to the left
        # neighbor (arriving as its from_right); our last element's j=np-1
        # column goes right (arriving as from_left)
        from_right = lax.ppermute(j0[:1], axis, perm_bwd)
        from_left = lax.ppermute(jl[-1:], axis, perm_fwd)
        s2 = _dss_grouped(s, w5, from_left, from_right)
        return _apply_grouped(lbd, s2)

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(espec, (espec, espec)),
        out_specs=espec,
        check_vma=False,
    )
    def step_overlap(q_g, aux):
        """Comm/compute-overlapped DSS step, full-batch-with-edge-patch
        form: both Laplacian applications run over the WHOLE element batch
        (remote DSS columns zeroed — interior rows never read them, so
        their outputs are already exact), the two boundary-column
        ppermutes overlap the second application, and once the halos land
        the two edge elements are recomputed correctly and patched over
        the batched result.  Bitwise-equal to step_serial.

        Design note (measured, production nelemd=5400, 1-dev): forms that
        split the element batch around the exchange — edge-first Laplacian
        (72.7 ms/step) or interior/edge second application (39.0 ms/step)
        — collapse vs 6.0 ms serial inside shard_map+scan, while an
        isolated full-vs-split apply probe shows only 3% overhead; the
        partitioned scan context punishes non-uniform batch slicing.  The
        patch form measures at serial speed, wasting only the two edge
        GROUPS' second applications.  Patches are whole g-element groups
        (recomputed with the same grouped apply) so serial and overlap
        stay bitwise-equal."""
        lbd, w5 = aux
        eg = lbd.shape[0]
        s = _apply_grouped(lbd, q_g)
        j0, jl = _edge_cols(s)

        from_right = lax.ppermute(j0[:1], axis, perm_bwd)
        from_left = lax.ppermute(jl[-1:], axis, perm_fwd)

        z = jnp.zeros_like(j0[:1])
        s2_local = _dss_grouped(s, w5, z, z)
        out = _apply_grouped(lbd, s2_local)

        # recompute the two edge GROUPS with the landed halo columns and
        # patch them over the batched result (their interior dss columns
        # are identical to s2_local's — only the shard-edge column differs)
        first = _dss_grouped(s[:1], w5[:1], from_left, j0[g:g + 1])
        last = _dss_grouped(s[-1:], w5[-1:], jl[-g - 1:-g], from_right)
        out_first = _apply_grouped(lbd[:1], first)
        out_last = _apply_grouped(lbd[-1:], last)
        return lax.dynamic_update_slice_in_dim(
            lax.dynamic_update_slice_in_dim(out, out_first, 0, axis=0),
            out_last, eg - 1, axis=0,
        )

    def gather(q_g):
        from cdk_tpu.kernels.biharmonic.problem import from_lane_layout
        import numpy as np

        q_lane = jnp.asarray(q_g).reshape(cfg.nelemd, npts, cfg.ncol)
        return np.asarray(jax.device_get(from_lane_layout(q_lane, cfg)))

    step = step_overlap if overlap else step_serial
    return shard_inputs, step, gather


def make_dist_loop_dss(cfg, mesh: Mesh, overlap: bool = False):
    """n chained DSS-biharmonic steps under ONE jit (`lax.scan` over the
    ppermute-exchange step) — one dispatch per run, the production
    integration shape (mirrors dist.mpdata.make_dist_loop)."""
    _, step, _ = make_dist_step_dss(cfg, mesh, overlap=overlap)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(q_s, aux, n: int):
        def body(q, _):
            return step(q, aux), None

        q_out, _ = jax.lax.scan(body, q_s, None, length=n)
        return q_out

    return loop

def make_dist_step_dss2d(cfg, mesh: Mesh):
    """2-D element-grid decomposition of the torus-DSS biharmonic
    (kernels/biharmonic/dss2d.py): elements live on an (ex, ey) torus,
    the device mesh splits BOTH grid axes, and the DSS runs as its two
    edge-sum passes — a j-direction boundary-column ppermute along the
    mesh's `ej` axis, then an i-direction boundary-row ppermute of the
    already j-summed field along `ei`.  The second pass's rows carry the
    first pass's corner partial sums, so 4-way corner dofs assemble
    exactly through two nearest-neighbor exchanges with no diagonal
    communication (the two-pass identity documented in dss2d.dss2d_sum).

    Layout: q travels and is carried as (ex, ey, npts, ncol) sharded
    P(ei, ej); the element-local Laplacians run as the per-element
    fused-operator einsum on the locally flattened batch.  (The grouped
    bd8 full-tile apply is a layout the 2-D assembly cannot view into
    without a measured-expensive relayout — the 1-D family's grouped-DSS
    trick needs neighbor elements contiguous in ONE direction; 2-D has
    two.  At miniapp sizes the per-element einsum is the shipped-size
    champion anyway; a grouped 2-D assembly is recorded future work.)

    Returns (shard_inputs, step, gather):
      shard_inputs(data) -> (q5 sharded, aux=(L5, w5)) — operators and
        inverse assembled mass are static per problem, built once
        (untimed staging), sharded so no spheremp dofs travel at step
        time;
      step(q5, aux) -> next q5;
      gather(q5) -> full (e, q, k, np, np) qtens on host."""
    from cdk_tpu.kernels.biharmonic.dss2d import dss2d_weights, torus_shape
    from cdk_tpu.kernels.biharmonic.operator import (
        apply_operator,
        build_element_operator,
    )

    ax_i, ax_j = mesh.axis_names
    pi, pj = mesh.devices.shape
    rr = cfg.np_dtype(cfg.rrearth)
    npg = cfg.np_gll
    npts, ncol = cfg.npts, cfg.ncol
    ex, ey = torus_shape(cfg.nelemd)
    if ex % pi or ey % pj:
        raise ValueError(
            f"element grid {ex}x{ey} not divisible by mesh {pi}x{pj}"
        )
    precision = "highest" if cfg.dtype == "float64" else "high"
    gspec = P(ax_i, ax_j)
    gshard = NamedSharding(mesh, gspec)

    def shard_inputs(data: BiharmonicData):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        w = dss2d_weights(data.spheremp, ex, ey)
        L5 = L.reshape(ex, ey, npts, npts)
        w5 = w.reshape(ex, ey, npts, 1)
        q5 = to_lane_layout(data.qtens).reshape(ex, ey, npts, ncol)
        return (
            jax.device_put(q5, gshard),
            (jax.device_put(L5, gshard), jax.device_put(w5, gshard)),
        )

    perm_fwd_j = [(p, (p + 1) % pj) for p in range(pj)]
    perm_bwd_j = [(p, (p - 1) % pj) for p in range(pj)]
    perm_fwd_i = [(p, (p + 1) % pi) for p in range(pi)]
    perm_bwd_i = [(p, (p - 1) % pi) for p in range(pi)]

    def _apply(L5, q5):
        exl, eyl = q5.shape[:2]
        out = apply_operator(
            L5.reshape(exl * eyl, npts, npts),
            q5.reshape(exl * eyl, npts, ncol),
            precision,
        )
        return out.reshape(exl, eyl, npts, ncol)

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(gspec, (gspec, gspec)),
        out_specs=gspec,
        check_vma=False,
    )
    def step(q5, aux):
        L5, w5 = aux
        s = _apply(L5, q5)
        exl, eyl = s.shape[:2]
        s6 = s.reshape(exl, eyl, npg, npg, ncol)      # (a, b, i, j, c)

        # ---- pass 1: j-direction edge sum (full columns, corners in) ---
        j0 = s6[:, :, :, 0]                            # (a, b, i, c)
        jl = s6[:, :, :, -1]
        from_left = lax.ppermute(jl[:, -1:], ax_j, perm_fwd_j)
        from_right = lax.ppermute(j0[:, :1], ax_j, perm_bwd_j)
        left = jnp.concatenate([from_left, jl[:, :-1]], axis=1)
        right = jnp.concatenate([j0[:, 1:], from_right], axis=1)
        t6 = jnp.concatenate(
            [
                (j0 + left)[:, :, :, None],
                s6[:, :, :, 1:-1],
                (jl + right)[:, :, :, None],
            ],
            axis=3,
        )

        # ---- pass 2: i-direction edge sum OF THE j-SUMMED field --------
        i0 = t6[:, :, 0]                               # (a, b, j, c)
        il = t6[:, :, -1]
        from_up = lax.ppermute(il[-1:], ax_i, perm_fwd_i)
        from_down = lax.ppermute(i0[:1], ax_i, perm_bwd_i)
        up = jnp.concatenate([from_up, il[:-1]], axis=0)
        down = jnp.concatenate([i0[1:], from_down], axis=0)
        u6 = jnp.concatenate(
            [
                (i0 + up)[:, :, None],
                t6[:, :, 1:-1],
                (il + down)[:, :, None],
            ],
            axis=2,
        )
        s2 = u6.reshape(exl, eyl, npts, ncol) * w5
        return _apply(L5, s2)

    def gather(q5):
        import numpy as np

        from cdk_tpu.kernels.biharmonic.problem import from_lane_layout

        q_lane = jnp.asarray(q5).reshape(cfg.nelemd, npts, ncol)
        return np.asarray(jax.device_get(from_lane_layout(q_lane, cfg)))

    return shard_inputs, step, gather


def make_dist_loop_dss2d(cfg, mesh: Mesh):
    """n chained torus-DSS steps under ONE jit (scan over the two-ppermute
    step) — one dispatch per run, mirroring make_dist_loop_dss."""
    _, step, _ = make_dist_step_dss2d(cfg, mesh)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(q5, aux, n: int):
        def body(q, _):
            return step(q, aux), None

        q_out, _ = jax.lax.scan(body, q5, None, length=n)
        return q_out

    return loop


def _rowchain_io(cfg, mesh: Mesh, geom):
    """Shared shard_inputs/gather plumbing of the distributed rowchain
    factories: q as (ex, L, ncol) + aux (lrow, w2), all sharded on the
    element-row axis."""
    from cdk_tpu.kernels.biharmonic.dss2d import dss2d_weights
    from cdk_tpu.kernels.biharmonic.operator import (
        blockdiag_group_operator,
        build_element_operator,
    )

    ex, ey, g, gb, gn, L, ncol, ncol0 = geom
    rr = cfg.np_dtype(cfg.rrearth)
    rows = NamedSharding(mesh, P(mesh.axis_names[0]))

    def shard_inputs(data: BiharmonicData):
        Lop = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        lrow = blockdiag_group_operator(Lop, g).reshape(ex, gb, gn, gn)
        w2 = dss2d_weights(data.spheremp, ex, ey).reshape(ex, L, 1)
        q2 = to_lane_layout(data.qtens).reshape(ex, L, cfg.ncol)
        return (
            jax.device_put(q2, rows),
            (jax.device_put(lrow, rows), jax.device_put(w2, rows)),
        )

    def gather(q2):
        import numpy as np

        from cdk_tpu.dist.mesh import to_host_global
        from cdk_tpu.kernels.biharmonic.problem import from_lane_layout

        q_lane = jnp.asarray(to_host_global(q2)).reshape(
            cfg.nelemd, cfg.npts, cfg.ncol)
        return np.asarray(jax.device_get(from_lane_layout(q_lane, cfg)))

    return shard_inputs, gather


def make_dist_loop_dss2d_rowchain(cfg, mesh: Mesh, overlap: bool = False):
    """Distributed t-carry rowchain for the torus-DSS family: element ROWS
    shard over a 1-D mesh (the j direction stays whole per shard — the
    rowchain's full-row-window premise), and each scan step ppermutes ONE
    t row per side before the fused step kernel
    (pallas_dss2d_resident._rowchain_step_kernel) runs on the locally
    padded rows — the dist-runs-the-tuned-kernel rule applied to the 2-D
    family.  The general (pi, pj) mesh keeps the per-step jnp form
    (make_dist_step_dss2d); this loop is the fast row-sharded production
    shape.

    Returns (shard_inputs, loop, gather): shard_inputs(data) ->
    (q2 (ex, L, ncol) sharded on rows, aux=(lrow, w2) sharded);
    loop(q2, aux, n) -> q2 after n steps; gather back to qtens."""
    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.biharmonic.dss2d import dss2d_weights, torus_shape
    from cdk_tpu.kernels.biharmonic.operator import (
        blockdiag_group_operator,
        build_element_operator,
    )
    from cdk_tpu.kernels.biharmonic.pallas_dss2d_resident import (
        _rowchain_calls,
    )

    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    rr = cfg.np_dtype(cfg.rrearth)
    precision = "highest" if cfg.dtype == "float64" else "bf16x3"
    # precomposed: the t-step kernels apply the squared operator ONCE per
    # step (pallas_dss2d_resident._make_fused_apply — measured 1.66x on
    # the single-chip production steady state); A² is per-row local, so
    # it commutes with the row sharding and the boundary ppermutes
    calls, geom = _rowchain_calls(cfg, precision, pallas_interpret(),
                                  precomposed=True)
    ex, ey, g, gb, gn, L, ncol, ncol0 = geom
    if ex % nparts:
        raise ValueError(f"element rows {ex} not divisible by {nparts}")
    espec = P(axis)
    rows = NamedSharding(mesh, espec)
    perm_fwd = [(i, (i + 1) % nparts) for i in range(nparts)]
    perm_bwd = [(i, (i - 1) % nparts) for i in range(nparts)]
    if overlap and ex // nparts < 2:
        raise ValueError("overlap form needs >= 2 element rows per shard")
    shard_inputs, gather = _rowchain_io(cfg, mesh, geom)

    def _pad_exchanged(t):
        """Extend the local (ex_loc*L, ncol) t by one ring-exchanged
        element row per side (the torus wrap rides the permutation)."""
        up = lax.ppermute(t[-L:], axis, perm_fwd)
        dn = lax.ppermute(t[:L], axis, perm_bwd)
        return jnp.concatenate([up, t, dn], axis=0)

    # blocked k-step path (serial form): bi_d owned rows and k chained
    # t-steps per kernel invocation — one k-row exchange per k t-steps.
    # Deepest VMEM-admitted depth first (k=4 at production under the
    # 100 MB limit), remainders with the shallower depths; falls back to
    # the 1-row step when the local row count has no usable divisor.
    from cdk_tpu.kernels.biharmonic.pallas_dss2d_resident import (
        step_budget_ok,
    )

    exl_rows = ex // nparts
    row_b = L * calls["ncol_blk"] * cfg.np_dtype(0).itemsize
    bi_d = 1
    # dist bi_d caps at 8, NOT the single-chip BI_CAP=15: the padded form
    # materializes a (exl + 2*bi_d)-row copy of t per exchange, so large
    # blocks inflate that copy traffic — measured at production 1-dev:
    # bi_d=15/k=3 921 us/step vs bi_d=5/k=4 885 (the mod-index wrap the
    # big block amortizes on the single chip does not exist here)
    for cand in range(min(8, exl_rows), 1, -1):
        # same live-set budget as the single-chip per-depth gates (the
        # step window + operators, double-buffered, vs the requested
        # 100 MB scoped-VMEM limit) — shared predicate, no gate drift
        if exl_rows % cand == 0 and step_budget_ok(2, cand, row_b):
            bi_d = cand
            break
    # padded k-step calls: each depth needs kk local rows to donate per
    # side and its own live-set budget; pad width P_kk = bi_d·ceil(kk/bi_d).
    # calls["kmax"] carries the precision-aware depth cap (k=4 only pays
    # where the apply is cheap — the precomposed bf16x3 form)
    steps_padded = {}
    if bi_d >= 2:
        for kk in range(2, calls["kmax"] + 1):
            if exl_rows >= kk and step_budget_ok(kk, bi_d, row_b):
                # padded_out: the serial loop carries the halo-padded
                # layout across the scan (see the padded-carry comment
                # at the scan site)
                steps_padded[kk] = calls["stepk_padded_factory"](
                    kk, bi_d, True)

    def _padk_t(t, kk):
        """Pad P_kk element rows per side; the innermost kk carry the
        ppermuted neighbor rows, the outer P_kk-kk are zeros (never read
        — see stepk_padded_factory)."""
        Pk = bi_d * (-(-kk // bi_d))
        up = lax.ppermute(t[-kk * L:], axis, perm_fwd)
        dn = lax.ppermute(t[:kk * L], axis, perm_bwd)
        if Pk > kk:
            z = jnp.zeros(((Pk - kk) * L, t.shape[1]), t.dtype)
            return jnp.concatenate([z, up, t, dn, z], axis=0)
        return jnp.concatenate([up, t, dn], axis=0)

    def _padk_ops(lrow, w2, kk):
        """Same pad for the step-invariant operators/weights (innermost
        kk-1 valid rows per side) — exchanged once per run, not per
        step."""
        Pk, m = bi_d * (-(-kk // bi_d)), kk - 1

        def pad(x):
            u = lax.ppermute(x[-m:], axis, perm_fwd)
            d = lax.ppermute(x[:m], axis, perm_bwd)
            if Pk > m:
                z = jnp.zeros((Pk - m, *x.shape[1:]), x.dtype)
                return jnp.concatenate([z, u, x, d, z], axis=0)
            return jnp.concatenate([u, x, d], axis=0)

        return pad(lrow), pad(w2)

    def _step_serial(lrow, w2, t):
        return calls["step_t_padded"](lrow, w2, _pad_exchanged(t))

    def _step_overlap(lrow, w2, t):
        """Comm/compute-overlapped t step, full-batch-with-edge-patch form
        (the 1-D family's measured-winning pattern: batch splits around
        the exchange collapse inside shard_map+scan, so compute the WHOLE
        batch with zeroed halos — interior rows never read them — while
        the two boundary-row permutes fly, then recompute the two edge
        rows with the landed halos and patch.  Bitwise-equal to serial:
        the patch runs the identical kernel on identical window
        content)."""
        up = lax.ppermute(t[-L:], axis, perm_fwd)
        dn = lax.ppermute(t[:L], axis, perm_bwd)
        z = jnp.zeros_like(t[:L])
        out = calls["step_t_padded"](
            lrow, w2, jnp.concatenate([z, t, z], axis=0))
        first = calls["step_t_padded"](
            lrow[:1], w2[:1],
            jnp.concatenate([up, t[:L], t[L:2 * L]], axis=0))
        last = calls["step_t_padded"](
            lrow[-1:], w2[-1:],
            jnp.concatenate([t[-2 * L:-L], t[-L:], dn], axis=0))
        out = lax.dynamic_update_slice_in_dim(out, first, 0, axis=0)
        return lax.dynamic_update_slice_in_dim(
            out, last, out.shape[0] - L, axis=0)

    step_fn = _step_overlap if overlap else _step_serial

    @functools.partial(jax.jit, static_argnames="n")
    def loop(q2, aux, n: int):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(espec, (espec, espec)),
            out_specs=espec,
            check_vma=False,
        )
        def run(q_loc, aux):
            from cdk_tpu.kernels.biharmonic.pallas_dss2d_resident import (
                precompose_operator,
            )

            lrow, w2 = aux
            lsq = precompose_operator(lrow)  # step-kernel operand (A²)
            exl = lrow.shape[0]
            t = calls["bridge_in"](lrow, q_loc.reshape(exl * L, cfg.ncol))
            nt = max(n - 1, 0)
            if not overlap:
                for kk in sorted(steps_padded, reverse=True):
                    if nt >= kk:
                        lrow_p, w2_p = _padk_ops(lsq, w2, kk)
                        # PADDED-CARRY scan (round 5): carry t in the
                        # halo-padded layout and refresh ONLY the 2*kk
                        # halo rows per call (ppermute of the center
                        # edges + two small row writes) — the previous
                        # form rebuilt the whole (exl+2P)-row array via
                        # _padk_t's concat every call (~270 MB at
                        # production kk=4).  The kernel writes its owned
                        # rows into the same padded shape (padded_out);
                        # halo rows left unwritten are always refreshed
                        # before the next read.
                        PL, kL = bi_d * (-(-kk // bi_d)) * L, kk * L

                        def refresh(tp, kL=kL, PL=PL):
                            up = lax.ppermute(
                                tp[PL + exl * L - kL:PL + exl * L],
                                axis, perm_fwd)
                            dn = lax.ppermute(tp[PL:PL + kL], axis,
                                              perm_bwd)
                            tp = lax.dynamic_update_slice_in_dim(
                                tp, up, PL - kL, 0)
                            return lax.dynamic_update_slice_in_dim(
                                tp, dn, PL + exl * L, 0)

                        tp, _ = lax.scan(
                            lambda tt, _, s=steps_padded[kk], lp=lrow_p,
                            wp=w2_p: (s(lp, wp, refresh(tt)), None),
                            _padk_t(t, kk), None, length=nt // kk,
                            unroll=2)
                        t = tp[PL:PL + exl * L]
                        nt %= kk
            if nt:
                t, _ = lax.scan(
                    lambda tt, _: (step_fn(lsq, w2, tt), None),
                    t, None, length=nt)
            q = calls["bridge_out_padded"](lrow, w2, _pad_exchanged(t))
            return q[:, :cfg.ncol].reshape(exl, L, cfg.ncol)

        return run(q2, aux)

    return shard_inputs, loop, gather


def make_dist_loop_dss2d_rowchain_kstep(cfg, mesh: Mesh, kstep: int = 4):
    """Communication-avoiding distributed rowchain: ppermute kstep t rows
    per side ONCE per kstep steps, then run a shrinking-window local
    chain — sub-step j consumes one halo row per side (the deep-halo
    validity argument on the row axis), so the SAME fused step kernel
    runs at kstep static shapes and no new kernel is needed.  Operators/
    weights for the halo rows are step-invariant: their extended windows
    are exchanged once per dispatch.  Exchange count drops kstep-fold at
    the cost of 2*sum(k-j)/ex_loc ≈ kstep/ex_loc row overcompute.

    Same contract as make_dist_loop_dss2d_rowchain; n must be a positive
    multiple of 1 (a trailing n % kstep remainder block is handled)."""
    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.biharmonic.dss2d import dss2d_weights, torus_shape
    from cdk_tpu.kernels.biharmonic.operator import (
        blockdiag_group_operator,
        build_element_operator,
    )
    from cdk_tpu.kernels.biharmonic.pallas_dss2d_resident import (
        _rowchain_calls,
    )

    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    rr = cfg.np_dtype(cfg.rrearth)
    precision = "highest" if cfg.dtype == "float64" else "bf16x3"
    # precomposed step kernels (A² per t-step; see the serial loop above)
    calls, geom = _rowchain_calls(cfg, precision, pallas_interpret(),
                                  precomposed=True)
    ex, ey, g, gb, gn, L, ncol, ncol0 = geom
    if ex % nparts:
        raise ValueError(f"element rows {ex} not divisible by {nparts}")
    ex_loc = ex // nparts
    if kstep < 1 or kstep > ex_loc:
        # halo rows beyond the shard would need multi-hop exchanges
        raise ValueError(f"kstep={kstep} must be in [1, {ex_loc}]")
    espec = P(axis)
    rows = NamedSharding(mesh, espec)
    perm_fwd = [(i, (i + 1) % nparts) for i in range(nparts)]
    perm_bwd = [(i, (i - 1) % nparts) for i in range(nparts)]

    shard_inputs, gather = _rowchain_io(cfg, mesh, geom)

    def _ext(x, h, ax=0):
        """Extend by h ring-exchanged leading-axis entries per side."""
        up = lax.ppermute(
            lax.slice_in_dim(x, x.shape[ax] - h, x.shape[ax], axis=ax),
            axis, perm_fwd)
        dn = lax.ppermute(lax.slice_in_dim(x, 0, h, axis=ax), axis,
                          perm_bwd)
        return jnp.concatenate([up, x, dn], axis=ax)

    def _chain(lrow_e, w_e, t, k):
        """k sub-steps on a (ex_loc + 2k)-row extended t, shrinking one
        row per side per sub-step (static shapes; the kernel is
        shape-generic).  lrow_e/w_e are ALWAYS extended by kstep rows per
        side, so for a remainder chain (k < kstep) every slice is offset
        by the unused kstep - k extension rows."""
        t_ext = _ext(t.reshape(ex_loc, L, ncol),
                     k).reshape((ex_loc + 2 * k) * L, ncol)
        off = kstep - k
        for j in range(1, k + 1):
            nrows = ex_loc + 2 * (k - j)
            lj = lax.slice_in_dim(lrow_e, off + j, off + j + nrows, axis=0)
            wj = lax.slice_in_dim(w_e, off + j, off + j + nrows, axis=0)
            t_ext = calls["step_t_padded"](lj, wj, t_ext)
        return t_ext  # (ex_loc * L, ncol)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(q2, aux, n: int):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(espec, (espec, espec)),
            out_specs=espec,
            check_vma=False,
        )
        def run(q_loc, aux):
            from cdk_tpu.kernels.biharmonic.pallas_dss2d_resident import (
                precompose_operator,
            )

            lrow, w2 = aux
            # step-invariant extended operator/weight windows: one
            # exchange per dispatch; the step kernels take the squared
            # operator (bridges keep the plain one)
            lrow_e = _ext(precompose_operator(lrow), kstep)
            w_e = _ext(w2, kstep)
            t = calls["bridge_in"](lrow, q_loc.reshape(ex_loc * L,
                                                       cfg.ncol))
            m, r = divmod(n - 1, kstep)
            if m:
                t, _ = lax.scan(
                    lambda tt, _: (_chain(lrow_e, w_e, tt, kstep), None),
                    t, None, length=m)
            if r:
                t = _chain(lrow_e, w_e, t, r)
            up = lax.ppermute(t[-L:], axis, perm_fwd)
            dn = lax.ppermute(t[:L], axis, perm_bwd)
            q = calls["bridge_out_padded"](
                lrow, w2, jnp.concatenate([up, t, dn], axis=0))
            return q[:, :cfg.ncol].reshape(ex_loc, L, cfg.ncol)

        return run(q2, aux)

    return shard_inputs, loop, gather


def make_dist_loop_dss_kstep(cfg, mesh: Mesh, kstep: int = 8,
                             precision: str | None = None,
                             split: bool = True):
    """Communication-avoiding dist DSS loop: exchange B halo GROUPS once
    per kstep in-kernel steps (ring ppermute over shards — the element
    ring is globally periodic, so the permutation wraps), then run the
    VMEM-resident windowed chain (pallas_dss_resident.apply_dss_resident_
    windowed) on each shard's extended block and keep the owned groups.
    Exactness: each in-kernel step consumes one element of halo validity
    per side (kstep <= hg*g with hg = ceil(kstep/g) halo groups — B is
    only the VMEM-budget center-block size); the mpdata kloop argument on
    the element ring.  Exchange count drops kstep-fold and the field's
    HBM round trip happens once per kstep steps instead of per step.

    Returns (shard_inputs, loop, gather): shard_inputs(data) ->
    (q_g grouped + sharded, aux=(lbd, w2)); loop(q_g, aux, n) with
    n % kstep == 0; gather back to qtens.  TRAVEL LAYOUT: q_g and the
    loop output carry (eg, gn, ncolp) with ncolp = ceil(ncol/128)*128 —
    LANE-PADDED, one pad at shard_inputs instead of a whole-field
    pad/slice per chain call (round5-summary §7); gather strips the
    pad.  Compare shards only through gather (or slice [:ncol]).

    split=True (default) assembles each window from the owned field +
    tiny per-window halo-strip arrays (apply_dss_resident_windowed_
    split) — no whole-field _exg concat or B-hg alignment pad per call
    (was ~1.0 GB HBM traffic/call at production, the entire measured
    dist-vs-single gap: 587 -> 436 us/step).  split=False keeps the
    padded-window form (apply_dss_resident_windowed) reachable for
    A/B, the same convention as the mpdata kloop."""
    import numpy as _np

    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.biharmonic.dss import dss_weights
    from cdk_tpu.kernels.biharmonic.operator import (
        blockdiag_group_operator,
        build_element_operator,
    )
    from cdk_tpu.kernels.biharmonic.pallas_dss_resident import (
        apply_dss_resident_windowed,
        apply_dss_resident_windowed_split,
    )

    # (validity is kstep <= hg*g with hg = ceil(kstep/g), which holds by
    # construction — the round-2 kstep<=KMAX guard was a knob relic; deep
    # kstep trades nothing but window width, gated below by eg_loc % hg)
    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    rr = cfg.np_dtype(cfg.rrearth)
    npg = cfg.np_gll
    npts, ncol = cfg.npts, cfg.ncol
    g = 8
    while cfg.nelemd % g:
        g -= 1
    gn = g * npts
    eg = cfg.nelemd // g
    if eg % nparts:
        raise ValueError(f"element groups {eg} not divisible by {nparts}")
    eg_loc = eg // nparts
    hg = -(-kstep // g)  # halo groups needed for kstep steps
    if eg_loc < hg or eg_loc % hg:
        # _exg's x[-hg:] would silently truncate the halo exchange and the
        # windowed kernel's geometry would be wrong — raise like the other
        # decomposition guards
        raise ValueError(
            f"{eg_loc} groups/shard cannot carry an hg={hg} halo "
            f"(kstep={kstep}, g={g}): lower kstep or devices"
        )
    # center-block size: a multiple of hg dividing the shard, as large as
    # the VMEM window budget allows (amortizes the 2*hg halo overcompute).
    # Budget = the single-chip chain's shared live-set predicate (round 4
    # replaced the round-2 3 MB literal, which capped B at 5 groups and
    # left 1.4x overcompute on the table at production)
    from cdk_tpu.kernels.biharmonic.pallas_dss_resident import GEOM_BUDGET

    blk = gn * 128 * cfg.np_dtype(0).itemsize
    B = hg
    for cand in sorted((b for b in range(hg, eg_loc + 1)
                        if eg_loc % b == 0 and b % hg == 0),
                       reverse=True):
        B = cand
        if (4 * cand + 9 * (cand + 2 * hg)) * blk <= GEOM_BUDGET:
            break
    nb = eg_loc // B
    if precision is None:
        precision = "highest" if cfg.dtype == "float64" else "bf16x3"
    interpret = pallas_interpret()
    espec = P(axis)
    elem = NamedSharding(mesh, espec)
    perm_fwd = [(i, (i + 1) % nparts) for i in range(nparts)]
    perm_bwd = [(i, (i - 1) % nparts) for i in range(nparts)]

    # travel lane-padded: the per-call jnp.pad of the whole field inside
    # the windowed apply was ~90 us/call of pure copy at production
    ncolp = -(-ncol // 128) * 128

    def shard_inputs(data: BiharmonicData):
        L = build_element_operator(
            data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )
        lbd = blockdiag_group_operator(L, g)
        w2 = dss_weights(data.spheremp).reshape(eg, gn, 1)
        q_g = to_lane_layout(data.qtens).reshape(eg, gn, ncol)
        q_g = jnp.pad(q_g, ((0, 0), (0, 0), (0, ncolp - ncol)))
        return (
            jax.device_put(q_g, elem),
            (jax.device_put(lbd, elem), jax.device_put(w2, elem)),
        )

    def _exg(x):
        """Extend by hg ring-exchanged halo groups per side (periodic)."""
        left = lax.ppermute(x[-hg:], axis, perm_fwd)
        right = lax.ppermute(x[:hg], axis, perm_bwd)
        return jnp.concatenate([left, x, right], axis=0)

    W = B + 2 * hg
    idx_w = _np.array([i * B + j for i in range(nb) for j in range(W)])

    @functools.partial(jax.jit, static_argnames="n")
    def loop(q_s, aux, n: int):
        if n % kstep:
            raise ValueError(f"n={n} not a multiple of kstep={kstep}")

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(espec, (espec, espec)),
            out_specs=espec,
            check_vma=False,
        )
        def run(q_loc, aux):
            lbd, w2 = aux
            # operators/weights are step-invariant: exchange + window ONCE.
            # A² likewise (the d-carry precomposition — k+1 bd8 applies
            # per kstep call instead of 2k, the single-chip sq champions'
            # algebra riding the same ring exchange)
            # precision gated on dtype like dss.py/dss2d.py: an explicit
            # MXU precision on an f64 einsum can route to the ~1e-9
            # bf16-emulated path on TPU (f64-on-chip-round4.txt); at f64
            # this loop only runs on CPU/interpret (Pallas f64 cannot
            # lower on the real chip), where None stays exact
            lsq = jnp.einsum("bij,bjk->bik", lbd, lbd,
                             precision=(None if lbd.dtype == jnp.float64
                                        else "highest"),
                             preferred_element_type=lbd.dtype)
            lw = jnp.take(_exg(lbd), idx_w, axis=0).reshape(nb, W, gn, gn)
            lw2 = jnp.take(_exg(lsq), idx_w,
                           axis=0).reshape(nb, W, gn, gn)
            ww = jnp.take(_exg(w2), idx_w, axis=0).reshape(nb, W * gn, 1)

            if split:
                def body(q, _):
                    # split-operand window assembly: the ppermuted
                    # neighbor strips + local block tails/heads form tiny
                    # per-window halo arrays, and the owned field IS the
                    # aligned center operand — no whole-field _exg concat
                    # or B-hg alignment pad per call (was ~1.0 GB HBM
                    # traffic/call ≈ the whole measured dist-vs-single
                    # gap; round5-summary §7)
                    left = lax.ppermute(q[-hg:], axis, perm_fwd)
                    right = lax.ppermute(q[:hg], axis, perm_bwd)
                    q_r = q.reshape(nb, B * gn, ncolp)
                    hl = jnp.concatenate(
                        [left.reshape(1, hg * gn, ncolp),
                         q_r[:-1, -hg * gn:]], axis=0)
                    hr = jnp.concatenate(
                        [q_r[1:, :hg * gn],
                         right.reshape(1, hg * gn, ncolp)], axis=0)
                    out = apply_dss_resident_windowed_split(
                        lw, ww, q.reshape(eg_loc * gn, ncolp), hl, hr,
                        kstep, b_groups=B, hg=hg, gn=gn, npg=npg,
                        precision=precision, interpret=interpret,
                        lw2=lw2,
                    )
                    return out.reshape(eg_loc, gn, ncolp), None
            else:
                def body(q, _):
                    # padded-window A/B form (the round-4 design): pays
                    # the per-call field concat + alignment pad
                    out = apply_dss_resident_windowed(
                        lw, ww, _exg(q), kstep, b_groups=B, hg=hg,
                        gn=gn, npg=npg, precision=precision,
                        interpret=interpret, lw2=lw2,
                    )
                    return out, None

            q_out, _ = lax.scan(body, q_loc, None, length=n // kstep,
                                unroll=2)
            return q_out

        return run(q_s, aux)

    def gather(q_g):
        from cdk_tpu.dist.mesh import to_host_global
        from cdk_tpu.kernels.biharmonic.problem import from_lane_layout
        import numpy as np

        # to_host_global first: under real multi-controller runs the
        # shards live on other processes' devices and a direct reshape/
        # fetch of the global array raises (dist.multiproc parity)
        q_lane = jnp.asarray(to_host_global(q_g)).reshape(
            cfg.nelemd, npts, ncolp)[:, :, :ncol]
        return np.asarray(jax.device_get(from_lane_layout(q_lane, cfg)))

    return shard_inputs, loop, gather

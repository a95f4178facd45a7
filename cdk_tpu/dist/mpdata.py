"""Domain-decomposed MPDATA: x-column decomposition with halo exchange.

The reference defers all horizontal decomposition ("plan was to add some MPI
parallelism later", nested_loops/README.md:29-31); its MPDATA miniapp scales
only the per-node slice batch.  This module supplies the deferred
capability the TPU-native way (SURVEY §5 "long-context analog"):

  - the global x axis is split into contiguous owned chunks over a 1-D
    `Mesh`;
  - each step, every shard exchanges H halo columns with its neighbors via
    `lax.ppermute` (collective-permute over ICI) inside `shard_map`;
  - each shard then runs the *masked-global* MPDATA core on its extended
    (owned + 2H) columns and keeps the owned slice.

Masked-global core: the single-device reference (reference.advect_scalar2d)
realizes the Fortran loops' x-range restrictions *positionally*
(concatenation at fixed offsets).  That formulation can't be cut at an
arbitrary x: a shard's local array edge would get boundary treatment that
belongs only to the true domain edge.  `advect_scalar2d_masked` instead
computes every stage with uniform stencils over ALL columns (collocated
layout: f, u, w all on one x grid) and applies each Fortran range
restriction as a `where` on the column's GLOBAL Fortran index — so a shard
holding any window of global columns computes exactly the global values for
its owned region, provided H ≥ 3 (the f→f_out stencil dependency depth:
f_out(i) reads f(i±3)).  H defaults to 4 for margin.

Domain flux sums (flux(k) = Σ_{i=1..nx}, advect…F90:540-547,613-628) become
owned-column partial sums + `lax.psum`.

Collocated layout: column ix holds Fortran index gi = ix − 2 of f; u(gi)
and w(gi) are stored at the same ix (u valid gi ∈ [-1, nx+3] → ix ≥ 1,
w valid gi ∈ [-1, nx+2]; unused slots are zero)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from cdk_tpu.kernels.mpdata.problem import MpdataData
from cdk_tpu.kernels.mpdata.reference import (
    EPS,
    _across,
    _andiff,
    _kb,
    _kc,
    _min3,
    _pn,
    _pp,
)

# Exchange halo width. 3 = the exact f→f_out stencil dependency depth
# (f_out(i) reads f(i±3)); verified exact at f64 on the 2/8-device mesh.
# Round 1 shipped 4 "for margin" — the margin costs 2 extra computed
# columns per shard and 25% more exchange bytes for nothing the tests can
# detect, so round 2 runs the exact depth.
HALO = 3


def _xl(a):
    """Left-neighbor read along x: out[ix] = a[ix-1] (clamped at 0)."""
    return jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)


def _xr(a):
    """Right-neighbor read along x: out[ix] = a[ix+1] (clamped at end)."""
    return jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)


def advect_scalar2d_masked(f, u, w, rho, rhow, adz, gi, owned, nx,
                           kspan=None):
    """Masked-global MPDATA step on collocated (S, X, Z) arrays.

    gi:    (X,) or (X,1) int32 — global Fortran i of each column (2-D form
           for Pallas callers: Mosaic has no 1-D iota/vectors)
    owned: (X,) or (X,1) bool — columns whose outputs this shard owns (flux
           sums count only owned columns; f is returned for all columns but
           only owned ones are meaningful)
    Returns (f_out (S,X,nzm), flux_body (S,nzm) partial sum over owned).
    """
    s, X, nzm = f.shape
    gim = jnp.reshape(gi, (1, X, 1))
    ownedm = jnp.reshape(owned, (1, X, 1))

    def m(lo, hi):
        return (gim >= lo) & (gim <= hi)

    irho = (1.0 / rho)[:, None, :]
    iadz = (1.0 / adz)[:, None, :]
    if kspan is None:
        k1 = jnp.arange(nzm)
        kspan = (
            jnp.minimum(nzm - 1, k1 + 1) - jnp.maximum(0, k1 - 1)
        ).astype(f.dtype)
    dd = 2.0 / jnp.reshape(kspan, (1, 1, nzm)) / adz[:, None, :]
    irhow = (1.0 / (rhow[..., :nzm] * adz))[:, None, :]
    w_s = w[..., :nzm]
    one = jnp.asarray(1.0, f.dtype)
    fmask = m(1, nx) & ownedm

    # stage 1: extrema (valid gi in [0, nx+1])
    lf, rf = _xl(f), _xr(f)
    mx = jnp.maximum(jnp.maximum(jnp.maximum(lf, rf),
                                 jnp.maximum(_kb(f), _kc(f))), f)
    mn = jnp.minimum(jnp.minimum(jnp.minimum(lf, rf),
                                 jnp.minimum(_kb(f), _kc(f))), f)

    # stage 2: upwind fluxes (uuu valid gi in [-1,nx+3], www in [-1,nx+2])
    uuu = _pp(u) * lf - _pn(u) * f
    www_k = _pp(w_s) * _kb(f) - _pn(w_s) * f
    flux = jnp.sum(jnp.where(fmask, www_k, 0.0), axis=1)
    www_kp1 = jnp.concatenate(  # www(k+1) with www(:,nz)=0 top boundary
        [www_k[..., 1:], jnp.zeros_like(www_k[..., :1])], axis=-1
    )

    # stage 3: upwind update (gi in [-1, nx+2])
    upd = (_xr(uuu) - uuu + (www_kp1 - www_k) * iadz) * irho
    f1 = jnp.where(m(-1, nx + 2), f - upd, f)

    # stage 4: antidiffusive velocities
    lf1, rf1 = _xl(f1), _xr(f1)
    lw = _xl(w_s)
    uuu2_b = _andiff(lf1, f1, u, irho) - _across(
        dd * (_kc(lf1) + _kc(f1) - _kb(lf1) - _kb(f1)),
        u,
        lw + _kc(lw) + w_s + _kc(w_s),
    ) * irho
    uuu2 = jnp.where(m(0, nx + 2), uuu2_b, uuu)
    ru = _xr(u)
    www2_b = _andiff(_kb(f1), f1, w_s, irhow) - _across(
        _kb(rf1) + rf1 - _kb(lf1) - lf1,
        w_s,
        _kb(u) + u + ru + _kb(ru),
    ) * irho
    www2_k = jnp.where(m(0, nx + 1), www2_b, www_k)
    # bottom boundary www(:,:,1)=0 (:586)
    www2_k = jnp.concatenate(
        [jnp.zeros_like(www2_k[..., :1]), www2_k[..., 1:]], axis=-1
    )

    # stage 5a: second extrema with updated f
    mx = jnp.maximum(jnp.maximum(jnp.maximum(lf1, rf1),
                                 jnp.maximum(_kb(f1), _kc(f1))),
                     jnp.maximum(f1, mx))
    mn = jnp.minimum(jnp.minimum(jnp.minimum(lf1, rf1),
                                 jnp.minimum(_kb(f1), _kc(f1))),
                     jnp.minimum(f1, mn))

    # stage 5b: in/out flux ratios (valid gi in [0, nx+1])
    ruuu2 = _xr(uuu2)
    wkc = _kc(www2_k)
    rho_b = rho[:, None, :]
    mxr = rho_b * (mx - f1) / (
        _pn(ruuu2) + _pp(uuu2) + iadz * (_pn(wkc) + _pp(www2_k)) + EPS
    )
    mnr = rho_b * (f1 - mn) / (
        _pp(ruuu2) + _pn(uuu2) + iadz * (_pp(wkc) + _pn(www2_k)) + EPS
    )

    # stage 5c: limit fluxes (uuu gi in [1, nx+1], www gi in [1, nx])
    lmxr, lmnr = _xl(mxr), _xl(mnr)
    uuu3 = jnp.where(
        m(1, nx + 1),
        _pp(uuu2) * _min3(one, mxr, lmnr) - _pn(uuu2) * _min3(one, lmxr, mnr),
        uuu2,
    )
    www3_b = (_pp(www2_k) * _min3(one, mxr, _kb(mnr))
              - _pn(www2_k) * _min3(one, _kb(mxr), mnr))
    www3_k = jnp.where(m(1, nx), www3_b, www2_k)
    flux = flux + jnp.sum(jnp.where(fmask, www3_b, 0.0), axis=1)

    # stage 6: final update with positive clip (gi in [1, nx])
    www3_kp1 = jnp.concatenate(
        [www3_k[..., 1:], jnp.zeros_like(www3_k[..., :1])], axis=-1
    )
    upd6 = (_xr(uuu3) - uuu3 + (www3_kp1 - www3_k) * iadz) * irho
    f_out = jnp.where(m(1, nx), jnp.maximum(0.0, f1 - upd6), f1)
    return f_out, flux


def to_collocated(data: MpdataData):
    """-> (f, u_g, w_g) on the common x grid (S, nx+6, ·); u/w are padded
    with zeros at the collocated slots where they are undefined."""
    s, fx, nzm = data.f.shape
    nx = fx - 6
    z = jnp.zeros((s, 1, nzm), data.f.dtype)
    zw = jnp.zeros((s, 1, nzm + 1), data.f.dtype)
    u_g = jnp.concatenate([z, data.u], axis=1)                 # gi ≥ -1
    w_g = jnp.concatenate([zw, data.w, zw], axis=1)            # gi in [-1,nx+2]
    return data.f, u_g, w_g


def advect_masked_global(data: MpdataData):
    """Single-device entry: masked core on the full global grid — must match
    reference.advect_scalar2d bitwise on f (tested)."""
    f, u_g, w_g = to_collocated(data)
    nx = f.shape[1] - 6
    gi = jnp.arange(f.shape[1], dtype=jnp.int32) - 2
    owned = jnp.ones(f.shape[1], dtype=bool)
    f_out, flux = advect_scalar2d_masked(
        f, u_g, w_g, data.rho, data.rhow, data.adz, gi, owned, nx
    )
    nzm = f.shape[-1]
    flux_out = jnp.concatenate([flux, data.flux[:, nzm:]], axis=-1)
    return f_out, flux_out


def _exchange_strips(x, h, axis_name, n):
    """Halo ppermutes along x inside shard_map: -> (left, right), the h
    columns arriving from the left/right neighbor (zeros at the global
    domain ends — provably never read by owned outputs, masks cover
    gi ∈ [-2, nx+3])."""
    left = lax.ppermute(x[:, -h:], axis_name,
                        [(i, i + 1) for i in range(n - 1)])
    right = lax.ppermute(x[:, :h], axis_name,
                         [(i, i - 1) for i in range(1, n)])
    return left, right


def _exchange(x, h, axis_name, n):
    """Halo exchange along x inside shard_map: returns x extended by h
    neighbor columns on each side (see _exchange_strips)."""
    left, right = _exchange_strips(x, h, axis_name, n)
    return jnp.concatenate([left, x, right], axis=1)


def _resolve_kernel(cfg, kernel):
    """AUTO (None) -> the x-major Pallas core when the geometry allows
    (nz <= 64 — pallas_xmajor.py; slice counts pad to a multiple of 16),
    else the z-on-lanes Pallas core.  "packed" (slice-major two-per-
    register) stays reachable by name."""
    if kernel is not None:
        return kernel
    from cdk_tpu.kernels.mpdata.pallas_packed import SEG

    return "xmajor" if cfg.nz <= SEG else "pallas"


def _make_core(cfg, kernel: str, interpret: bool):
    """Masked-core dispatch shared by the dist step/overlap/loop builders.

    -> core(f_, u_, w_, rho, rhow, adz, gi0_, lo, hi): one masked MPDATA
    step on an extended column window whose owned outputs are local columns
    [lo, hi); returns (f_out_ext, flux_part (S, nzm)) with the flux partial
    already unpacked from the kernel's travel layout."""
    from cdk_tpu.kernels.mpdata.pallas_masked import (
        masked_step_pallas,
        masked_step_pallas_packed,
        masked_step_xmajor,
    )
    from cdk_tpu.kernels.mpdata import pallas_packed as pk
    from cdk_tpu.kernels.mpdata import pallas_xmajor as px

    nx = cfg.nx
    nzm = cfg.nzm
    nsl = cfg.nslices

    if kernel == "xmajor":
        def core(f_, u_, w_, rho, rhow, adz, gi0_, lo, hi):
            f_o, flux_p = masked_step_xmajor(
                f_, u_, w_, rho, rhow, adz, gi0_,
                nx=nx, nzm=nzm, owned_lo=lo, owned_hi=hi,
                interpret=interpret,
            )
            return f_o, px.unpack2x(flux_p, nsl, nzm)
    elif kernel == "packed":
        def core(f_, u_, w_, rho, rhow, adz, gi0_, lo, hi):
            f_o, flux_p = masked_step_pallas_packed(
                f_, u_, w_, rho, rhow, adz, gi0_,
                nx=nx, nzm=nzm, owned_lo=lo, owned_hi=hi,
                interpret=interpret,
            )
            return f_o, pk.unpack2(flux_p, nzm)
    elif kernel == "pallas":
        def core(f_, u_, w_, rho, rhow, adz, gi0_, lo, hi):
            return masked_step_pallas(
                f_, u_, w_, rho, rhow, adz, gi0_,
                nx=nx, owned_lo=lo, owned_hi=hi, interpret=interpret,
            )
    else:  # "jnp": the XLA-compiled masked core
        def core(f_, u_, w_, rho, rhow, adz, gi0_, lo, hi):
            lis = jnp.arange(f_.shape[1], dtype=jnp.int32)
            return advect_scalar2d_masked(
                f_, u_, w_, rho, rhow, adz, gi0_ + lis,
                (lis >= lo) & (lis < hi), nx,
            )
    return core


def make_dist_step(cfg, mesh: Mesh, halo: int = HALO,
                   kernel: str | None = None):
    """Build (shard_inputs, step, gather_f) for x-decomposed MPDATA.

    shard_inputs(data) -> (f_s, u_s, w_s, aux) sharded over the mesh axis;
    step(f_s, u_s, w_s, aux) -> (f_s_next, flux) one advection step with
    halo exchange; flux is replicated (psum over shards).

    kernel: None (AUTO) picks the fastest valid Pallas core; "packed" runs
    the two-slices-per-register masked core (f/u/w travel and exchange in
    the packed layout — pack/unpack only at the shard_inputs/gather
    boundary); "pallas" the z-on-lanes masked core; "jnp" the XLA-compiled
    masked core (the directive-analog form).  All three are the same
    per-column arithmetic (parity-tested); running tuned kernels inside
    shard_map is the VERDICT r1 #1 discipline."""
    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.mpdata import pallas_packed as pk
    from cdk_tpu.kernels.mpdata import pallas_xmajor as px

    kernel = _resolve_kernel(cfg, kernel)
    use_packed = kernel == "packed"
    use_xmajor = kernel == "xmajor"
    nzm_l = cfg.nzm
    nsl = cfg.nslices
    core = _make_core(cfg, kernel, pallas_interpret())
    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    nx = cfg.nx
    xg = nx + 6
    chunk = -(-xg // nparts)  # ceil: pad global grid to nparts*chunk
    if nparts > 1 and chunk < halo:
        # _exchange's edge slices would silently truncate (x[:, -h:] just
        # returns fewer columns) and every gi/owned index would misalign
        raise ValueError(
            f"chunk={chunk} < halo={halo}: too many devices for nx={nx}"
        )
    xp = chunk * nparts

    fspec = (P(None, axis, None, None) if use_xmajor
             else P(None, axis, None))

    def shard_inputs(data: MpdataData):
        f, u_g, w_g = to_collocated(data)
        pad = xp - xg

        def padx(a):
            return jnp.pad(a, ((0, 0), (0, pad), (0, 0)))

        dev_put = lambda a, spec: jax.device_put(
            a, jax.sharding.NamedSharding(mesh, spec)
        )
        if use_xmajor:
            f_s = dev_put(px.pack3x(padx(f)), fspec)
            u_s = dev_put(px.pack3x(padx(u_g)), fspec)
            w_s = dev_put(px.pack3x(padx(w_g)), fspec)
            aux = tuple(
                dev_put(a, P())
                for a in (px.pack2x(data.rho, pad=1.0),
                          px.pack2x(data.rhow, pad=1.0),
                          px.pack2x(data.adz, pad=1.0), data.flux)
            )
            return f_s, u_s, w_s, aux
        if use_packed:
            f_s = dev_put(pk.pack3(padx(f)), fspec)
            u_s = dev_put(pk.pack3(padx(u_g)), fspec)
            w_s = dev_put(pk.pack3(padx(w_g)), fspec)
            aux = tuple(
                dev_put(a, P())
                for a in (pk.pack2(data.rho, pad=1.0),
                          pk.pack2(data.rhow, pad=1.0),
                          pk.pack2(data.adz, pad=1.0), data.flux)
            )
            return f_s, u_s, w_s, aux
        f_s = dev_put(padx(f), fspec)
        u_s = dev_put(padx(u_g), fspec)
        w_s = dev_put(padx(w_g), fspec)
        aux = tuple(
            dev_put(a, P())
            for a in (data.rho, data.rhow, data.adz, data.flux)
        )
        return f_s, u_s, w_s, aux

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(fspec, fspec, fspec, (P(), P(), P(), P())),
        out_specs=(fspec, P()),
        check_vma=False,
    )
    def step(f_loc, u_loc, w_loc, aux):
        rho, rhow, adz, flux_in = aux
        nzm = nzm_l
        f_ext = _exchange(f_loc, halo, axis, nparts)
        u_ext = _exchange(u_loc, halo, axis, nparts)
        w_ext = _exchange(w_loc, halo, axis, nparts)
        me = lax.axis_index(axis)
        gi0 = me * chunk - 2 - halo
        f_out_ext, flux_part = core(f_ext, u_ext, w_ext, rho, rhow, adz,
                                    gi0, halo, halo + chunk)
        f_out = f_out_ext[:, halo:halo + chunk]
        flux = lax.psum(flux_part, axis)
        flux_out = jnp.concatenate([flux, flux_in[:, nzm:]], axis=-1)
        return f_out, flux_out

    def gather_f(f_s):
        """Collect the sharded f back to the reference global layout
        (multi-controller safe: see dist.mesh.to_host_global)."""
        from cdk_tpu.dist.mesh import to_host_global

        f_h = jnp.asarray(to_host_global(f_s))
        if use_xmajor:
            return np.asarray(px.unpack3x(f_h, nsl, nzm_l))[:, :xg]
        if use_packed:
            return np.asarray(pk.unpack3(f_h, nzm_l))[:, :xg]
        return np.asarray(f_h)[:, :xg]

    return shard_inputs, step, gather_f


def make_dist_step_overlap(cfg, mesh: Mesh, halo: int = HALO,
                           kernel: str | None = None):
    """x-decomposed MPDATA step with comm/compute OVERLAP.

    The plain step (make_dist_step) serializes: exchange → compute, so the
    ppermute latency sits on the critical path.  Here the graph is
    restructured so XLA's latency-hiding scheduler can run the halo
    ppermutes concurrently with the bulk of the arithmetic (the interior/
    boundary split of SURVEY §5):

      1. kick off the f/u/w halo ppermutes;
      2. INTERIOR: run the masked core on the UNEXTENDED local chunk —
         valid for every column ≥ DEPTH(=3) from the shard edges, and
         data-independent of the exchange;
      3. BOUNDARY: once halos land, run the masked core on two thin strips
         (halo + DEPTH+3 local columns) and patch their DEPTH owned edge
         columns over the interior result.

    Results are identical to the serialized step (same per-column
    arithmetic; flux partial sums are disjoint across interior/strips).

    Uses the same (shard_inputs, gather_f) as make_dist_step built with the
    SAME kernel choice.  With a Pallas kernel the interior AND strip
    computations run the fused masked core (three static column geometries
    → three compiled kernels); the halo ppermutes still overlap the
    interior call."""
    from cdk_tpu.core.platform import pallas_interpret

    kernel = _resolve_kernel(cfg, kernel)
    use_xmajor = kernel == "xmajor"
    nzm_l = cfg.nzm
    core0 = _make_core(cfg, kernel, pallas_interpret())
    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    nx = cfg.nx
    xg = nx + 6
    chunk = -(-xg // nparts)
    depth = 3            # stencil dependency depth of the masked core
    need = depth + 3     # strip columns needed beyond the patched region
    if chunk < max(halo, need):
        raise ValueError(
            f"chunk={chunk} too small for overlap (need >= {need})"
        )
    fspec = (P(None, axis, None, None) if use_xmajor
             else P(None, axis, None))

    @jax.jit
    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(fspec, fspec, fspec, (P(), P(), P(), P())),
        out_specs=(fspec, P()),
        check_vma=False,
    )
    def step(f_loc, u_loc, w_loc, aux):
        rho, rhow, adz, flux_in = aux
        nzm = nzm_l
        me = lax.axis_index(axis)
        gi0 = me * chunk - 2

        def core(f_, u_, w_, gi0_, lo, hi):
            """Masked core on one column window, owned outputs [lo, hi)."""
            return core0(f_, u_, w_, rho, rhow, adz, gi0_, lo, hi)

        # 1) halo exchange (independent of the interior compute below)
        perm_r = [(i, i + 1) for i in range(nparts - 1)]
        perm_l = [(i, i - 1) for i in range(1, nparts)]
        halos = [
            (lax.ppermute(a[:, -halo:], axis, perm_r),
             lax.ppermute(a[:, :halo], axis, perm_l))
            for a in (f_loc, u_loc, w_loc)
        ]

        # 2) interior: valid except within `depth` of the shard edges
        f_int, flux_int = core(f_loc, u_loc, w_loc, gi0, depth,
                               chunk - depth)

        # 3) boundary strips
        def strip(side):
            if side == 0:  # left edge of the chunk
                arrs = [jnp.concatenate([h[0], a[:, :need]], axis=1)
                        for h, a in zip(halos, (f_loc, u_loc, w_loc))]
                return core(*arrs, gi0 - halo, halo, halo + depth)
            # right edge
            arrs = [jnp.concatenate([a[:, -need:], h[1]], axis=1)
                    for h, a in zip(halos, (f_loc, u_loc, w_loc))]
            return core(*arrs, gi0 + chunk - need, need - depth, need)

        fl, flux_l = strip(0)
        fr, flux_r = strip(1)
        f_out = jnp.concatenate(
            [
                fl[:, halo:halo + depth],
                f_int[:, depth:chunk - depth],
                fr[:, need - depth:need],
            ],
            axis=1,
        )
        flux = lax.psum(flux_int + flux_l + flux_r, axis)
        flux_out = jnp.concatenate([flux, flux_in[:, nzm:]], axis=-1)
        return f_out, flux_out

    return step


def make_dist_loop_slices(cfg, mesh: Mesh):
    """Slice-batch (data-parallel) distributed MPDATA — the scaling axis
    the REFERENCE itself uses: its miniapp parallelizes by giving each
    node its own slice batch (advect_scalar2D is embarrassingly parallel
    over CRM columns; the per-node batch is the only scaling knob the
    Fortran exposes — mmf-mpdata-tracer/README.md, nIters/nslices), and
    the deferred MPI plan (nested_loops/README.md:27-35) never touches x.

    TPU-native form: the PACKED slice-group axis (pallas_xmajor's leading
    g axis, 16 slices per group) is sharded over the mesh; each shard
    runs the unmodified single-chip champion kernel — in-kernel n-step
    time loop, hoisted invariants, f VMEM-resident per block — on its
    own groups.  There is NO exchange and NO collective at all: f, u, w,
    rho, rhow, adz AND flux are all per-slice, so every output is
    computed where it lives.  Weak scaling is exact by construction
    (per-device work is independent of the mesh size); this is the
    production scaling answer for MPDATA, with the x-decomposed forms
    (make_dist_step / make_dist_loop) supplying the halo-exchange
    capability for domains whose x extent outgrows a chip.

    Returns (shard_inputs, loop, gather_f): loop(f_s, u_s, w_s, aux, n)
    runs n steps under one jit; outputs stay sharded."""
    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.mpdata import pallas_xmajor as px
    from cdk_tpu.kernels.mpdata.pallas_packed import _packed_kspan
    from cdk_tpu.kernels.mpdata.pallas_xmajor import (
        _run_xmajor,
        pick_block_x,
    )

    interpret = pallas_interpret()
    nzm, nz, nsl = cfg.nzm, cfg.nz, cfg.nslices
    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    g = -(-nsl // px.GRP)
    gp = -(-g // nparts) * nparts   # pad groups to the mesh size
    g_loc = gp // nparts
    spec4 = P(axis, None, None, None)
    spec3 = P(axis, None, None)

    def _padg(a, pad):
        r = gp - a.shape[0]
        if r == 0:
            return a
        return jnp.pad(a, ((0, r),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=pad)

    def shard_inputs(data: MpdataData):
        f_p, flux_p, aux = px.pack_data_x(data)
        u_p, w_p, rho_p, rhow_p, adz_p = aux
        put = lambda a, s: jax.device_put(
            a, jax.sharding.NamedSharding(mesh, s))
        f_s = put(_padg(f_p, 0.0), spec4)
        u_s = put(_padg(u_p, 0.0), spec4)
        w_s = put(_padg(w_p, 0.0), spec4)
        aux_s = (
            put(_padg(rho_p, 1.0), spec3),
            put(_padg(rhow_p, 1.0), spec3),
            put(_padg(adz_p, 1.0), spec3),
            put(_padg(flux_p, 0.0), spec3),
        )
        return f_s, u_s, w_s, aux_s

    @functools.partial(jax.jit, static_argnames="n")
    def loop(f_s, u_s, w_s, aux, n: int):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(spec4, spec4, spec4, (spec3, spec3, spec3, spec3)),
            out_specs=(spec4, spec3),
            check_vma=False,
        )
        def run(f_loc, u_loc, w_loc, aux):
            rho, rhow, adz, flux = aux
            kspan = _packed_kspan(nzm, f_loc.dtype)
            return _run_xmajor(f_loc, u_loc, w_loc, rho, rhow, adz, flux,
                               kspan, nzm, n, pick_block_x(g_loc),
                               interpret)

        return run(f_s, u_s, w_s, aux)

    def gather_f(f_s):
        from cdk_tpu.dist.mesh import to_host_global

        f_h = jnp.asarray(to_host_global(f_s))
        return np.asarray(px.unpack3x(f_h, nsl, nzm))

    def gather_flux(flux_s):
        from cdk_tpu.dist.mesh import to_host_global

        fx = jnp.asarray(to_host_global(flux_s))
        return np.asarray(px.unpack2x(fx, nsl, nz))

    return shard_inputs, loop, (gather_f, gather_flux)


def _make_dist_kloop(cfg, mesh: Mesh, kstep: int, kernel: str | None,
                     split: bool = True, unroll: int = 1):
    """Communication-avoiding dist loop (see make_dist_loop docstring).
    x-major only: the deep-halo window rides the same masked-global
    validity argument regardless of where the window is cut.

    split=True (default) assembles the deep f halo IN-KERNEL
    (masked_kloop_xmajor_split): the ppermuted strips enter the Pallas
    call as separate refs and only owned columns are written back,
    removing the per-call f_ext concat materialization and owned-slice
    copy (measured ~90 us/step at production k=4).  split=False keeps
    the concat-window form for A/B."""
    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.mpdata.pallas_masked import (
        masked_kloop_xmajor,
        masked_kloop_xmajor_split,
    )
    from cdk_tpu.kernels.mpdata import pallas_xmajor as px

    kernel = _resolve_kernel(cfg, kernel)
    if kernel != "xmajor":
        raise ValueError(f"kstep > 1 requires the x-major kernel "
                         f"(resolved {kernel!r})")
    depth = 3
    h = depth * kstep
    nzm = cfg.nzm
    nsl = cfg.nslices
    interpret = pallas_interpret()
    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    nx = cfg.nx
    xg = nx + 6
    chunk = -(-xg // nparts)
    if nparts > 1 and chunk < h:
        raise ValueError(
            f"chunk={chunk} < deep halo {h}: lower kstep (={kstep}) or "
            f"devices"
        )
    fspec = P(None, axis, None, None)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(f_s, u_s, w_s, aux, n: int):
        if n % kstep:
            raise ValueError(f"n={n} not a multiple of kstep={kstep}")

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(fspec, fspec, fspec, (P(), P(), P(), P())),
            out_specs=(fspec, P()),
            check_vma=False,
        )
        def run(f_loc, u_loc, w_loc, aux):
            rho, rhow, adz, flux_in = aux
            me = lax.axis_index(axis)
            gi0 = me * chunk - 2 - h
            # u/w are step-invariant: exchange deep halos ONCE per run
            u_ext = _exchange(u_loc, h, axis, nparts)
            w_ext = _exchange(w_loc, h, axis, nparts)

            if split:
                def body(carry, _):
                    f_l, _ = carry
                    lh, rh = _exchange_strips(f_l, h, axis, nparts)
                    f_o, flux_p = masked_kloop_xmajor_split(
                        f_l, lh, rh, u_ext, w_ext, rho, rhow, adz, gi0,
                        nx=nx, nzm=nzm, halo=h, nsteps=kstep,
                        interpret=interpret,
                    )
                    flux = lax.psum(px.unpack2x(flux_p, nsl, nzm), axis)
                    return (f_o, flux), None
            else:
                def body(carry, _):
                    f_l, _ = carry
                    f_ext = _exchange(f_l, h, axis, nparts)
                    f_o_ext, flux_p = masked_kloop_xmajor(
                        f_ext, u_ext, w_ext, rho, rhow, adz, gi0,
                        nx=nx, nzm=nzm, owned_lo=h, owned_hi=h + chunk,
                        nsteps=kstep, interpret=interpret,
                    )
                    f_o = f_o_ext[:, h:h + chunk]
                    flux = lax.psum(px.unpack2x(flux_p, nsl, nzm), axis)
                    return (f_o, flux), None

            (f_o, flux), _ = jax.lax.scan(
                body, (f_loc, flux_in[:, :nzm]), None, length=n // kstep,
                unroll=unroll,
            )
            flux_out = jnp.concatenate([flux, flux_in[:, nzm:]], axis=-1)
            return f_o, flux_out

        return run(f_s, u_s, w_s, aux)

    return loop


def make_dist_loop(cfg, mesh: Mesh, halo: int = HALO, overlap: bool = False,
                   kernel: str | None = None, kstep: int = 1,
                   unroll: int | None = None, split: bool = True):
    """n-step distributed integration under ONE jit: `lax.scan` over the
    halo-exchange step, so the whole multi-step run (exchanges included)
    compiles to a single device-side loop — the production integration
    driver shape (one dispatch per run, not per step).

    kstep > 1 (x-major kernel only) builds the COMMUNICATION-AVOIDING
    form: each scan iteration exchanges a depth*kstep halo once, then
    runs kstep masked steps INSIDE one Pallas kernel (invariants hoisted,
    f iterated in VMEM).  Exactness: each masked application shrinks the
    valid window by the stencil depth (3 columns) from the window edges,
    so after kstep applications the owned chunk is still exact — the same
    argument that fixes HALO=3 for the per-step form, applied k times.
    Exchange count drops k-fold and u/w halos are exchanged once per RUN
    (they are step-invariant); per-step DMA amortizes over the in-kernel
    loop.

    The default (kstep=1, overlap=False) form also exchanges the u/w halos
    once per RUN: u/w are constant across the reference's step loop
    (advect…F90:479-481 takes them as intent(in)), so re-running their
    ppermute+concat every step — as chaining make_dist_step does — leaves
    the invariant work inside the scan body (the hoist alone measured
    1168 → 1086 us/step at production, 1-dev; XLA's loop-invariant code
    motion already caught most of it).  With the x-major kernel the f
    halo is additionally assembled IN-KERNEL (masked_step_xmajor_split),
    removing the per-step f_ext concat materialization and owned-slice
    copy: production 1-dev 983 us/step, 1.63x the single-chip in-kernel-
    loop champion (601 us) — the residual is the mandatory per-step f HBM
    round trip (~250 us that the single-chip form amortizes by keeping f
    VMEM-resident across its time loop), ~16% halo overcompute at the
    reference's toy nx=32, and the global-index mask ops.
    Bitwise-identical to the chained step: the same masked arithmetic
    sees the same assembled window (tested at 1e-15)."""
    if kstep > 1:
        return _make_dist_kloop(cfg, mesh, kstep, kernel, split=split,
                                unroll=unroll or 1)
    if not overlap:
        # unroll=2 default: duplicating the scan body lets XLA overlap
        # one step's inter-kernel glue (strip slicing, ppermute, flux
        # unpack/psum) with the previous step's Pallas call — measured
        # 1020 -> 887 us/step at production 1-dev, reproduced across two
        # windows (round5 probe + paired A/B); unroll=4 gave it back
        # (949).  The kloop keeps unroll=1 (measured ~neutral there).
        return _make_dist_loop_hoisted(cfg, mesh, halo, kernel,
                                       unroll=unroll or 2)
    step = make_dist_step_overlap(cfg, mesh, halo, kernel=kernel)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(f_s, u_s, w_s, aux, n: int):
        def body(carry, _):
            f, flux = carry
            rho, rhow, adz, _ = aux
            f2, flux2 = step(f, u_s, w_s, (rho, rhow, adz, flux))
            return (f2, flux2), None

        (f_out, flux_out), _ = jax.lax.scan(
            body, (f_s, aux[3]), None, length=n
        )
        return f_out, flux_out

    return loop


def _make_dist_loop_hoisted(cfg, mesh: Mesh, halo: int, kernel: str | None,
                            unroll: int = 1):
    """Serialized dist loop with the step-invariant u/w halo exchange
    hoisted out of the scan (see make_dist_loop docstring).  Each scan
    iteration exchanges only f, then runs the same masked kernel as
    make_dist_step on the same extended window.

    With the x-major kernel the step additionally assembles the f halo
    IN-KERNEL (masked_step_xmajor_split): the exchanged strips enter the
    Pallas call as separate refs, concatenated in VMEM, and only the owned
    columns are written back — removing the per-step f_ext materialization
    and the owned-slice copy, the two full-array HBM round trips that
    dominated the serialized dist step's overhead over the single-chip
    kernel."""
    from cdk_tpu.core.platform import pallas_interpret
    from cdk_tpu.kernels.mpdata.pallas_masked import masked_step_xmajor_split
    from cdk_tpu.kernels.mpdata import pallas_xmajor as px

    kernel = _resolve_kernel(cfg, kernel)
    interpret = pallas_interpret()
    core = _make_core(cfg, kernel, interpret)
    nzm = cfg.nzm
    nsl = cfg.nslices
    nx = cfg.nx
    axis = mesh.axis_names[0]
    nparts = mesh.devices.size
    chunk = -(-(nx + 6) // nparts)
    if nparts > 1 and chunk < halo:
        raise ValueError(
            f"chunk={chunk} < halo={halo}: too many devices for nx={nx}"
        )
    fspec = (P(None, axis, None, None) if kernel == "xmajor"
             else P(None, axis, None))

    @functools.partial(jax.jit, static_argnames="n")
    def loop(f_s, u_s, w_s, aux, n: int):
        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(fspec, fspec, fspec, (P(), P(), P(), P())),
            out_specs=(fspec, P()),
            check_vma=False,
        )
        def run(f_loc, u_loc, w_loc, aux):
            rho, rhow, adz, flux_in = aux
            me = lax.axis_index(axis)
            gi0 = me * chunk - 2 - halo
            u_ext = _exchange(u_loc, halo, axis, nparts)
            w_ext = _exchange(w_loc, halo, axis, nparts)

            if kernel == "xmajor":
                # the flux travels PACKED through the scan and only the
                # final step's value survives, so its unpack + psum run
                # ONCE after the loop instead of per step
                def body(carry, _):
                    f_l, _flux = carry
                    lh, rh = _exchange_strips(f_l, halo, axis, nparts)
                    f_o, flux_p = masked_step_xmajor_split(
                        f_l, lh, rh, u_ext, w_ext, rho, rhow, adz, gi0,
                        nx=nx, nzm=nzm, halo=halo, interpret=interpret,
                    )
                    return (f_o, flux_p), None

                fp0 = jnp.zeros(f_loc.shape[:1] + f_loc.shape[2:],
                                f_loc.dtype)
                (f_o, flux_p), _ = lax.scan(
                    body, (f_loc, fp0), None, length=n, unroll=unroll)
                flux = lax.psum(px.unpack2x(flux_p, nsl, nzm), axis)
                flux_out = jnp.concatenate([flux, flux_in[:, nzm:]],
                                           axis=-1)
                return f_o, flux_out
            else:
                def body(carry, _):
                    f_l, _flux = carry
                    f_ext = _exchange(f_l, halo, axis, nparts)
                    f_o_ext, flux_p = core(f_ext, u_ext, w_ext, rho, rhow,
                                           adz, gi0, halo, halo + chunk)
                    f_o = f_o_ext[:, halo:halo + chunk]
                    return (f_o, lax.psum(flux_p, axis)), None

            (f_o, flux), _ = lax.scan(
                body, (f_loc, flux_in[:, :nzm]), None, length=n,
                unroll=unroll,
            )
            flux_out = jnp.concatenate([flux, flux_in[:, nzm:]], axis=-1)
            return f_o, flux_out

        return run(f_s, u_s, w_s, aux)

    return loop

"""Trusted jnp reference implementation of the biharmonic_wk weak Laplacian.

Semantics match the reference CPU kernel module `biharmonic_wk_scalar_cpu`
(atmosphere/biharmonic_wk_kernel.F90:100-202) — despite the miniapp's name,
the extracted kernel applies the tensor-HV weak Laplacian ONCE per
(element, tracer, level):

  gradient_sphere (:109-134):
      v1(l,j) = rrearth * Σ_i Dvv(i,l) s(i,j)       (x-derivative)
      v2(j,l) = rrearth * Σ_i Dvv(i,l) s(j,i)       (y-derivative)
      ds_a = Dinv(:,:,1,a) v1 + Dinv(:,:,2,a) v2    (contravariant→latlon)
  tensorVisc contraction (:173-180):
      g_a = Σ_b tensorVisc(:,:,a,b) ds_b
  divergence_sphere_wk (:138-160):
      vt_a = Σ_b Dinv(:,:,a,b) g_b
      div(m,n) = -rrearth Σ_j [ spheremp(j,n) vt1(j,n) Dvv(m,j)
                              + spheremp(m,j) vt2(m,j) Dvv(n,j) ]

Everything is expressed as einsums over the trailing (i, j) GLL axes,
batched over (nelemd, qsize, nlev) — the jnp analog of the reference's
"push-loop" restructuring (loops pushed into the operators with the
(nlev, qsize) batch fused, biharmonic_wk_kernel.F90:369-536). XLA
parallelizes these the way OpenACC directives parallelize the Fortran.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cdk_tpu.core.registry import register
from cdk_tpu.kernels.biharmonic.problem import BiharmonicData


def _bcast(elem_field: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-element (e, i, j[, ...]) field over the (q, k) batch
    axes of qtens (e, q, k, i, j)."""
    return elem_field[:, None, None]


def gradient_sphere(s, dvv, dinv, rrearth):
    """s: (..., i, j) -> ds: tuple of 2 arrays (..., i, j)."""
    # v1[l,j] = rr * Σ_i dvv[i,l] s[i,j];  v2[j,l] = rr * Σ_i dvv[i,l] s[j,i]
    # precision="highest": f32 on the MXU otherwise runs bf16 passes
    # (~1e-3 relative error at np=4 contractions)
    v1 = rrearth * jnp.einsum("il,...ij->...lj", dvv, s, precision="highest")
    v2 = rrearth * jnp.einsum("il,...ji->...jl", dvv, s, precision="highest")
    ds1 = dinv[..., 0, 0] * v1 + dinv[..., 1, 0] * v2
    ds2 = dinv[..., 0, 1] * v1 + dinv[..., 1, 1] * v2
    return ds1, ds2


def divergence_sphere_wk(v1, v2, dvv, dinv, spheremp, rrearth):
    vt1 = dinv[..., 0, 0] * v1 + dinv[..., 0, 1] * v2
    vt2 = dinv[..., 1, 0] * v1 + dinv[..., 1, 1] * v2
    t1 = jnp.einsum("mj,...jn->...mn", dvv, spheremp * vt1,
                    precision="highest")
    t2 = jnp.einsum("nj,...mj->...mn", dvv, spheremp * vt2,
                    precision="highest")
    return -rrearth * (t1 + t2)


def laplace_sphere_wk(s, dvv, dinv, spheremp, tensorvisc, rrearth):
    ds1, ds2 = gradient_sphere(s, dvv, dinv, rrearth)
    g1 = ds1 * tensorvisc[..., 0, 0] + ds2 * tensorvisc[..., 0, 1]
    g2 = ds1 * tensorvisc[..., 1, 0] + ds2 * tensorvisc[..., 1, 1]
    return divergence_sphere_wk(g1, g2, dvv, dinv, spheremp, rrearth)


def biharmonic_wk_reference(
    qtens, dvv, dinv, spheremp, tensorvisc, rrearth
) -> jnp.ndarray:
    """Apply the weak Laplacian to every (e, q, k) slab of qtens."""
    return laplace_sphere_wk(
        qtens,
        dvv,
        _bcast(dinv),
        _bcast(spheremp),
        _bcast(tensorvisc),
        rrearth,
    )


@register(
    "biharmonic",
    "reference_jnp",
    "trusted jnp/XLA einsum reference (analog of the Fortran CPU form, "
    "biharmonic_wk_kernel.F90:186-200)",
)
def make_reference(cfg):
    rr = cfg.np_dtype(cfg.rrearth)

    @jax.jit
    def step(data: BiharmonicData) -> jnp.ndarray:
        return biharmonic_wk_reference(
            data.qtens, data.dvv, data.dinv, data.spheremp, data.tensorvisc, rr
        )

    return step

"""Domain-decomposed biharmonic_wk: element decomposition over the mesh.

The extracted biharmonic kernel is ELEMENT-LOCAL (one weak Laplacian per
element; the DSS neighbor exchange of real HOMME is not part of the
extracted kernel — biharmonic_wk_kernel.F90:186-200, SURVEY §5), so the
element dimension decomposes embarrassingly: shard every per-element array
on its leading `nelemd` axis and let pjit/XLA keep all compute local with
zero communication.  This is the capability the reference's hard-coded
`nets..nete=16` single-node loop bounds (biharmonic:15-17) stand in for."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cdk_tpu.kernels.biharmonic.problem import BiharmonicData
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

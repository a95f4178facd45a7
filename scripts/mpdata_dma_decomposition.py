"""DMA-only vs full packed kernel at production: same grid/BlockSpecs,
body reduced to a copy — isolates pipeline/memory cost from VPU work."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
from cdk_tpu.core.platform import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from cdk_tpu.core.timer import fetch_sync
from cdk_tpu.core.config import production_config
from cdk_tpu.harness.specs import all_specs
from cdk_tpu.kernels.mpdata import pallas_packed as pp

cfg = production_config("mpdata")
spec = all_specs()["mpdata"]
data = spec.init(cfg)
f_p, flux_p, (u_p, w_p, rho_p, rhow_p, adz_p) = pp.pack_data(data)
kspan = pp._packed_kspan(cfg.nzm, f_p.dtype)
SEG = pp.SEG
s2 = f_p.shape[0]
b = pp.pick_block(s2)
print(f"s2={s2} block={b} f_p={f_p.shape} u={u_p.shape} w={w_p.shape}", flush=True)

def _copy_kernel(kspan_ref, f_ref, u_ref, w_ref, rho_ref, rhow_ref,
                 adz_ref, flux_ref, fout_ref, fluxout_ref):
    # touch every input so DMAs are not DCE'd; no stage math
    touch = (jnp.sum(u_ref[...]) + jnp.sum(w_ref[...])) * 0.0
    fout_ref[...] = f_ref[...] + touch
    fluxout_ref[...] = (flux_ref[...] + touch + rho_ref[...] * 0.0
                        + rhow_ref[...] * 0.0 + adz_ref[...] * 0.0)

@functools.partial(jax.jit, static_argnames=("block",))
def run_copy(f, u, w, rho, rhow, adz, flux, kspan, block):
    blk3 = lambda a: pl.BlockSpec((block, a.shape[1], 2 * SEG),
                                  lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((block, 2 * SEG), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _copy_kernel,
        out_shape=(jax.ShapeDtypeStruct(f.shape, f.dtype),
                   jax.ShapeDtypeStruct(flux.shape, flux.dtype)),
        grid=(f.shape[0] // block,),
        in_specs=[pl.BlockSpec((1, 2 * SEG), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  blk3(f), blk3(u), blk3(w), blk2, blk2, blk2, blk2],
        out_specs=(blk3(f), blk2),
    )(kspan, f, u, w, rho, rhow, adz, flux)

@functools.partial(jax.jit, static_argnames="n")
def loop_copy(f, flux, n):
    def body(c, _):
        return run_copy(c[0], u_p, w_p, rho_p, rhow_p, adz_p, c[1], kspan, b), None
    out, _ = jax.lax.scan(body, (f, flux), None, length=n)
    return out

@functools.partial(jax.jit, static_argnames="n")
def loop_full(f, flux, n):
    def body(c, _):
        return pp._run_packed(c[0], u_p, w_p, rho_p, rhow_p, adz_p, c[1],
                              kspan, cfg.nzm, b, False), None
    out, _ = jax.lax.scan(body, (f, flux), None, length=n)
    return out

for name, fn in (("dma_only", loop_copy), ("full", loop_full)):
    fetch_sync(fn(f_p, flux_p, 8)); fetch_sync(fn(f_p, flux_p, 64))
    def best(n, trials=5):
        v = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter(); fetch_sync(fn(f_p, flux_p, n))
            v = min(v, time.perf_counter() - t0)
        return v
    sl = (best(64) - best(8)) / 56
    print(f"{name}: {sl*1e6:.1f} us/step", flush=True)

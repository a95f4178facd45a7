"""Resident-loop packed MPDATA (plain + hoisted-invariant) vs per-step
packed kernel on the real chip: production + shipped sizes, block sweep.

Round-2 decomposition: per-step pipeline = 1140 us with 470 us DMA.
First resident measurement (block 8/16/32): 1018/1025/1036 us -> the
per-step kernel already overlapped most DMA; compute is ~1000 us and
op-count reduction (hoisting) is the real lever.  block=64 exceeds the
16 MB scoped-VMEM limit (28.94M) and crashes the compile helper — do not
sweep it."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
from cdk_tpu.core.platform import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from cdk_tpu.core.timer import fetch_sync
from cdk_tpu.core.config import MpdataConfig, production_config
from cdk_tpu.harness.specs import all_specs
from cdk_tpu.kernels.mpdata import pallas_packed as pp
from cdk_tpu.kernels.mpdata import pallas_resident as pr

spec = all_specs()["mpdata"]


def best(fn, data, n, trials=5):
    v = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter(); fetch_sync(fn(data, n))
        v = min(v, time.perf_counter() - t0)
    return v


def slope(fn, data, n1=8, n2=64):
    fetch_sync(fn(data, n1)); fetch_sync(fn(data, n2))  # warm compiles
    return (best(fn, data, n2) - best(fn, data, n1)) / (n2 - n1)


def resident_loop(cfg, b, hoisted):
    nzm, nz = cfg.nzm, cfg.nz

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data, n):
        kspan = pp._packed_kspan(nzm, data.f.dtype)
        f_p, flux_p, (u_p, w_p, rho_p, rhow_p, adz_p) = pp.pack_data(data)
        f_o, flux_o = pr._run_resident(
            f_p, u_p, w_p, rho_p, rhow_p, adz_p, flux_p, kspan,
            nzm, n, b, False, hoisted)
        return pp.unpack3(f_o, nzm), pp.unpack2(flux_o, nz)

    return loop


def run_case(tag, cfg, with_packed=True, hoist_opts=(False, True),
             blocks=(8, 16)):
    # block=32 hoisted exceeds the 16 MB scoped-VMEM limit (17.42M) and
    # CRASHES the compile helper — keep it out of sweeps.
    data = spec.init(cfg)
    if with_packed:
        sl = slope(pp._make_packed_forms(cfg)["loop"], data)
        print(f"{tag} packed(per-step): {sl*1e6:.2f} us/step", flush=True)
    s2 = cfg.nslices // 2
    for hoisted in hoist_opts:
        for b in blocks:
            if s2 % b:
                continue
            sl = slope(resident_loop(cfg, b, hoisted), data)
            name = "hoisted" if hoisted else "resident"
            print(f"{tag} {name} block={b}: {sl*1e6:.2f} us/step",
                  flush=True)


def xmajor_loop(cfg, b):
    from cdk_tpu.kernels.mpdata import pallas_xmajor as px
    nzm, nz, nsl = cfg.nzm, cfg.nz, cfg.nslices

    @functools.partial(jax.jit, static_argnames="n")
    def loop(data, n):
        kspan = pp._packed_kspan(nzm, data.f.dtype)
        f_p, flux_p, (u_p, w_p, rho_p, rhow_p, adz_p) = px.pack_data_x(data)
        f_o, flux_o = px._run_xmajor(
            f_p, u_p, w_p, rho_p, rhow_p, adz_p, flux_p, kspan,
            nzm, n, b, False)
        return px.unpack3x(f_o, nsl, nzm), px.unpack2x(flux_o, nsl, nz)

    return loop


def run_xmajor(tag, cfg, blocks=(1, 2)):
    data = spec.init(cfg)
    g = (cfg.nslices + 15) // 16
    for b in blocks:
        if g % b:
            continue
        sl = slope(xmajor_loop(cfg, b), data)
        print(f"{tag} xmajor block={b}: {sl*1e6:.2f} us/step", flush=True)


run_xmajor("production(8192sl)", production_config("mpdata"))
run_xmajor("shipped(48sl)", MpdataConfig(dtype="float32"), blocks=(1, 3))
print("DONE", flush=True)

"""Careful shipped-size (48 slices, reference nml geometry) mpdata
comparison: big-n two-point slopes so the ~24 ms dispatch RT and jitter
cancel cleanly at microsecond step costs."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
from cdk_tpu.core.platform import enable_compilation_cache
enable_compilation_cache()
import jax
from cdk_tpu.core.timer import fetch_sync
from cdk_tpu.core.config import MpdataConfig
from cdk_tpu.harness.specs import all_specs
from cdk_tpu.core.registry import _materialize, get

cfg = MpdataConfig(dtype="float32")
spec = all_specs()["mpdata"]
data = spec.init(cfg)


def best(fn, n, trials=7):
    v = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter(); fetch_sync(fn(data, n))
        v = min(v, time.perf_counter() - t0)
    return v


for name in ("pallas_packed", "pallas_resident", "pallas_hoisted",
             "pallas_xmajor"):
    _, _, loop = _materialize(get("mpdata", name), cfg, data)
    fetch_sync(loop(data, 200)); fetch_sync(loop(data, 1600))
    sl = (best(loop, 1600) - best(loop, 200)) / 1400
    print(f"shipped {name}: {sl*1e6:.3f} us/step", flush=True)
print("DONE", flush=True)

"""On-chip microbenchmark: int8 vs bf16 fused field kernel throughput.

Times fused_full_t / fused_full_t_int8 on identical (8, N) inputs with
random weights — pure kernel throughput (Mpts/s), no render pipeline.
This isolates the kernel speedup from the fast path's march/selection
overhead and flags Mosaic int8 lowering problems (e.g. the K=8 x-column
matmuls) before burning a frontier run.

Run: python tools/int8_kernel_bench.py [N_POINTS=2097152]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa
import jax.numpy as jnp  # noqa

from nerf_siren_tpu.config import NeRFConfig  # noqa
from nerf_siren_tpu.models.nerf import init_nerf  # noqa
from nerf_siren_tpu.ops.pallas import fused_mlp, fused_mlp_int8  # noqa

N = int(os.environ.get("N_POINTS", str(2 * 1024 * 1024)))
REPS = int(os.environ.get("REPS", "30"))


def main():
    cfg = NeRFConfig()
    params = {"fine": init_nerf(jax.random.PRNGKey(0), cfg)}
    packed = fused_mlp.pack_model_params(params, cfg)["fine"]
    packed8 = fused_mlp_int8.pack_model_params_int8(params, cfg)["fine"]

    key = jax.random.PRNGKey(1)
    xyz = jax.random.uniform(key, (fused_mlp.IN_ROWS, N), jnp.float32,
                             minval=-2.0, maxval=2.0)
    xyz = xyz.at[3:].set(0.0)
    d = jax.random.normal(jax.random.fold_in(key, 1), (fused_mlp.IN_ROWS, N))
    d = (d / jnp.linalg.norm(d[:3], axis=0, keepdims=True)).at[3:].set(0.0)

    def bench(name, fn, pk):
        f = jax.jit(lambda x, dd: jnp.sum(fn(pk, x, dd)))
        for _ in range(25):   # tunneled runtime re-optimizes early runs
            chk = f(xyz, d)
        float(chk)
        t0 = time.perf_counter()
        for _ in range(REPS):
            chk = f(xyz, d)
        float(chk)
        dt = (time.perf_counter() - t0) / REPS
        print(f"{name:6s}: {dt*1e3:7.2f} ms/call  {N/dt/1e6:7.1f} Mpts/s",
              flush=True)
        return dt

    print(f"devices: {jax.devices()}  N={N}", flush=True)
    t_bf = bench("bf16", fused_mlp.fused_full_t, packed)
    t_i8 = bench("int8", fused_mlp_int8.fused_full_t_int8, packed8)
    print(f"speedup int8 vs bf16: {t_bf / t_i8:.2f}x")


if __name__ == "__main__":
    main()

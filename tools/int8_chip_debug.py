"""Localize the on-chip int8 kernel divergence (round 4).

On-chip measurement (tools/fast_frontier.py --int8_only) returned ~10 dB
agreement while the interpret-mode tests pass — the Mosaic-vs-interpret
hazard docs/status.md warns about. This probe isolates it:

1. jnp SIMULATION of the exact kernel math (same pack, same quantization,
   integer matmuls evaluated in f32 — exact for int8 ranges): the ground
   truth for what the kernel SHOULD compute on any backend.
2. chip kernel vs simulation on the same inputs -> max|Δ| per output.
3. binary zero-probes: zero one operand family (x-passthrough / embedding
   / hidden) in BOTH pack and simulation; the probe whose zeroing makes
   chip==sim names the matmul whose Mosaic lowering is broken.

Run (needs the cached frontier scene): python tools/int8_chip_debug.py
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("DEBUG_CPU"):  # validate sim==interpret-kernel off-chip
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from nerf_siren_tpu.config import NeRFConfig  # noqa: E402
from nerf_siren_tpu.ops.pallas import fused_mlp  # noqa: E402
from nerf_siren_tpu.ops.pallas.fused_mlp_int8 import (  # noqa: E402
    fused_sigma_t_int8,
    pack_nerf_params_int8,
)
from nerf_siren_tpu.training.checkpoints import load_checkpoint  # noqa: E402

CKPT = os.environ.get("CKPT", "/tmp/frontier_scene_spheres.msgpack")


def sim_sigma(packed, X, depth=8, skips=(4,)):
    """f32 jnp re-derivation of _sigma_kernel_int8's math (exact),
    dynamic per-point activation scales (round-4 recipe)."""
    f32 = lambda k: jnp.asarray(packed[k], jnp.float32)  # noqa: E731

    def qdyn(v):
        s = jnp.maximum(jnp.max(jnp.abs(v), axis=0, keepdims=True),
                        1e-9) / 127.0
        return jnp.clip(jnp.round(v / s), -127., 127.), s

    xq, sx = qdyn(X)
    e = jnp.sin(f32("sx") @ X + f32("px"))
    eq = jnp.clip(jnp.round(e * 127.0), -127., 127.)
    y = ((f32("q0x") @ xq) * f32("f0x") * sx
         + (f32("q0s") @ eq) * f32("f0s"))
    for i in range(1, depth):
        h = jax.nn.relu(y + f32(f"b{i-1}"))
        hq, sh = qdyn(h)
        if i in skips:
            y = ((f32(f"q{i}h") @ hq) * f32(f"f{i}h") * sh
                 + (f32(f"q{i}x") @ xq) * f32(f"f{i}x") * sx
                 + (f32(f"q{i}s") @ eq) * f32(f"f{i}s"))
        else:
            y = (f32(f"q{i}") @ hq) * f32(f"f{i}") * sh
    h8 = jax.nn.relu(y + f32(f"b{depth-1}")).astype(jnp.bfloat16)
    sig = jax.lax.dot_general(
        packed["w_sigma"], h8, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + packed["b_sigma"]
    return sig[:fused_mlp.OUT_ROWS]


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    blob = load_checkpoint(CKPT)
    params = blob["params"]["fine"] if "fine" in blob.get("params", {}) else \
        next(v for v in blob["params"].values() if "xyz_layers" in v)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = NeRFConfig()

    rng = np.random.default_rng(0)
    n = 4096
    xyz = rng.uniform(-1.2, 1.2, (n, 3)).astype(np.float32)
    X = jnp.asarray(
        np.concatenate([xyz.T, np.zeros((5, n), np.float32)], 0))

    packed = pack_nerf_params_int8(params, cfg)

    def compare(tag, pk):
        chip = np.asarray(fused_sigma_t_int8(pk, X))[3]
        sim = np.asarray(sim_sigma(pk, X))[3]
        d = np.abs(chip - sim)
        ref = np.std(sim) + 1e-6
        print(f"{tag:28s} max|Δσ|={d.max():10.4f}  rel={d.max()/ref:8.3f}  "
              f"sim σ range [{sim.min():.2f}, {sim.max():.2f}]", flush=True)
        return d.max() / ref

    compare("full int8 pack", packed)

    def zeroed(keys):
        pk = dict(packed)
        for k in keys:
            pk[k] = jnp.zeros_like(packed[k])
        return pk

    # which operand family breaks the chip matmul?
    compare("zero x-passthrough (q*x)", zeroed(["q0x", "q4x"]))
    compare("zero embedding (q*s)", zeroed(["q0s", "q4s"]))
    compare("zero skip-hidden (q4h)", zeroed(["q4h"]))
    compare("zero hidden (q1..q7)",
            zeroed([f"q{i}" for i in (1, 2, 3, 5, 6, 7)]))
    # everything zero except layer-0: isolates stage0
    compare("only stage0 (zero 1..7)",
            zeroed([f"q{i}" for i in (1, 2, 3, 5, 6, 7)]
                   + ["q4h", "q4x", "q4s"]))


if __name__ == "__main__":
    main()

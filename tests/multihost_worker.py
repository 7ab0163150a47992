"""Worker process for the 2-process multi-host integration test.

Run as: python multihost_worker.py <process_id> <port> [mode]

Each process owns 4 virtual CPU devices; together they form one 8-device
global mesh. Both processes train the same tiny model (mode: nerf | eg3d)
on disjoint per-host data shards (epoch_iterator shard args) and print a
parameter fingerprint — the parent test asserts the fingerprints are
identical across processes (reference check_ddp_consistency,
torch_utils/misc.py:182-196) and that the loss decreased.
"""
import os
import sys

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

process_id = int(sys.argv[1])
port = int(sys.argv[2])
mode = sys.argv[3] if len(sys.argv) > 3 else "nerf"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nerf_siren_tpu.parallel.multihost import initialize_distributed, is_primary

initialize_distributed(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=process_id)
assert jax.process_count() == 2
assert len(jax.devices()) == 8, jax.devices()

import numpy as np

from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
from nerf_siren_tpu.parallel.mesh import make_mesh
from nerf_siren_tpu.training.system import NeRFSystem, epoch_iterator
from nerf_siren_tpu.utils.debug import check_replica_consistency

mesh = make_mesh()  # all 8 global devices on the data axis
if mode == "eg3d":
    from nerf_siren_tpu.render.triplane import RenderingOptions, TriPlaneConfig
    from nerf_siren_tpu.training.eg3d_system import EG3DSystem

    tiny = TriPlaneConfig(
        z_dim=32, w_dim=32, plane_resolution=16, plane_channels=8,
        mapping_layers=2, channel_base=512, channel_max=32,
        rendering=RenderingOptions(depth_resolution=8,
                                   depth_resolution_importance=8,
                                   ray_start=0.5, ray_end=4.0, box_warp=4.0))
    system = EG3DSystem(
        RenderConfig(), TrainConfig(lr=5e-3, batch_size=64, decay_step=(100,)),
        steps_per_epoch=4, mesh=mesh, triplane_cfg=tiny)
else:
    system = NeRFSystem(
        RenderConfig(n_samples=8, n_importance=8, perturb=1.0, noise_std=0.0),
        TrainConfig(lr=5e-3, batch_size=64, decay_step=(100,)),
        NeRFConfig(depth=2, width=32),
        steps_per_epoch=4,
        mesh=mesh,
    )
state = system.init_state(jax.random.PRNGKey(0))

# identical full dataset on both hosts; each host draws its own shard
rng = np.random.default_rng(0)
n = 512
d = rng.normal(size=(n, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=-1, keepdims=True)
if mode == "eg3d":  # rays that enter the triplane box from z=-2
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -2.0
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
else:
    o = np.zeros((n, 3), np.float32)
rays = np.concatenate(
    [o, d,
     np.full((n, 1), 2.0, np.float32), np.full((n, 1), 6.0, np.float32)], -1)
rgbs = rng.uniform(0, 1, (n, 3)).astype(np.float32)

loss_key = "train/loss"
losses = []
for epoch in range(2):
    for batch in epoch_iterator(rays, rgbs, batch_size=64, seed=0, epoch=epoch,
                                shard_index=jax.process_index(),
                                num_shards=jax.process_count()):
        assert batch["rays"].shape[0] == 32  # local half of the global batch
        state, metrics = system.train_step(state, batch, jax.random.PRNGKey(1))
        losses.append(float(metrics[loss_key]))

fingerprint = check_replica_consistency(state.params)
# the parent greps these
print(f"RESULT process={jax.process_index()} primary={is_primary()} "
      f"hash={fingerprint:.10e} loss0={losses[0]:.8f} lossN={losses[-1]:.8f}",
      flush=True)

"""Device mesh and sharding helpers — the distributed layer.

The reference's distributed story is Lightning DDP over NCCL (reference:
train.py:47-63): data parallelism with replicated params and gradient
allreduce. The TPU-native equivalent is a 1-D `jax.sharding.Mesh` over all
chips with the ray batch sharded on the `data` axis and params replicated;
jit's partitioner inserts the psum over ICI automatically when grads of
replicated params are formed from sharded data.

Multi-host: call `jax.distributed.initialize()` before building the mesh and
feed per-host shards (each host loads its slice of the ray buffer); the mesh
spans all processes' devices.

No TP/PP/EP axes are needed for parity (SURVEY §2.5) — the NeRF MLP is tiny
and rays are embarrassingly parallel — but `make_mesh` accepts arbitrary axis
shapes so model-sharded configs (e.g. sharding the StyleGAN2 synthesis) can
reuse it.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_shapes: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; default is all devices on one 'data' axis."""
    if devices is None:
        devices = jax.devices()
    if axis_shapes is None:
        axis_shapes = (len(devices),)
    dev_array = np.asarray(devices).reshape(axis_shapes)
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (ray/batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_rays(batch, mesh: Mesh, axis: str = "data"):
    """Place a host array (or pytree of arrays sharing a leading ray dim) so
    rows are split across devices. Leading dim must divide by mesh size.

    Multi-process: each host passes its LOCAL rows; they become that host's
    addressable shards of the global batch (parallel.multihost.global_batch).
    """
    if jax.process_count() > 1:
        from nerf_siren_tpu.parallel.multihost import global_batch

        return global_batch(batch, mesh, axis)
    sharding = data_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate params/optimizer state on every device."""
    sharding = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def sharded_tile_render(tile_fn, mesh: Mesh, chunk: int, axis: str = "data"):
    """Mesh-shard any per-tile full-frame renderer (VERDICT r4 item 2).

    tile_fn: (chunk, 8) rays -> dict of per-ray arrays. Returns
    render(rays) for an (N, 8) frame: rays are split across the mesh's
    data axis (contiguous slabs — scanline bands for eval frames), each
    device lax.maps tile_fn over its slab's tiles, outputs concatenate
    back on the ray axis. Params/proxy packs live in tile_fn's closure and
    are replicated by jit as broadcast constants; there are ZERO
    collectives — eval rays are embarrassingly parallel, the same
    distribution contract as the reference's per-GPU rendering
    (reference train.py:47-63, every device renders its slice).

    Works for the exact, fused, and proxy-culled fast renderers alike:
    the Pallas march/field kernels compile per shard with the per-device
    tile shapes (asserted shard-count-invariant in
    tests/test_fast_render.py and exercised by dryrun_multichip).
    """
    from jax.sharding import PartitionSpec as P

    from nerf_siren_tpu.parallel.shard_train import shard_map_compat

    n_dev = mesh.shape[axis]

    @jax.jit
    def render_padded(rays_p):
        per = rays_p.shape[0] // n_dev

        def per_shard(r):
            tiles = r.reshape(-1, chunk, 8)
            out = jax.lax.map(tile_fn, tiles)
            return {k: v.reshape(per, *v.shape[2:]) for k, v in out.items()}

        return shard_map_compat(per_shard, mesh=mesh, in_specs=(P(axis),),
                                out_specs=P(axis))(rays_p)

    def render(rays):
        import jax.numpy as jnp

        n = rays.shape[0]
        per = -(-n // (n_dev * chunk)) * chunk
        rays_p = jnp.pad(jnp.asarray(rays, jnp.float32),
                         ((0, per * n_dev - n), (0, 0)))
        rays_p = shard_rays(rays_p, mesh, axis)
        return {k: v[:n] for k, v in render_padded(rays_p).items()}

    return render


def cross_replica_param_hash(params) -> jax.Array:
    """Debug check analogous to DDP consistency verification (reference:
    torch_utils/misc.py:182-196): a scalar fingerprint of the params; compare
    across hosts/restarts to detect divergence."""
    leaves = jax.tree_util.tree_leaves(params)
    acc = jax.numpy.zeros((), jax.numpy.float64 if jax.config.jax_enable_x64 else jax.numpy.float32)
    for leaf in leaves:
        acc = acc + jax.numpy.sum(leaf.astype(acc.dtype) * 1e-3) + jax.numpy.sum(jax.numpy.abs(leaf).astype(acc.dtype)) * 1e-6
    return acc

"""nerf_siren_tpu — a TPU-native (JAX/XLA/Pallas/pjit) neural rendering framework.

Re-designed from scratch with the capability surface of the Freedomcls/neref-siren
reference (a nerf_pl fork with semantic NeRF, SIREN/FiLM NeRF, PointNet semantics,
and an EG3D triplane renderer), but built TPU-first:

- functional core: models are param pytrees + pure apply fns; `render_rays` is a
  pure jittable function with static shapes (no Python chunk loops inside jit).
- explicit `jax.random` keys for all stochasticity.
- data parallelism via `jax.sharding.Mesh` + NamedSharding (rays sharded over a
  `data` axis, params replicated, grads psum'd by the partitioner).
- hot ops (fused ray-march MLP, searchsorted/sample_pdf, triplane grid_sample)
  get Pallas TPU kernels with jnp reference implementations that the kernels
  must match bit-for-bit in tests.
"""

__version__ = "0.1.0"

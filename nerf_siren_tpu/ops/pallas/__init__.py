from nerf_siren_tpu.ops.pallas.fused_mlp import (
    pack_nerf_params,
    pack_model_params,
    fused_nerf_sigma,
    fused_nerf_full,
    fused_sigma_t,
    fused_full_t,
    make_fused_field_fn,
)

__all__ = [
    "pack_nerf_params",
    "pack_model_params",
    "fused_nerf_sigma",
    "fused_nerf_full",
    "fused_sigma_t",
    "fused_full_t",
    "make_fused_field_fn",
]

from nerf_siren_tpu.models.embedding import positional_encoding, embedding_out_channels
from nerf_siren_tpu.models.nerf import init_nerf, apply_nerf

__all__ = [
    "positional_encoding",
    "embedding_out_channels",
    "init_nerf",
    "apply_nerf",
]

from nerf_siren_tpu.training.losses import loss_dict
from nerf_siren_tpu.training.metrics import mse, psnr

__all__ = ["loss_dict", "mse", "psnr"]

from nerf_siren_tpu.utils.visualization import visualize_depth
from nerf_siren_tpu.utils.color import color_cls

__all__ = ["visualize_depth", "color_cls"]

"""Static configuration dataclasses.

The reference drives everything through a single argparse namespace
(reference: opt.py:3-87). Here config is split into small frozen dataclasses so
they can be passed as static args to jit'd functions (hashable) and composed.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Volume rendering configuration.

    Mirrors the knobs of the reference renderer (reference:
    models/rendering.py:70-103) — sample counts, disparity sampling, stratified
    perturbation, sigma noise, white background, and the test-time sigma-only
    coarse pass.
    """

    n_samples: int = 64          # coarse samples per ray
    n_importance: int = 0        # fine (importance) samples per ray
    use_disp: bool = False       # sample linearly in disparity instead of depth
    perturb: float = 0.0         # stratified-perturbation factor (train only)
    noise_std: float = 1.0       # stddev of noise added to raw sigma
    white_back: bool = False     # composite onto white background
    test_time: bool = False      # skip coarse rgb (sigma-only coarse pass)
    chunk: int = 32 * 1024       # rays per tile when rendering full images

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Architecture of the vanilla NeRF MLP (reference: models/nerf.py:41-82)."""

    depth: int = 8               # number of xyz-encoding layers
    width: int = 256             # hidden units
    in_channels_xyz: int = 63    # 3 + 3*10*2
    in_channels_dir: int = 27    # 3 + 3*4*2
    skips: Tuple[int, ...] = (4,)
    n_classes: int = 0           # >0 adds the semantic head (models/nerf_cls.py)


@dataclasses.dataclass(frozen=True)
class EmbeddingConfig:
    """NeRF positional encoding (reference: models/nerf.py:4-38)."""

    in_channels: int = 3
    n_freqs: int = 10
    logscale: bool = True

    @property
    def out_channels(self) -> int:
        return self.in_channels * (2 * self.n_freqs + 1)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization configuration (reference: opt.py:53-80, utils/__init__.py)."""

    optimizer: str = "adam"      # sgd | adam | radam | ranger
    lr: float = 5e-4
    momentum: float = 0.9
    weight_decay: float = 0.0
    lr_scheduler: str = "steplr"  # steplr | cosine | poly
    decay_step: Tuple[int, ...] = (2, 4, 8)   # epochs, steplr
    decay_gamma: float = 0.5
    warmup_epochs: int = 0
    warmup_multiplier: float = 1.0
    poly_exp: float = 0.9
    num_epochs: int = 16
    batch_size: int = 1024       # rays per global step
    loss_type: str = "mse"       # mse | msece | msenll
    seed: int = 42

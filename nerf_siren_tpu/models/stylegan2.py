"""StyleGAN2 generator stack in functional JAX (reference:
eg3d_training/networks_stylegan2.py).

Parity with the reference modules:
- FullyConnectedLayer: weight ~ N(0,1)/lr_mult with runtime weight_gain =
  lr_mult/sqrt(fan_in), bias_gain = lr_mult (reference :97-133),
- modulated_conv2d with demodulation; executed in the UNFUSED formulation
  (scale activations by styles before the conv, by dcoefs after,
  reference :71-79) — mathematically identical to the grouped-conv fused path
  and the better mapping onto XLA (no per-sample grouped convolutions),
- MappingNetwork: 2nd-moment normalization, lr_mult 0.01, w_avg truncation
  (reference :193-271; the w_avg EMA buffer is carried but only updated by
  the training system, keeping apply pure),
- SynthesisLayer (modconv + noise + lrelu bias_act with sqrt(2) gain,
  up=2 via the [1,3,3,1] resample filter), ToRGBLayer (demodulate=False,
  weight_gain normalization), skip-architecture SynthesisBlock with
  upsampled RGB accumulation, SynthesisNetwork 4→img_resolution
  (channels = min(channel_base/res, channel_max)), Generator.

TPU notes: everything is f32 (the EG3D config uses num_fp16_res=0,
reference eg3d_renderer.py:36); bf16 can be enabled per-call via
compute_dtype on the conv inputs if profiling warrants.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nerf_siren_tpu.ops.bias_act import bias_act
from nerf_siren_tpu.ops.conv2d_resample import conv2d_resample
from nerf_siren_tpu.ops.upfirdn2d import setup_filter, upsample2d

RESAMPLE_FILTER = [1, 3, 3, 1]


def normalize_2nd_moment(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=axis, keepdims=True) + eps)


# -- FullyConnectedLayer -------------------------------------------------------

def init_fc(key, in_features: int, out_features: int, bias: bool = True,
            lr_multiplier: float = 1.0, bias_init: float = 0.0) -> Dict[str, Any]:
    p = {"weight": jax.random.normal(key, (out_features, in_features)) / lr_multiplier}
    if bias:
        p["bias"] = jnp.full((out_features,), float(bias_init))
    return p


def apply_fc(params, x, activation: str = "linear", lr_multiplier: float = 1.0):
    in_features = params["weight"].shape[1]
    w = params["weight"] * (lr_multiplier / math.sqrt(in_features))
    x = x @ w.T
    b = params.get("bias")
    if b is not None:
        b = b * lr_multiplier
    if activation == "linear":
        return x + b if b is not None else x
    return bias_act(x, b, dim=x.ndim - 1, act=activation)


# -- modulated conv ------------------------------------------------------------

def modulated_conv2d(x, weight, styles, noise=None, up=1, down=1, padding=0,
                     resample_filter=None, demodulate=True, flip_weight=True):
    """x (N,I,H,W), weight (O,I,kh,kw), styles (N,I). Unfused execution
    (reference networks_stylegan2.py:71-79)."""
    batch = x.shape[0]
    dcoefs = None
    if demodulate:
        w = weight[None] * styles[:, None, :, None, None]         # (N,O,I,kh,kw)
        dcoefs = jax.lax.rsqrt(jnp.sum(w ** 2, axis=(2, 3, 4)) + 1e-8)  # (N,O)

    x = x * styles[:, :, None, None].astype(x.dtype)
    x = conv2d_resample(x, weight.astype(x.dtype), resample_filter,
                        up=up, down=down, padding=padding, flip_weight=flip_weight)
    if demodulate:
        x = x * dcoefs[:, :, None, None].astype(x.dtype)
    if noise is not None:
        x = x + noise.astype(x.dtype)
    return x


# -- Conv2dLayer (plain, used by Discriminator / resnet skips) -----------------

def init_conv2d_layer(key, in_channels, out_channels, kernel_size=3, bias=True):
    p = {"weight": jax.random.normal(key, (out_channels, in_channels,
                                           kernel_size, kernel_size))}
    if bias:
        p["bias"] = jnp.zeros((out_channels,))
    return p


def apply_conv2d_layer(params, x, f=None, up=1, down=1, activation="linear",
                       gain=1.0, conv_clamp=None):
    w = params["weight"]
    kernel_size = w.shape[-1]
    weight_gain = 1.0 / math.sqrt(w.shape[1] * kernel_size ** 2)
    x = conv2d_resample(x, w * weight_gain, f, up=up, down=down,
                        padding=kernel_size // 2, flip_weight=(up == 1))
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    return bias_act(x, params.get("bias"), act=activation,
                    gain=_act_gain(activation) * gain, clamp=act_clamp)


def _act_gain(activation):
    from nerf_siren_tpu.ops.bias_act import activation_funcs
    return activation_funcs[activation].def_gain


# -- MappingNetwork ------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MappingConfig:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    num_ws: int = 14
    num_layers: int = 8
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998


def init_mapping(key, cfg: MappingConfig) -> Dict[str, Any]:
    embed_features = cfg.w_dim if cfg.c_dim > 0 else 0
    features = [cfg.z_dim + embed_features] + [cfg.w_dim] * (cfg.num_layers - 1) + [cfg.w_dim]
    keys = jax.random.split(key, cfg.num_layers + 1)
    p = {"fcs": [init_fc(keys[i], features[i], features[i + 1],
                         lr_multiplier=cfg.lr_multiplier)
                 for i in range(cfg.num_layers)],
         "w_avg": jnp.zeros((cfg.w_dim,))}
    if cfg.c_dim > 0:
        p["embed"] = init_fc(keys[-1], cfg.c_dim, embed_features)
    return p


def mapping_pre_broadcast(params, cfg: MappingConfig, z, c=None) -> jax.Array:
    """The mapping network output BEFORE ws broadcast/truncation: (N, w_dim).

    Split out so training can compute the w_avg EMA update from the same
    value the reference uses (networks_stylegan2.py:251-254 updates w_avg
    from x right after the FC stack, before broadcasting to num_ws)."""
    x = None
    if cfg.z_dim > 0:
        x = normalize_2nd_moment(z.astype(jnp.float32))
    if cfg.c_dim > 0:
        y = normalize_2nd_moment(apply_fc(params["embed"], c.astype(jnp.float32)))
        x = jnp.concatenate([x, y], axis=1) if x is not None else y
    for fc in params["fcs"]:
        x = apply_fc(fc, x, activation="lrelu", lr_multiplier=cfg.lr_multiplier)
    return x


def w_avg_ema(params, cfg: MappingConfig, w_pre_broadcast: jax.Array) -> jax.Array:
    """New w_avg buffer after one training step.

    Reference networks_stylegan2.py:251-254:
    w_avg <- mean(x, 0).lerp(w_avg, beta) = mean + beta * (w_avg - mean)."""
    mean = jax.lax.stop_gradient(jnp.mean(w_pre_broadcast, axis=0))
    return mean + cfg.w_avg_beta * (params["w_avg"] - mean)


def apply_mapping(params, cfg: MappingConfig, z, c=None,
                  truncation_psi: float = 1.0,
                  truncation_cutoff: Optional[int] = None) -> jax.Array:
    x = mapping_pre_broadcast(params, cfg, z, c)
    x = jnp.broadcast_to(x[:, None, :], (x.shape[0], cfg.num_ws, cfg.w_dim))
    if truncation_psi != 1:
        w_avg = params["w_avg"]
        if truncation_cutoff is None:
            x = w_avg + truncation_psi * (x - w_avg)
        else:
            head = w_avg + truncation_psi * (x[:, :truncation_cutoff] - w_avg)
            x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
    return x


# -- SynthesisLayer / ToRGB ----------------------------------------------------

def init_synthesis_layer(key, in_channels, out_channels, w_dim, resolution,
                         kernel_size=3, use_noise=True) -> Dict[str, Any]:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "affine": init_fc(k1, w_dim, in_channels, bias_init=1.0),
        "weight": jax.random.normal(k2, (out_channels, in_channels,
                                         kernel_size, kernel_size)),
        "bias": jnp.zeros((out_channels,)),
    }
    if use_noise:
        p["noise_const"] = jax.random.normal(k3, (resolution, resolution))
        p["noise_strength"] = jnp.zeros(())
    return p


def apply_synthesis_layer(params, x, w, f, up=1, activation="lrelu",
                          conv_clamp=None, gain=1.0,
                          noise_mode="const", rng=None):
    styles = apply_fc(params["affine"], w)
    noise = None
    if "noise_const" in params and noise_mode != "none":
        res = params["noise_const"].shape[0]
        if noise_mode == "random":
            assert rng is not None, "noise_mode='random' needs an rng"
            noise = jax.random.normal(rng, (x.shape[0], 1, res, res)) * params["noise_strength"]
        else:
            noise = params["noise_const"] * params["noise_strength"]
    kernel_size = params["weight"].shape[-1]
    x = modulated_conv2d(x, params["weight"], styles, noise=noise, up=up,
                         padding=kernel_size // 2, resample_filter=f,
                         flip_weight=(up == 1))
    act_gain = _act_gain(activation) * gain
    act_clamp = conv_clamp * gain if conv_clamp is not None else None
    return bias_act(x, params["bias"], act=activation, gain=act_gain, clamp=act_clamp)


def init_torgb_layer(key, in_channels, out_channels, w_dim, kernel_size=1):
    k1, k2 = jax.random.split(key)
    return {
        "affine": init_fc(k1, w_dim, in_channels, bias_init=1.0),
        "weight": jax.random.normal(k2, (out_channels, in_channels,
                                         kernel_size, kernel_size)),
        "bias": jnp.zeros((out_channels,)),
    }


def apply_torgb_layer(params, x, w, conv_clamp=None):
    in_channels = params["weight"].shape[1]
    kernel_size = params["weight"].shape[-1]
    weight_gain = 1.0 / math.sqrt(in_channels * kernel_size ** 2)
    styles = apply_fc(params["affine"], w) * weight_gain
    x = modulated_conv2d(x, params["weight"], styles, demodulate=False)
    return bias_act(x, params["bias"], clamp=conv_clamp)


# -- SynthesisBlock / Network --------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SynthesisConfig:
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 96
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None
    architecture: str = "skip"

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        log2 = int(math.log2(self.img_resolution))
        return tuple(2 ** i for i in range(2, log2 + 1))

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2          # num_conv
        return n + 1                            # + last block's torgb


def init_synthesis_block(key, cfg: SynthesisConfig, res: int) -> Dict[str, Any]:
    in_ch = cfg.channels(res // 2) if res > 4 else 0
    out_ch = cfg.channels(res)
    keys = jax.random.split(key, 4)
    p: Dict[str, Any] = {}
    if in_ch == 0:
        p["const"] = jax.random.normal(keys[0], (out_ch, res, res))
    else:
        p["conv0"] = init_synthesis_layer(keys[1], in_ch, out_ch, cfg.w_dim, res)
    p["conv1"] = init_synthesis_layer(keys[2], out_ch, out_ch, cfg.w_dim, res)
    if cfg.architecture == "skip" or res == cfg.img_resolution:
        p["torgb"] = init_torgb_layer(keys[3], out_ch, cfg.img_channels, cfg.w_dim)
    return p


def apply_synthesis_block(params, cfg: SynthesisConfig, res: int, x, img,
                          ws_block, f, noise_mode="const", rng=None):
    """ws_block: (B, num_conv + num_torgb, w_dim)."""
    w_iter = iter(jnp.moveaxis(ws_block, 1, 0))
    rngs = iter(jax.random.split(rng, 2)) if rng is not None else iter([None, None])

    if "const" in params:
        batch = ws_block.shape[0]
        x = jnp.broadcast_to(params["const"][None], (batch, *params["const"].shape))
        x = apply_synthesis_layer(params["conv1"], x, next(w_iter), f,
                                  conv_clamp=cfg.conv_clamp,
                                  noise_mode=noise_mode, rng=next(rngs))
    else:
        x = apply_synthesis_layer(params["conv0"], x, next(w_iter), f, up=2,
                                  conv_clamp=cfg.conv_clamp,
                                  noise_mode=noise_mode, rng=next(rngs))
        x = apply_synthesis_layer(params["conv1"], x, next(w_iter), f,
                                  conv_clamp=cfg.conv_clamp,
                                  noise_mode=noise_mode, rng=next(rngs))

    if img is not None:
        img = upsample2d(img, f)
    if "torgb" in params:
        y = apply_torgb_layer(params["torgb"], x, next(w_iter),
                              conv_clamp=cfg.conv_clamp)
        img = img + y if img is not None else y
    return x, img


def init_synthesis_network(key, cfg: SynthesisConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, len(cfg.block_resolutions))
    return {f"b{res}": init_synthesis_block(k, cfg, res)
            for res, k in zip(cfg.block_resolutions, keys)}


def apply_synthesis_network(params, cfg: SynthesisConfig, ws,
                            noise_mode="const", rng=None) -> jax.Array:
    """ws: (B, num_ws, w_dim) → (B, img_channels, R, R)."""
    f = setup_filter(RESAMPLE_FILTER)
    x = img = None
    w_idx = 0
    rngs = (jax.random.split(rng, len(cfg.block_resolutions))
            if rng is not None else [None] * len(cfg.block_resolutions))
    for res, block_rng in zip(cfg.block_resolutions, rngs):
        num_conv = 1 if res == 4 else 2
        num_torgb = 1 if ("torgb" in params[f"b{res}"]) else 0
        ws_block = ws[:, w_idx: w_idx + num_conv + num_torgb]
        x, img = apply_synthesis_block(params[f"b{res}"], cfg, res, x, img,
                                       ws_block, f, noise_mode, block_rng)
        w_idx += num_conv
    return img


# -- Generator -----------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    img_resolution: int = 256
    img_channels: int = 96
    mapping_layers: int = 8
    channel_base: int = 32768
    channel_max: int = 512
    conv_clamp: Optional[float] = None

    @property
    def synthesis(self) -> SynthesisConfig:
        return SynthesisConfig(self.w_dim, self.img_resolution, self.img_channels,
                               self.channel_base, self.channel_max, self.conv_clamp)

    @property
    def mapping(self) -> MappingConfig:
        return MappingConfig(self.z_dim, self.c_dim, self.w_dim,
                             num_ws=self.synthesis.num_ws,
                             num_layers=self.mapping_layers)


def init_generator(key, cfg: GeneratorConfig) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    return {"mapping": init_mapping(k1, cfg.mapping),
            "synthesis": init_synthesis_network(k2, cfg.synthesis)}


def apply_generator(params, cfg: GeneratorConfig, z, c=None,
                    truncation_psi: float = 1.0, noise_mode="const",
                    rng=None) -> jax.Array:
    ws = apply_mapping(params["mapping"], cfg.mapping, z, c,
                       truncation_psi=truncation_psi)
    return apply_synthesis_network(params["synthesis"], cfg.synthesis, ws,
                                   noise_mode=noise_mode, rng=rng)


# -- Discriminator (reference networks_stylegan2.py:557-795; unused by the
# reference's training, kept for capability completeness) ----------------------

@dataclasses.dataclass(frozen=True)
class DiscriminatorConfig:
    c_dim: int = 0
    img_resolution: int = 256
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1

    @property
    def block_resolutions(self) -> Tuple[int, ...]:
        log2 = int(math.log2(self.img_resolution))
        return tuple(2 ** i for i in range(log2, 2, -1))

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)


def init_discriminator(key, cfg: DiscriminatorConfig) -> Dict[str, Any]:
    keys = jax.random.split(key, len(cfg.block_resolutions) * 4 + 4)
    ki = iter(range(len(keys)))
    p: Dict[str, Any] = {}
    p["frgb"] = init_conv2d_layer(keys[next(ki)], cfg.img_channels,
                                  cfg.channels(cfg.img_resolution), kernel_size=1)
    for res in cfg.block_resolutions:
        in_ch, out_ch = cfg.channels(res), cfg.channels(res // 2)
        p[f"b{res}"] = {
            "conv0": init_conv2d_layer(keys[next(ki)], in_ch, in_ch),
            "conv1": init_conv2d_layer(keys[next(ki)], in_ch, out_ch),
            "skip": init_conv2d_layer(keys[next(ki)], in_ch, out_ch,
                                      kernel_size=1, bias=False),
        }
    ch4 = cfg.channels(4)
    p["epi_conv"] = init_conv2d_layer(keys[next(ki)],
                                      ch4 + cfg.mbstd_num_channels, ch4)
    p["epi_fc"] = init_fc(keys[next(ki)], ch4 * 16, ch4)
    p["epi_out"] = init_fc(keys[next(ki)], ch4, 1)
    return p


def minibatch_stddev(x: jax.Array, group_size: int = 4,
                     num_channels: int = 1) -> jax.Array:
    """(reference networks_stylegan2.py:682-703 MinibatchStdLayer)."""
    n, c, h, w = x.shape
    g = min(group_size, n) if group_size is not None else n
    g = max(1, n // max(1, n // g))
    f = num_channels
    y = x.reshape(g, -1, f, c // f, h, w)
    y = y - jnp.mean(y, axis=0)
    y = jnp.sqrt(jnp.mean(y ** 2, axis=0) + 1e-8)
    y = jnp.mean(y, axis=(2, 3, 4))                   # (n//g, F)
    y = jnp.repeat(y, g, axis=0).reshape(n, f, 1, 1)
    y = jnp.broadcast_to(y, (n, f, h, w))
    return jnp.concatenate([x, y], axis=1)


def apply_discriminator(params, cfg: DiscriminatorConfig, img: jax.Array) -> jax.Array:
    """img (N, C, R, R) → logits (N, 1). Resnet architecture."""
    f = setup_filter(RESAMPLE_FILTER)
    x = apply_conv2d_layer(params["frgb"], img, activation="lrelu")
    for res in cfg.block_resolutions:
        blk = params[f"b{res}"]
        y = apply_conv2d_layer(blk["skip"], x, f=f, down=2, gain=math.sqrt(0.5))
        x = apply_conv2d_layer(blk["conv0"], x, activation="lrelu")
        x = apply_conv2d_layer(blk["conv1"], x, f=f, down=2, activation="lrelu",
                               gain=math.sqrt(0.5))
        x = y + x
    x = minibatch_stddev(x, cfg.mbstd_group_size, cfg.mbstd_num_channels)
    x = apply_conv2d_layer(params["epi_conv"], x, activation="lrelu")
    x = apply_fc(params["epi_fc"], x.reshape(x.shape[0], -1), activation="lrelu")
    return apply_fc(params["epi_out"], x)

"""StyleGAN2 op parity vs torch oracles: upfirdn2d, conv2d_resample,
grid_sample, bias_act. Torch CPU defines the reference numerics."""
import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from nerf_siren_tpu.ops.bias_act import bias_act  # noqa: E402
from nerf_siren_tpu.ops.conv2d_resample import conv2d_resample  # noqa: E402
from nerf_siren_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d  # noqa: E402
from nerf_siren_tpu.ops.upfirdn2d import setup_filter, upfirdn2d, upsample2d  # noqa: E402


def torch_upfirdn2d_ref(x, f, up=1, down=1, padding=(0, 0, 0, 0),
                        flip_filter=False, gain=1.0):
    """Literal re-derivation of the reference python path
    (reference torch_utils/ops/upfirdn2d.py:169-217) in torch."""
    x = torch.tensor(x)
    f = torch.tensor(np.asarray(f))
    b, c, in_h, in_w = x.shape
    px0, px1, py0, py1 = padding
    x = x.reshape(b, c, in_h, 1, in_w, 1)
    x = F.pad(x, [0, up - 1, 0, 0, 0, up - 1])
    x = x.reshape(b, c, in_h * up, in_w * up)
    x = F.pad(x, [max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)])
    x = x[:, :, max(-py0, 0): x.shape[2] - max(-py1, 0),
          max(-px0, 0): x.shape[3] - max(-px1, 0)]
    f = f * (gain ** (f.ndim / 2))
    f = f.to(x.dtype)
    if not flip_filter:
        f = f.flip(list(range(f.ndim)))
    if f.ndim == 2:
        w = f[None, None].repeat(c, 1, 1, 1)
        x = F.conv2d(x, w, groups=c)
    else:
        w = f[None, None].repeat(c, 1, 1)
        x = F.conv2d(x, w.unsqueeze(2), groups=c)
        x = F.conv2d(x, w.unsqueeze(3), groups=c)
    return x[:, :, ::down, ::down].numpy()


@pytest.mark.parametrize("up,down,padding", [
    (1, 1, (1, 1, 1, 1)),
    (2, 1, (2, 1, 2, 1)),
    (1, 2, (1, 1, 1, 1)),
    (1, 1, (-1, 2, 0, 1)),
])
def test_upfirdn2d_matches_torch(up, down, padding, rng):
    x = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    f = np.asarray(setup_filter([1, 3, 3, 1]))
    expected = torch_upfirdn2d_ref(x, f, up, down, padding)
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f), up=up, down=down,
                               padding=list(padding)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_upsample2d_doubles_resolution(rng):
    x = rng.standard_normal((1, 2, 8, 8)).astype(np.float32)
    f = setup_filter([1, 3, 3, 1])
    y = np.asarray(upsample2d(jnp.asarray(x), f))
    assert y.shape == (1, 2, 16, 16)
    # constant input stays ~constant in the interior (filter is normalized,
    # gain=4 compensates the zero stuffing)
    xc = np.ones((1, 1, 8, 8), np.float32)
    yc = np.asarray(upsample2d(jnp.asarray(xc), f))
    np.testing.assert_allclose(yc[0, 0, 4:-4, 4:-4], 1.0, rtol=1e-4)


@pytest.mark.parametrize("up,kernel,padding", [(1, 3, 1), (1, 1, 0), (2, 3, 1)])
def test_conv2d_resample_matches_torch(up, kernel, padding, rng):
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    w = rng.standard_normal((5, 4, kernel, kernel)).astype(np.float32) * 0.2
    f = np.asarray(setup_filter([1, 3, 3, 1]))

    got = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(f), up=up, padding=padding,
                                     flip_weight=(up == 1)))
    # torch oracle re-deriving the reference's generic fallback
    fw = fh = 4
    px0 = px1 = py0 = py1 = padding
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    xt = torch_upfirdn2d_ref(x, f if up > 1 else np.ones((1, 1), np.float32),
                             up=up, padding=(px0, px1, py0, py1), gain=up ** 2)
    wt = torch.tensor(w)
    if up != 1:  # flip_weight False → convolution (flip kernel)
        wt = wt.flip([2, 3])
    expected = F.conv2d(torch.tensor(xt), wt).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_grid_sample_2d_matches_torch(rng):
    feats = rng.standard_normal((3, 8, 5, 7)).astype(np.float32)
    coords = rng.uniform(-1.3, 1.3, (3, 20, 2)).astype(np.float32)  # incl. OOB
    expected = F.grid_sample(torch.tensor(feats),
                             torch.tensor(coords)[:, None],  # (B, 1, M, 2)
                             mode="bilinear", padding_mode="zeros",
                             align_corners=False)[:, :, 0].permute(0, 2, 1).numpy()
    got = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(coords)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_grid_sample_3d_matches_torch(rng):
    grid = rng.standard_normal((2, 4, 6, 5, 7)).astype(np.float32)
    coords = rng.uniform(-1.2, 1.2, (2, 15, 3)).astype(np.float32)
    expected = F.grid_sample(torch.tensor(grid),
                             torch.tensor(coords)[:, None, None],  # (B,1,1,M,3)
                             mode="bilinear", padding_mode="zeros",
                             align_corners=False)[:, :, 0, 0].permute(0, 2, 1).numpy()
    got = np.asarray(grid_sample_3d(jnp.asarray(grid), jnp.asarray(coords)))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_bias_act_lrelu_gain_clamp(rng):
    x = rng.standard_normal((4, 6)).astype(np.float32) * 3
    b = rng.standard_normal(6).astype(np.float32)
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act="lrelu", clamp=1.5))
    expected = torch.clamp(
        F.leaky_relu(torch.tensor(x) + torch.tensor(b), 0.2) * np.sqrt(2),
        -1.5, 1.5).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_grid_sample_2d_packed_matches_unpacked(rng):
    """The block-gather formulation (one (2,2,C) CLIP gather per point on a
    zero-bordered channel-last table) must reproduce grid_sample_2d exactly
    for an f32 table — including coords beyond the 1-texel band, where the
    whole-point mask supplies the zeros-padding answer."""
    from nerf_siren_tpu.ops.grid_sample import (grid_sample_2d_packed,
                                                pack_grid_for_block_sample)
    feats = rng.standard_normal((3, 8, 5, 7)).astype(np.float32)
    coords = np.concatenate([
        rng.uniform(-1.3, 1.3, (3, 40, 2)),      # in-band + 1-texel border
        rng.uniform(-4.0, 4.0, (3, 24, 2)),      # far out of band
        np.broadcast_to([[[-1.0, 1.0]]], (3, 1, 2)),   # exact corners
        np.broadcast_to([[[1.0, -1.0]]], (3, 1, 2)),
    ], axis=1).astype(np.float32)
    ref = np.asarray(grid_sample_2d(jnp.asarray(feats), jnp.asarray(coords)))
    table = pack_grid_for_block_sample(jnp.asarray(feats), jnp.float32)
    got = np.asarray(grid_sample_2d_packed(table, jnp.asarray(coords)))
    np.testing.assert_array_equal(got, ref)

    # bf16 table: same values up to table rounding
    table16 = pack_grid_for_block_sample(jnp.asarray(feats), jnp.bfloat16)
    got16 = np.asarray(grid_sample_2d_packed(table16, jnp.asarray(coords)))
    np.testing.assert_allclose(got16, ref, rtol=0, atol=2e-2)

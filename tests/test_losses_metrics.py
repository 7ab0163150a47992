"""Loss and metric parity tests vs torch oracles (torch CPU is available
in the test environment and defines the reference semantics)."""
import numpy as np
import pytest
import jax.numpy as jnp

from nerf_siren_tpu.training.losses import loss_dict, mse_loss, msece_loss, msenll_loss
from nerf_siren_tpu.training.metrics import mse, psnr, ssim

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def test_mse_loss_coarse_fine(rng):
    rgb_c = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    rgb_f = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    tgt = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    out = {"rgb_coarse": jnp.asarray(rgb_c)}
    l1 = mse_loss(out, jnp.asarray(tgt))["sum"]
    exp1 = np.mean((rgb_c - tgt) ** 2)
    np.testing.assert_allclose(float(l1), exp1, rtol=1e-5)

    out["rgb_fine"] = jnp.asarray(rgb_f)
    l2 = mse_loss(out, jnp.asarray(tgt))["sum"]
    np.testing.assert_allclose(float(l2), exp1 + np.mean((rgb_f - tgt) ** 2), rtol=1e-5)


def test_msece_matches_torch(rng):
    n, k = 128, 6
    logits = rng.standard_normal((n, k)).astype(np.float32)
    labels = rng.integers(-1, k, n)  # includes ignore_index -1
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    tgt = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    out = {"rgb_coarse": jnp.asarray(rgb), "cls_coarse": jnp.asarray(logits)}
    got = msece_loss(out, jnp.asarray(tgt), jnp.asarray(labels), weight=0.3)

    ce_t = F.cross_entropy(torch.tensor(logits), torch.tensor(labels), ignore_index=-1)
    mse_t = F.mse_loss(torch.tensor(rgb), torch.tensor(tgt))
    np.testing.assert_allclose(float(got["cls"]), 0.7 * float(ce_t), rtol=1e-5)
    np.testing.assert_allclose(float(got["rgb"]), 0.3 * float(mse_t), rtol=1e-5)
    np.testing.assert_allclose(float(got["sum"]), float(got["rgb"]) + float(got["cls"]), rtol=1e-6)


def test_msenll_matches_torch(rng):
    n, k = 128, 6
    logp = np.log(rng.dirichlet(np.ones(k), n).astype(np.float32) + 1e-8)
    labels = rng.integers(0, k, n)
    rgb = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    tgt = rng.uniform(0, 1, (n, 3)).astype(np.float32)

    out = {"rgb_coarse": jnp.asarray(rgb), "cls_coarse": jnp.asarray(logp)}
    got = msenll_loss(out, jnp.asarray(tgt), jnp.asarray(labels))

    nll_t = F.nll_loss(torch.tensor(logp), torch.tensor(labels))
    mse_t = F.mse_loss(torch.tensor(rgb), torch.tensor(tgt))
    np.testing.assert_allclose(float(got["cls"]), 0.01 * float(nll_t), rtol=1e-4)
    np.testing.assert_allclose(float(got["rgb"]), 0.99 * float(mse_t), rtol=1e-5)


def test_registry():
    assert set(loss_dict) == {"mse", "msece", "msenll"}


def test_psnr_known_value():
    a = jnp.zeros((10, 10, 3))
    b = jnp.full((10, 10, 3), 0.1)
    # mse = 0.01 → psnr = 20
    np.testing.assert_allclose(float(psnr(a, b)), 20.0, rtol=1e-4)


def test_psnr_valid_mask(rng):
    a = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (8, 8, 3)).astype(np.float32)
    mask = rng.uniform(0, 1, (8, 8, 3)) > 0.5
    expected = -10 * np.log10(np.mean((a[mask] - b[mask]) ** 2))
    got = float(psnr(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
    np.testing.assert_allclose(got, expected, rtol=1e-4)


def test_ssim_basics(rng):
    img = rng.uniform(0, 1, (1, 3, 32, 32)).astype(np.float32)
    # identical images → ssim 1
    s_same = float(ssim(jnp.asarray(img), jnp.asarray(img)))
    np.testing.assert_allclose(s_same, 1.0, atol=1e-5)
    # noisy counterpart scores lower
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape).astype(np.float32), 0, 1)
    s_noisy = float(ssim(jnp.asarray(img), jnp.asarray(noisy)))
    assert s_noisy < 0.9

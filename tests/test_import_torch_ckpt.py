"""Torch-checkpoint import: build a reference-named Lightning state_dict with
a REAL torch NeRF (reference architecture), convert, and verify our renderer
produces the same image as the torch model."""
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

sys.path.insert(0, "tools")

from nerf_siren_tpu.config import NeRFConfig, RenderConfig  # noqa: E402
from nerf_siren_tpu.render.rendering import render_rays  # noqa: E402
from nerf_siren_tpu.training.checkpoints import load_ckpt  # noqa: E402
from tests.test_torch_parity import torch_render  # noqa: E402
from tools.import_torch_ckpt import (  # noqa: E402
    convert_nerf_state,
    import_torch_ckpt,
)


def _torch_nerf_module(seed=0, n_classes=0):
    """The reference NeRF as torch modules with the reference's names."""
    g = torch.Generator().manual_seed(seed)

    def lin(i, o):
        m = torch.nn.Linear(i, o)
        with torch.no_grad():
            m.weight.copy_(torch.randn(o, i, generator=g) * 0.05)
            m.bias.copy_(torch.randn(o, generator=g) * 0.05)
        return m

    mod = torch.nn.Module()
    for i in range(8):
        in_dim = 63 if i == 0 else (319 if i == 4 else 256)
        setattr(mod, f"xyz_encoding_{i + 1}",
                torch.nn.Sequential(lin(in_dim, 256), torch.nn.ReLU(True)))
    mod.xyz_encoding_final = lin(256, 256)
    mod.dir_encoding = torch.nn.Sequential(lin(283, 128), torch.nn.ReLU(True))
    mod.sigma = lin(256, 1)
    mod.rgb = torch.nn.Sequential(lin(128, 3), torch.nn.Sigmoid())
    if n_classes:
        mod.parse = torch.nn.Sequential(lin(256, 512), lin(512, n_classes),
                                        torch.nn.Sigmoid())
    return mod


def test_roundtrip_render_matches_torch(tmp_path, rng):
    coarse = _torch_nerf_module(0)
    fine = _torch_nerf_module(1)
    state = {}
    for name, mod in [("nerf_coarse", coarse), ("nerf_fine", fine)]:
        for k, v in mod.state_dict().items():
            state[f"{name}.{k}"] = v
    ckpt_path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": state, "epoch": 15}, ckpt_path)

    out_path = str(tmp_path / "imported.msgpack")
    import_torch_ckpt(ckpt_path, out_path)

    from nerf_siren_tpu.models.nerf import init_nerf
    params = {
        "coarse": load_ckpt(init_nerf(jax.random.PRNGKey(9)), out_path, "nerf_coarse"),
        "fine": load_ckpt(init_nerf(jax.random.PRNGKey(10)), out_path, "nerf_fine"),
    }

    n = 32
    o = rng.standard_normal((n, 3)).astype(np.float32) * 0.2
    d = rng.standard_normal((n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays_np = np.concatenate([o, d, np.full((n, 1), 2, np.float32),
                              np.full((n, 1), 6, np.float32)], -1)

    cfg = RenderConfig(n_samples=24, n_importance=8, perturb=0.0,
                       noise_std=0.0, white_back=True)
    ours = render_rays(params, jnp.asarray(rays_np), cfg, None)

    # torch oracle render on OUR converted params must equal a render with
    # the original torch weights — sanity: compare our render against the
    # torch-oracle render of the converted params (weights identical by
    # construction if conversion is correct)
    with torch.no_grad():
        theirs = torch_render(params, torch.tensor(rays_np), 24, 8, True)
    for k in ["rgb_coarse", "rgb_fine", "depth_fine"]:
        got, exp = np.asarray(ours[k]), theirs[k].numpy()
        close = np.isclose(got, exp, rtol=1e-3, atol=1e-4)
        assert close.mean() > 0.95, f"{k}: {close.mean():.3f}"

    # direct torch-module forward equality on the coarse MLP
    from tests.test_torch_parity import torch_embedding
    x = torch.tensor(rng.standard_normal((16, 3)).astype(np.float32))
    dirs = torch.tensor(rng.standard_normal((16, 3)).astype(np.float32))
    with torch.no_grad():
        emb = torch_embedding(x, 10)
        demb = torch_embedding(dirs, 4)
        h = emb
        for i in range(8):
            if i == 4:
                h = torch.cat([emb, h], -1)
            h = getattr(coarse, f"xyz_encoding_{i + 1}")(h)
        sig_t = coarse.sigma(h)
        feat = coarse.xyz_encoding_final(h)
        rgb_t = coarse.rgb(coarse.dir_encoding(torch.cat([feat, demb], -1)))

    from nerf_siren_tpu.models.embedding import positional_encoding
    from nerf_siren_tpu.models.nerf import apply_nerf
    out = apply_nerf(params["coarse"], positional_encoding(jnp.asarray(x.numpy()), 10),
                     positional_encoding(jnp.asarray(dirs.numpy()), 4))
    np.testing.assert_allclose(np.asarray(out[:, :3]), rgb_t.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, 3:4]), sig_t.numpy(), rtol=1e-4, atol=1e-5)


def test_semantic_head_conversion(tmp_path):
    mod = _torch_nerf_module(2, n_classes=6)
    sd = {k: v for k, v in mod.state_dict().items()}
    params = convert_nerf_state({k: v.numpy() for k, v in sd.items()})
    assert "parse" in params
    assert params["parse"][0]["kernel"].shape == (256, 512)
    assert params["parse"][1]["kernel"].shape == (512, 6)

"""Dataset loader tests over synthetic on-disk scenes, including an
end-to-end train-on-lego-format smoke that PSNR improves."""
import numpy as np
import pytest
import jax

from nerf_siren_tpu.datasets import dataset_dict
from nerf_siren_tpu.datasets.blender import BlenderDataset
from nerf_siren_tpu.datasets.llff import LLFFDataset
from tests.datasets_synthetic import make_blender_dataset, make_llff_dataset


@pytest.fixture(scope="module")
def blender_root(tmp_path_factory):
    return make_blender_dataset(str(tmp_path_factory.mktemp("blender_sphere")))


@pytest.fixture(scope="module")
def llff_root(tmp_path_factory):
    return make_llff_dataset(str(tmp_path_factory.mktemp("llff_sphere")))


def test_registry():
    assert dataset_dict["blender"] is BlenderDataset
    assert dataset_dict["llff"] is LLFFDataset


def test_blender_train_buffers(blender_root):
    ds = BlenderDataset(blender_root, "train", img_wh=(40, 40))
    n_px = 40 * 40
    assert ds.all_rays.shape == (6 * n_px, 8)
    assert ds.all_rgbs.shape == (6 * n_px, 3)
    assert ds.white_back
    np.testing.assert_allclose(ds.all_rays[:, 6], 2.0)
    np.testing.assert_allclose(ds.all_rays[:, 7], 6.0)
    # rays_d normalized
    np.testing.assert_allclose(np.linalg.norm(ds.all_rays[:, 3:6], axis=-1), 1.0, rtol=1e-5)
    # each image has its own camera origin (guards against the reference's
    # frames[0] pose bug)
    origins = ds.all_rays[::n_px, :3]
    assert np.unique(np.round(origins, 4), axis=0).shape[0] == 6
    # background pixels are white (blended)
    assert ds.all_rgbs.max() <= 1.0 and (ds.all_rgbs > 0.99).any()


def test_blender_val_item(blender_root):
    ds = BlenderDataset(blender_root, "val", img_wh=(40, 40))
    assert len(ds) == 2
    item = ds[0]
    assert item["rays"].shape == (1600, 8)
    assert item["rgbs"].shape == (1600, 3)
    assert item["valid_mask"].dtype == bool
    assert 0 < item["valid_mask"].sum() < 1600  # sphere covers part of frame


def test_llff_train_ndc(llff_root):
    ds = LLFFDataset(llff_root, "train", img_wh=(40, 30))
    n_px = 40 * 30
    assert ds.all_rays.shape == (4 * n_px, 8)  # 5 images minus val image
    # NDC: near/far are 0/1
    np.testing.assert_allclose(ds.all_rays[:, 6], 0.0)
    np.testing.assert_allclose(ds.all_rays[:, 7], 1.0)
    # NDC origins at the z=-1 plane
    np.testing.assert_allclose(ds.all_rays[:, 2], -1.0, atol=1e-4)
    # bounds rescaled so nearest depth ≈ 1.33
    np.testing.assert_allclose(ds.bounds.min(), 1 / 0.75, rtol=1e-5)


def test_llff_spheric(llff_root):
    ds = LLFFDataset(llff_root, "train", img_wh=(40, 30), spheric_poses=True)
    near = ds.bounds.min()
    np.testing.assert_allclose(ds.all_rays[:, 6], near, rtol=1e-5)


def test_llff_test_split_spiral(llff_root):
    ds = LLFFDataset(llff_root, "test", img_wh=(40, 30))
    assert len(ds) == 120  # spiral path default
    item = ds[0]
    assert item["rays"].shape == (1200, 8)
    assert "c2w" in item


def test_blender_e2e_training_improves(blender_root):
    """The minimum end-to-end slice (SURVEY §7 milestone 3): train on the
    Blender-format synthetic scene, PSNR must climb."""
    from nerf_siren_tpu.config import NeRFConfig, RenderConfig, TrainConfig
    from nerf_siren_tpu.training.system import NeRFSystem, epoch_iterator

    ds = BlenderDataset(blender_root, "train", img_wh=(40, 40))
    render_cfg = RenderConfig(n_samples=32, perturb=1.0, noise_std=1.0, white_back=True)
    system = NeRFSystem(render_cfg,
                        TrainConfig(lr=1e-3, batch_size=1024, decay_step=(100,)),
                        NeRFConfig(depth=4, width=64), steps_per_epoch=9)
    state = system.init_state(jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)
    psnrs = []
    for epoch in range(10):
        for batch in epoch_iterator(ds.all_rays, ds.all_rgbs, 1024, seed=0, epoch=epoch):
            state, m = system.train_step(state, batch, rng)
        psnrs.append(float(m["train/psnr"]))
    assert psnrs[-1] > psnrs[0] + 2.0, f"no learning: {psnrs}"

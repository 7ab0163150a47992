"""Native C++ host library vs the numpy reference implementations."""
import numpy as np
import pytest

from nerf_siren_tpu import native
from nerf_siren_tpu.datasets import ray_utils


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("no C++ toolchain available; numpy fallback covers parity")


def test_ray_directions_match():
    expected = ray_utils.get_ray_directions(30, 40, 35.0)
    got = native.ray_directions(30, 40, 35.0)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_world_rays_match(rng):
    dirs = ray_utils.get_ray_directions(16, 16, 20.0)
    c2w = np.array([[0, -1, 0, 1.0], [1, 0, 0, 2.0], [0, 0, 1, 3.0]], np.float32)
    eo, ed = ray_utils.get_rays(dirs, c2w)
    go, gd = native.world_rays(dirs, c2w)
    np.testing.assert_allclose(go, eo, rtol=1e-6)
    np.testing.assert_allclose(gd, ed, rtol=1e-5, atol=1e-6)


def test_ndc_rays_match(rng):
    dirs = ray_utils.get_ray_directions(24, 32, 30.0)
    c2w = np.eye(4, dtype=np.float32)[:3]
    o, d = ray_utils.get_rays(dirs, c2w)
    eo, ed = ray_utils.get_ndc_rays(24, 32, 30.0, 1.0, o, d)
    go, gd = native.ndc_rays(24, 32, 30.0, 1.0, o, d)
    np.testing.assert_allclose(go, eo, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(gd, ed, rtol=1e-4, atol=1e-5)


def test_blend_rgba_match(rng):
    rgba = rng.integers(0, 255, (100, 4)).astype(np.uint8)
    arr = rgba.astype(np.float32) / 255.0
    expected = arr[:, :3] * arr[:, 3:] + (1 - arr[:, 3:])
    got = native.blend_rgba_white(rgba)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_pack_rays_match(rng):
    o = rng.standard_normal((50, 3)).astype(np.float32)
    d = rng.standard_normal((50, 3)).astype(np.float32)
    expected = ray_utils.make_ray_batch(o, d, 2.0, 6.0)
    got = native.pack_rays(o, d, 2.0, 6.0)
    np.testing.assert_allclose(got, expected, rtol=1e-6)

"""Ray generation, NDC warp, and pose math tests."""
import numpy as np

from nerf_siren_tpu.datasets.ray_utils import (
    get_ndc_rays,
    get_ray_directions,
    get_rays,
    make_ray_batch,
)
from nerf_siren_tpu.datasets.poses import (
    average_poses,
    center_poses,
    create_spheric_poses,
    create_spiral_poses,
)


def test_ray_directions_formula():
    H, W, f = 4, 6, 10.0
    d = get_ray_directions(H, W, f)
    assert d.shape == (H, W, 3)
    # center-ish pixel: no +0.5 offset convention (reference ray_utils.py:19-22)
    np.testing.assert_allclose(d[2, 3], [ (3 - 3.0) / f, -(2 - 2.0) / f, -1.0])
    np.testing.assert_allclose(d[0, 0], [(0 - 3.0) / f, -(0 - 2.0) / f, -1.0])
    # z is always -1 (looking down -z)
    np.testing.assert_allclose(d[..., 2], -1.0)


def test_get_rays_world():
    H, W, f = 8, 8, 5.0
    d = get_ray_directions(H, W, f)
    # 90° rotation about z + translation
    c2w = np.array([[0, -1, 0, 1.0], [1, 0, 0, 2.0], [0, 0, 1, 3.0]], np.float32)
    rays_o, rays_d = get_rays(d, c2w)
    assert rays_o.shape == (64, 3) and rays_d.shape == (64, 3)
    np.testing.assert_allclose(rays_o, np.broadcast_to([1, 2, 3.0], (64, 3)))
    np.testing.assert_allclose(np.linalg.norm(rays_d, axis=-1), 1.0, rtol=1e-6)
    # manual rotate + normalize for one pixel
    v = d.reshape(-1, 3)[10] @ c2w[:, :3].T
    np.testing.assert_allclose(rays_d[10], v / np.linalg.norm(v), rtol=1e-6)


def test_ndc_rays_properties(rng):
    H, W, f = 378, 504, 400.0
    d = get_ray_directions(H, W, f)
    c2w = np.eye(4)[:3].astype(np.float32)
    rays_o, rays_d = get_rays(d, c2w)
    ndc_o, ndc_d = get_ndc_rays(H, W, f, 1.0, rays_o, rays_d)
    # origin lies on the z=-near plane → ndc o2 = 1 + 2*near/(-near) = -1
    np.testing.assert_allclose(ndc_o[:, 2], -1.0, atol=1e-5)
    # marching to t=1 reaches the far plane z_ndc=+1
    np.testing.assert_allclose((ndc_o + ndc_d)[:, 2], 1.0, atol=1e-5)
    # world point at infinity maps inside [-1,1] in x/y for central rays
    center = (H // 2) * W + W // 2
    assert abs(ndc_o[center, 0]) < 0.05 and abs(ndc_o[center, 1]) < 0.05


def test_make_ray_batch():
    o = np.zeros((5, 3), np.float32)
    d = np.ones((5, 3), np.float32)
    r = make_ray_batch(o, d, 2.0, 6.0)
    assert r.shape == (5, 8)
    np.testing.assert_allclose(r[:, 6], 2.0)
    np.testing.assert_allclose(r[:, 7], 6.0)


def _random_poses(rng, n=12):
    poses = []
    for _ in range(n):
        # small random rotation + translation, right-handed frame
        angle = rng.uniform(-0.3, 0.3, 3)
        cx, cy, cz = np.cos(angle)
        sx, sy, sz = np.sin(angle)
        rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
        ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
        rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
        R = rx @ ry @ rz
        t = rng.uniform(-1, 1, (3, 1))
        poses.append(np.concatenate([R, t], 1))
    return np.stack(poses)


def test_average_and_center_poses(rng):
    poses = _random_poses(rng)
    avg = average_poses(poses)
    R = avg[:, :3]
    # orthonormal right-handed rotation
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    assert np.linalg.det(R) > 0.99

    centered, inv_avg = center_poses(poses)
    # the average of the centered poses is (near) identity
    avg2 = average_poses(centered)
    np.testing.assert_allclose(avg2[:, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(avg2[:, 3], 0.0, atol=1e-6)


def test_render_path_poses(rng):
    spiral = create_spiral_poses(np.array([0.5, 0.5, 0.2]), 3.5, n_poses=30)
    assert spiral.shape == (30, 3, 4)
    spheric = create_spheric_poses(4.0, n_poses=24)
    assert spheric.shape == (24, 3, 4)
    for P in (spiral, spheric):
        R = P[:, :, :3]
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(np.transpose(R, (0, 2, 1)) @ R, eye, atol=1e-6)

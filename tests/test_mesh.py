"""Mesh extraction tests: iso-surface of an analytic sphere, PLY roundtrip,
largest-component denoise."""
import numpy as np
import pytest

from nerf_siren_tpu.mesh.marching import (
    largest_connected_component,
    marching_tetrahedra,
)
from nerf_siren_tpu.mesh.ply import read_ply, write_ply


def _sphere_grid(n=48, radius=0.6):
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    return radius - np.sqrt(x ** 2 + y ** 2 + z ** 2), lin


def test_sphere_surface_accuracy():
    grid, lin = _sphere_grid()
    spacing = (lin[1] - lin[0],) * 3
    verts, faces = marching_tetrahedra(grid, 0.0, spacing=spacing,
                                       origin=(-1, -1, -1))
    assert len(verts) > 500 and len(faces) > 1000
    r = np.linalg.norm(verts, axis=-1)
    # all vertices lie on the r=0.6 sphere within a cell size
    np.testing.assert_allclose(r, 0.6, atol=2 * spacing[0])
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_mesh_is_closed_and_oriented():
    grid, lin = _sphere_grid(32)
    verts, faces = marching_tetrahedra(grid, 0.0)
    # Closed surface: every edge appears in exactly 2 faces
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges_sorted = np.sort(edges, axis=1)
    _, counts = np.unique(edges_sorted, axis=0, return_counts=True)
    assert (counts == 2).mean() > 0.99
    # Outward orientation: face normal aligns with vertex direction (sphere)
    center = (np.asarray(grid.shape) - 1) / 2
    tri = verts[faces]
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    outward = tri.mean(1) - center
    frac_out = ((n * outward).sum(-1) > 0).mean()
    assert frac_out > 0.95, f"only {frac_out:.2f} faces outward"


def test_empty_and_full_grids():
    grid = np.zeros((8, 8, 8), np.float32)
    v, f = marching_tetrahedra(grid, 0.5)
    assert len(v) == 0 and len(f) == 0
    v, f = marching_tetrahedra(grid + 1.0, 0.5)
    assert len(v) == 0 and len(f) == 0


def test_largest_component():
    # two spheres, one bigger
    lin = np.linspace(-1, 1, 40, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    big = 0.4 - np.sqrt((x + 0.5) ** 2 + y ** 2 + z ** 2)
    small = 0.15 - np.sqrt((x - 0.6) ** 2 + y ** 2 + z ** 2)
    grid = np.maximum(big, small)
    verts, faces = marching_tetrahedra(grid, 0.0)
    v2, f2, kept = largest_connected_component(verts, faces)
    assert len(v2) < len(verts)
    assert len(f2) > 0.5 * len(faces)
    # all kept vertices belong to the big sphere (x < 0 region in grid coords)
    assert (v2[:, 0] < 25).all()


def test_ply_roundtrip(tmp_path):
    grid, _ = _sphere_grid(16)
    verts, faces = marching_tetrahedra(grid, 0.0)
    colors = np.random.default_rng(0).integers(0, 255, (len(verts), 3)).astype(np.uint8)
    p = str(tmp_path / "m.ply")
    write_ply(p, verts, faces, colors)
    v, f, c = read_ply(p)
    np.testing.assert_allclose(v, verts, rtol=1e-6)
    np.testing.assert_array_equal(f, faces)
    np.testing.assert_array_equal(c, colors)

    # colorless variant
    p2 = str(tmp_path / "m2.ply")
    write_ply(p2, verts, faces)
    v, f, c = read_ply(p2)
    assert c is None and len(v) == len(verts)

from nerf_siren_tpu.mesh.marching import marching_tetrahedra
from nerf_siren_tpu.mesh.ply import write_ply, read_ply

__all__ = ["marching_tetrahedra", "write_ply", "read_ply"]

from nerf_siren_tpu.render.rendering import render_rays, render_rays_chunked

__all__ = ["render_rays", "render_rays_chunked"]

from nerf_siren_tpu.ops.searchsorted import searchsorted
from nerf_siren_tpu.ops.sample_pdf import sample_pdf

__all__ = ["searchsorted", "sample_pdf"]

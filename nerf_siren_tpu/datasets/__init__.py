"""Dataset loaders and the dataset registry.

Mirrors the reference registry (reference: datasets/__init__.py:6-12); loaders
are registered lazily as they are implemented.
"""
dataset_dict = {}


def register_dataset(name):
    def deco(cls):
        dataset_dict[name] = cls
        return cls
    return deco


from nerf_siren_tpu.datasets import ray_utils, poses  # noqa: E402,F401
from nerf_siren_tpu.datasets.blender import BlenderDataset  # noqa: E402,F401
from nerf_siren_tpu.datasets.blender_cls import BlenderClsImgBatchDataset  # noqa: E402,F401
from nerf_siren_tpu.datasets.llff import LLFFDataset  # noqa: E402,F401
from nerf_siren_tpu.datasets.llff_cls import LLFFClsDataset, LLFFClsImgBatchDataset  # noqa: E402,F401
from nerf_siren_tpu.datasets.replica import ReplicaDatasetCache  # noqa: E402,F401

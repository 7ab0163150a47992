"""Label-map analysis helpers (reference: utils/data.py).

The fine-grained 18-attribute face-parsing space and its alternative
19→11-class merge (the 5-class merge used in training lives in
datasets.llff_cls.merge_cls); plus a raw-label distribution analyzer.
"""
from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np

ATTS = ['skin', 'l_brow', 'r_brow', 'l_eye', 'r_eye', 'eye_g', 'l_ear',
        'r_ear', 'ear_r', 'nose', 'mouth', 'u_lip', 'l_lip', 'neck',
        'neck_l', 'cloth', 'hair', 'hat']
NEW_ATTS_11 = ['skin', 'brow', 'brow', 'eye', 'eye', 'eye_g', 'ear', 'ear',
               'ignore', 'nose', 'mouth', 'lip', 'lip', 'neck', 'ignore',
               'ignore', 'hair', 'ignore']
NEW_MAP_11 = {'skin': 1, 'brow': 2, 'eye': 3, 'eye_g': 4, 'ear': 5,
              'nose': 6, 'mouth': 7, 'lip': 8, 'neck': 9, 'hair': 10,
              'ignore': 11}


def parallel_map(fn, items, max_workers: int = 8):
    """Ordered thread-pool map for IO-bound dataset preprocessing.

    PIL decode/resize and numpy ray precompute release the GIL, so loading
    a 100-image 800² scene parallelizes ~linearly across threads (the
    torch-DataLoader-workers role in the reference, without processes).
    Falls back to a plain map for small inputs."""
    items = list(items)
    if len(items) < 2:
        return [fn(x) for x in items]
    import concurrent.futures

    with concurrent.futures.ThreadPoolExecutor(
            max_workers=min(max_workers, len(items))) as pool:
        return list(pool.map(fn, items))


def merge_cls_11() -> Dict[int, int]:
    """attribute id (1-based) → 11-class id (the reference's alternative
    merge, utils/data.py:15-41)."""
    return {i: NEW_MAP_11[new] for i, (_, new) in enumerate(zip(ATTS, NEW_ATTS_11), 1)}


def remap_labels(labels: np.ndarray, ids_map: Dict[int, int]) -> np.ndarray:
    out = np.asarray(labels).copy()
    for src, dst in ids_map.items():
        out[np.asarray(labels) == src] = dst
    return out


def analyze_parse_labels(root_dir: str, subdir: str = "raw_parse"):
    """Per-file unique-label histogram of stored parse PNGs
    (reference utils/data.py:6-12 aly_parse_res). Returns {path: counts}."""
    from PIL import Image

    out = {}
    for path in sorted(glob.glob(os.path.join(root_dir, subdir, "*.png"))):
        arr = np.asarray(Image.open(path))
        values, counts = np.unique(arr, return_counts=True)
        out[path] = dict(zip(values.tolist(), counts.tolist()))
    return out

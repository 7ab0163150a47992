"""Depth visualization (reference: utils/visualization.py:6-18)."""
from __future__ import annotations

import cv2
import numpy as np


def visualize_depth(depth: np.ndarray, cmap: int = cv2.COLORMAP_JET) -> np.ndarray:
    """Normalize a (H, W) depth map and colorize with a JET colormap.

    Returns (H, W, 3) uint8 RGB.
    """
    x = np.nan_to_num(np.asarray(depth, np.float32))
    mi, ma = np.min(x), np.max(x)
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * x).astype(np.uint8)
    colored = cv2.applyColorMap(x, cmap)  # BGR
    return cv2.cvtColor(colored, cv2.COLOR_BGR2RGB)

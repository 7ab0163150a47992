"""Semantic class-map visualization (reference: utils/color.py:7-62):
overlay a predicted class map on an rgb image using a fixed 23-color palette
and dump pred/overlay/raw PNGs."""
from __future__ import annotations

import os

import cv2
import numpy as np

PART_COLORS = np.asarray(
    [[255, 0, 0], [255, 0, 255], [255, 170, 0],
     [255, 0, 85], [255, 0, 170],
     [0, 255, 0], [85, 255, 0], [170, 255, 0],
     [0, 255, 85], [0, 255, 170],
     [0, 0, 255], [85, 0, 255], [170, 0, 255],
     [0, 85, 255], [0, 170, 255],
     [255, 255, 0], [255, 255, 85], [255, 255, 170],
     [255, 85, 255], [255, 170, 255],
     [0, 255, 255], [85, 255, 255], [170, 255, 255]], np.uint8)


def colorize_cls(pred_map: np.ndarray) -> np.ndarray:
    """(H, W) int class map -> (H, W, 3) uint8 color map (class 0 = black).

    Classes 1-22 use the reference palette index directly (parity with the
    19-class face-parsing sets); beyond that the palette cycles — Replica
    scenes carry many more semantic classes than the palette has colors.
    """
    pred = np.asarray(pred_map).astype(np.int32)
    out = np.zeros((*pred.shape, 3), np.uint8)
    for i in range(1, int(pred.max()) + 1):
        out[pred == i] = PART_COLORS[i % len(PART_COLORS)]
    return out


def color_cls(img: np.ndarray, pred_map: np.ndarray, savedir: str,
              prefix: str = "") -> np.ndarray:
    """Write pred_map.png / img_color.png / img_raw.png like the reference.

    img: (H, W, 3) uint8 RGB; pred_map: (H, W) int classes.
    Returns the overlay (RGB uint8).
    """
    os.makedirs(savedir, exist_ok=True)
    vis_im = np.asarray(img).astype(np.uint8)
    pred_color = colorize_cls(pred_map)
    overlay_bgr = cv2.addWeighted(
        cv2.cvtColor(vis_im, cv2.COLOR_RGB2BGR), 0.4, pred_color, 0.6, 0)
    cv2.imwrite(os.path.join(savedir, prefix + "pred_map.png"), pred_color)
    cv2.imwrite(os.path.join(savedir, prefix + "img_color.png"), overlay_bgr)
    cv2.imwrite(os.path.join(savedir, prefix + "img_raw.png"),
                cv2.cvtColor(vis_im, cv2.COLOR_RGB2BGR))
    return cv2.cvtColor(overlay_bgr, cv2.COLOR_BGR2RGB)

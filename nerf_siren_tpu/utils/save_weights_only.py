"""Strip a full training checkpoint to bare model weights
(reference: utils/save_weights_only.py — the "portable scene" export, ~5MB).

Usage: python -m nerf_siren_tpu.utils.save_weights_only --ckpt_path a.msgpack
"""
from __future__ import annotations

import argparse
import os


def save_weights_only(ckpt_path: str, out_path: str = None) -> str:
    from nerf_siren_tpu.training.checkpoints import load_checkpoint, save_checkpoint

    ckpt = load_checkpoint(ckpt_path)
    params = ckpt.get("params", ckpt)  # full-resume ckpts nest under 'params'
    if out_path is None:
        base, ext = os.path.splitext(ckpt_path)
        out_path = base + "_weights" + ext
    save_checkpoint(out_path, params)
    return out_path


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt_path", type=str, required=True)
    parser.add_argument("--out_path", type=str, default=None)
    args = parser.parse_args()
    print(save_weights_only(args.ckpt_path, args.out_path))

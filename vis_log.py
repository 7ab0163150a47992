"""Plot a metric column from a training CSV/TensorBoard log to an image
(reference: vis_log.py:5-18).

Works on the CSV files TensorBoard event consumers export, or any CSV with a
header row.
"""
from __future__ import annotations

import argparse
import csv

import numpy as np


def main(log_path: str, metric: str, out_path: str):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps, values = [], []
    with open(log_path) as f:
        reader = csv.DictReader(f)
        for i, row in enumerate(reader):
            if metric in row and row[metric] not in ("", None):
                steps.append(float(row.get("step", i)))
                values.append(float(row[metric]))
    if not values:
        raise ValueError(f"metric {metric!r} not found in {log_path}")
    plt.figure(figsize=(8, 4))
    plt.plot(steps, values)
    plt.xlabel("step")
    plt.ylabel(metric)
    plt.tight_layout()
    plt.savefig(out_path)
    print(f"wrote {out_path} ({len(values)} points)")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--log", type=str, required=True)
    parser.add_argument("--metric", type=str, required=True)
    parser.add_argument("--out", type=str, default="metric.jpg")
    args = parser.parse_args()
    main(args.log, args.metric, args.out)

#!/usr/bin/env python3
"""PCK accuracy-vs-threshold curves from keypoints.csv files.

Counterpart of the reference's standalone plot CLI
(reference dream/oks_plots.py:18-181), generalized: keypoint count and frame
resolution are flags instead of the reference's hard-coded 7 kps / 640x480
(reference dream/oks_plots.py:64,76), and the computed metrics are
self-checked against dream_tpu.analysis.keypoint_metrics the same way the
reference asserts against its analysis module (reference dream/oks_plots.py:118-128).
"""

from __future__ import annotations

import argparse

import numpy as np


def pck_curve_from_csv(
    csv_file: str,
    n_keypoints: int = 7,
    image_resolution=(640, 480),
    pixel_threshold: float = 20.0,
):
    """Returns (pck_values, y_values, auc, distances) for one keypoints.csv."""
    import pandas as pd

    df = pd.read_csv(csv_file)
    all_dist = []
    for i in range(n_keypoints):
        gt = df[[f"kp{i}x_gt", f"kp{i}y_gt"]].values
        pred = df[[f"kp{i}x", f"kp{i}y"]].values
        inframe = (
            (gt[:, 0] > 0)
            & (gt[:, 0] < image_resolution[0])
            & (gt[:, 1] > 0)
            & (gt[:, 1] < image_resolution[1])
        )
        d = np.linalg.norm(gt[inframe] - pred[inframe], axis=1)
        all_dist += d.tolist()
    all_dist = np.array(all_dist)

    pck_values = np.arange(0, int(pixel_threshold), 0.01)
    y_values = np.sum(all_dist[None, :] < pck_values[:, None], axis=1) / len(all_dist)
    auc = np.trapezoid(y_values, dx=0.01) / float(pixel_threshold)
    return pck_values, y_values, auc, all_dist


def main(argv=None):
    parser = argparse.ArgumentParser(description="PCK curves for dream_tpu")
    parser.add_argument("--data", nargs="+", required=True, help="keypoints.csv files")
    parser.add_argument("--labels", nargs="+", default=None)
    parser.add_argument("--styles", nargs="+", default=None)
    parser.add_argument("--colours", nargs="+", default=None)
    parser.add_argument("--pixel", type=float, default=20)
    parser.add_argument("--keypoints", type=int, default=7)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--height", type=int, default=480)
    parser.add_argument("--output", default="output.pdf")
    parser.add_argument("--show", default=False, action="store_true")
    parser.add_argument("--title", default=None)
    args = parser.parse_args(argv)

    import matplotlib

    if not args.show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure()
    ax = plt.axes()
    ax.grid(True, alpha=0.3)

    for i_csv, csv_file in enumerate(args.data):
        if csv_file == "666":  # legend spacer, reference behavior
            plt.plot([], [], " ", label=args.labels[i_csv].replace("_", " "))
            continue

        pck_values, y_values, auc, dists = pck_curve_from_csv(
            csv_file, args.keypoints, (args.width, args.height), args.pixel
        )
        print(csv_file)
        print("detected", len(dists))
        print("auc", auc)
        print("mean", np.mean(dists[dists < 1000]))
        print("median", np.median(dists[dists < 1000]))
        print("std", np.std(dists[dists < 1000]))

        label = (
            args.labels[i_csv].replace("_", " ")
            if args.labels and i_csv < len(args.labels)
            else csv_file.replace(".csv", "")
        )
        label += f" ({auc:.3f})"
        style = (
            args.styles[i_csv] if args.styles and i_csv < len(args.styles) else "-"
        )
        plt.plot(pck_values, y_values, style, label=label)

    plt.xlabel("PCK threshold distance (pixels)")
    plt.ylabel("Accuracy")
    plt.ylim(0, 1)
    if args.title:
        plt.title(args.title)
    ax.legend(loc="lower right")
    plt.savefig(args.output)
    if args.show:
        plt.show()
    print(f"Saved plot to {args.output}")


if __name__ == "__main__":
    main()

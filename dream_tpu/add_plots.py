#!/usr/bin/env python3
"""ADD accuracy-vs-threshold curves from pnp_results.csv files.

Counterpart of the reference plot CLI (reference dream/add_plots.py:18-158),
with the same ``--divide`` cm->m option and the same self-check against the
metrics module (reference dream/add_plots.py:88-104).
"""

from __future__ import annotations

import argparse

import numpy as np

from dream_tpu.analysis import pnp_metrics


def add_curve_from_csv(csv_file: str, threshold: float = 0.1, divide: bool = False):
    import pandas as pd

    df = pd.read_csv(csv_file)
    add = np.asarray(df["add"].tolist(), dtype=float)
    if divide:
        add = add / 100.0
    magic = -9.99 if divide else -999.0

    n_inframe = np.asarray(df["n_inframe_gt_projs"].tolist())
    n_pnp_possible = int(np.sum(n_inframe >= 4))
    add_found = add[add > magic]

    delta = 0.00001
    values = np.arange(0.0, threshold, delta)
    counts = np.sum(add_found[None, :] <= values[:, None], axis=1) / float(
        n_pnp_possible
    )
    auc = float(np.trapezoid(counts, dx=delta) / threshold)

    # Self-check vs the metrics module (reference dream/add_plots.py:88-104).
    if not divide and abs(threshold - 0.1) < 1e-12:
        m = pnp_metrics(df["add"], df["n_inframe_gt_projs"])
        assert abs(m["add_auc"] - auc) < 1e-9
        assert m["num_pnp_found"] == len(add_found)
        assert m["num_pnp_possible"] == n_pnp_possible

    return values, counts, auc, add_found, n_pnp_possible


def main(argv=None):
    parser = argparse.ArgumentParser(description="ADD curves for dream_tpu")
    parser.add_argument("--data", nargs="+", required=True, help="pnp_results.csv files")
    parser.add_argument("--labels", nargs="+", default=None)
    parser.add_argument("--styles", nargs="+", default=None)
    parser.add_argument("--threshold", type=float, default=0.1)
    parser.add_argument("--output", default="output.pdf")
    parser.add_argument("--show", default=False, action="store_true")
    parser.add_argument("--divide", default=False, action="store_true",
                        help="Divide ADD values by 100 (cm -> m).")
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
        if csv_file == "666":
            plt.plot([], [], " ", label=args.labels[i_csv].replace("_", " "))
            continue

        values, counts, auc, add_found, n_possible = add_curve_from_csv(
            csv_file, args.threshold, args.divide
        )
        print(csv_file)
        print("auc", auc)
        print("found", len(add_found) / n_possible if n_possible else float("nan"))
        if len(add_found):
            print("mean", np.mean(add_found))
            print("median", np.median(add_found))
            print("std", np.std(add_found))

        label = (
            args.labels[i_csv].replace("_", " ")
            if args.labels and i_csv < len(args.labels)
            else csv_file.replace(".csv", "")
        )
        label += f" ({auc:.3f})"
        style = (
            args.styles[i_csv] if args.styles and i_csv < len(args.styles) else "-"
        )
        plt.plot(values * 100.0, counts, style, label=label)

    plt.xlabel("ADD threshold distance (cm)")
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

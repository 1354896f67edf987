#!/usr/bin/env python3
"""Aggregate analysis of N training runs (seed-variance studies).

Parity: reference scripts/analyze_training_multi.py:20-225 — best/median/worst
instance selection by last-half training-loss sum, per-instance and aggregate
loss plots, validation-loss comparison.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dream_tpu.analysis as dream_analysis
from dream_tpu.utils import makedirs


def analyze_training_multi(args):
    assert os.path.exists(args.input_dir)
    save_results = args.output_dir is not None
    if save_results:
        makedirs(args.output_dir, exist_ok=args.force_overwrite)

    import matplotlib

    if save_results:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dir_list = sorted(
        d for d in os.listdir(args.input_dir)
        if os.path.isdir(os.path.join(args.input_dir, d))
        and os.path.exists(os.path.join(args.input_dir, d, "training_log.pkl"))
    )
    assert dir_list, "No training instance directories with training_log.pkl found."

    all_losses_list = []
    all_validation_losses = []
    random_seeds = []
    train_epochs = None
    for d in dir_list:
        with open(os.path.join(args.input_dir, d, "training_log.pkl"), "rb") as f:
            log = pickle.load(f)
        train_epochs = log["epochs"]
        all_losses_list.append(log["losses"])
        all_validation_losses.append(log["validation_losses"])
        random_seeds.append(log["random_seed"])
        print(f"{d}: Random seed: {log['random_seed']}")

    all_losses = np.array(all_losses_list)
    all_validation_losses = np.array(all_validation_losses)
    n_traces = len(all_losses_list)
    n_epochs = len(train_epochs)

    lasthalf_sum = np.sum(all_losses[:, n_epochs // 2:], axis=1)
    x_worst = int(np.argmax(lasthalf_sum))
    x_best = int(np.argmin(lasthalf_sum))
    x_median = int(np.argsort(lasthalf_sum)[n_traces // 2])

    print("Training Loss Performance")
    print("~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~")
    print(f"Best instance for training loss: {dir_list[x_best]}")
    print(f"Median instance for training loss: {dir_list[x_median]}")
    print(f"Worst instance for training loss: {dir_list[x_worst]}")
    print("")

    fig, ax = plt.subplots()
    ax.plot(train_epochs, np.transpose(all_losses), ".-")
    for x_sel, lbl in [
        (x_worst, "Worst training result"),
        (x_best, "Best training result"),
        (x_median, "Median training result"),
    ]:
        ax.plot(train_epochs, all_losses[x_sel], "-", linewidth=8, alpha=0.667,
                label=lbl)
    ax.grid()
    plt.xlabel("Training epoch")
    plt.ylabel("Training loss")
    plt.xlim((train_epochs[0], train_epochs[-1]))
    plt.title(f"All training results ({n_traces} instances)")
    ax.legend(loc="best")
    if save_results:
        plt.savefig(os.path.join(args.output_dir, "training_results_instances.png"))

    mean, std = np.mean(all_losses, axis=0), np.std(all_losses, axis=0)
    fig, ax = plt.subplots()
    ax.fill_between(train_epochs, mean - std, mean + std, alpha=0.333,
                    label="Aggregate mean +- 1 std dev")
    ax.plot(train_epochs, mean, ".-", label="Aggregate mean")
    ax.plot(train_epochs, np.median(all_losses, axis=0), ".-", label="Aggregate median")
    ax.plot(train_epochs, np.min(all_losses, axis=0), ".-", label="Aggregate min")
    ax.plot(train_epochs, np.max(all_losses, axis=0), ".-", label="Aggregate max")
    ax.grid()
    plt.xlabel("Training epoch")
    plt.ylabel("Training loss")
    plt.xlim((train_epochs[0], train_epochs[-1]))
    plt.title(f"Aggregate (epoch-wise) training results ({n_traces} instances)")
    ax.legend(loc="best")
    if save_results:
        plt.savefig(os.path.join(args.output_dir, "training_results_aggregate.png"))
    else:
        plt.show()

    if len(all_validation_losses) > 0:
        min_per_trace = np.min(all_validation_losses, axis=1)
        x_best_valid = int(np.argmin(min_per_trace))
        x_epoch = int(np.argmin(all_validation_losses[x_best_valid]))
        print("Validation Loss Performance:")
        print("~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~")
        print(
            f"Best instance for validation loss: {dir_list[x_best_valid]} "
            f"({min_per_trace[x_best_valid]} after epoch {train_epochs[x_epoch]})"
        )
        for n in range(n_traces):
            save_path = (
                os.path.join(args.output_dir, f"train_valid_loss_{dir_list[n]}")
                if save_results else None
            )
            dream_analysis.plot_train_valid_loss(
                train_epochs, list(all_losses[n]), list(all_validation_losses[n]),
                dataset_name=dir_list[n], save_plot_path=save_path,
            )
        if not save_results:
            plt.show()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-i", "--input-dir", required=True)
    parser.add_argument("-o", "--output-dir", default=None)
    parser.add_argument("-f", "--force-overwrite", action="store_true", default=False)
    analyze_training_multi(parser.parse_args())

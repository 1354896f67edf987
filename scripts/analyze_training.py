#!/usr/bin/env python3
"""Training analysis CLI: loss plots + dataset re-analysis.

Parity: reference scripts/analyze_training.py:19-140.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dream_tpu.analysis as dream_analysis
from dream_tpu.utils import load_yaml, makedirs

LOSS_TEXT = "loss"
VIZ_TEXT = "viz"


def analyze_training(args):
    assert os.path.exists(args.input_params_path)
    input_config_path = args.input_config_path or (
        os.path.splitext(args.input_params_path)[0] + ".yaml"
    )
    assert os.path.exists(input_config_path)

    do_training_plots = LOSS_TEXT in args.analyses
    do_visualizations = VIZ_TEXT in args.analyses

    makedirs(args.output_dir, exist_ok=args.force_overwrite)

    if do_training_plots:
        training_log_path = os.path.join(
            os.path.dirname(args.input_params_path), "training_log.pkl"
        )
        with open(training_log_path, "rb") as f:
            training_log = pickle.load(f)

        dream_analysis.plot_train_valid_loss(
            training_log["epochs"],
            training_log["batch_training_losses"],
            training_log["batch_validation_losses"],
            save_plot_path=os.path.join(args.output_dir, "train_valid_loss.png"),
        )

    if do_visualizations:
        network_config = load_yaml(input_config_path)
        dataset_dir = os.path.expanduser(network_config["data_path"])
        dream_analysis.analyze_ndds_dataset(
            args.input_params_path,
            input_config_path,
            dataset_dir,
            args.output_dir,
            batch_size=args.batch_size,
            force_overwrite=True,
        )


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-i", "--input-params-path", required=True)
    parser.add_argument("-c", "--input-config-path", default=None)
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-f", "--force-overwrite", action="store_true", default=False)
    parser.add_argument(
        "-a", "--analyses", nargs="+", choices=[LOSS_TEXT, VIZ_TEXT],
        default=[LOSS_TEXT, VIZ_TEXT],
    )
    parser.add_argument("-b", "--batch-size", type=int, default=16)
    analyze_training(parser.parse_args())

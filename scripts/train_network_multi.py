#!/usr/bin/env python3
"""Run N training instances sequentially for seed-variance studies.

Parity: reference scripts/train_network_multi.py:20-68 (which shells out the
same way; its latent missing-import bug is fixed here).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dream_tpu.utils import makedirs


def train_network_multi(args):
    makedirs(args.output_dir, exist_ok=args.force_overwrite)
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)), "train_network.py")
    for n in range(args.num_instances):
        output_dir = os.path.join(args.output_dir, f"train_{n}")
        cmd = f'{sys.executable} "{script}" {args.train_command} -o "{output_dir}"'
        print(f"[train_network_multi] instance {n}: {cmd}")
        subprocess.run(cmd, shell=True, check=True)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-n", "--num-instances", type=int, required=True)
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-c", "--train-command", required=True,
                        help="Command line options passed through to train_network.py.")
    parser.add_argument("-f", "--force-overwrite", action="store_true", default=False)
    train_network_multi(parser.parse_args())

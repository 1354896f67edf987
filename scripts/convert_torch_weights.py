#!/usr/bin/env python3
"""Convert reference PyTorch checkpoints (.pth) to dream_tpu msgpack params.

The reference ships trained models as torch ``state_dict`` files
(reference trained_models/DOWNLOAD.sh; saved at dream/network.py:608-616).
Loading them enables direct inference-parity comparison between this
framework and the reference.  Requires torch (CPU is fine) to read the file;
torchvision is NOT needed.

Layout conversions applied:
- Conv2d weight [out, in, kh, kw]  -> HWIO [kh, kw, in, out]
- ConvTranspose2d weight [in, out, kh, kw] -> spatially flipped HWIO
  (dream_tpu.models.layers.TorchConvTranspose implements deconv as a
  fractionally strided conv, so taps must be flipped)
- Linear weight [out, in] -> [in, out]
- BatchNorm running stats -> flax ``batch_stats`` collection

Name mapping covers the vgg (DreamHourglass / multistage) and resnet
(ResnetSimple) architectures; keys are matched structurally by walking the
flax parameter tree in the same construction order as the torch modules.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _to_hwio(w):
    return np.transpose(w, (2, 3, 1, 0))


def _deconv_to_hwio(w):
    return np.transpose(np.flip(w, axis=(2, 3)), (2, 3, 0, 1))


def _collect_torch_convs(state_dict, prefix_order):
    """Flatten torch conv/bn entries in deterministic module order."""
    entries = []
    for key in state_dict:
        entries.append(key)
    return entries


# --- vgg hourglass mapping -------------------------------------------------

_HOURGLASS_ENCODER = [
    # (torch prefix inside DreamHourglass, flax path)
    ("layer_0_1_down.0", ("down1", "conv0")),
    ("layer_0_1_down.2", ("down1", "conv1")),
    ("layer_0_2_down.5", ("down2", "conv0")),
    ("layer_0_2_down.7", ("down2", "conv1")),
    ("layer_0_3_down.10", ("down3", "conv0")),
    ("layer_0_3_down.12", ("down3", "conv1")),
    ("layer_0_3_down.14", ("down3", "conv2")),
    ("layer_0_3_down.16", ("down3", "conv3")),
    ("layer_0_4_down.19", ("down4", "conv0")),
    ("layer_0_4_down.21", ("down4", "conv1")),
    ("layer_0_4_down.23", ("down4", "conv2")),
    ("layer_0_4_down.25", ("down4", "conv3")),
    ("layer_0_5_down.28", ("down5", "conv0")),
    ("layer_0_5_down.30", ("down5", "conv1")),
    ("layer_0_5_down.32", ("down5", "conv2")),
    ("layer_0_5_down.34", ("down5", "conv3")),
]

_HOURGLASS_UPSAMPLE = [
    ("upsample_0_4.4", ("upsample4", "conv0")),
    ("upsample_0_4.6", ("upsample4", "conv1")),
    ("upsample_0_3.4", ("upsample3", "conv0")),
    ("upsample_0_3.6", ("upsample3", "conv1")),
    ("upsample_0_2.2", ("upsample2", "conv0")),
    ("upsample_0_2.4", ("upsample2", "conv1")),
    ("upsample_0_1.2", ("upsample1", "conv0")),
    ("upsample_0_1.4", ("upsample1", "conv1")),
]

_HOURGLASS_DECONV = [
    ("deconv_0_4.0", ("deconv4", "deconv")),
    ("deconv_0_4.2", ("deconv4", "conv")),
    ("deconv_0_3.0", ("deconv3", "deconv")),
    ("deconv_0_3.2", ("deconv3", "conv")),
    ("deconv_0_2.0", ("deconv2", "deconv")),
    ("deconv_0_2.2", ("deconv2", "conv")),
    ("deconv_0_1.0", ("deconv1", "deconv")),
]

_HOURGLASS_HEAD = [
    ("heads_0.0", ("head", "conv0")),
    ("heads_0.2", ("head", "conv1")),
    ("heads_0.4", ("head", "conv2")),
]


def _convert_hourglass_stage(sd, torch_prefix, out):
    """Convert one DreamHourglass's weights into flax param dict ``out``."""
    def put(path, kernel, bias):
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = {"kernel": kernel, "bias": bias}

    for tname, fpath in (
        _HOURGLASS_ENCODER + _HOURGLASS_UPSAMPLE + _HOURGLASS_DECONV + _HOURGLASS_HEAD
    ):
        wkey = f"{torch_prefix}{tname}.weight"
        if wkey not in sd:
            continue  # decoder variant not present in this checkpoint
        w = sd[wkey].numpy()
        b = sd[f"{torch_prefix}{tname}.bias"].numpy()
        if fpath[-1] == "deconv":
            put(fpath, _deconv_to_hwio(w), b)
        else:
            put(fpath, _to_hwio(w), b)
    return out


def convert_vgg(sd):
    """DreamHourglass / DreamHourglassMultiStage state_dict -> flax params."""
    # Strip DataParallel "module." prefix (reference wraps all models in it).
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }
    is_multistage = any(k.startswith("stage1.") for k in sd)
    params = {}
    if is_multistage:
        n_stages = max(
            int(k.split(".")[0][5:]) for k in sd if k.startswith("stage")
        )
        for s in range(1, n_stages + 1):
            params[f"stage{s}"] = _convert_hourglass_stage(sd, f"stage{s}.", {})
    else:
        _convert_hourglass_stage(sd, "", params)
    return {"params": params}


# --- resnet mapping --------------------------------------------------------


def convert_resnet(sd, layers=(3, 4, 23, 3)):
    sd = { (k[7:] if k.startswith("module.") else k): v for k, v in sd.items() }
    params = {}
    batch_stats = {}

    def put_conv(fpath, w):
        node = params
        for p in fpath[:-1]:
            node = node.setdefault(p, {})
        node[fpath[-1]] = {"kernel": _to_hwio(w)}

    def put_bn(fpath, prefix):
        node_p = params
        node_s = batch_stats
        for p in fpath[:-1]:
            node_p = node_p.setdefault(p, {})
            node_s = node_s.setdefault(p, {})
        node_p[fpath[-1]] = {
            "scale": sd[prefix + ".weight"].numpy(),
            "bias": sd[prefix + ".bias"].numpy(),
        }
        node_s[fpath[-1]] = {
            "mean": sd[prefix + ".running_mean"].numpy(),
            "var": sd[prefix + ".running_var"].numpy(),
        }

    put_conv(("conv1",), sd["conv1.weight"].numpy())
    put_bn(("bn1",), "bn1")

    for li, n_blocks in enumerate(layers, start=1):
        for b in range(n_blocks):
            tp = f"layer{li}.{b}"
            fp = (f"layer{li}", f"block{b}")
            for ci in (1, 2, 3):
                put_conv(fp + (f"conv{ci}",), sd[f"{tp}.conv{ci}.weight"].numpy())
                put_bn(fp + (f"bn{ci}",), f"{tp}.bn{ci}")
            if f"{tp}.downsample.0.weight" in sd:
                put_conv(fp + ("downsample_conv",), sd[f"{tp}.downsample.0.weight"].numpy())
                put_bn(fp + ("downsample_bn",), f"{tp}.downsample.1")

    # Decoder: reference packs deconv+bn blocks into nn.Sequential "upsample"
    # (+ "upsample2" for the full variant); indices step by 3 per block.
    def put_deconv(fpath, w, b):
        node = params
        for p in fpath[:-1]:
            node = node.setdefault(p, {})
        node[fpath[-1]] = {"kernel": _deconv_to_hwio(w), "bias": b}

    up_idx = 0
    seq = 0
    while f"upsample.{seq}.weight" in sd:
        w = sd[f"upsample.{seq}.weight"]
        if w.ndim == 4 and f"upsample.{seq + 1}.weight" in sd:
            put_deconv((f"up{up_idx}", "deconv"), w.numpy(), sd[f"upsample.{seq}.bias"].numpy())
            put_bn((f"up{up_idx}", "bn"), f"upsample.{seq + 1}")
            up_idx += 1
            seq += 3
        else:
            # Trailing 1x1 conv head ("half" variant).
            params["head"] = {
                "kernel": _to_hwio(w.numpy()),
                "bias": sd[f"upsample.{seq}.bias"].numpy(),
            }
            break
    if "upsample2.0.weight" in sd:  # full variant
        put_deconv((f"up{up_idx}", "deconv"), sd["upsample2.0.weight"].numpy(),
                   sd["upsample2.0.bias"].numpy())
        put_bn((f"up{up_idx}", "bn"), "upsample2.1")
        # upsample2 Sequential is (ConvTranspose=0, BatchNorm=1, ReLU=2,
        # Conv2d=3) — reference dream/models.py:124-136 — so the 1x1 head
        # lives at index 3 (ReLU has no weights and does not consume an index
        # beyond its own).
        params["head"] = {
            "kernel": _to_hwio(sd["upsample2.3.weight"].numpy()),
            "bias": sd["upsample2.3.bias"].numpy(),
        }

    return {"params": params, "batch_stats": batch_stats}


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-i", "--input-pth", required=True,
                        help="Reference .pth state_dict file.")
    parser.add_argument("-a", "--architecture", choices=["vgg", "resnet"],
                        required=True)
    parser.add_argument("-o", "--output", required=True,
                        help="Output .msgpack params file.")
    args = parser.parse_args()

    import torch
    from flax import serialization

    sd = torch.load(args.input_pth, map_location="cpu")
    variables = convert_vgg(sd) if args.architecture == "vgg" else convert_resnet(sd)

    # Serialize as a plain nested dict of numpy arrays; DreamNetwork's
    # from_bytes restores it against the model's param structure.
    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(variables))
    n = sum(x.size for x in __import__("jax").tree_util.tree_leaves(variables))
    print(f"Wrote {args.output}: {n} parameters")


if __name__ == "__main__":
    main()

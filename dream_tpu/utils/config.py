"""YAML config IO and run determinism helpers.

The reference uses ruamel.yaml ordered-dict YAML with ``!!omap`` tags
(reference arch_configs/*.yaml, dream/network.py:48-53).  dream_tpu configs
are plain YAML maps, but :func:`load_yaml` transparently accepts the
reference's ``!!omap`` files too, so existing config/checkpoint sidecars can
be read unchanged.
"""

from __future__ import annotations

import os
import random
from typing import Any

import numpy as np
import yaml


def _omap_to_dict(node: Any) -> Any:
    """Recursively convert PyYAML's !!omap representation into dicts."""
    if isinstance(node, list):
        if node and all(
            isinstance(item, tuple) and len(item) == 2 for item in node
        ):
            return {k: _omap_to_dict(v) for k, v in node}
        return [_omap_to_dict(item) for item in node]
    if isinstance(node, dict):
        return {k: _omap_to_dict(v) for k, v in node.items()}
    return node


def load_yaml(path: str) -> dict:
    """Load YAML (plain maps or reference-style !!omap) into plain dicts."""
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return _omap_to_dict(data)


def load_yaml_str(text: str) -> dict:
    return _omap_to_dict(yaml.safe_load(text))


def save_yaml(data: dict, path: str, overwrite: bool = False) -> None:
    """Self-describing YAML sidecar writer (reference dream/network.py:592-606)."""
    if not overwrite:
        assert not os.path.exists(path), f'Output file already exists in "{path}".'
    with open(path, "w") as f:
        yaml.safe_dump(_plain(data), f, default_flow_style=False, sort_keys=False)


def _plain(node: Any) -> Any:
    """Coerce numpy scalars/arrays to YAML-safe Python types."""
    if isinstance(node, dict):
        return {k: _plain(v) for k, v in node.items()}
    if isinstance(node, (list, tuple)):
        return [_plain(v) for v in node]
    if isinstance(node, np.generic):
        return node.item()
    if isinstance(node, np.ndarray):
        return node.tolist()
    if hasattr(node, "item") and not isinstance(node, (str, bytes, bool, int, float)):
        try:
            return node.item()
        except Exception:
            return node
    return node


def set_random_seed(seed: int) -> None:
    """Seed all host RNGs (reference dream/utilities.py:15-26).

    Device-side randomness in dream_tpu flows through explicit jax PRNG keys
    derived from this seed, so no global device seeding exists (that is the
    TPU-native replacement for torch.manual_seed/cudnn.deterministic).
    """
    assert isinstance(seed, int), f'Expected "seed" to be an integer, but it is "{type(seed)}".'
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)


def makedirs(directory: str, exist_ok: bool = False) -> None:
    """Parity: reference dream/utilities.py:29-35."""
    if os.path.exists(directory):
        assert exist_ok, f'Specified directory "{directory}" already exists.'
    else:
        os.makedirs(directory)

"""Device mesh + sharding helpers: the TPU-native replacement for DataParallel.

The reference's only parallelism is single-process multi-GPU data parallelism
via ``torch.nn.DataParallel`` with config-selected ``gpu_ids``
(reference dream/network.py:244-284, training/platform/gpu_ids).  Here the
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis (batch-sharded
inputs; XLA inserts the gradient all-reduce over ICI) plus an optional
``model`` axis that shards wide conv channels (tensor parallelism the
reference never had).  Multi-host DP extends over DCN via ``jax.distributed``
with the same code path.

Config surface: ``training/platform/mesh: {data: N, model: M}`` replaces the
reference's ``gpu_ids`` list.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults to all devices on the data axis — the moral equivalent of the
    reference's "no gpu_ids => use all GPUs" (reference dream/network.py:184-185).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        assert len(devices) % n_model == 0
        n_data = len(devices) // n_model
    n_used = n_data * n_model
    assert n_used <= len(devices), (
        f"Mesh {n_data}x{n_model} needs {n_used} devices, have {len(devices)}."
    )
    dev_array = np.array(devices[:n_used]).reshape(n_data, n_model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


_MIN_SHARD_CHANNELS = 256


def param_shardings(params, mesh: Mesh):
    """Channel-shard large conv kernels over the model axis.

    Rule: a conv kernel ``[kh, kw, cin, cout]`` with ``cout`` divisible by the
    model-axis size and >= 256 shards its output channels; its bias follows.
    Everything else replicates.  With ``model=1`` this degenerates to pure DP.
    """
    n_model = mesh.shape["model"]

    def rule(path, x):
        if n_model > 1 and hasattr(x, "ndim"):
            if x.ndim == 4 and x.shape[-1] >= _MIN_SHARD_CHANNELS and x.shape[-1] % n_model == 0:
                return NamedSharding(mesh, P(None, None, None, "model"))
            if x.ndim == 1 and x.shape[0] >= _MIN_SHARD_CHANNELS and x.shape[0] % n_model == 0:
                return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh according to :func:`param_shardings`."""
    shardings = param_shardings(params, mesh)
    return jax.device_put(params, shardings)

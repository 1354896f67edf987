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


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Multi-host data parallelism over DCN: ``jax.distributed`` entry point.

    The reference has no multi-node story at all (SURVEY.md section 2.3:
    single-process DataParallel only); this is the TPU-native extension that
    scales the same training code across hosts.  Call ONCE per process,
    before any other JAX device use.  On Cloud TPU pods all three arguments
    auto-detect from the TPU metadata (pass nothing); elsewhere (e.g. a
    CPU/GPU cluster or a simulated multi-process run) pass them explicitly.

    Pod recipe (one v5e-16 pod slice, 4 hosts):

        # identical invocation on every host; JAX auto-detects its role
        python scripts/train_network.py -i DATA -m manip_configs/panda.yaml \\
            -ar arch_configs/dream_vgg_q.yaml -e 25 -b 512 -o OUT \\
            --distributed --mesh-data 16

    Each process then sees its local chips in ``jax.local_devices()`` while
    ``jax.devices()`` spans the pod; ``make_mesh`` builds the global mesh,
    batches are assembled from process-local shards
    (``process_local_batch``), and XLA routes the gradient all-reduce over
    ICI within a host and DCN across hosts.

    Returns ``{"process_index", "process_count", "local_device_count"}``.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
    }


def process_local_batch(mesh: Mesh, local_array, ndim: Optional[int] = None):
    """Assemble a globally batch-sharded array from this process's local shard.

    Single-process: a plain ``device_put`` with the batch sharding.
    Multi-process: ``jax.make_array_from_process_local_data`` — each process
    contributes ``global_batch / process_count`` rows and the result is one
    logical array sharded over the mesh's ``data`` axis (the multi-host
    analog of DataParallel's scatter, reference dream/network.py:244-284).
    """
    import jax

    ndim = ndim if ndim is not None else local_array.ndim
    sharding = NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    return jax.make_array_from_process_local_data(sharding, local_array)


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

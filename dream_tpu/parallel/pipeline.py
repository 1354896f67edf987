"""GPipe-style stage pipelining for the multistage hourglass cascade.

The reference's DreamHourglassMultiStage runs its 2-6 refinement stages
sequentially on one GPU (reference dream/models.py:350-553).  On a TPU slice
the cascade is a natural pipeline: stage ``i``'s parameters live on device
``i`` of a ``stage`` mesh axis and microbatches stream through, each hop a
single ``ppermute`` over ICI.  At steady state all stages compute
concurrently — throughput approaches ``n_stages`` x a single chip for large
batches (minus the ``(S-1)/(M+S-1)`` pipeline-bubble fraction).

TPU-native design notes:

- Stage 1 consumes a 3-channel image while stages 2+ consume
  ``concat([image, prev_belief_upsampled])`` (3 + n_kp channels).  The stage
  programs are HOMOGENIZED by zero-padding stage 1's first conv kernel to
  3 + n_kp input channels and feeding it zeros for the belief slot — the
  math is unchanged, and every device then runs the SAME compiled program
  over a stacked parameter tree sharded on the leading ``stage`` axis
  (SPMD, no per-stage branches).
- The schedule is a ``lax.scan`` over ``M + S - 1`` ticks.  At tick ``t``
  device ``s`` processes microbatch ``m = t - s`` (bubble ticks compute on
  clamped dummy input — cheaper than a ``lax.cond`` on TPU, where both
  branches of a diverging cond are materialized anyway).
- ``ppermute`` moves the x4-upsampled belief maps one hop down the chain;
  devices without a source (stage 1) receive zeros, which is exactly the
  homogenized stage-1 input contract.
- Final-stage outputs are collected by masking non-final devices to zero
  and ``psum``-ing over the axis (belief maps are small; the collective is
  negligible next to the stage conv stacks).

Inference-only: training the cascade this way needs the backward schedule
(1F1B) — tracked in NEXT_STEPS.md.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dream_tpu.models.layers import upsample_nearest


def make_pipeline_mesh(n_stages: int, devices=None) -> Mesh:
    """1-D mesh with a ``stage`` axis of size ``n_stages``."""
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_stages, (
        f"Pipeline over {n_stages} stages needs {n_stages} devices, "
        f"have {len(devices)}."
    )
    return Mesh(np.array(devices[:n_stages]), axis_names=("stage",))


def _stack_stage_params(variables, n_stages: int, n_keypoints: int):
    """Stack per-stage param subtrees along a leading ``stage`` axis.

    Zero-pads stage 1's first conv kernel from 3 to ``3 + n_keypoints``
    input channels so all stages share one pytree structure/shape.
    """
    stages = []
    for i in range(n_stages):
        sub = jax.tree_util.tree_map(lambda x: x, variables["params"][f"stage{i + 1}"])
        if i == 0:
            k = sub["down1"]["conv0"]["kernel"]  # [3, 3, 3, 64]
            pad = jnp.zeros(k.shape[:2] + (n_keypoints, k.shape[3]), k.dtype)
            sub["down1"]["conv0"]["kernel"] = jnp.concatenate([k, pad], axis=2)
        stages.append(sub)
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)


def pipeline_multistage_inference(
    model,
    variables,
    mesh: Optional[Mesh] = None,
    n_microbatches: int = 4,
):
    """Build a jitted ``fn(images) -> final-stage belief maps`` that runs the
    multistage cascade as a stage-parallel pipeline over ``mesh``.

    Args:
      model: a ``DreamHourglassMultiStage`` (default decoder: quarter-res
        upsample, no internal soft-argmax — the shipped multistage config).
      variables: its ``{"params": ...}`` pytree.
      mesh: a ``stage``-axis mesh (default: :func:`make_pipeline_mesh`).
      n_microbatches: batch is split into this many pipeline microbatches;
        must divide the batch size.

    Returns ``(fn, mesh)``.
    """
    from dream_tpu.models.hourglass import DreamHourglass

    assert not model.deconv_decoder and not model.full_output, (
        "Pipeline supports the default quarter-resolution upsample decoder."
    )
    assert not model.internalize_spatial_softmax, (
        "Pipeline emits belief maps; decode peaks downstream."
    )
    S = model.n_stages
    K = model.n_keypoints
    M = n_microbatches
    mesh = mesh if mesh is not None else make_pipeline_mesh(S)
    assert mesh.shape["stage"] == S, (mesh.shape, S)

    stage_module = DreamHourglass(
        n_keypoints=K,
        n_image_input_channels=3 + K,
        internalize_spatial_softmax=False,
        learned_beta=model.learned_beta,
        initial_beta=model.initial_beta,
        skip_connections=model.skip_connections,
        deconv_decoder=False,
        full_output=False,
        dtype=model.dtype,
    )

    stacked = _stack_stage_params(variables, S, K)
    stacked = jax.device_put(
        stacked,
        jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P("stage")), stacked
        ),
    )
    param_specs = jax.tree_util.tree_map(lambda _: P("stage"), stacked)

    def pipe(params_stacked, images_mb):
        # params_stacked leaves: [1, ...] (this device's stage); images_mb:
        # [M, mb, H, W, 3] (replicated on every stage device).
        params = jax.tree_util.tree_map(lambda x: x[0], params_stacked)
        s = jax.lax.axis_index("stage")
        mb, h, w = images_mb.shape[1], images_mb.shape[2], images_mb.shape[3]

        def tick(state, t):
            m = t - s
            img = images_mb[jnp.clip(m, 0, M - 1)]
            x_in = jnp.concatenate([img, state], axis=-1)
            belief = stage_module.apply({"params": params}, x_in)[0]
            nxt = jax.lax.ppermute(
                upsample_nearest(belief, 4).astype(images_mb.dtype),
                "stage",
                [(i, i + 1) for i in range(S - 1)],
            )
            active_last = ((m >= 0) & (m < M)) & (s == S - 1)
            out = jnp.where(active_last, belief, jnp.zeros_like(belief))
            return nxt, out

        state0 = jnp.zeros((mb, h, w, K), images_mb.dtype)
        _, ys = jax.lax.scan(tick, state0, jnp.arange(M + S - 1))
        # Everyone but the last stage contributed zeros; psum replicates the
        # final-stage stream to all devices.
        return jax.lax.psum(ys, "stage")

    sharded_pipe = jax.jit(
        jax.shard_map(
            pipe,
            mesh=mesh,
            in_specs=(param_specs, P()),
            out_specs=P(),
            check_vma=False,
        )
    )

    def fn(images):
        B, h, w, c = images.shape
        assert B % M == 0, f"Batch {B} must divide into {M} microbatches."
        mb = B // M
        images_mb = images.reshape(M, mb, h, w, c)
        ys = sharded_pipe(stacked, images_mb)
        # Microbatch m exits the last stage at tick t = m + S - 1.
        out = ys[S - 1 : S - 1 + M]  # [M, mb, h/4, w/4, K]
        return out.reshape(B, out.shape[2], out.shape[3], K)

    return fn, mesh

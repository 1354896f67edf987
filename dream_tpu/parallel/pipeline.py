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

Training runs the same schedule differentiated end to end: the loss is the
reference's all-stage criterion (every stage's output against the broadcast
target, reference dream/network.py:345-356) accumulated across active ticks,
and ``jax.grad`` through the ``shard_map``/``scan``/``ppermute`` program IS
the reversed pipeline — the scan transpose walks ticks backward and the
``ppermute`` transpose carries belief-map cotangents one hop UP the chain
over ICI, so each device computes exactly its own stage's backward work
(GPipe's all-forward-then-all-backward schedule; with ``remat=True`` stage
activations are rematerialized in the backward pass, which is what bounds
live memory the way 1F1B's interleaving does).  Gradient parity against the
sequential model is pinned by tests/test_pipeline.py.
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


def _stage_module(model):
    """The homogenized per-stage module: every stage consumes
    ``3 + n_keypoints`` input channels (stage 1's extra channels are fed
    zeros against a zero-padded first conv kernel — same math)."""
    from dream_tpu.models.hourglass import DreamHourglass

    return DreamHourglass(
        n_keypoints=model.n_keypoints,
        n_image_input_channels=3 + model.n_keypoints,
        internalize_spatial_softmax=False,
        learned_beta=model.learned_beta,
        initial_beta=model.initial_beta,
        skip_connections=model.skip_connections,
        deconv_decoder=False,
        full_output=False,
        dtype=model.dtype,
    )


def unstack_stage_params(stacked, n_keypoints: int):
    """Inverse of :func:`_stack_stage_params`: a stage-stacked pytree back to
    the sequential model's ``variables["params"]`` structure.

    Slices the zero-pad channels off stage 1's first conv kernel.  Applied to
    gradients this is exact: the padded input channels are identically zero
    for stage 1, so their kernel slots receive zero gradient.
    """
    n_stages = jax.tree_util.tree_leaves(stacked)[0].shape[0]
    params = {}
    for i in range(n_stages):
        sub = jax.tree_util.tree_map(lambda x: x[i], stacked)
        if i == 0:
            k = sub["down1"]["conv0"]["kernel"]  # [kh, kw, 3 + n_kp, 64]
            sub["down1"]["conv0"]["kernel"] = k[:, :, : k.shape[2] - n_keypoints]
        params[f"stage{i + 1}"] = sub
    return params


def _loss_terms(loss_config):
    """Per-element (numerator, denominator) terms whose psum'd ratio equals
    the sequential all-stage criterion (dream_tpu/network.py loss_fn) exactly
    — including weighted MSE, whose weight-sum normalizer does NOT decompose
    as a mean over microbatches."""
    loss_type = loss_config.get("type", "mse") if loss_config else "mse"
    if loss_type == "weighted_mse":
        pos_weight = float(loss_config["pos_weight"])

        def terms(pred, target):
            w = 1.0 + (pos_weight - 1.0) * jnp.clip(target, 0.0, 1.0)
            return jnp.sum(w * (pred - target) ** 2), jnp.sum(w)

    elif loss_type == "huber":

        def terms(pred, target):
            d = jnp.abs(pred - target)
            num = jnp.sum(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))
            return num, jnp.asarray(float(pred.size), jnp.float32)

    else:
        assert loss_type == "mse", loss_type

        def terms(pred, target):
            return (
                jnp.sum((pred - target) ** 2),
                jnp.asarray(float(pred.size), jnp.float32),
            )

    return terms


def pipeline_multistage_value_and_grad(
    model,
    variables,
    mesh: Optional[Mesh] = None,
    n_microbatches: int = 4,
    loss_config=None,
    remat: bool = True,
):
    """Build the pipelined training loss and its gradient.

    Returns ``(value_and_grad_fn, stacked_params, mesh)`` where
    ``value_and_grad_fn(stacked_params, images, targets) -> (loss, grads)``:

    - ``images``: ``[B, H, W, 3]`` net input (B divisible by
      ``n_microbatches``);
    - ``targets``: ``[B, ho, wo, n_kp]`` NHWC belief-map targets at the net
      output resolution;
    - ``loss`` equals the sequential model's all-stage criterion
      (reference dream/network.py:345-356 semantics) bit-for-bit up to
      reduction order;
    - ``grads`` is stage-stacked (same structure as ``stacked_params``);
      :func:`unstack_stage_params` maps it back to the sequential layout.

    The forward is the GPipe tick schedule; the backward is its ``jax.grad``
    transpose (reversed ticks, ``ppermute`` cotangents flowing up the
    chain).  ``remat=True`` wraps each stage apply in ``jax.checkpoint`` so
    backward recomputes stage activations instead of keeping all
    ``M + S - 1`` ticks' internals live.
    """
    assert not model.deconv_decoder and not model.full_output, (
        "Pipeline supports the default quarter-resolution upsample decoder."
    )
    S = model.n_stages
    K = model.n_keypoints
    M = n_microbatches
    mesh = mesh if mesh is not None else make_pipeline_mesh(S)
    assert mesh.shape["stage"] == S, (mesh.shape, S)

    stage_module = _stage_module(model)
    terms = _loss_terms(loss_config)

    def stage_apply(params, x_in):
        return stage_module.apply({"params": params}, x_in)[0]

    if remat:
        stage_apply = jax.checkpoint(stage_apply)

    stacked = _stack_stage_params(variables, S, K)
    stacked = jax.device_put(
        stacked,
        jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P("stage")), stacked
        ),
    )
    param_specs = jax.tree_util.tree_map(lambda _: P("stage"), stacked)

    def pipe_loss(params_stacked, images_mb, targets_mb):
        # params_stacked leaves: [1, ...]; images_mb: [M, mb, H, W, 3] and
        # targets_mb: [M, mb, ho, wo, K], both replicated on every device.
        params = jax.tree_util.tree_map(lambda x: x[0], params_stacked)
        s = jax.lax.axis_index("stage")
        mb, h, w = images_mb.shape[1], images_mb.shape[2], images_mb.shape[3]

        def tick(state, t):
            belief_in, num_acc, den_acc = state
            m = t - s
            mc = jnp.clip(m, 0, M - 1)
            img = images_mb[mc]
            tgt = targets_mb[mc].astype(jnp.float32)
            x_in = jnp.concatenate([img, belief_in], axis=-1)
            belief = stage_apply(params, x_in)
            active = ((m >= 0) & (m < M)).astype(jnp.float32)
            num, den = terms(belief.astype(jnp.float32), tgt)
            nxt = jax.lax.ppermute(
                upsample_nearest(belief, 4).astype(images_mb.dtype),
                "stage",
                [(i, i + 1) for i in range(S - 1)],
            )
            return (nxt, num_acc + active * num, den_acc + active * den), None

        state0 = (
            jnp.zeros((mb, h, w, K), images_mb.dtype),
            jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32),
        )
        (_, num_total, den_total), _ = jax.lax.scan(
            tick, state0, jnp.arange(M + S - 1)
        )
        return jax.lax.psum(num_total, "stage") / jax.lax.psum(
            den_total, "stage"
        )

    sharded_loss = jax.shard_map(
        pipe_loss,
        mesh=mesh,
        in_specs=(param_specs, P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def value_and_grad_fn(params_stacked, images, targets):
        B = images.shape[0]
        mb = B // M
        images_mb = images.reshape((M, mb) + images.shape[1:])
        targets_mb = targets.reshape((M, mb) + targets.shape[1:])
        return jax.value_and_grad(sharded_loss)(
            params_stacked, images_mb, targets_mb
        )

    return value_and_grad_fn, stacked, mesh


def pipeline_multistage_train_step(
    model,
    variables,
    optimizer,
    mesh: Optional[Mesh] = None,
    n_microbatches: int = 4,
    loss_config=None,
    remat: bool = True,
):
    """Full pipelined training step: loss + reversed-pipeline backward +
    optax update, parameters and optimizer state resident stage-sharded.

    Returns ``(step_fn, state)``: ``state = {"params": stacked, "opt_state":
    ...}`` and ``step_fn(state, images, targets) -> (state, loss)``.  Recover
    sequential-layout parameters with
    ``unstack_stage_params(state["params"], model.n_keypoints)``.
    """
    import optax

    value_and_grad_fn, stacked, mesh = pipeline_multistage_value_and_grad(
        model, variables, mesh, n_microbatches, loss_config, remat
    )
    opt_state = optimizer.init(stacked)

    @jax.jit
    def step_fn(state, images, targets):
        loss, grads = value_and_grad_fn(state["params"], images, targets)
        updates, opt_state = optimizer.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt_state": opt_state}, loss

    return step_fn, {"params": stacked, "opt_state": opt_state}


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

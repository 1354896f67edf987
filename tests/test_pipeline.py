"""Stage-pipeline parallelism tests (virtual 8-device CPU mesh).

The multistage cascade as a GPipe-style pipeline over a ``stage`` mesh axis
must reproduce the sequential model's final-stage belief maps exactly
(same params, same math — the stage-1 homogenization is a zero-pad).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_tpu.models.hourglass import DreamHourglassMultiStage
from dream_tpu.parallel.pipeline import (
    make_pipeline_mesh,
    pipeline_multistage_inference,
)


@pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 2)])
def test_pipeline_matches_sequential(n_stages, n_micro):
    model = DreamHourglassMultiStage(n_keypoints=4, n_stages=n_stages)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    sequential = model.apply(variables, x)[-1]

    fn, mesh = pipeline_multistage_inference(
        model, variables, n_microbatches=n_micro
    )
    assert mesh.shape["stage"] == n_stages
    pipelined = fn(x)

    assert pipelined.shape == sequential.shape
    np.testing.assert_allclose(
        np.asarray(pipelined), np.asarray(sequential), atol=1e-5, rtol=1e-5
    )


def test_pipeline_params_actually_staged():
    """The stacked parameter tree must land sharded over the stage axis."""
    model = DreamHourglassMultiStage(n_keypoints=4, n_stages=2)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    fn, mesh = pipeline_multistage_inference(model, variables, n_microbatches=2)
    # Rebuild the stacked tree the same way and check placement via the fn's
    # closed-over params: run once, then inspect a device buffer count.
    from dream_tpu.parallel.pipeline import _stack_stage_params

    stacked = _stack_stage_params(variables, 2, 4)
    from jax.sharding import NamedSharding, PartitionSpec as P

    placed = jax.device_put(
        stacked,
        jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P("stage")), stacked),
    )
    leaf = jax.tree_util.tree_leaves(placed)[0]
    assert len(leaf.sharding.device_set) == 2
    # Each device holds exactly one stage's slice.
    shard_shapes = {s.data.shape for s in leaf.addressable_shards}
    assert all(shape[0] == 1 for shape in shard_shapes)


def test_pipeline_rejects_unsupported_configs():
    model = DreamHourglassMultiStage(
        n_keypoints=4, n_stages=2, deconv_decoder=True
    )
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    with pytest.raises(AssertionError):
        pipeline_multistage_inference(model, variables)


def test_network_pipeline_inference_matches_sequential():
    """DreamNetwork.enable_pipeline_inference reproduces the sequential
    inference (belief maps AND decoded keypoints)."""
    from dream_tpu.network import DreamNetwork
    from tests.test_network import _vgg_config

    cfg = _vgg_config(n_stages=2)
    net = DreamNetwork(cfg)
    net.init_variables(seed=3)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32))

    belief_seq, kp_seq = net.inference(x)
    belief_seq, kp_seq = np.asarray(belief_seq), np.asarray(kp_seq)

    mesh = net.enable_pipeline_inference(n_microbatches=2)
    assert mesh.shape["stage"] == 2
    belief_pipe, kp_pipe = net.inference(x)

    np.testing.assert_allclose(
        np.asarray(belief_pipe), belief_seq, atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(kp_pipe), kp_seq, atol=1e-4)


@pytest.mark.parametrize(
    "loss_cfg",
    [{"type": "mse"}, {"type": "weighted_mse", "pos_weight": 25.0}],
)
def test_pipeline_gradient_parity(loss_cfg):
    """Pipelined training (GPipe forward + AD-reversed backward) must produce
    the SAME loss and per-stage gradients as the sequential all-stage
    criterion (reference dream/network.py:345-356 semantics)."""
    from dream_tpu.parallel.pipeline import (
        pipeline_multistage_value_and_grad,
        unstack_stage_params,
    )

    n_stages, n_micro, n_kp = 2, 4, 4
    model = DreamHourglassMultiStage(n_keypoints=n_kp, n_stages=n_stages)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
    targets = jnp.asarray(
        np.abs(rng.randn(8, 16, 16, n_kp)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(1), x[:1])

    if loss_cfg["type"] == "weighted_mse":
        pw = loss_cfg["pos_weight"]

        def criterion(pred, target):
            w = 1.0 + (pw - 1.0) * jnp.clip(target, 0.0, 1.0)
            return jnp.sum(w * (pred - target) ** 2) / jnp.sum(w)
    else:
        def criterion(pred, target):
            return jnp.mean((pred - target) ** 2)

    def sequential_loss(params):
        outputs = model.apply({"params": params}, x)
        stacked = jnp.stack(outputs).astype(jnp.float32)
        tgt = jnp.broadcast_to(targets.astype(jnp.float32), stacked.shape)
        return criterion(stacked, tgt)

    loss_seq, grads_seq = jax.value_and_grad(sequential_loss)(
        variables["params"]
    )

    vg_fn, stacked_params, mesh = pipeline_multistage_value_and_grad(
        model, variables, n_microbatches=n_micro, loss_config=loss_cfg,
    )
    assert mesh.shape["stage"] == n_stages
    loss_pipe, grads_stacked = vg_fn(stacked_params, x, targets)
    grads_pipe = unstack_stage_params(grads_stacked, n_kp)

    np.testing.assert_allclose(
        float(loss_pipe), float(loss_seq), rtol=1e-5
    )
    flat_seq = jax.tree_util.tree_leaves_with_path(grads_seq)
    flat_pipe = dict(
        jax.tree_util.tree_leaves_with_path(grads_pipe)
    )
    assert len(flat_seq) == len(flat_pipe)
    for path, leaf_seq in flat_seq:
        leaf_pipe = flat_pipe[path]
        np.testing.assert_allclose(
            np.asarray(leaf_pipe), np.asarray(leaf_seq),
            atol=2e-5, rtol=2e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_pipeline_train_step_learns():
    """The full pipelined train step (stage-sharded params + optax state)
    reduces the loss on a fixed batch."""
    import optax

    from dream_tpu.parallel.pipeline import (
        pipeline_multistage_train_step,
        unstack_stage_params,
    )

    model = DreamHourglassMultiStage(n_keypoints=3, n_stages=2)
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(4, 64, 64, 3).astype(np.float32))
    targets = jnp.asarray(
        np.abs(rng.randn(4, 16, 16, 3)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), x[:1])

    step, state = pipeline_multistage_train_step(
        model, variables, optax.adam(1e-3), n_microbatches=2,
        loss_config={"type": "mse"},
    )
    losses = []
    for _ in range(5):
        state, loss = step(state, x, targets)
        losses.append(float(loss))
    assert losses[-1] < losses[0]

    # Round-trip: updated stage-stacked params map back to the sequential
    # layout and still drive the sequential model.
    params = unstack_stage_params(state["params"], 3)
    out = model.apply({"params": params}, x)
    assert out[-1].shape == (4, 16, 16, 3)

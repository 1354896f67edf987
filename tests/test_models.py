"""Model zoo shape tests.

The reference verifies forward shapes via __main__ smoke tests on CUDA
(reference dream/models.py:830-962); here the same coverage runs as fast CPU
pytest using jax.eval_shape (no FLOPs) for the 400x400 cases plus one real
tiny forward per architecture family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dream_tpu import models
from dream_tpu.utils import resolutions as res


def _eval_output_shapes(model, input_shape, **apply_kwargs):
    """init + eval_shape without running any real compute."""
    x = jnp.zeros(input_shape, dtype=jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x, **apply_kwargs)
    )
    out = jax.eval_shape(
        lambda v: model.apply(v, x, **apply_kwargs), variables
    )
    return out


@pytest.mark.parametrize(
    "deconv,full_output,expected",
    [
        (False, False, (100, 100)),  # vgg-Q
        (True, False, (400, 400)),  # vgg-F (deconv)
        (False, True, (400, 400)),  # full_output upsample
    ],
)
def test_hourglass_output_shapes_400(deconv, full_output, expected):
    model = models.DreamHourglass(
        n_keypoints=7, deconv_decoder=deconv, full_output=full_output
    )
    out = _eval_output_shapes(model, (2, 400, 400, 3))
    assert out[0].shape == (2, expected[1], expected[0], 7)
    # Analytic resolution function must agree.
    assert res.vgg_output_resolution(
        (400, 400), deconv_decoder=deconv, full_output=full_output
    ) == expected


def test_hourglass_real_forward_tiny():
    model = models.DreamHourglass(n_keypoints=3)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out[0].shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(out[0])))


@pytest.mark.parametrize("n_stages", [1, 2, 3, 6])
def test_multistage_output_shapes(n_stages):
    model = models.DreamHourglassMultiStage(n_keypoints=7, n_stages=n_stages)
    out = _eval_output_shapes(model, (1, 400, 400, 3))
    assert len(out) == n_stages
    for stage_out in out:
        assert stage_out.shape == (1, 100, 100, 7)


def test_multistage_real_forward_tiny():
    model = models.DreamHourglassMultiStage(n_keypoints=2, n_stages=2)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert len(out) == 2
    assert out[-1].shape == (1, 16, 16, 2)


def test_hourglass_spatial_softmax_head():
    model = models.DreamHourglass(
        n_keypoints=3, internalize_spatial_softmax=True, learned_beta=True
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert len(out) == 2
    assert out[1].shape == (1, 3, 2)  # (x, y) per keypoint


@pytest.mark.parametrize(
    "full,expected", [(False, (208, 208)), (True, (416, 416))]
)
def test_resnet_output_shapes(full, expected):
    model = models.ResnetSimple(n_keypoints=7, full=full)
    out = _eval_output_shapes(model, (1, 400, 400, 3), train=False)
    assert out[0].shape == (1, expected[1], expected[0], 7)
    assert res.resnet_output_resolution((400, 400), full=full) == expected


def test_resnet_real_forward_tiny():
    # Use a shallow resnet config for speed; the block arithmetic is identical.
    model = models.ResnetSimple(n_keypoints=3, layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out[0].shape == (1, 32, 32, 3)

    # Training mode must update batch_stats.
    out2, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated


def test_dope_output_shapes():
    model = models.DopeNetworkBelief(n_keypoints=7, stage_out=6)
    out = _eval_output_shapes(model, (1, 400, 400, 3))
    assert len(out) == 6
    for o in out:
        assert o.shape == (1, 50, 50, 7)  # 1/8 resolution


def test_dope_stage_out_truncation():
    model = models.DopeNetworkBelief(n_keypoints=4, stage_out=2)
    out = _eval_output_shapes(model, (1, 64, 64, 3))
    assert len(out) == 2


def test_torch_conv_transpose_shapes():
    # k3 s2 p1 op1 doubles; k4 s2 p1 doubles (torch arithmetic).
    x = jnp.zeros((1, 13, 13, 8))
    for k, p, op in [(3, 1, 1), (4, 1, 0)]:
        layer = models.TorchConvTranspose(
            4, kernel_size=k, stride=2, padding=p, output_padding=op
        )
        v = layer.init(jax.random.PRNGKey(0), x)
        y = layer.apply(v, x)
        assert y.shape == (1, 26, 26, 4)


def test_torch_conv_transpose_matches_torch():
    """Value parity with torch.nn.ConvTranspose2d given converted weights."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    x = rng.randn(1, 8, 13, 13).astype(np.float32)  # NCHW for torch

    for k, p, op in [(3, 1, 1), (4, 1, 0)]:
        tlayer = torch.nn.ConvTranspose2d(8, 4, k, stride=2, padding=p, output_padding=op)
        with torch.no_grad():
            ty = tlayer(torch.from_numpy(x)).numpy()

        # Convert torch weight [in, out, kh, kw] -> flipped HWIO.
        tw = tlayer.weight.detach().numpy()
        kernel = np.flip(tw, axis=(2, 3)).transpose(2, 3, 0, 1)
        bias = tlayer.bias.detach().numpy()

        layer = models.TorchConvTranspose(
            4, kernel_size=k, stride=2, padding=p, output_padding=op
        )
        variables = {"params": {"kernel": jnp.array(kernel.copy()), "bias": jnp.array(bias)}}
        y = layer.apply(variables, jnp.array(x.transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(y), ty.transpose(0, 2, 3, 1), atol=1e-4
        )

"""int8 post-training quantization (models/quant.py + enable_int8_inference).

dream_tpu extension — the reference is fp32 end-to-end.  These tests pin the
quantization arithmetic exactly (manual numpy oracle), the calibration
bookkeeping, parameter-tree compatibility with float checkpoints, and the
network-facade integration.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_tpu.models import DreamHourglass
from dream_tpu.models.quant import QuantConv
from dream_tpu.network import DreamNetwork


def _quantize_ref(x, kernel, bias, amax):
    """Numpy oracle for QuantConv's int8 path (3x3, pad 1)."""
    s_x = max(amax, 1e-12) / 127.0
    x_q = np.clip(np.round(x / s_x), -127, 127).astype(np.int32)
    s_w = np.maximum(np.abs(kernel).max(axis=(0, 1, 2)), 1e-12) / 127.0
    w_q = np.clip(np.round(kernel / s_w), -127, 127).astype(np.int32)
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    xp = np.pad(x_q, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((b, h, w, co), np.int64)
    for dy in range(3):
        for dx in range(3):
            patch = xp[:, dy : dy + h, dx : dx + w, :]
            out += np.einsum("bhwc,co->bhwo", patch, w_q[dy, dx]).astype(np.int64)
    return out.astype(np.float32) * (s_x * s_w) + bias


def test_quantconv_int8_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 8, 8, 5), minval=-2.0, maxval=2.0)
    conv = QuantConv(7, kernel_size=3, padding=1, mode="int8")
    variables = conv.init(key, x)
    amax = 1.7
    variables = {
        "params": variables["params"],
        "quant": {"act_amax": jnp.asarray(amax, jnp.float32)},
    }
    got = np.asarray(conv.apply(variables, x))
    want = _quantize_ref(
        np.asarray(x, np.float64),
        np.asarray(variables["params"]["kernel"], np.float64),
        np.asarray(variables["params"]["bias"], np.float64),
        amax,
    )
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_quantconv_calibration_records_running_amax():
    key = jax.random.PRNGKey(1)
    conv = QuantConv(4, mode="calibrate")
    x1 = jnp.full((1, 4, 4, 3), 0.5)
    x2 = jnp.full((1, 4, 4, 3), -3.25)
    variables = conv.init(key, x1)
    assert float(variables["quant"]["act_amax"]) == 0.0  # init records nothing
    _, mut = conv.apply(variables, x1, mutable=["quant"])
    assert float(mut["quant"]["act_amax"]) == pytest.approx(0.5)
    _, mut = conv.apply(
        {"params": variables["params"], "quant": mut["quant"]}, x2,
        mutable=["quant"],
    )
    assert float(mut["quant"]["act_amax"]) == pytest.approx(3.25)
    # Calibrate-mode forward == plain float conv (bias included).
    y, _ = conv.apply(variables, x1, mutable=["quant"])
    ref = jax.lax.conv_general_dilated(
        x1, variables["params"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + variables["params"]["bias"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-6)


def test_hourglass_quant_param_tree_matches_float_model():
    """A float-trained checkpoint must load into the quant model unchanged."""
    model = DreamHourglass(n_keypoints=3)
    x = jnp.zeros((1, 32, 32, 3))
    float_params = model.init(jax.random.PRNGKey(0), x)["params"]
    calib = dataclasses.replace(model, quant_mode="calibrate")
    qvars = calib.init(jax.random.PRNGKey(0), x)
    float_tree = jax.tree.structure(float_params)
    quant_tree = jax.tree.structure(qvars["params"])
    assert float_tree == quant_tree
    for (pf, lf), (pq, lq) in zip(
        jax.tree_util.tree_leaves_with_path(float_params),
        jax.tree_util.tree_leaves_with_path(qvars["params"]),
    ):
        assert pf == pq and lf.shape == lq.shape
    # One amax per quantized conv; the head's output conv is NOT quantized.
    amaxes = jax.tree.leaves(qvars["quant"])
    assert len(amaxes) == 22  # 16 encoder + 4 decoder + 2 head convs
    flat = jax.tree_util.tree_flatten_with_path(qvars["quant"])[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert not any("conv2" in n and "head" in n for n in names)


def test_hourglass_int8_output_tracks_float():
    model = DreamHourglass(n_keypoints=3)
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 32, 32, 3), minval=-1, maxval=1)
    variables = model.init(key, x)
    ref = np.asarray(model.apply(variables, x)[-1])

    calib = dataclasses.replace(model, quant_mode="calibrate")
    q0 = calib.init(key, x)["quant"]
    _, mut = calib.apply(
        {"params": variables["params"], "quant": q0}, x, mutable=["quant"]
    )
    int8_model = dataclasses.replace(model, quant_mode="int8")
    got = np.asarray(
        int8_model.apply(
            {"params": variables["params"], "quant": mut["quant"]}, x
        )[-1]
    )
    assert got.shape == ref.shape
    # Random-init outputs are tiny, so pin correlation + relative-to-peak
    # error rather than absolute tolerance.
    cc = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert cc > 0.99
    # Random-init activations are the PTQ worst case (no dominant signal);
    # trained checkpoints track far tighter (held-out eval in DEMO.md).
    assert np.abs(got - ref).max() < 0.2 * np.abs(ref).max()


def _vgg_config(net_input=(64, 64)):
    return {
        "architecture": {
            "type": "vgg",
            "target": "belief_maps",
            "input_heads": ["image_rgb"],
            "output_heads": ["belief_maps"],
            "image_normalization": {"mean": [0.5] * 3, "stdev": [0.5] * 3},
            "loss": {"type": "mse"},
            "image_preprocessing": "shrink-and-crop",
        },
        "manipulator": {
            "name": "panda",
            "keypoints": [
                {"name": f"kp{i}", "friendly_name": f"KP{i}"} for i in range(4)
            ],
        },
        "training": {
            "config": {
                "net_input_resolution": list(net_input),
                "optimizer": {"type": "adam", "learning_rate": 1e-3},
            },
            "platform": {},
        },
    }


def test_network_enable_int8_inference():
    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)
    float_belief, float_kps = net.inference(jnp.zeros((1, 64, 64, 3)))

    rng = np.random.RandomState(0)
    calib = [
        jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
        for _ in range(2)
    ]
    qvars = net.enable_int8_inference(calib)
    assert len(jax.tree.leaves(qvars)) == 22
    belief, kps = net.inference(jnp.zeros((1, 64, 64, 3)))
    assert belief.shape == float_belief.shape
    assert kps.shape == float_kps.shape
    # Detailed path is overridden too.
    b2, k2, scores, best = net.inference_detailed(jnp.zeros((1, 64, 64, 3)))
    assert scores.shape == (1, 4) and best.shape == (1, 4, 2)

def test_int8_impl_env_validation(monkeypatch):
    """DREAM_INT8_IMPL: unknown values raise (not assert — must survive
    ``python -O``), and an explicit chain override the architecture/backend
    can't honor warns before downgrading to quantconv instead of silently
    benchmarking the wrong graph."""
    import warnings as _warnings

    rng = np.random.RandomState(2)
    calib = [
        jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    ]

    monkeypatch.setenv("DREAM_INT8_IMPL", "bogus")
    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)
    with pytest.raises(ValueError, match="DREAM_INT8_IMPL"):
        net.enable_int8_inference(calib)

    # chain_ok is false on CPU, so an explicit 'xla_chain' must warn and
    # fall back.
    monkeypatch.setenv("DREAM_INT8_IMPL", "xla_chain")
    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        net.enable_int8_inference(calib)
    assert any("falling back" in str(w.message) for w in caught)
    assert net._int8_impl == "quantconv"


def test_network_enable_int8_inference_resnet():
    """resnet goes through the BN-folded deploy graph (resnet_deploy.py)."""
    cfg = _vgg_config()
    cfg["architecture"]["type"] = "resnet"
    cfg["architecture"]["layers"] = [1, 1, 1, 1]  # small trunk for CPU
    net = DreamNetwork(cfg)
    net.init_variables(seed=0)
    float_belief, float_kps = net.inference(jnp.zeros((1, 64, 64, 3)))

    rng = np.random.RandomState(1)
    calib = [
        jnp.asarray(rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32))
    ]
    net.enable_int8_inference(calib)
    belief, kps = net.inference(jnp.zeros((1, 64, 64, 3)))
    assert belief.shape == float_belief.shape
    assert kps.shape == float_kps.shape


def test_resnet_bn_fold_exact():
    """Deploy model (float mode) must reproduce the BN model's inference."""
    from dream_tpu.models.resnet_deploy import (
        ResnetSimpleDeploy, fold_batchnorm_resnet,
    )
    from dream_tpu.models.resnet_simple import ResnetSimple

    model = ResnetSimple(n_keypoints=3, layers=(1, 1, 1, 1))
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-1, maxval=1)
    variables = model.init(key, x, train=False)
    # Randomize the BN statistics/affine params so the fold is non-trivial.
    leaves, treedef = jax.tree.flatten(variables)
    rngs = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [
        l + 0.3 * jax.random.uniform(r, l.shape) if l.ndim == 1 else l
        for l, r in zip(leaves, rngs)
    ]
    variables = jax.tree.unflatten(treedef, leaves)
    # BN var must stay positive.
    variables = jax.tree_util.tree_map(jnp.abs, variables)

    ref = np.asarray(model.apply(variables, x, train=False)[0])
    deploy = ResnetSimpleDeploy(n_keypoints=3, layers=(1, 1, 1, 1), mode="float")
    folded = fold_batchnorm_resnet(variables)
    got = np.asarray(deploy.apply(folded, x)[0])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# QAT (quant_mode='qat'): fake-quant forward + STE gradients.


def test_quantconv_qat_matches_int8_numerics():
    """With the int8 path's amax set to the batch amax (qat's dynamic
    choice), the qat forward must reproduce the int8 forward — same integer
    grid, float vs int32 accumulation only."""
    key = jax.random.PRNGKey(4)
    x = jax.random.uniform(key, (2, 8, 8, 5), minval=-2.0, maxval=2.0)
    qat = QuantConv(7, kernel_size=3, padding=1, mode="qat")
    variables = qat.init(key, x)
    assert "quant" not in variables  # qat is stateless
    got = np.asarray(qat.apply(variables, x))

    int8 = QuantConv(7, kernel_size=3, padding=1, mode="int8")
    int8_vars = {
        "params": variables["params"],
        "quant": {"act_amax": jnp.max(jnp.abs(x)).astype(jnp.float32)},
    }
    want = np.asarray(int8.apply(int8_vars, x))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_quantconv_qat_gradients_flow_like_float():
    """STE: gradients through the fake-quant conv are finite, nonzero, and
    near-parallel to the plain float conv's gradients."""
    key = jax.random.PRNGKey(5)
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 8, 8, 3), minval=-1, maxval=1)
    qat = QuantConv(4, mode="qat")
    variables = qat.init(key, x)
    flt = QuantConv(4, mode="float")

    def loss(mode_conv, params, xx):
        return jnp.sum(mode_conv.apply({"params": params}, xx) ** 2)

    g_qat = jax.grad(lambda p: loss(qat, p, x))(variables["params"])
    g_flt = jax.grad(lambda p: loss(flt, p, x))(variables["params"])
    for name in ("kernel", "bias"):
        gq = np.asarray(g_qat[name], np.float64).ravel()
        gf = np.asarray(g_flt[name], np.float64).ravel()
        assert np.all(np.isfinite(gq)) and np.linalg.norm(gq) > 0
        cos = gq @ gf / (np.linalg.norm(gq) * np.linalg.norm(gf))
        assert cos > 0.98, (name, cos)
    # Input gradient flows too (decoder convs feed earlier layers).
    g_x = jax.grad(lambda xx: loss(qat, variables["params"], xx))(x)
    assert np.all(np.isfinite(np.asarray(g_x))) and float(jnp.abs(g_x).sum()) > 0


def test_quantconv_qat_bfloat16_gradients():
    """Regression: qat mode under a bfloat16 compute dtype must be
    differentiable.  The round-4 qat fine-tune crashed in the backward pass
    because the fake-quant conv contracted bf16 inputs with
    preferred_element_type=f32, and the transpose conv then mixed the f32
    cotangent with the bf16 kernel (lax rejects mixed conv dtypes).  The
    qat conv now contracts in f32 regardless of compute dtype."""
    from dream_tpu.models.quant import QuantConvTranspose

    x = jax.random.uniform(
        jax.random.PRNGKey(7), (2, 8, 8, 3), minval=-1, maxval=1
    ).astype(jnp.bfloat16)
    for module in (
        QuantConv(4, mode="qat", dtype=jnp.bfloat16),
        QuantConvTranspose(4, mode="qat", dtype=jnp.bfloat16),
    ):
        variables = module.init(jax.random.PRNGKey(8), x)
        out = module.apply(variables, x)
        assert out.dtype == jnp.bfloat16

        def loss(p):
            return jnp.mean(
                module.apply({"params": p}, x).astype(jnp.float32) ** 2
            )

        grads = jax.grad(loss)(variables["params"])
        for leaf in jax.tree_util.tree_leaves(grads):
            assert np.all(np.isfinite(np.asarray(leaf, np.float64)))
        assert float(jnp.abs(grads["kernel"]).sum()) > 0


def test_network_qat_training_then_int8_deploy():
    """End-to-end QAT: a vgg net with architecture quant_mode='qat' trains
    (loss drops), its checkpoint tree matches the float tree, and the
    qat-trained params deploy through the standard int8 PTQ path with a
    forward that tracks the qat training forward."""
    from dream_tpu.ops.belief_maps import create_belief_maps

    cfg = _vgg_config()
    cfg["architecture"]["quant_mode"] = "qat"
    net = DreamNetwork(cfg)
    net.enable_training()

    rng = np.random.RandomState(7)
    images = jnp.array(rng.rand(2, 64, 64, 3).astype(np.float32))
    kp_netout = jnp.array([[[4.0, 4.0], [10.0, 4.0], [4.0, 10.0], [9.0, 9.0]]] * 2)
    target = create_belief_maps(kp_netout, (16, 16))

    first_loss = float(net.train([images], target))
    for _ in range(60):
        loss = net.train([images], target)
    assert float(loss) < first_loss, (first_loss, float(loss))

    # Same param tree as a float net: QAT checkpoints are ordinary
    # checkpoints.
    float_net = DreamNetwork(_vgg_config())
    float_net.init_variables(seed=0)
    assert jax.tree.structure(net.variables["params"]) == jax.tree.structure(
        float_net.variables["params"]
    )

    qat_belief, _ = net.inference(images)
    calib = [images]
    net.enable_int8_inference(calib)
    int8_belief, _ = net.inference(images)
    cc = np.corrcoef(
        np.asarray(qat_belief).ravel(), np.asarray(int8_belief).ravel()
    )[0, 1]
    assert cc > 0.99, cc


def test_network_qat_rejected_for_resnet():
    cfg = _vgg_config()
    cfg["architecture"]["type"] = "resnet"
    cfg["architecture"]["layers"] = [1, 1, 1, 1]
    cfg["architecture"]["quant_mode"] = "qat"
    with pytest.raises(AssertionError, match="BN-folded"):
        DreamNetwork(cfg)


def test_resnet_deploy_int8_tracks_float():
    from dream_tpu.models.resnet_deploy import (
        ResnetSimpleDeploy, fold_batchnorm_resnet,
    )
    from dream_tpu.models.resnet_simple import ResnetSimple
    import dataclasses

    model = ResnetSimple(n_keypoints=3, layers=(1, 1, 1, 1))
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 64, 64, 3), minval=-1, maxval=1)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    folded = fold_batchnorm_resnet(variables)

    deploy = ResnetSimpleDeploy(n_keypoints=3, layers=(1, 1, 1, 1), mode="float")
    ref = np.asarray(deploy.apply(folded, x)[0])

    calib = dataclasses.replace(deploy, mode="calibrate")
    qshape = calib.init(jax.random.PRNGKey(0), x)["quant"]
    _, mut = calib.apply(
        {"params": folded["params"], "quant": qshape}, x, mutable=["quant"]
    )
    int8 = dataclasses.replace(deploy, mode="int8")
    got = np.asarray(
        int8.apply({"params": folded["params"], "quant": mut["quant"]}, x)[0]
    )
    cc = np.corrcoef(ref.ravel(), got.ravel())[0, 1]
    assert cc > 0.98


def test_quantconv_qat_int8_gap_wide_channels():
    """At vgg-scale widths (3x3x256 taps), QAT's f32 accumulation vs int8's
    int32 accumulation diverge only by f32 rounding of partial sums.  The
    integer dot products here reach |y| ~ taps * 127^2 ~ 3.7e7 > 2^24, so
    exact equality is NOT expected (quant.py docstring); the gap must stay
    below the f32 rounding bound for the accumulated magnitude.

    Bound derivation: each partial sum is exact until it exceeds 2^24; above
    that f32 rounds each add to 0.5 ulp ~ |y| * 2^-25.  With n = kh*kw*ci
    sequential adds the worst case is ~ n * |y|_max * 2^-25 in the integer
    domain, scaled by s_x * s_w back to the float domain.  We use that bound
    with a 4x safety margin (MXU accumulation order is tree-like, much
    tighter than sequential)."""
    ci, co = 256, 64
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (1, 8, 8, ci), minval=-2.0, maxval=2.0)
    qat = QuantConv(co, kernel_size=3, padding=1, mode="qat")
    variables = qat.init(jax.random.PRNGKey(8), x)
    got = np.asarray(qat.apply(variables, x), np.float64)

    int8 = QuantConv(co, kernel_size=3, padding=1, mode="int8")
    amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
    int8_vars = {
        "params": variables["params"],
        "quant": {"act_amax": amax},
    }
    want = np.asarray(int8.apply(int8_vars, x), np.float64)

    s_x = float(amax) / 127.0
    s_w = np.asarray(
        jnp.max(jnp.abs(variables["params"]["kernel"]), axis=(0, 1, 2))
    ) / 127.0
    n_taps = 3 * 3 * ci
    y_int_max = n_taps * 127.0 * 127.0
    bound = 4.0 * n_taps * y_int_max * 2.0**-25 * s_x * s_w[None, None, None, :]

    gap = np.abs(got - want)
    assert np.all(gap <= bound), (gap.max(), bound.min())
    # And the gap is tiny relative to the outputs themselves (sanity).
    assert gap.max() <= 1e-3 * max(1.0, np.abs(want).max())

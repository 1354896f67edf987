"""Fused Pallas int8 vgg deployment chain vs the XLA QuantConv path.

Interpret mode on CPU at a reduced input resolution (the param tree is
resolution-independent); the real-chip drive lives in
scripts/profile_breakdown.py / tpu_smoke.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_tpu.models import DreamHourglass
from dream_tpu.models.vgg_int8_deploy import supports, vgg_q_int8_infer


@pytest.fixture(scope="module")
def calibrated():
    model = DreamHourglass(n_keypoints=7, dtype=jnp.float32)
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (2, 64, 64, 3), minval=-1.0, maxval=1.0
    )
    variables = model.init(key, x)
    calib = dataclasses.replace(model, quant_mode="calibrate")
    qinit = calib.init(key, x)["quant"]
    _, mut = calib.apply(
        {"params": variables["params"], "quant": qinit}, x, mutable=["quant"]
    )
    return model, variables, mut["quant"], x


def test_supports_gates():
    assert supports(DreamHourglass(n_keypoints=7))
    assert not supports(DreamHourglass(n_keypoints=7, deconv_decoder=True))
    assert not supports(DreamHourglass(n_keypoints=7, skip_connections=True))
    assert not supports(DreamHourglass(n_keypoints=7, full_output=True))


def test_fused_chain_tracks_xla_int8_and_float(calibrated):
    model, variables, qvars, x = calibrated

    int8_model = dataclasses.replace(model, quant_mode="int8")
    ref_int8 = np.asarray(
        int8_model.apply(
            {"params": variables["params"], "quant": qvars}, x
        )[-1],
        np.float64,
    )
    got = np.asarray(
        vgg_q_int8_infer(
            variables["params"], qvars, x, dtype=jnp.float32, interpret=True
        ),
        np.float64,
    )
    assert got.shape == ref_int8.shape

    # Same int8 grids from down2 onward; the fused chain additionally runs
    # down1 in bf16 instead of int8 (vgg_int8_deploy.py module docstring —
    # the XLA int8 conv at 400x400 OOMs HBM at b=128), so the two paths
    # differ by down1's quantization error plus the XLA path's bf16 round
    # trips.  Measured q99 ~0.041 / max ~0.068 (both paths stay within the
    # same fidelity-to-float gate below, corr 0.9990 each).
    scale = np.abs(ref_int8).max() + 1e-9
    delta = np.abs(got - ref_int8) / scale
    assert np.quantile(delta, 0.99) < 0.06, np.quantile(delta, 0.99)
    assert delta.max() < 0.12, delta.max()

    # And the same fidelity-to-float gate the XLA int8 path is held to.
    ref_float = np.asarray(model.apply(variables, x)[-1], np.float64)
    rel = np.abs(got - ref_float) / (np.abs(ref_float).max() + 1e-9)
    assert rel.max() < 0.15, rel.max()

    cc = np.corrcoef(got.ravel(), ref_float.ravel())[0, 1]
    assert cc > 0.99, cc


def test_xla_chain_matches_pallas_chain(calibrated):
    """backend='xla' shares the prologue/chain/head structure and requant
    math with the Pallas kernel — same int8 taps, int32 accumulation, and
    per-channel folded scales — so the two backends must agree to ~1 int8
    requant step everywhere."""
    model, variables, qvars, x = calibrated

    got_pallas = np.asarray(
        vgg_q_int8_infer(
            variables["params"], qvars, x, dtype=jnp.float32, interpret=True
        ),
        np.float64,
    )
    got_xla = np.asarray(
        vgg_q_int8_infer(
            variables["params"], qvars, x, dtype=jnp.float32, backend="xla"
        ),
        np.float64,
    )
    assert got_xla.shape == got_pallas.shape
    scale = np.abs(got_pallas).max() + 1e-9
    delta = np.abs(got_xla - got_pallas) / scale
    assert np.quantile(delta, 0.99) < 0.02, np.quantile(delta, 0.99)
    assert delta.max() < 0.05, delta.max()

    # Held to the same fidelity-to-float gate as both existing paths.
    ref_float = np.asarray(model.apply(variables, x)[-1], np.float64)
    rel = np.abs(got_xla - ref_float) / (np.abs(ref_float).max() + 1e-9)
    assert rel.max() < 0.15, rel.max()
    cc = np.corrcoef(got_xla.ravel(), ref_float.ravel())[0, 1]
    assert cc > 0.99, cc

"""Pallas fused int8 conv kernel vs the plain-XLA int8 oracle.

Interpret mode on CPU; real-chip timing/validation lives in
scripts/profile_breakdown.py + scripts/tpu_smoke.py drives.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_tpu.ops import pallas_conv as pc


def _rand_case(rng, b, h, w, ci, co):
    x_q = jnp.asarray(rng.randint(-127, 128, (b, h, w, ci)), jnp.int8)
    w_q = jnp.asarray(rng.randint(-127, 128, (3, 3, ci, co)), jnp.int8)
    k = jnp.asarray(rng.uniform(1e-4, 5e-4, (co,)).astype(np.float32))
    bias = jnp.asarray(rng.uniform(-3, 3, (co,)).astype(np.float32))
    return x_q, w_q, k, bias


@pytest.mark.parametrize(
    "shape,relu",
    [
        ((2, 16, 24, 32), True),     # multi-band, ragged last band
        ((1, 8, 8, 64), True),       # single band
        ((2, 16, 24, 32), False),    # linear (signed) requant
        ((1, 25, 50, 64), True),     # odd H (band clamp), W=50 layout
    ],
)
def test_conv3x3_int8_matches_oracle(shape, relu):
    b, h, w, ci = shape
    co = 64
    rng = np.random.RandomState(hash((h, w, relu)) % 2**31)
    x_q, w_q, k, bias = _rand_case(rng, b, h, w, ci, co)

    want = np.asarray(pc.conv3x3_int8_reference(x_q, w_q, k, bias, relu=relu))
    xp = pc.pad_activation(x_q)
    out = pc.conv3x3_int8(
        xp, pc.pack_weights(w_q), k, bias, h=h, w=w, relu=relu, interpret=True
    )
    got = np.asarray(pc.unpad_activation(out, h, w))
    np.testing.assert_array_equal(got, want)

    # Halo contract: rows 0,1,H+2 and the pad columns are exactly zero, so
    # the output feeds the next conv3x3_int8 without re-padding.
    full = np.asarray(out)
    assert (full[:, :2] == 0).all() and (full[:, h + 2 :] == 0).all()
    assert (full[:, :, : pc.PAD_LEFT] == 0).all()
    assert (full[:, :, pc.PAD_LEFT + w :] == 0).all()


def test_conv3x3_int8_chain_two_layers():
    """Two chained kernels (the production pattern) equal two oracle convs
    with the intermediate requantized identically."""
    rng = np.random.RandomState(3)
    b, h, w, ci, cm, co = 1, 16, 16, 32, 64, 32
    x_q, w1, k1, b1 = _rand_case(rng, b, h, w, ci, cm)
    _, w2, k2, b2 = _rand_case(rng, b, h, w, cm, co)

    mid = pc.conv3x3_int8_reference(x_q, w1, k1, b1)
    want = np.asarray(pc.conv3x3_int8_reference(mid, w2, k2, b2))

    xp = pc.pad_activation(x_q)
    o1 = pc.conv3x3_int8(xp, pc.pack_weights(w1), k1, b1, h=h, w=w,
                         interpret=True)
    o2 = pc.conv3x3_int8(o1, pc.pack_weights(w2), k2, b2, h=h, w=w,
                         interpret=True)
    got = np.asarray(pc.unpad_activation(o2, h, w))
    np.testing.assert_array_equal(got, want)


def test_pad_unpad_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 128, (2, 10, 13, 8)), jnp.int8)
    xp = pc.pad_activation(x)
    assert xp.shape == (2, 13, pc.padded_width(13), 8)
    np.testing.assert_array_equal(np.asarray(pc.unpad_activation(xp, 10, 13)),
                                  np.asarray(x))

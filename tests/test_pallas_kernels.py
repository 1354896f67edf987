"""Pallas fused decode kernel vs the XLA composite implementation.

Runs in interpret mode on the CPU test mesh; the real-TPU path is exercised
by bench.py and the verify drives.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dream_tpu.ops import belief_maps as bm
from dream_tpu.ops.pallas_kernels import peaks_from_belief_maps_pallas


def _compare(maps, offset=0.0, max_peaks=8):
    ref = bm.peaks_from_belief_maps(maps, offset, max_peaks=max_peaks)
    out = peaks_from_belief_maps_pallas(
        maps, offset, max_peaks=max_peaks, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(ref["count"]), np.asarray(out["count"])
    )
    ref_valid = np.asarray(ref["valid"])
    for key, atol in [("coords", 1e-4), ("scores", 1e-5)]:
        a = np.asarray(ref[key])
        b = np.asarray(out[key])
        # Only valid entries are defined (padding differs: -inf vs values).
        np.testing.assert_allclose(
            a[ref_valid], b[ref_valid], atol=atol, err_msg=key
        )


def test_pallas_matches_xla_single_peak():
    maps = bm.create_belief_maps(
        jnp.array([[40.0, 30.0], [10.0, 50.0]]), (80, 60)
    )
    _compare(maps)


def test_pallas_matches_xla_multi_peak_and_empty():
    res = (100, 100)
    map_multi = (
        bm.create_belief_maps(jnp.array([[20.0, 20.0]]), res)[0]
        + 0.6 * bm.create_belief_maps(jnp.array([[70.0, 60.0]]), res)[0]
        + 0.3 * bm.create_belief_maps(jnp.array([[50.0, 80.0]]), res)[0]
    )
    maps = jnp.stack([map_multi, jnp.zeros(res[::-1])])
    _compare(maps)


def test_pallas_matches_xla_noisy():
    rng = np.random.RandomState(0)
    base = np.asarray(
        bm.create_belief_maps(jnp.array([[33.0, 21.0], [70.0, 50.0]]), (80, 60))
    )
    maps = jnp.asarray(base + rng.rand(2, 60, 80) * 0.004)
    _compare(maps, offset=0.4395)


def test_pallas_batched_shapes():
    kp = jnp.array([[[10.0, 10.0], [20.0, 30.0]], [[50.0, 40.0], [64.0, 15.0]]])
    maps = bm.create_belief_maps(kp, (80, 60))
    out = peaks_from_belief_maps_pallas(maps, 0.0, max_peaks=4, interpret=True)
    assert out["coords"].shape == (2, 2, 4, 2)
    assert out["count"].shape == (2, 2)

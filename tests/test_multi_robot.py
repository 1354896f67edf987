"""Multi-robot keypoint-count stress tests (kuka 8 kps, baxter 17 kps).

The reference ships trained models and datasets for three robots —
panda (7 keypoints), kuka (8), baxter (17)
(reference manip_configs/{panda,kuka,baxter}.yaml,
trained_models/DOWNLOAD.sh:20-40).  Baxter's 17 keypoints are where
fixed-shape decode / top-K / PnP-masking assumptions would crack, so this
file drives the full synthetic render -> belief-map encode -> peak decode
-> coordinate round-trip -> PnP chain at both non-panda counts on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dream_tpu.data import synthetic
from dream_tpu.ops.belief_maps import create_belief_maps, keypoints_from_belief_maps
from dream_tpu.ops import coords
from dream_tpu.ops.geometric_vision import solve_pnp


@pytest.mark.parametrize("n_kp", [8, 17])
def test_decode_and_pnp_many_keypoints(n_kp):
    """Render an n_kp scene, stamp GT belief maps, decode peaks, convert
    back to raw coordinates, and solve PnP — median pixel error and pose
    translation error must stay tight at kuka/baxter keypoint counts."""
    rng = np.random.RandomState(3)
    w, h = 640, 480
    img, projs, pos = synthetic.render_random_scene(rng, (w, h), n_keypoints=n_kp)
    assert img.shape == (h, w, 3) and projs.shape == (n_kp, 2)
    K = np.array([[0.96 * w, 0, w / 2.0], [0, 0.96 * w, h / 2.0], [0, 0, 1.0]])

    netin, netout = (400, 400), (100, 100)
    a_in = coords.affine_netin_from_raw((w, h), netin, "shrink-and-crop")
    a_out = coords.affine_netout_from_netin(netin, netout)
    kps_netout = a_out(a_in(jnp.asarray(projs)))
    bm = create_belief_maps(kps_netout[None], netout)
    assert bm.shape == (1, n_kp, netout[1], netout[0])

    kp_out, _peaks = keypoints_from_belief_maps(bm, offset_due_to_upsampling=0.4395)
    kp_raw = np.asarray(
        coords.affine_raw_from_netin(netin, (w, h), "shrink-and-crop")(
            coords.affine_netin_from_netout(netout, netin)(kp_out[0])
        )
    )
    # Only keypoints that survive the shrink-and-crop viewport and landed in
    # frame can be decoded; the rest carry the -999 sentinel.
    detected = kp_raw[:, 0] > -900
    assert detected.sum() >= 4, detected
    err = np.linalg.norm(kp_raw[detected] - projs[detected], axis=1)
    assert np.median(err) < 6.0, err

    sol = solve_pnp(
        jnp.asarray(pos - pos.mean(axis=0)),
        jnp.asarray(kp_raw),
        jnp.asarray(K),
    )
    t_err = np.linalg.norm(np.asarray(sol.translation) - pos.mean(axis=0))
    assert bool(sol.valid) and t_err < 0.05, (np.asarray(sol.translation), pos.mean(axis=0))

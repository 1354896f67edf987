"""Belief-map synthesis + peak extraction tests.

Includes the reference's single most important behavioral test — the
belief-map round trip (reference test/test_image_proc.py:94-120) — plus
bit-level parity checks against a numpy re-derivation of the reference
algorithm and scipy's gaussian_filter.
"""

import numpy as np
import scipy.ndimage

import jax.numpy as jnp

from dream_tpu.ops import belief_maps as bm


def _reference_create_belief_map(image_resolution, points, sigma=2):
    """Direct numpy port of reference dream/image_proc.py:866-910 (oracle)."""
    image_width, image_height = image_resolution
    out = np.zeros((len(points), image_height, image_width))
    w = int(sigma * 2)
    for i_point, point in enumerate(points):
        pixel_u = int(point[0])
        pixel_v = int(point[1])
        array = np.zeros((image_height, image_width))
        if (
            pixel_u - w >= 0
            and pixel_u + w + 1 < image_width
            and pixel_v - w >= 0
            and pixel_v + w + 1 < image_height
        ):
            for i in range(pixel_u - w, pixel_u + w + 1):
                for j in range(pixel_v - w, pixel_v + w + 1):
                    array[j, i] = np.exp(
                        -(((i - pixel_u) ** 2 + (j - pixel_v) ** 2) / (2 * sigma ** 2))
                    )
        out[i_point] = array
    return out


def test_create_belief_maps_matches_reference_oracle():
    points = [(65.3, 20.9), (3.0, 3.0), (0.0, 0.0), (79.0, 59.0), (95.0, 20.0)]
    ours = np.asarray(bm.create_belief_maps(jnp.array(points), (80, 60)))
    oracle = _reference_create_belief_map((80, 60), points)
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_create_belief_maps_out_of_frame_is_zero():
    maps = np.asarray(bm.create_belief_maps(jnp.array([[100.0, 80.0]]), (80, 60)))
    assert maps.shape == (1, 60, 80)
    assert np.all(maps == 0.0)


def test_gaussian_blur_matches_scipy():
    rng = np.random.RandomState(0)
    x = rng.rand(3, 50, 70).astype(np.float32)
    ours = np.asarray(bm.gaussian_blur_scipy_compat(jnp.array(x), 3))
    ref = np.stack([scipy.ndimage.gaussian_filter(m, sigma=3) for m in x])
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_belief_map_round_trip():
    """Reference test/test_image_proc.py:94-120 ported."""
    belief_map_resolution = (80, 60)
    kp_proj = np.array([65.0, 20.0])
    kp_out = np.array([100.0, 80.0])
    maps = bm.create_belief_maps(
        jnp.array([kp_proj, kp_out]), belief_map_resolution
    )
    peaks = bm.peaks_from_belief_maps(maps, 0.0)
    counts = np.asarray(peaks["count"])

    # First map: exactly one peak, recovered to < 1e-3 px.
    assert counts[0] == 1
    detected = np.asarray(peaks["coords"])[0, 0]
    assert np.linalg.norm(kp_proj - detected) < 1.0e-3

    # Second map (out-of-frame keypoint): no peaks.
    assert counts[1] == 0


def test_keypoints_decode_sentinel_and_disambiguation():
    resolution = (100, 100)
    # Map A: single strong keypoint.
    map_a = bm.create_belief_maps(jnp.array([[50.0, 50.0]]), resolution)[0]
    # Map B: two equal peaks far apart -> ambiguous -> sentinel.
    map_b = (
        bm.create_belief_maps(jnp.array([[20.0, 20.0]]), resolution)[0]
        + bm.create_belief_maps(jnp.array([[80.0, 80.0]]), resolution)[0]
    )
    # Map C: two peaks, one dominant by > 0.25 -> keep the dominant one.
    map_c = (
        bm.create_belief_maps(jnp.array([[30.0, 70.0]]), resolution)[0]
        + 0.5 * bm.create_belief_maps(jnp.array([[70.0, 30.0]]), resolution)[0]
    )
    # Map D: empty -> sentinel.
    map_d = jnp.zeros((100, 100))

    maps = jnp.stack([map_a, map_b, map_c, map_d])
    kps, peaks = bm.keypoints_from_belief_maps(maps, 0.0)
    kps = np.asarray(kps)

    assert np.linalg.norm(kps[0] - [50.0, 50.0]) < 1e-3
    assert np.all(kps[1] <= -999.0)
    assert np.linalg.norm(kps[2] - [30.0, 70.0]) < 0.5
    assert np.all(kps[3] <= -999.0)


def test_peaks_offset_due_to_upsampling():
    maps = bm.create_belief_maps(jnp.array([[40.0, 30.0]]), (100, 100))
    kps, _ = bm.keypoints_from_belief_maps(maps, 0.4395)
    np.testing.assert_allclose(
        np.asarray(kps)[0], [40.4395, 30.4395], atol=1e-3
    )


def test_peaks_batched_shapes():
    kp = jnp.array([[[10.0, 10.0], [20.0, 30.0]], [[50.0, 40.0], [70.0, 15.0]]])
    maps = bm.create_belief_maps(kp, (80, 60))  # [2, 2, 60, 80]
    assert maps.shape == (2, 2, 60, 80)
    peaks = bm.peaks_from_belief_maps(maps, 0.0, max_peaks=4)
    assert peaks["coords"].shape == (2, 2, 4, 2)
    assert peaks["count"].shape == (2, 2)
    np.testing.assert_array_equal(np.asarray(peaks["count"]), [[1, 1], [1, 1]])


def test_subpixel_refinement_against_reference_oracle():
    """Full numpy port of the reference peak pipeline on a noisy map."""
    rng = np.random.RandomState(42)
    maps = np.zeros((2, 60, 80), dtype=np.float32)
    oracle_maps = _reference_create_belief_map(
        (80, 60), [(33.7, 21.2), (70.1, 50.6)]
    )
    maps = oracle_maps + rng.rand(2, 60, 80) * 0.005

    # Oracle: reference peaks_from_belief_maps (dream/image_proc.py:913-1018).
    def oracle_peaks(map_ori, offset):
        blurred = scipy.ndimage.gaussian_filter(map_ori, sigma=3)
        p = 1
        m = blurred
        left = np.zeros_like(m); left[p:, :] = m[:-p, :]
        right = np.zeros_like(m); right[:-p, :] = m[p:, :]
        up = np.zeros_like(m); up[:, p:] = m[:, :-p]
        down = np.zeros_like(m); down[:, :-p] = m[:, p:]
        binary = np.logical_and.reduce(
            (m >= left, m >= right, m >= up, m >= down, m > 0.01)
        )
        ys, xs = np.nonzero(binary)
        results = []
        for x, y in zip(xs, ys):
            win = 5
            ran = win // 2
            weights = np.zeros((win, win))
            i_vals = np.zeros((win, win))
            j_vals = np.zeros((win, win))
            for i in range(-ran, ran + 1):
                for j in range(-ran, ran + 1):
                    if (
                        y + i < 0 or y + i >= map_ori.shape[0]
                        or x + j < 0 or x + j >= map_ori.shape[1]
                    ):
                        continue
                    i_vals[j + ran, i + ran] = y + i
                    j_vals[j + ran, i + ran] = x + j
                    weights[j + ran, i + ran] = map_ori[y + i, x + j]
            try:
                px = np.average(j_vals, weights=weights) + offset
                py = np.average(i_vals, weights=weights) + offset
            except ZeroDivisionError:
                px, py = x + offset, y + offset
            results.append((px, py, map_ori[y, x]))
        return results

    ours = bm.peaks_from_belief_maps(jnp.array(maps), 0.0, max_peaks=8)
    for mi in range(2):
        oracle = oracle_peaks(maps[mi], 0.0)
        count = int(np.asarray(ours["count"])[mi])
        assert count == len(oracle)
        # Compare score-sorted sets.
        oracle_sorted = sorted(oracle, key=lambda t: -t[2])
        coords = np.asarray(ours["coords"])[mi][:count]
        scores = np.asarray(ours["scores"])[mi][:count]
        for k in range(count):
            np.testing.assert_allclose(
                coords[k], oracle_sorted[k][:2], atol=1e-4
            )
            np.testing.assert_allclose(scores[k], oracle_sorted[k][2], atol=1e-5)

"""PnP solver validation against OpenCV's solvePnP (host-side oracle).

The reference delegates pose recovery to cv2 (reference
dream/geometric_vision.py:86-104).  Our solver must agree with it on clean and
noisy synthetic problems, handle masked/missing points, and report failure for
under-constrained inputs.
"""

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dream_tpu.ops import geometric_vision as gv


def _random_problem(rng, n_points=7, noise_px=0.0):
    K = np.array([[615.0, 0.0, 320.0], [0.0, 615.0, 240.0], [0.0, 0.0, 1.0]])
    # Random points in a ~0.8m cube in front of origin (robot-frame keypoints).
    X = rng.uniform(-0.4, 0.4, size=(n_points, 3))
    # Random pose with the object well in front of the camera.
    axis = rng.randn(3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0.1, 1.2)
    rvec = (axis * angle).reshape(3, 1)
    R, _ = cv2.Rodrigues(rvec)
    t = np.array([rng.uniform(-0.2, 0.2), rng.uniform(-0.2, 0.2), rng.uniform(1.0, 3.0)])
    Xc = X @ R.T + t
    uv = (Xc @ K.T)
    uv = uv[:, :2] / uv[:, 2:3]
    uv = uv + rng.randn(n_points, 2) * noise_px
    return K, X, uv, R, t


def _cv2_solve(X, uv, K):
    retval, rvec, tvec = cv2.solvePnP(
        X.reshape(-1, 1, 3), uv.reshape(-1, 1, 2), K, np.array([]),
        flags=cv2.SOLVEPNP_EPNP,
    )
    retval, rvec, tvec = cv2.solvePnP(
        X.reshape(-1, 1, 3), uv.reshape(-1, 1, 2), K, np.array([]),
        flags=cv2.SOLVEPNP_ITERATIVE, useExtrinsicGuess=True, rvec=rvec, tvec=tvec,
    )
    R, _ = cv2.Rodrigues(rvec)
    return retval, R, tvec[:, 0]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_solve_pnp_clean_matches_ground_truth(seed):
    rng = np.random.RandomState(seed)
    K, X, uv, R_gt, t_gt = _random_problem(rng)
    result = gv.solve_pnp(jnp.array(X), jnp.array(uv), jnp.array(K))
    assert bool(result.valid)
    np.testing.assert_allclose(np.asarray(result.translation), t_gt, atol=1e-3)
    np.testing.assert_allclose(np.asarray(result.rotation), R_gt, atol=1e-3)
    assert float(result.reproj_error) < 0.05


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_solve_pnp_noisy_matches_cv2_accuracy(seed):
    rng = np.random.RandomState(seed)
    K, X, uv, R_gt, t_gt = _random_problem(rng, noise_px=2.0)
    result = gv.solve_pnp(jnp.array(X), jnp.array(uv), jnp.array(K))
    assert bool(result.valid)

    _, R_cv, t_cv = _cv2_solve(X, uv, K)

    # Both should land near GT with comparable error; our translation error
    # must be within 1.5x of cv2's (same objective, same local minimum).
    err_ours = np.linalg.norm(np.asarray(result.translation) - t_gt)
    err_cv = np.linalg.norm(t_cv - t_gt)
    assert err_ours < max(1.5 * err_cv, 0.02)


def test_solve_pnp_sentinel_masking():
    rng = np.random.RandomState(7)
    K, X, uv, R_gt, t_gt = _random_problem(rng)
    uv_bad = uv.copy()
    uv_bad[2] = [-999.999, -999.999]  # no-detection sentinel
    uv_bad[5] = [np.nan, np.nan]
    result = gv.solve_pnp(jnp.array(X), jnp.array(uv_bad), jnp.array(K))
    assert bool(result.valid)  # 5 valid points remain
    np.testing.assert_allclose(np.asarray(result.translation), t_gt, atol=1e-3)


def test_solve_pnp_too_few_points_invalid():
    rng = np.random.RandomState(3)
    K, X, uv, _, _ = _random_problem(rng, n_points=3)
    result = gv.solve_pnp(jnp.array(X), jnp.array(uv), jnp.array(K))
    assert not bool(result.valid)

    # All-sentinel input -> invalid (reference returns (False, None, None)).
    uv_sent = np.full_like(uv, -999.999)
    result2 = gv.solve_pnp(jnp.array(X), jnp.array(uv_sent), jnp.array(K))
    assert not bool(result2.valid)


def test_solve_pnp_vmap_batch():
    rng = np.random.RandomState(21)
    problems = [_random_problem(rng) for _ in range(4)]
    K = problems[0][0]
    Xb = jnp.array(np.stack([p[1] for p in problems]))
    uvb = jnp.array(np.stack([p[2] for p in problems]))
    batch_solve = jax.vmap(lambda X, uv: gv.solve_pnp(X, uv, jnp.array(K)))
    results = batch_solve(Xb, uvb)
    for i, (_, _, _, R_gt, t_gt) in enumerate(problems):
        assert bool(results.valid[i])
        np.testing.assert_allclose(
            np.asarray(results.translation[i]), t_gt, atol=1e-3
        )


def test_solve_pnp_ransac_rejects_outliers():
    rng = np.random.RandomState(33)
    K, X, uv, R_gt, t_gt = _random_problem(rng, n_points=8)
    uv_corrupt = uv.copy()
    uv_corrupt[0] += 120.0  # gross outlier
    result, inliers = gv.solve_pnp_ransac(
        jnp.array(X), jnp.array(uv_corrupt), jnp.array(K),
        key=jax.random.PRNGKey(0),
    )
    assert bool(result.valid)
    inliers = np.asarray(inliers)
    assert not inliers[0]
    assert inliers[1:].sum() >= 6
    np.testing.assert_allclose(np.asarray(result.translation), t_gt, atol=5e-3)


def test_quaternion_round_trip():
    rng = np.random.RandomState(5)
    for _ in range(10):
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        angle = rng.uniform(0.01, 3.0)
        R_cv, _ = cv2.Rodrigues((axis * angle).reshape(3, 1))
        q = gv.quaternion_from_rotation_matrix(jnp.array(R_cv))
        R_back = gv.rotation_matrix_from_quaternion(q)
        np.testing.assert_allclose(np.asarray(R_back), R_cv, atol=1e-5)


def test_add_from_pose_identity_is_zero():
    kp = jnp.array([[0.1, 0.2, 0.9], [0.3, -0.2, 1.2], [-0.1, 0.0, 1.5]])
    add = gv.add_from_pose(
        jnp.zeros(3), jnp.array([0.0, 0.0, 0.0, 1.0]), kp
    )
    assert float(add) < 1e-7


def test_add_from_pose_translation():
    kp = jnp.array([[0.1, 0.2, 0.9], [0.3, -0.2, 1.2]])
    add = gv.add_from_pose(
        jnp.array([0.05, 0.0, 0.0]), jnp.array([0.0, 0.0, 0.0, 1.0]), kp
    )
    np.testing.assert_allclose(float(add), 0.05, atol=1e-6)


def test_solve_pnp_ransac_vmapped():
    """The analysis --ransac path vmaps the RANSAC solver over frames."""
    rng = np.random.RandomState(3)
    K = np.array([[615.0, 0, 320.0], [0, 615.0, 240.0], [0, 0, 1.0]])
    Xb, uvb = [], []
    for _ in range(3):
        K2, X, uv, _, _ = _random_problem(rng)
        uv[0] += 150.0  # gross outlier per frame
        Xb.append(X)
        uvb.append(uv)

    def one(X, uv, key):
        result, _ = gv.solve_pnp_ransac(X, uv, jnp.asarray(K, jnp.float32), key=key)
        return result

    res = jax.jit(jax.vmap(one))(
        jnp.asarray(np.stack(Xb), jnp.float32),
        jnp.asarray(np.stack(uvb), jnp.float32),
        jax.random.split(jax.random.PRNGKey(0), 3),
    )
    assert np.all(np.asarray(res.valid))
    assert np.all(np.asarray(res.reproj_error) < 1.0)

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


def test_add_from_pose_weights_subset():
    """ADD over the detected subset only (reference passes kp_pos_gt_pnp —
    dream/analysis.py:322-339 — not all GT keypoints)."""
    kp = jnp.array([[0.1, 0.2, 0.9], [0.3, -0.2, 1.2], [5.0, 5.0, 5.0]])
    t = jnp.array([0.05, 0.0, 0.0])
    q = jnp.array([0.0, 0.0, 0.0, 1.0])
    # Pure translation: every point moves 0.05, so the masked mean is also
    # 0.05 — use a rotation to make the subset matter.
    qz = jnp.array([0.0, 0.0, np.sin(0.05), np.cos(0.05)])  # 0.1 rad about z
    add_all = gv.add_from_pose(t, qz, kp)
    add_sub = gv.add_from_pose(t, qz, kp, weights=jnp.array([1.0, 1.0, 0.0]))
    add_sub_manual = gv.add_from_pose(t, qz, kp[:2])
    np.testing.assert_allclose(float(add_sub), float(add_sub_manual), rtol=1e-6)
    assert abs(float(add_all) - float(add_sub)) > 1e-3  # far point dominates


def test_add_rotation_convention_matters():
    """Documents why add_from_pose exposes ``rotation_convention``: for
    PnP-recovered poses, R and t errors are anticorrelated (R x + t ~= x), so
    applying R^T (pyrr's possible row-vector matrix33 layout, reference
    dream/geometric_vision.py:185) inflates ADD by ~3x — the two candidate
    reference conventions are NOT interchangeable and parity_check.py must
    resolve them against real reference CSVs."""
    rng = np.random.RandomState(0)
    K = jnp.asarray([[615.0, 0, 320], [0, 615.0, 240], [0, 0, 1]], jnp.float32)
    solve = jax.jit(lambda X, uv: gv.solve_pnp(X, uv, K))
    add_std, add_T = [], []
    for _ in range(10):
        X = rng.randn(7, 3) * 0.3 + np.array([0, 0, 1.0])
        uv = np.array(gv.point_projection_from_3d(K, jnp.asarray(X, jnp.float32)))
        uv = uv + rng.randn(*uv.shape) * 2.0
        res = solve(jnp.asarray(X, jnp.float32), jnp.asarray(uv, jnp.float32))
        Xj = jnp.asarray(X, jnp.float32)
        add_std.append(float(gv.add_from_pose(res.translation, res.quaternion, Xj)))
        add_T.append(float(gv.add_from_pose(
            res.translation, res.quaternion, Xj,
            rotation_convention="transposed",
        )))
    assert np.mean(add_T) > 1.5 * np.mean(add_std)
    # With zero translation the two conventions agree exactly
    # (||R x - x|| == ||x - R^T x||).
    kp = jnp.asarray(rng.randn(5, 3), jnp.float32)
    q = gv.convert_rvec_to_quaternion(jnp.array([0.3, -0.2, 0.5]))
    t0 = jnp.zeros(3)
    np.testing.assert_allclose(
        float(gv.add_from_pose(t0, q, kp)),
        float(gv.add_from_pose(t0, q, kp, rotation_convention="transposed")),
        rtol=1e-5,
    )


def test_solve_pnp_reject_outliers_recovers_pose():
    """The deterministic outlier-rejection pass fixes one grossly-wrong
    detection without RANSAC randomness."""
    rng = np.random.RandomState(11)
    K, X, uv, R_gt, t_gt = _random_problem(rng, n_points=7, noise_px=0.5)
    uv_bad = uv.copy()
    uv_bad[2] += np.array([120.0, -80.0])  # confidently-wrong keypoint

    Xj = jnp.asarray(X, jnp.float32)
    uvj = jnp.asarray(uv_bad, jnp.float32)
    Kj = jnp.asarray(K, jnp.float32)

    plain = gv.solve_pnp(Xj, uvj, Kj)
    robust = gv.solve_pnp(Xj, uvj, Kj, reject_outliers_px=8.0)
    assert bool(robust.valid)
    t_err_plain = float(np.linalg.norm(np.asarray(plain.translation) - t_gt))
    t_err_robust = float(np.linalg.norm(np.asarray(robust.translation) - t_gt))
    assert t_err_robust < t_err_plain
    assert t_err_robust < 0.02
    # Clean input: the pass is a no-op (no point exceeds the threshold).
    clean = gv.solve_pnp(Xj, jnp.asarray(uv, jnp.float32), Kj,
                         reject_outliers_px=8.0)
    base = gv.solve_pnp(Xj, jnp.asarray(uv, jnp.float32), Kj)
    np.testing.assert_allclose(
        np.asarray(clean.translation), np.asarray(base.translation), atol=1e-5
    )


def test_solve_pnp_soft_confidence_weights():
    """Continuous weights down-weight a noisy detection; validity counting
    still uses the >0 mask (not the weight sum)."""
    rng = np.random.RandomState(12)
    K, X, uv, R_gt, t_gt = _random_problem(rng, n_points=6, noise_px=0.0)
    uv_noisy = uv.copy()
    uv_noisy[0] += np.array([25.0, -30.0])

    Xj = jnp.asarray(X, jnp.float32)
    Kj = jnp.asarray(K, jnp.float32)
    w = jnp.asarray([0.02, 1.0, 1.0, 1.0, 1.0, 1.0], jnp.float32)

    weighted = gv.solve_pnp(Xj, jnp.asarray(uv_noisy, jnp.float32), Kj, weights=w)
    unweighted = gv.solve_pnp(Xj, jnp.asarray(uv_noisy, jnp.float32), Kj)
    assert bool(weighted.valid)
    t_err_w = float(np.linalg.norm(np.asarray(weighted.translation) - t_gt))
    t_err_u = float(np.linalg.norm(np.asarray(unweighted.translation) - t_gt))
    assert t_err_w < t_err_u
    # Tiny-but-positive weights keep points countable: 4 points each with
    # weight 0.1 must still be a valid (>=4 correspondences) problem.
    w4 = jnp.asarray([0.1, 0.1, 0.1, 0.1, 0.0, 0.0], jnp.float32)
    r4 = gv.solve_pnp(Xj, jnp.asarray(uv, jnp.float32), Kj, weights=w4)
    assert bool(r4.valid)


def test_solve_pnp_ransac_fallback_when_consensus_fails():
    """With a tight inlier threshold and noisy points, RANSAC falls back to
    the all-point solve instead of failing the frame."""
    rng = np.random.RandomState(13)
    K, X, uv, _, _ = _random_problem(rng, n_points=7, noise_px=12.0)
    result, inliers = gv.solve_pnp_ransac(
        jnp.asarray(X, jnp.float32), jnp.asarray(uv, jnp.float32),
        jnp.asarray(K, jnp.float32), key=jax.random.PRNGKey(0),
        inlier_thresh_px=0.5,  # stricter than the 12 px noise -> no consensus
    )
    assert bool(result.valid)
    assert np.asarray(inliers).sum() == 7  # fallback marks all valid points


def test_solve_pnp_lm_escapes_gauss_newton_stall():
    """Regression: a real evaluation frame where a monotone fixed-damping
    Gauss-Newton stalled at reproj 8.6 px / ADD 0.36 m while cv2's
    SOLVEPNP_ITERATIVE (Levenberg-Marquardt) reached 1.2 px / ADD 0.018 m
    from the SAME EPnP initialization.  The refiner must use adaptive
    damping so a rejected step shrinks the trust region instead of
    freezing the iterate (dream_tpu round-3 fix; the 7 points span a
    shallow arc, making the GN normal equations ill-conditioned)."""
    X = np.array([
        [0.342848, -0.232486, 2.950015],
        [0.20407, -0.294963, 2.691486],
        [0.068658, -0.269428, 2.525922],
        [-0.029768, -0.174821, 2.381832],
        [-0.084142, -0.027946, 2.352317],
        [-0.091256, 0.080641, 2.411123],
        [-0.061347, 0.175295, 2.488234],
    ], np.float32)
    uv = np.array([
        [389.968, 189.815],
        [365.234, 174.279],
        [336.615, 174.776],
        [312.502, 194.166],
        [297.997, 232.771],
        [298.248, 261.267],
        [303.182, 284.742],
    ], np.float32)
    K = np.array([[614.4, 0.0, 320.0], [0.0, 614.4, 240.0], [0.0, 0.0, 1.0]],
                 np.float32)

    result = gv.solve_pnp(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K))
    assert bool(result.valid)
    assert float(result.reproj_error) < 1.5, (
        f"refiner stalled: reproj {float(result.reproj_error):.2f} px"
    )
    # The 3D points here are the camera-frame GT positions, so ADD is
    # directly computable against the identity pose.
    add = float(gv.add_from_pose(
        result.translation, result.quaternion, jnp.asarray(X)
    ))
    assert add < 0.03, f"pose off by ADD {add:.3f} m"

    # cv2 oracle: same minimum.
    ok, rvec, tvec = cv2.solvePnP(
        X.reshape(-1, 1, 3).astype(np.float64),
        uv.reshape(-1, 1, 2).astype(np.float64),
        K.astype(np.float64), None, flags=cv2.SOLVEPNP_EPNP,
    )
    ok2, rvec2, tvec2 = cv2.solvePnP(
        X.reshape(-1, 1, 3).astype(np.float64),
        uv.reshape(-1, 1, 2).astype(np.float64),
        K.astype(np.float64), None, rvec=rvec, tvec=tvec,
        useExtrinsicGuess=True, flags=cv2.SOLVEPNP_ITERATIVE,
    )
    assert ok2
    np.testing.assert_allclose(
        np.asarray(result.translation), tvec2.ravel(), atol=2e-3
    )


def test_solve_pnp_loo_rejection_finds_true_outlier():
    """Regression: a real evaluation frame where the base keypoint is
    detected 123 px off while the other six are sub-pixel.  Under the
    outlier-dragged least-squares pose the WORST residual lands on a GOOD
    point (34.1 px) rather than the outlier (22.6 px), so a reject-the-
    worst-residual strategy evicts a good point and makes the pose worse
    (measured ADD 0.51 -> 0.70 m).  The leave-one-out influence selection
    must identify the true outlier and recover the pose."""
    X = np.array([
        [-0.582183, -0.024239, 1.45003],
        [-0.350126, 0.163972, 1.423087],
        [-0.172748, 0.272193, 1.47988],
        [0.005633, 0.303005, 1.56131],
        [0.091958, 0.24579, 1.682448],
        [0.07749, 0.165342, 1.775285],
        [0.036982, 0.06506, 1.839338],
    ], np.float32)
    uv = np.array([
        [166.107, 310.973],  # true location (73.3, 229.7): 123 px outlier
        [168.668, 310.267],
        [247.476, 352.227],
        [322.945, 358.944],
        [353.389, 330.619],
        [346.427, 296.691],
        [332.318, 261.746],
    ], np.float32)
    K = np.array([[614.4, 0.0, 320.0], [0.0, 614.4, 240.0], [0.0, 0.0, 1.0]],
                 np.float32)

    plain = gv.solve_pnp(jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K))
    robust = gv.solve_pnp(
        jnp.asarray(X), jnp.asarray(uv), jnp.asarray(K),
        reject_outliers_px=5.0,
    )
    assert bool(plain.valid) and bool(robust.valid)
    add_plain = float(gv.add_from_pose(
        plain.translation, plain.quaternion, jnp.asarray(X)
    ))
    add_robust = float(gv.add_from_pose(
        robust.translation, robust.quaternion, jnp.asarray(X)
    ))
    assert add_plain > 0.1  # the outlier genuinely wrecks the plain solve
    assert add_robust < 0.02, f"LOO rejection failed: ADD {add_robust:.3f} m"
    # Post-rejection reproj_error describes the surviving fit only (the
    # serving pose gate consumes it).
    assert float(robust.reproj_error) < 2.0

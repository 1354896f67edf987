"""JAX-native Perspective-n-Point pose solving and pose-error metrics.

TPU-native replacement for the reference's OpenCV C++ solver calls
(reference dream/geometric_vision.py:40-180): an EPnP initializer
(Lepetit et al. 2009; the same algorithm behind cv2.SOLVEPNP_EPNP) followed by
damped Gauss-Newton refinement of the 6-DoF pose on the reprojection
residuals (the analog of the cv2.SOLVEPNP_ITERATIVE refinement pass at
reference dream/geometric_vision.py:94-104).

Design rules for TPU:
- fixed shapes everywhere: invalid/missing correspondences are handled by a
  0/1 weight vector instead of the reference's Python None-filtering
  (reference dream/geometric_vision.py:57-79);
- fully differentiable / vmappable: ``solve_pnp`` maps over a batch of frames
  with ``jax.vmap``; RANSAC is a fixed-trip-count hypothesis sweep;
- failure is data, not control flow: the reference returns
  ``(False, None, None)`` on failure; we return ``valid=False`` with zeroed
  pose so downstream code stays jittable.

Quaternions use XYZW order to match the reference's pyrr convention
(reference dream/geometric_vision.py:12-22).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_EPS = 1e-12


class PnPResult(NamedTuple):
    valid: jnp.ndarray  # bool []
    translation: jnp.ndarray  # [3]
    quaternion: jnp.ndarray  # [4] XYZW
    rotation: jnp.ndarray  # [3, 3]
    reproj_error: jnp.ndarray  # [] mean weighted reprojection error (px)


# -----------------------------------------------------------------------------
# Rotation utilities
# -----------------------------------------------------------------------------


def rotation_matrix_from_axis_angle(rvec):
    """Rodrigues formula; safe at theta -> 0."""
    theta = jnp.linalg.norm(rvec) + _EPS
    k = rvec / theta
    K = jnp.array(
        [
            [0.0, -k[2], k[1]],
            [k[2], 0.0, -k[0]],
            [-k[1], k[0], 0.0],
        ]
    )
    return (
        jnp.eye(3)
        + jnp.sin(theta) * K
        + (1.0 - jnp.cos(theta)) * (K @ K)
    )


def axis_angle_from_rotation_matrix(R):
    """Inverse Rodrigues; safe near identity."""
    cos_theta = jnp.clip((jnp.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    axis_raw = jnp.array(
        [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]]
    )
    axis = axis_raw / (jnp.linalg.norm(axis_raw) + _EPS)
    return axis * theta


def quaternion_from_rotation_matrix(R):
    """Rotation matrix -> unit quaternion, XYZW (pyrr order).

    Shepperd's branchless method via the largest-trace 4x4 eigen trick,
    implemented with jnp.where selects to stay jittable.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best.
    def cand_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, _EPS)) * 2.0
        return jnp.array([(m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s, 0.25 * s])

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 2.0
        return jnp.array([0.25 * s, (m01 + m10) / s, (m02 + m20) / s, (m21 - m12) / s])

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, _EPS)) * 2.0
        return jnp.array([(m01 + m10) / s, 0.25 * s, (m12 + m21) / s, (m02 - m20) / s])

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, _EPS)) * 2.0
        return jnp.array([(m02 + m20) / s, (m12 + m21) / s, 0.25 * s, (m10 - m01) / s])

    use_w = tr > 0.0
    use_x = (m00 >= m11) & (m00 >= m22)
    use_y = m11 >= m22
    q = jnp.where(
        use_w,
        cand_w(),
        jnp.where(use_x, cand_x(), jnp.where(use_y, cand_y(), cand_z())),
    )
    return q / (jnp.linalg.norm(q) + _EPS)


def rotation_matrix_from_quaternion(q):
    """Unit quaternion (XYZW) -> rotation matrix."""
    x, y, z, w = q[0], q[1], q[2], q[3]
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ]
    )


def convert_rvec_to_quaternion(rvec):
    """Axis-angle -> XYZW quaternion (reference dream/geometric_vision.py:12-22)."""
    return quaternion_from_rotation_matrix(rotation_matrix_from_axis_angle(jnp.asarray(rvec)))


def hnormalized(vector):
    """Parity: reference dream/geometric_vision.py:25-27."""
    v = jnp.asarray(vector)
    return (v / v[..., -1:])[..., :-1]


def point_projection_from_3d(camera_K, points):
    """Project ``[N, 3]`` camera-frame points through K -> ``[N, 2]`` pixels.

    Parity: reference dream/geometric_vision.py:30-37, batched.
    """
    p = jnp.asarray(points) @ jnp.asarray(camera_K).T
    return hnormalized(p)


# -----------------------------------------------------------------------------
# EPnP initializer
# -----------------------------------------------------------------------------


def _control_points(X, w):
    """Weighted centroid + principal-axis control points (EPnP world basis)."""
    n = jnp.sum(w) + _EPS
    c0 = jnp.sum(X * w[:, None], axis=0) / n
    Xc = (X - c0) * w[:, None]
    cov = Xc.T @ (X - c0) / n
    lam, V = jnp.linalg.eigh(cov)  # ascending
    # Guard degenerate (planar/collinear) configurations with a floor.
    s = jnp.sqrt(jnp.maximum(lam, 1e-8))
    ctrl = c0[None, :] + s[:, None] * V.T  # [3, 3]
    return jnp.concatenate([c0[None, :], ctrl], axis=0)  # [4, 3]


def _barycentric(X, C):
    """alphas such that X = alphas @ C, rows sum to 1."""
    Ct = jnp.concatenate([C.T, jnp.ones((1, 4))], axis=0)  # [4, 4]
    Xt = jnp.concatenate([X.T, jnp.ones((1, X.shape[0]))], axis=0)  # [4, N]
    alphas = jnp.linalg.solve(Ct, Xt)  # [4, N]
    return alphas.T  # [N, 4]


def _build_MtM(alphas, uv_norm, w):
    """12x12 normal matrix of the EPnP M matrix, weighted per-point."""
    N = alphas.shape[0]
    u = uv_norm[:, 0]
    v = uv_norm[:, 1]
    zeros = jnp.zeros((N, 4))
    # Row pairs for each point: [a*1, 0, -a*u] and [0, a*1, -a*v] interleaved
    # over the 4 control points -> 12 columns ordered (x1,y1,z1,...,x4,y4,z4).
    rx = jnp.stack([alphas, zeros, -alphas * u[:, None]], axis=-1).reshape(N, 12)
    ry = jnp.stack([zeros, alphas, -alphas * v[:, None]], axis=-1).reshape(N, 12)
    M = jnp.concatenate([rx * w[:, None], ry * w[:, None]], axis=0)  # [2N, 12]
    return M.T @ M


def _pairwise_dists(P):
    """Six pairwise distances among 4 points, fixed order."""
    idx_i = jnp.array([0, 0, 0, 1, 1, 2])
    idx_j = jnp.array([1, 2, 3, 2, 3, 3])
    d = P[idx_i] - P[idx_j]
    return d, idx_i, idx_j


def _kabsch(X, Y, w):
    """Weighted rigid alignment: find R, t with Y ~= R X + t."""
    n = jnp.sum(w) + _EPS
    Xc = jnp.sum(X * w[:, None], axis=0) / n
    Yc = jnp.sum(Y * w[:, None], axis=0) / n
    H = ((X - Xc) * w[:, None]).T @ (Y - Yc)
    U, _, Vt = jnp.linalg.svd(H)
    d = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.array([1.0, 1.0, d]))
    R = Vt.T @ D @ U.T
    t = Yc - R @ Xc
    return R, t


def _epnp_candidate(vs, C, alphas, X, w):
    """Given a [12] null-space vector combo, recover (R, t) via scale + Kabsch."""
    vctrl = vs.reshape(4, 3)  # candidate camera-frame control points (up to scale)
    dv, _, _ = _pairwise_dists(vctrl)
    dc, _, _ = _pairwise_dists(C)
    ndv = jnp.linalg.norm(dv, axis=1)
    ndc = jnp.linalg.norm(dc, axis=1)
    beta = jnp.sum(ndv * ndc) / (jnp.sum(ndv * ndv) + _EPS)
    ctrl_cam = beta * vctrl
    Xcam = alphas @ ctrl_cam  # [N, 3]
    # Cheirality: points must be in front of the camera.
    mean_z = jnp.sum(Xcam[:, 2] * w) / (jnp.sum(w) + _EPS)
    Xcam = jnp.where(mean_z < 0, -Xcam, Xcam)
    R, t = _kabsch(X, Xcam, w)
    return R, t


def _reproj_residuals(R, t, X, uv_norm, w):
    Xc = X @ R.T + t
    z = Xc[:, 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, jnp.sign(z) * 1e-9 + 1e-12, z)
    proj = Xc[:, :2] / safe_z[:, None]
    return (proj - uv_norm) * w[:, None]


def _gauss_newton_pose(R0, t0, X, uv_norm, w, iters: int = 30, damping: float = 1e-3):
    """Levenberg-Marquardt on (axis-angle, t); fixed trip count for jit.

    Adaptive damping is essential, not a nicety: a monotone Gauss-Newton
    that merely REJECTS uphill steps (fixed tiny damping) stalls permanently
    whenever the full GN step overshoots — measured reproj 8.6 px vs cv2's
    1.2 px on a real frame (ADD 0.36 m vs 0.018 m).  LM with the classic
    accept/decrease / reject-increase lambda schedule reaches cv2
    SOLVEPNP_ITERATIVE's minimum exactly on those frames (this is the
    algorithm cv2's ITERATIVE refinement runs, reference
    dream/geometric_vision.py:94-104).
    """
    r0 = axis_angle_from_rotation_matrix(R0)
    params0 = jnp.concatenate([r0, t0])

    def residual_fn(params):
        R = rotation_matrix_from_axis_angle(params[:3])
        return _reproj_residuals(R, params[3:], X, uv_norm, w).reshape(-1)

    def step(carry, _):
        params, lam, cost = carry
        res = residual_fn(params)
        J = jax.jacfwd(residual_fn)(params)  # [2N, 6]
        JtJ = J.T @ J + lam * jnp.eye(6)
        delta = jnp.linalg.solve(JtJ, J.T @ res)
        cand = params - delta
        cand_cost = jnp.sum(residual_fn(cand) ** 2)
        accept = cand_cost < cost
        params = jnp.where(accept, cand, params)
        cost = jnp.where(accept, cand_cost, cost)
        lam = jnp.where(
            accept,
            jnp.maximum(lam / 3.0, 1e-12),
            jnp.minimum(lam * 10.0, 1e6),
        )
        return (params, lam, cost), None

    cost0 = jnp.sum(residual_fn(params0) ** 2)
    (params, _, _), _ = jax.lax.scan(
        step, (params0, jnp.asarray(damping), cost0), None, length=iters
    )
    return rotation_matrix_from_axis_angle(params[:3]), params[3:]


def _solve_core(Xs, uv_norm, w, refinement: bool, gn_iters: int, multi_start: bool):
    """EPnP candidates + (multi-start) Gauss-Newton; returns (R, t).

    Factored out of solve_pnp so outlier rejection can re-run the FULL
    pipeline on a reduced weight set: re-refining with GN alone from a pose
    that a gross outlier dragged into the wrong basin stays in the wrong
    basin (measured ~10x ADD difference on near-degenerate frames).
    """
    C = _control_points(Xs, w)
    alphas = _barycentric(Xs, C)
    MtM = _build_MtM(alphas, uv_norm, w)
    eigval, eigvec = jnp.linalg.eigh(MtM)  # ascending

    # Candidate 1: single smallest null vector (EPnP beta case N=1).
    R1, t1 = _epnp_candidate(eigvec[:, 0], C, alphas, Xs, w)
    # Candidate 2: two-vector combination solved from distance constraints.
    v1, v2 = eigvec[:, 0].reshape(4, 3), eigvec[:, 1].reshape(4, 3)
    dv1, _, _ = _pairwise_dists(v1)
    dv2, _, _ = _pairwise_dists(v2)
    dc, _, _ = _pairwise_dists(C)
    # ||b1*dv1 + b2*dv2||^2 = ||dc||^2 -> LS in (b1^2, b1*b2, b2^2)
    L = jnp.stack(
        [
            jnp.sum(dv1 * dv1, axis=1),
            2.0 * jnp.sum(dv1 * dv2, axis=1),
            jnp.sum(dv2 * dv2, axis=1),
        ],
        axis=-1,
    )  # [6, 3]
    rho = jnp.sum(dc * dc, axis=1)
    btb = jnp.linalg.solve(L.T @ L + 1e-9 * jnp.eye(3), L.T @ rho)
    b1 = jnp.sqrt(jnp.maximum(btb[0], _EPS))
    b2 = jnp.sqrt(jnp.maximum(btb[2], _EPS)) * jnp.sign(btb[1])
    R2, t2 = _epnp_candidate(
        (b1 * eigvec[:, 0] + b2 * eigvec[:, 1]), C, alphas, Xs, w
    )

    e1 = jnp.sum(_reproj_residuals(R1, t1, Xs, uv_norm, w) ** 2)
    e2 = jnp.sum(_reproj_residuals(R2, t2, Xs, uv_norm, w) ** 2)
    use1 = e1 <= e2
    R0 = jnp.where(use1, R1, R2)
    t0 = jnp.where(use1, t1, t2)

    if refinement and not multi_start:
        R, t = _gauss_newton_pose(R0, t0, Xs, uv_norm, w, iters=gn_iters)
    elif refinement:
        # Multi-start damped Gauss-Newton: EPnP candidates plus geometric
        # front-facing initializations (depth from 3D/2D spread ratio).  The
        # minimal 4-point case can defeat the linear EPnP initializer; a
        # handful of extra cheap GN starts makes the solver globally robust
        # (all starts run vmapped, cost is negligible next to the model).
        n_eff = jnp.sum(w) + _EPS
        c3d = jnp.sum(Xs * w[:, None], axis=0) / n_eff
        c2d = jnp.sum(uv_norm * w[:, None], axis=0) / n_eff
        spread3d = jnp.sum(
            jnp.linalg.norm((Xs - c3d) * w[:, None], axis=1)
        ) / n_eff
        spread2d = jnp.sum(
            jnp.linalg.norm((uv_norm - c2d) * w[:, None], axis=1)
        ) / n_eff
        z0 = spread3d / (spread2d + _EPS)

        def front_init(R_guess):
            t_guess = jnp.concatenate([c2d * z0, jnp.array([z0])]) - R_guess @ c3d
            return R_guess, t_guess

        flip_x = jnp.diag(jnp.array([1.0, -1.0, -1.0]))
        flip_y = jnp.diag(jnp.array([-1.0, 1.0, -1.0]))
        flip_z = jnp.diag(jnp.array([-1.0, -1.0, 1.0]))
        starts_R = jnp.stack(
            [R0, R1, R2]
            + [front_init(Rg)[0] for Rg in (jnp.eye(3), flip_x, flip_y, flip_z)]
        )
        starts_t = jnp.stack(
            [t0, t1, t2]
            + [front_init(Rg)[1] for Rg in (jnp.eye(3), flip_x, flip_y, flip_z)]
        )

        def run_start(Rs, ts):
            Rf, tf = _gauss_newton_pose(Rs, ts, Xs, uv_norm, w, iters=gn_iters)
            cost = jnp.sum(_reproj_residuals(Rf, tf, Xs, uv_norm, w) ** 2)
            # Penalize solutions that put points behind the camera.
            z = Xs @ Rf.T[:, 2] + tf[2]
            behind = jnp.sum((z < 0) * w)
            return Rf, tf, cost + 1e6 * behind

        Rs_all, ts_all, costs = jax.vmap(run_start)(starts_R, starts_t)
        best = jnp.argmin(costs)
        R, t = Rs_all[best], ts_all[best]
    else:
        R, t = R0, t0
    return R, t


def solve_pnp(
    canonical_points,
    projections,
    camera_K,
    weights: Optional[jnp.ndarray] = None,
    refinement: bool = True,
    gn_iters: int = 20,
    multi_start: bool = True,
    reject_outliers_px: Optional[float] = None,
) -> PnPResult:
    """EPnP + Gauss-Newton pose recovery, fully on device.

    Args:
      canonical_points: ``[N, 3]`` 3D points (robot-frame keypoints).
      projections: ``[N, 2]`` detected pixel coords (sentinel/NaN entries are
        auto-invalidated).
      camera_K: ``[3, 3]`` intrinsics.
      weights: optional ``[N]`` validity/confidence weights; defaults to
        auto-detection of NaN / <=-999 sentinel entries (the reference's
        None-filtering, dream/geometric_vision.py:57-79, plus the
        analysis-time sentinel filtering at dream/analysis.py:321-324).
        Binary 0/1 masks validity; continuous values (e.g. belief-map peak
        scores) softly weight the least-squares residuals — a TPU-native
        extension over the reference's unweighted cv2 solve.
      refinement: run the iterative refinement pass (the reference's second
        cv2.solvePnP call, dream/geometric_vision.py:94-104).
      reject_outliers_px: if set, run a second pass that drops
        correspondences whose pixel reprojection error under the first
        solution exceeds this threshold (when >=4 survive) and re-refines —
        a deterministic robustifier against one confidently-wrong detection
        dragging the pose (no reference analog; RANSAC is the reference's
        only outlier story, dream/geometric_vision.py:116-180).

    Returns:
      PnPResult; ``valid`` is False when fewer than 4 usable correspondences
      exist (cv2's minimum for EPnP => the reference's except-branch).
    """
    X = jnp.asarray(canonical_points, dtype=jnp.float32)
    uv = jnp.asarray(projections, dtype=jnp.float32)
    K = jnp.asarray(camera_K, dtype=jnp.float32)

    auto_valid = (
        jnp.all(jnp.isfinite(X), axis=1)
        & jnp.all(jnp.isfinite(uv), axis=1)
        & jnp.all(uv > -999.0, axis=1)
    )
    w = auto_valid.astype(jnp.float32)
    if weights is not None:
        w = w * jnp.asarray(weights, dtype=jnp.float32)
    # Count usable correspondences (weights may be continuous confidences).
    n_valid = jnp.sum(w > 0)

    # Work in normalized camera coordinates for conditioning.
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    uv_norm = jnp.stack([(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy], axis=-1)
    uv_norm = jnp.where(w[:, None] > 0, uv_norm, 0.0)
    Xs = jnp.where(w[:, None] > 0, X, 0.0)

    # Full float32 matmul precision throughout: TPUs default f32 matmuls to
    # bfloat16 mantissas, which wrecks the conditioning of the EPnP normal
    # matrix / GN steps on near-degenerate (small-span, near-planar)
    # configurations — measured ~20x ADD blowup on such frames without this.
    with jax.default_matmul_precision("highest"):
        R, t = _solve_core(Xs, uv_norm, w, refinement, gn_iters, multi_start)

        valid_mask = (w > 0).astype(jnp.float32)

        def _px_errors(R_, t_):
            # Unweighted per-point pixel reprojection error, masked to
            # validity.
            res_ = _reproj_residuals(R_, t_, Xs, uv_norm, valid_mask)
            return jnp.sqrt(jnp.sum((res_ * jnp.array([fx, fy])) ** 2, axis=1))

        if reject_outliers_px is not None:
            # Deterministic robustifier via LEAVE-ONE-OUT influence: while
            # the worst residual exceeds the threshold and >4 points remain,
            # re-solve FROM SCRATCH once per candidate point (vmapped) and
            # drop the point whose removal leaves the best remaining fit.
            # Selecting by worst RESIDUAL instead is wrong on exactly the
            # frames that matter: a gross outlier drags the least-squares
            # pose until a GOOD point reprojects worst (measured: outlier at
            # 22.6 px, good point at 34.1 px on a real frame), so
            # argmax-residual evicts good points and makes the pose WORSE.
            # LOO costs N extra solves per trip — all vmapped, negligible
            # next to the model.  Fixed trip count (3) keeps it jittable;
            # with <=3 rejections and the >=4-point floor this covers the
            # reference's 7-17-keypoint robots.  (No reference analog;
            # RANSAC is the reference's only outlier story,
            # dream/geometric_vision.py:116-180.)
            n_pts = w.shape[0]
            px_scale = jnp.array([fx, fy])

            def _loo_solve(i, w_cur):
                w_i = w_cur * (1.0 - jax.nn.one_hot(i, n_pts))
                R_i, t_i = _solve_core(
                    Xs, uv_norm, w_i, refinement, gn_iters, multi_start
                )
                res_i = _reproj_residuals(
                    R_i, t_i, Xs, uv_norm, (w_i > 0).astype(jnp.float32)
                )
                px = jnp.sqrt(jnp.sum((res_i * px_scale) ** 2, axis=1))
                cost = jnp.max(jnp.where(w_i > 0, px, 0.0))
                # Never "drop" an already-invalid point.
                return R_i, t_i, jnp.where(w_cur[i] > 0, cost, jnp.inf)

            w_cur = w
            R_cur, t_cur = R, t
            for _ in range(3):
                err_i = _px_errors(R_cur, t_cur)
                worst_err = jnp.max(jnp.where(w_cur > 0, err_i, -jnp.inf))
                do_drop = (worst_err > reject_outliers_px) & (
                    jnp.sum(w_cur > 0) > 4
                )
                R_all, t_all, costs = jax.vmap(
                    lambda i: _loo_solve(i, w_cur)
                )(jnp.arange(n_pts))
                best_i = jnp.argmin(costs)
                R_cur = jnp.where(do_drop, R_all[best_i], R_cur)
                t_cur = jnp.where(do_drop, t_all[best_i], t_cur)
                w_cur = jnp.where(
                    do_drop,
                    w_cur * (1.0 - jax.nn.one_hot(best_i, n_pts)),
                    w_cur,
                )
            R, t = R_cur, t_cur
            # The returned error describes the fit actually produced: only
            # surviving correspondences count (a dropped outlier's residual
            # would otherwise trip downstream reproj-error pose gates,
            # e.g. serve.py --max-reproj-err-px, on a good pose).
            valid_mask = (w_cur > 0).astype(jnp.float32)

        err = _px_errors(R, t)
        mean_err = jnp.sum(err * valid_mask) / (jnp.sum(valid_mask) + _EPS)

    valid = (n_valid >= 4) & jnp.all(jnp.isfinite(t)) & jnp.isfinite(mean_err)
    quat = quaternion_from_rotation_matrix(R)

    zero3 = jnp.zeros(3)
    return PnPResult(
        valid=valid,
        translation=jnp.where(valid, t, zero3),
        quaternion=jnp.where(valid, quat, jnp.array([0.0, 0.0, 0.0, 1.0])),
        rotation=jnp.where(valid, R, jnp.eye(3)),
        reproj_error=jnp.where(valid, mean_err, jnp.inf),
    )


# -----------------------------------------------------------------------------
# RANSAC variant
# -----------------------------------------------------------------------------


def solve_pnp_ransac(
    canonical_points,
    projections,
    camera_K,
    key: Optional[jax.Array] = None,
    weights: Optional[jnp.ndarray] = None,
    inlier_thresh_px: float = 5.0,  # reference dream/geometric_vision.py:121
    n_hypotheses: int = 64,
    gn_iters: int = 20,
):
    """Fixed-trip-count RANSAC PnP (reference dream/geometric_vision.py:116-180).

    Samples ``n_hypotheses`` minimal 4-point subsets (vmapped), scores inliers
    by pixel reprojection error, then refits on the best inlier set with the
    full solver.  Returns ``(PnPResult, inlier_mask [N])``.
    """
    X = jnp.asarray(canonical_points, dtype=jnp.float32)
    uv = jnp.asarray(projections, dtype=jnp.float32)
    K = jnp.asarray(camera_K, dtype=jnp.float32)
    N = X.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)

    auto_valid = (
        jnp.all(jnp.isfinite(X), axis=1)
        & jnp.all(jnp.isfinite(uv), axis=1)
        & jnp.all(uv > -999.0, axis=1)
    )
    w = auto_valid.astype(jnp.float32)
    if weights is not None:
        w = w * jnp.asarray(weights, dtype=jnp.float32)

    # Sample hypothesis subsets biased to valid points.
    logits = jnp.where(w > 0, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)

    def one_hypothesis(k):
        idx = jax.random.choice(k, N, shape=(4,), replace=False, p=jax.nn.softmax(logits))
        sub_w = jnp.zeros(N).at[idx].set(1.0) * w
        # Single-start GN per hypothesis: the consensus vote, not the
        # hypothesis solver, provides robustness — multi-start here would
        # multiply the kernel 7x for no accuracy gain.
        result = solve_pnp(
            X, uv, K, weights=sub_w, refinement=True, gn_iters=8,
            multi_start=False,
        )
        proj = point_projection_from_3d(K, X @ result.rotation.T + result.translation)
        err = jnp.linalg.norm(proj - uv, axis=1)
        inliers = (err < inlier_thresh_px) & (w > 0)
        score = jnp.where(result.valid, jnp.sum(inliers), -1)
        return score, inliers

    scores, inlier_sets = jax.vmap(one_hypothesis)(keys)
    best = jnp.argmax(scores)
    best_inliers = inlier_sets[best]

    final = solve_pnp(
        X, uv, K, weights=best_inliers.astype(jnp.float32), gn_iters=gn_iters
    )

    # Consensus fallback: when the best hypothesis leaves fewer than 4
    # inliers (tight threshold / noisy detections), fall back to the plain
    # all-point solve instead of failing the frame — RANSAC should never have
    # a worse success rate than single-solve.  (The reference's
    # cv2.solvePnPRansac fails outright in this regime,
    # dream/geometric_vision.py:174-178.)
    plain = solve_pnp(X, uv, K, weights=weights, gn_iters=gn_iters)
    use_ransac = final.valid
    merged = PnPResult(
        valid=jnp.where(use_ransac, final.valid, plain.valid),
        translation=jnp.where(use_ransac, final.translation, plain.translation),
        quaternion=jnp.where(use_ransac, final.quaternion, plain.quaternion),
        rotation=jnp.where(use_ransac, final.rotation, plain.rotation),
        reproj_error=jnp.where(use_ransac, final.reproj_error, plain.reproj_error),
    )
    merged_inliers = jnp.where(use_ransac, best_inliers, w > 0)
    return merged, merged_inliers


def add_from_pose(
    translation,
    quaternion,
    keypoint_positions_wrt_cam_gt,
    weights=None,
    rotation_convention: str = "standard",
):
    """Average 3D keypoint distance under the recovered pose.

    Parity: reference dream/geometric_vision.py:183-202 (applies [R|t] to the
    GT camera-frame keypoints and takes the mean L2 to the untransformed GT).
    The reference computes this over ``kp_pos_gt_pnp`` — only the keypoints
    with good detections that were fed to PnP (dream/analysis.py:322-339);
    pass the same 0/1 detection mask as ``weights`` to match that accounting.

    Rotation-convention note (``rotation_convention``): the reference builds
    its transform from ``pyrr.Quaternion.matrix33`` and applies it
    column-vector style (``transform @ points.T``).  The quaternion itself is
    standard — the reference ROS node feeds it to the column-vector
    ``tf.transformations.quaternion_matrix`` and the published TF tree works
    (reference scripts/launch_dream_ros.py:463-482) — but pyrr documents
    row-major/row-vector matrices, so its ``matrix33`` may be the TRANSPOSE of
    the standard rotation matrix, in which case the reference's ADD
    effectively applies ``R^T``.  pyrr cannot be installed in this egress-free
    environment to check, and the choice is NOT negligible: for PnP-recovered
    poses the rotation and translation errors are anticorrelated
    (``R x + t ~= x``), so applying ``R^T`` roughly doubles the first-order
    error term (measured ~3x mean ADD on noisy synthetic solves,
    tests/test_pnp.py::test_add_rotation_convention_matters).

    - ``"standard"`` (default): ``aligned = R @ kp + t`` — matches
      ``cv2.Rodrigues``/``tf.transformations`` and the metric's intent.
    - ``"transposed"``: ``aligned = R^T @ kp + t`` — what the reference
      computes IF pyrr's ``matrix33`` is row-vector laid out.

    ``scripts/parity_check.py`` resolves the question empirically against the
    reference's own ``pnp_results.csv`` when real data is present.
    """
    R = rotation_matrix_from_quaternion(jnp.asarray(quaternion))
    if rotation_convention == "transposed":
        R = R.T
    else:
        assert rotation_convention == "standard", rotation_convention
    kp = jnp.asarray(keypoint_positions_wrt_cam_gt)
    aligned = kp @ R.T + jnp.asarray(translation)
    dists = jnp.linalg.norm(aligned - kp, axis=-1)
    if weights is None:
        return jnp.mean(dists)
    w = jnp.asarray(weights, dtype=dists.dtype)
    return jnp.sum(dists * w) / (jnp.sum(w) + _EPS)

"""Serving-node tests: state machine + HTTP transport round trip.

Covers the reference ROS node's behavior surface
(reference scripts/launch_dream_ros.py): camera_info / FK keypoint intake,
per-frame processing, single- vs multi-frame buffer semantics, pose
publication (robot-from-camera inverse), and debug renders — over HTTP.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax.numpy as jnp

from dream_tpu.network import DreamNetwork
from dream_tpu.serve import DreamInferenceServer, make_http_server
from tests.test_network import _vgg_config


class _OracleNetwork(DreamNetwork):
    """DreamNetwork whose keypoints_from_image returns planted GT projections
    (isolates serve-layer logic from model quality)."""

    def __init__(self, planted_projs, planted_best_peaks=None,
                 planted_scores=None, **kwargs):
        super().__init__(_vgg_config(), **kwargs)
        self._planted = np.asarray(planted_projs, dtype=float)
        self._best_peaks = (
            self._planted if planted_best_peaks is None
            else np.asarray(planted_best_peaks, dtype=float)
        )
        self._scores = (
            np.ones(len(self._planted)) if planted_scores is None
            else np.asarray(planted_scores, dtype=float)
        )

    def keypoints_from_image(self, image, image_preprocessing_override=None,
                             debug=False, detailed=False):
        result = {"detected_keypoints": self._planted.copy()}
        if detailed:
            result["peak_scores"] = self._scores.copy()
            result["best_peak_keypoints"] = self._best_peaks.copy()
        if debug:
            result["image_rgb_net_input"] = np.zeros((64, 64, 3), np.float32)
            result["belief_maps"] = np.zeros((4, 16, 16), np.float32)
            result["detected_keypoints_net_output"] = self._planted / 4.0
            result["detected_keypoints_net_input"] = self._planted.copy()
        return result


def _make_scene():
    """GT pose + keypoints + projections for a synthetic camera."""
    rng = np.random.RandomState(0)
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    X = rng.uniform(-0.3, 0.3, (4, 3))
    t = np.array([0.0, 0.0, 1.5])
    Xc = X + t  # identity rotation
    uv = (Xc @ K.T)
    uv = uv[:, :2] / uv[:, 2:]
    return K, X, uv, t


def test_serve_state_machine_single_frame():
    K, X, uv, t_gt = _make_scene()
    net = _OracleNetwork(uv)
    server = DreamInferenceServer(net, base_frame="base", single_frame_mode=True)

    image = np.zeros((240, 320, 3), np.uint8)

    # No intrinsics / FK yet -> no pose.
    status = server.process_image(image)
    assert status["pnp"] is False
    assert server.get_pose()["ok"] is False

    server.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    server.on_keypoint_positions(X)
    status = server.process_image(image)
    assert status["pnp"] is True

    pose = server.get_pose()
    assert pose["ok"]
    # camera_from_robot should recover t_gt (identity rotation).
    np.testing.assert_allclose(
        pose["camera_from_robot"]["translation"], t_gt, atol=1e-3
    )
    # published pose is the inverse.
    np.testing.assert_allclose(pose["translation"], -t_gt, atol=1e-3)

    # Single-frame mode never grows the buffer.
    assert server.get_status()["buffer_size"] == 0


def test_serve_multi_frame_buffer():
    K, X, uv, _ = _make_scene()
    net = _OracleNetwork(uv)
    server = DreamInferenceServer(net, base_frame="base", single_frame_mode=False)
    server.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    server.on_keypoint_positions(X)

    image = np.zeros((240, 320, 3), np.uint8)

    # Without a capture request, frames do not touch the buffer.
    status = server.process_image(image)
    assert status["pnp"] is False
    assert server.get_status()["buffer_size"] == 0

    server.capture_frame()
    status = server.process_image(image)
    assert status["pnp"] is True
    assert server.get_status()["buffer_size"] == 4

    server.capture_frame()
    server.process_image(image)
    assert server.get_status()["buffer_size"] == 8

    server.clear_buffer()
    assert server.get_status()["buffer_size"] == 0


def test_serve_rejects_bad_keypoint_positions():
    _, X, uv, _ = _make_scene()
    server = DreamInferenceServer(_OracleNetwork(uv), base_frame="base")
    with pytest.raises(AssertionError):
        server.on_keypoint_positions(np.zeros((3, 3)))  # wrong n_kp


def test_serve_sentinel_detections_skipped():
    K, X, uv, _ = _make_scene()
    uv_partial = uv.copy()
    uv_partial[0] = [-999.999, -999.999]  # one keypoint not detected
    server = DreamInferenceServer(_OracleNetwork(uv_partial), base_frame="base")
    server.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    server.on_keypoint_positions(X)
    image = np.zeros((240, 320, 3), np.uint8)
    # 3 valid correspondences < 4 -> no PnP.
    status = server.process_image(image)
    assert status["pnp"] is False
    assert status["n_detected"] == 3


def test_http_transport_round_trip():
    from PIL import Image

    K, X, uv, t_gt = _make_scene()
    server = DreamInferenceServer(_OracleNetwork(uv), base_frame="base")
    httpd = make_http_server(server, "127.0.0.1", 0)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()

    def post(path, data):
        req = urllib.request.Request(f"http://127.0.0.1:{port}{path}", data=data)
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    def get(path):
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as resp:
            return resp.read(), resp.headers.get("Content-Type")

    try:
        assert post("/camera_info", json.dumps(
            {"fx": K[0, 0], "fy": K[1, 1], "cx": K[0, 2], "cy": K[1, 2]}
        ).encode())["ok"]
        assert post("/keypoint_positions", json.dumps(X.tolist()).encode())["ok"]

        buf = io.BytesIO()
        Image.new("RGB", (320, 240)).save(buf, format="PNG")
        result = post("/image", buf.getvalue())
        assert result["ok"] and result["pnp"]

        body, ctype = get("/pose")
        pose = json.loads(body)
        assert pose["ok"]
        np.testing.assert_allclose(
            pose["camera_from_robot"]["translation"], t_gt, atol=1e-3
        )

        body, ctype = get("/status")
        assert json.loads(body)["frames_processed"] == 1

        body, ctype = get("/debug/keypoint_overlay.png")
        assert ctype == "image/png"

        # Unknown endpoint -> 404 JSON error.
        try:
            get("/nonsense")
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()


def test_pose_triad_debug_stream():
    K, X, uv, t_gt = _make_scene()
    server = DreamInferenceServer(_OracleNetwork(uv), base_frame="base")
    server.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    server.on_keypoint_positions(X)
    # No pose yet -> None.
    assert server.render_debug("keypoint_frame_overlay") is None
    server.process_image(np.zeros((240, 320, 3), np.uint8))
    img = server.render_debug("keypoint_frame_overlay")
    assert img is not None
    arr = np.asarray(img)
    # Triad axis lines must have been drawn (non-black pixels on black input).
    assert (arr.sum(axis=-1) > 0).sum() > 20


def test_serve_reproj_error_gate():
    """max_reproj_err_px rejects geometrically-inconsistent solutions (one
    corrupted correspondence) while clean frames still publish."""
    K, X, uv, t_gt = _make_scene()
    uv_bad = uv.copy()
    uv_bad[1] += [60.0, -45.0]  # confidently-wrong detection
    image = np.zeros((240, 320, 3), np.uint8)

    # Gated server rejects the corrupted frame...
    net = _OracleNetwork(uv_bad)
    gated = DreamInferenceServer(
        net, base_frame="base", single_frame_mode=True, max_reproj_err_px=3.0
    )
    gated.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    gated.on_keypoint_positions(X)
    status = gated.process_image(image)
    assert status["pnp"] is False
    assert gated.get_pose()["ok"] is False

    # ...an ungated server publishes it (reference parity), and the gated
    # server accepts a clean frame.
    ungated = DreamInferenceServer(
        _OracleNetwork(uv_bad), base_frame="base", single_frame_mode=True
    )
    ungated.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    ungated.on_keypoint_positions(X)
    assert ungated.process_image(image)["pnp"] is True

    clean = DreamInferenceServer(
        _OracleNetwork(uv), base_frame="base", single_frame_mode=True,
        max_reproj_err_px=3.0,
    )
    clean.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    clean.on_keypoint_positions(X)
    assert clean.process_image(image)["pnp"] is True
    assert clean.get_pose()["ok"] is True


def test_serve_soft_detections_recover_below_floor_frames():
    """pnp_soft_detections solves frames whose canonical detections fall
    below the 4-point PnP floor, using the unconditional best peaks."""
    K, X, uv, t_gt = _make_scene()
    uv_partial = uv.copy()
    uv_partial[0] = [-999.999, -999.999]  # disambiguation rejected this kp
    image = np.zeros((240, 320, 3), np.uint8)

    # Canonical mode: 3 < 4 detections -> no pose.
    canonical = DreamInferenceServer(
        _OracleNetwork(uv_partial), base_frame="base", single_frame_mode=True
    )
    canonical.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    canonical.on_keypoint_positions(X)
    assert canonical.process_image(image)["pnp"] is False

    # Soft mode: the best peak for the rejected keypoint is still right
    # (score 0.5 > floor) -> pose recovered.
    soft = DreamInferenceServer(
        _OracleNetwork(uv_partial, planted_best_peaks=uv,
                       planted_scores=[0.5, 0.9, 0.9, 0.9]),
        base_frame="base", single_frame_mode=True, pnp_soft_detections=True,
    )
    soft.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    soft.on_keypoint_positions(X)
    assert soft.process_image(image)["pnp"] is True
    np.testing.assert_allclose(
        soft.get_pose()["camera_from_robot"]["translation"], t_gt, atol=1e-3
    )

    # Below-floor peaks stay excluded: score 0.01 -> back under the floor.
    floor = DreamInferenceServer(
        _OracleNetwork(uv_partial, planted_best_peaks=uv,
                       planted_scores=[0.01, 0.9, 0.9, 0.9]),
        base_frame="base", single_frame_mode=True, pnp_soft_detections=True,
    )
    floor.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    floor.on_keypoint_positions(X)
    assert floor.process_image(image)["pnp"] is False


def test_serve_outlier_rejection():
    """pnp_reject_outliers_px recovers the pose when one of five
    correspondences is confidently wrong."""
    rng = np.random.RandomState(1)
    K = np.array([[300.0, 0, 160.0], [0, 300.0, 120.0], [0, 0, 1.0]])
    X = rng.uniform(-0.3, 0.3, (5, 3))
    t_gt = np.array([0.0, 0.0, 1.5])
    uv = ((X + t_gt) @ K.T)
    uv = uv[:, :2] / uv[:, 2:]
    uv_bad = uv.copy()
    uv_bad[2] += [55.0, -40.0]
    image = np.zeros((240, 320, 3), np.uint8)

    robust = _OracleNetwork(uv_bad)
    robust.n_keypoints = 5
    server = DreamInferenceServer(
        robust, base_frame="base", single_frame_mode=True,
        pnp_reject_outliers_px=5.0,
    )
    server.on_camera_info(K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    server.on_keypoint_positions(X)
    assert server.process_image(image)["pnp"] is True
    np.testing.assert_allclose(
        server.get_pose()["camera_from_robot"]["translation"], t_gt, atol=5e-3
    )


def test_serve_online_int8_calibration():
    """First N frames run float and calibrate; then the conv stack switches
    to int8 (dream_tpu extension — reference serves fp32 only)."""
    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)
    server = DreamInferenceServer(
        net, base_frame="base", int8_calibration_frames=2
    )
    image = np.zeros((96, 128, 3), np.uint8)

    assert server.get_status()["int8"] == "calibrating"
    server.process_image(image)
    assert server.get_status()["int8"] == "calibrating"
    float_fn = net.__dict__.get("_inference_fn")
    server.process_image(image)  # second frame completes calibration
    assert server.get_status()["int8"] == "active"
    assert net.__dict__["_inference_fn"] is not float_fn

    # Frames keep serving through the quantized stack.
    status = server.process_image(image)
    assert status["frame"] == 3
    assert server.latest_detection["detected_keypoints"].shape == (4, 2)

    # Disabled by default.
    off = DreamInferenceServer(net, base_frame="base")
    assert off.get_status()["int8"] == "off"


def test_serve_from_export_artifact(tmp_path):
    """Serving a jax.export artifact: no checkpoint/model code at serving
    time — the adapter feeds the server raw-frame detections and belief
    maps (dream_tpu/export.py + ArtifactInference)."""
    from dream_tpu.export import export_inference
    from dream_tpu.serve import ArtifactInference

    net = DreamNetwork(_vgg_config())
    net.init_variables(seed=0)
    artifact = tmp_path / "net.jaxexport"
    artifact.write_bytes(export_inference(net, raw_resolution=(128, 96),
                                          batch_size=1))

    adapter = ArtifactInference(
        str(artifact), [f"kp{i}" for i in range(4)]
    )
    assert adapter.n_keypoints == 4
    server = DreamInferenceServer(adapter, base_frame="base")
    image = np.zeros((96, 128, 3), np.uint8)
    status = server.process_image(image)
    assert status["frame"] == 1 and status["pnp"] is False

    # Detection contract matches the live network exactly.
    live = net.keypoints_from_image(image)["detected_keypoints"]
    art = server.latest_detection["detected_keypoints"]
    detected = live > -999.0
    np.testing.assert_array_equal(art > -999.0, detected)
    np.testing.assert_allclose(art[detected], live[detected], atol=1e-3)

    # Debug streams: belief maps render; the net-input stream degrades to
    # None (it exists only inside the compiled graph).
    assert server.render_debug("belief_maps") is not None
    assert server.render_debug("keypoint_overlay") is not None
    assert server.render_debug("net_input_image") is None

    # Wrong-resolution frames are rejected, not silently resized.
    with pytest.raises(AssertionError):
        server.process_image(np.zeros((64, 64, 3), np.uint8))

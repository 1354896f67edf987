"""Online pose serving: the TPU-host equivalent of the reference ROS node.

The reference ships real-time serving as a ROS-Kinetic node
(reference scripts/launch_dream_ros.py:60-719): subscribe camera image +
intrinsics topics, look up per-keypoint 3D positions from the robot's live TF
tree (forward kinematics), run inference + PnP, broadcast the
robot-from-camera transform, publish debug overlay images, and expose
capture-frame / clear-buffer services for multi-frame calibration.

ROS is absent on TPU hosts, so dream_tpu serves the same capability shape
over HTTP/JSON (stdlib only — no extra deps):

| reference ROS surface                      | dream_tpu HTTP surface          |
|--------------------------------------------|---------------------------------|
| image topic subscription                   | POST /image (png/jpeg bytes)    |
| camera_info topic                          | POST /camera_info               |
| TF lookups of keypoint frames (FK)         | POST /keypoint_positions        |
| /dream/capture_frame service               | POST /capture_frame             |
| /dream/clear_buffer service                | POST /clear_buffer              |
| TF broadcast base->dream/camera_rgb_frame  | GET /pose                       |
| debug image topics                         | GET /debug/<stream>.png         |

Single-frame vs multi-frame buffer semantics mirror the reference
(reference scripts/launch_dream_ros.py:429-496): in multi-frame mode,
correspondences accumulate into a buffer whenever PnP succeeds after a
capture request; the published pose is the robot-from-camera inverse of the
PnP camera-from-robot solution.
"""

from __future__ import annotations

import io
import json
import threading
import time
from typing import Optional

import numpy as np


class ArtifactInference:
    """Network-like adapter that serves a jax.export artifact
    (dream_tpu/export.py) — deserialized StableHLO + the manipulator's
    keypoint names.  At serving time only jax and the artifact file are
    needed: no checkpoint, flax model code, or weights on disk.

    The artifact returns raw-frame keypoint coords directly, so the
    server's PnP/pose path is unchanged.  Soft-detection PnP and online
    int8 calibration are unavailable (the artifact bakes hard detections
    and its quantization choice at export time).
    """

    def __init__(self, artifact_path, keypoint_names=None, friendly_names=None):
        import json
        import os

        from jax import export as jax_export

        with open(artifact_path, "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        aval = self._exported.in_avals[0]
        self._batch, self._h, self._w = aval.shape[0], aval.shape[1], aval.shape[2]
        if keypoint_names is None:
            # The export CLI writes a <artifact>.meta.json sidecar with the
            # manipulator's keypoint names.
            meta_path = artifact_path + ".meta.json"
            assert os.path.exists(meta_path), (
                "keypoint_names not given and no metadata sidecar found at "
                f"{meta_path}"
            )
            with open(meta_path) as f:
                meta = json.load(f)
            keypoint_names = meta["keypoint_names"]
            friendly_names = friendly_names or meta.get("friendly_keypoint_names")
        self.keypoint_names = list(keypoint_names)
        self.friendly_keypoint_names = list(friendly_names or keypoint_names)
        self.n_keypoints = len(self.keypoint_names)

    def enable_evaluation(self):
        pass

    def keypoints_from_image(self, image, image_preprocessing_override=None,
                             debug=False, detailed=False):
        assert not detailed, (
            "soft-detection PnP needs the full network; the artifact "
            "exports the disambiguated detections only."
        )
        arr = np.asarray(image, dtype=np.uint8)
        assert arr.shape == (self._h, self._w, 3), (
            f"artifact expects {self._h}x{self._w} RGB frames, got {arr.shape}"
        )
        batch = np.zeros((self._batch, self._h, self._w, 3), np.uint8)
        batch[0] = arr
        belief, kps = self._exported.call(batch)
        result = {"detected_keypoints": np.asarray(kps[0], dtype=float)}
        if debug:
            result["belief_maps"] = np.asarray(belief[0])
        return result


class DreamInferenceServer:
    """Framework core of the serving node (transport-agnostic, fully testable).

    State machine parity: reference scripts/launch_dream_ros.py:60-626.
    """

    def __init__(
        self,
        dream_network,
        base_frame: str = "base_link",
        single_frame_mode: bool = True,
        verbose: bool = False,
        max_reproj_err_px: Optional[float] = None,
        pnp_reject_outliers_px: Optional[float] = None,
        pnp_soft_detections: bool = False,
        pnp_soft_min_score: float = 0.05,
        int8_calibration_frames: int = 0,
    ):
        self.network = dream_network
        self.network.enable_evaluation()
        self.base_frame = base_frame
        self.single_frame_mode = single_frame_mode
        self.verbose = verbose
        # Reprojection-error gate: a PnP solution whose mean reprojection
        # error exceeds this is rejected (pose not published, buffer not
        # grown).  The reference has no such gate — it publishes every
        # cv2-"successful" pose — but confidently-wrong clustered detections
        # produce geometrically-consistent garbage poses; gating on
        # reprojection error filters them.  None disables (reference parity).
        self.max_reproj_err_px = max_reproj_err_px
        # Robust-PnP extensions, same semantics as the offline analysis
        # options (dream_tpu/analysis.py analyze_ndds_dataset):
        # - reject_outliers_px: after a first solve, drop correspondences
        #   reprojecting worse than this and fully re-solve.
        # - soft detections: feed PnP the best belief-map peak for every
        #   keypoint above the score floor, even those the score-gap
        #   disambiguation rejects from the published detections.
        self.pnp_reject_outliers_px = pnp_reject_outliers_px
        self.pnp_soft_detections = pnp_soft_detections
        self.pnp_soft_min_score = pnp_soft_min_score
        # Online int8 quantization (dream_tpu extension, vgg architectures):
        # the first N frames run in float while their net inputs are
        # buffered as calibration data; frame N+1 onward runs the int8 conv
        # stack (2x MXU rate on v5e).  0 disables.
        self.int8_calibration_frames = int(int8_calibration_frames)
        self._int8_calib_inputs: list = []
        self._int8_active = False

        self.camera_K: Optional[np.ndarray] = None
        self.keypoint_positions: Optional[np.ndarray] = None  # FK-provided [n_kp, 3]
        self.capture_requested = single_frame_mode

        self.kp_projs_raw_buffer = np.empty((0, 2))
        self.kp_positions_buffer = np.empty((0, 3))

        self.pnp_solution_found = False
        self.latest_pose = None  # dict, robot_from_cam
        self.latest_detection = None
        self.latest_image = None
        self.frames_processed = 0
        self._lock = threading.Lock()

    # -- input channels ------------------------------------------------

    def on_camera_info(self, fx, fy, cx, cy):
        """Parity: reference :215-221 (builds K from camera_info)."""
        with self._lock:
            self.camera_K = np.array(
                [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]]
            )

    def on_keypoint_positions(self, positions):
        """FK-provided 3D keypoint positions in the base frame — the HTTP
        replacement for live TF lookups (reference :383-406)."""
        positions = np.asarray(positions, dtype=float)
        assert positions.shape == (self.network.n_keypoints, 3), (
            f"Expected [{self.network.n_keypoints}, 3] keypoint positions, got "
            f"{positions.shape}."
        )
        with self._lock:
            self.keypoint_positions = positions

    def capture_frame(self):
        """Service parity: reference :72-77 — the next processed frame's
        correspondences are added to the PnP buffer."""
        with self._lock:
            self.capture_requested = True
        return {"ok": True}

    def clear_buffer(self):
        with self._lock:
            self.kp_projs_raw_buffer = np.empty((0, 2))
            self.kp_positions_buffer = np.empty((0, 3))
            self.pnp_solution_found = False
        return {"ok": True}

    # -- processing ----------------------------------------------------

    def process_image(self, image):
        """Full per-frame pipeline: detect -> correspond -> PnP -> pose.

        ``image``: PIL image or HxWx3 uint8 array.  Returns a status dict.
        Parity: the reference's rate-loop body (reference :694-719).
        """
        detection = self.network.keypoints_from_image(
            image, debug=True, detailed=self.pnp_soft_detections
        )
        detected = detection["detected_keypoints"]

        if self.int8_calibration_frames and not self._int8_active:
            calib = None
            with self._lock:
                # Re-check under the lock: another handler thread may have
                # completed calibration while this frame was in flight.
                if not self._int8_active and self._int8_calib_inputs is not None:
                    self._int8_calib_inputs.append(
                        np.asarray(detection["image_rgb_net_input"])
                    )
                    if (
                        len(self._int8_calib_inputs)
                        >= self.int8_calibration_frames
                    ):
                        calib = np.stack(self._int8_calib_inputs)
                        # None marks calibration as claimed, so concurrent
                        # frames neither buffer further nor calibrate twice.
                        self._int8_calib_inputs = None
            if calib is not None:
                # The calibration compile can take minutes through the
                # remote-compile relay — run it OUTSIDE the lock so status/
                # pose endpoints stay responsive.  The inference-fn swap
                # inside enable_int8_inference is a plain attribute store
                # (atomic for concurrent readers).
                self.network.enable_int8_inference([calib])
                with self._lock:
                    self._int8_active = True
                if self.verbose:
                    print(
                        f"[serve] int8 inference active (calibrated on "
                        f"{calib.shape[0]} frames)"
                    )

        with self._lock:
            self.latest_detection = detection
            self.latest_image = np.asarray(image)
            self.frames_processed += 1
            keypoint_positions = self.keypoint_positions
            camera_K = self.camera_K
            capture = self.capture_requested or self.single_frame_mode
            if not self.single_frame_mode:
                self.capture_requested = False

        status = {
            "frame": self.frames_processed,
            "n_detected": int(
                np.sum((detected[:, 0] > -999.0) & (detected[:, 1] > -999.0))
            ),
            "pnp": False,
        }

        if keypoint_positions is None or camera_K is None or not capture:
            return status

        # Keep in-frame detections (reference :409-427).  In soft mode the
        # correspondence set is instead every unconditional best peak above
        # the score floor (published detections are unaffected).
        if self.pnp_soft_detections:
            good = detection["peak_scores"] > self.pnp_soft_min_score
            kp_projs = detection["best_peak_keypoints"][good]
        else:
            good = (detected[:, 0] > -999.0) & (detected[:, 1] > -999.0)
            kp_projs = detected[good]
        kp_pos = keypoint_positions[good]

        status["pnp"] = self._solve_pnp_buffer(kp_projs, kp_pos, camera_K)
        return status

    def _solve_pnp_buffer(self, candidate_projs, candidate_positions, camera_K):
        """Parity: reference :429-496 (buffer concat + solve + invert)."""
        import jax.numpy as jnp

        from dream_tpu.ops import geometric_vision as gv

        # Snapshot the buffers under the lock: ThreadingHTTPServer handles
        # requests concurrently, so /clear_buffer or a second /image could
        # otherwise race this read-solve-update sequence.
        with self._lock:
            projs = np.concatenate([self.kp_projs_raw_buffer, candidate_projs])
            positions = np.concatenate(
                [self.kp_positions_buffer, candidate_positions]
            )
        if len(projs) < 4:
            with self._lock:
                self.pnp_solution_found = False
            return False

        result = gv.solve_pnp(
            jnp.asarray(positions, jnp.float32),
            jnp.asarray(projs, jnp.float32),
            jnp.asarray(camera_K, jnp.float32),
            reject_outliers_px=self.pnp_reject_outliers_px,
        )
        gated = (
            self.max_reproj_err_px is not None
            and float(result.reproj_error) > self.max_reproj_err_px
        )
        if not bool(result.valid) or gated:
            with self._lock:
                self.pnp_solution_found = False
            return False

        # Invert camera-from-robot -> robot-from-camera (reference :463-482).
        R = np.asarray(result.rotation)
        t = np.asarray(result.translation)
        R_inv = R.T
        t_inv = -R_inv @ t
        quat_inv = np.asarray(
            gv.quaternion_from_rotation_matrix(jnp.asarray(R_inv))
        )

        with self._lock:
            self.pnp_solution_found = True
            self.latest_pose = {
                "parent_frame": self.base_frame,
                "child_frame": "dream/camera_rgb_frame",
                "translation": t_inv.tolist(),
                "quaternion_xyzw": quat_inv.tolist(),
                "camera_from_robot": {
                    "translation": t.tolist(),
                    "quaternion_xyzw": np.asarray(result.quaternion).tolist(),
                },
                "reprojection_error_px": float(result.reproj_error),
                "n_correspondences": int(len(projs)),
                "stamp": time.time(),
            }
            if not self.single_frame_mode:
                self.kp_projs_raw_buffer = projs
                self.kp_positions_buffer = positions
        return True

    # -- output channels ----------------------------------------------

    def get_pose(self):
        with self._lock:
            if self.latest_pose is None:
                return {"ok": False, "error": "no pose solution yet"}
            return dict(self.latest_pose, ok=True)

    def get_status(self):
        with self._lock:
            return {
                "ok": True,
                "frames_processed": self.frames_processed,
                "camera_info_received": self.camera_K is not None,
                "keypoint_positions_received": self.keypoint_positions is not None,
                "pnp_solution_found": self.pnp_solution_found,
                "buffer_size": int(self.kp_projs_raw_buffer.shape[0]),
                "single_frame_mode": self.single_frame_mode,
                "keypoint_names": self.network.friendly_keypoint_names,
                "int8": (
                    "active" if self._int8_active
                    else "calibrating" if self.int8_calibration_frames
                    else "off"
                ),
            }

    def render_debug(self, stream: str):
        """Debug overlay renders (reference topics :143-157), produced on
        demand, like the reference's subscriber-gated publishing (:237-252)."""
        from PIL import Image as PILImage

        from dream_tpu import visualize as viz

        with self._lock:
            detection = self.latest_detection
            image = self.latest_image
        if detection is None:
            return None

        if stream == "net_input_image":
            # Unavailable when serving a jax.export artifact (the net input
            # exists only inside the compiled graph).
            if detection.get("image_rgb_net_input") is None:
                return None
            return viz.image_from_tensor(
                detection["image_rgb_net_input"],
                self.network.image_normalization,
            )
        if stream == "keypoint_overlay":
            return viz.overlay_points_on_image(
                PILImage.fromarray(image), detection["detected_keypoints"],
                self.network.friendly_keypoint_names,
            )
        if stream == "belief_maps":
            return viz.mosaic_images(
                viz.images_from_belief_maps(np.asarray(detection["belief_maps"])),
                rows=1, cols=self.network.n_keypoints,
            )
        if stream == "keypoint_belief_overlay":
            combined = np.max(np.asarray(detection["belief_maps"]), axis=0)
            blend = viz.blend_belief_overlay(PILImage.fromarray(image), combined)
            return viz.overlay_points_on_image(
                blend, detection["detected_keypoints"]
            )
        if stream == "keypoint_frame_overlay":
            with self._lock:
                pose = self.latest_pose
                camera_K = self.camera_K
            if pose is None or camera_K is None:
                return None
            cam_from_robot = pose["camera_from_robot"]
            return viz.overlay_pose_triad(
                image, camera_K,
                cam_from_robot["translation"],
                cam_from_robot["quaternion_xyzw"],
            )
        return None


# ---------------------------------------------------------------------------
# HTTP transport
# ---------------------------------------------------------------------------


def make_http_server(server: DreamInferenceServer, host: str = "127.0.0.1", port: int = 8080):
    """Wrap a DreamInferenceServer in a threaded stdlib HTTP server.

    Binds loopback-only by default: the endpoints are unauthenticated and
    include state-mutating POSTs and camera debug streams.  Pass
    ``host="0.0.0.0"`` explicitly (e.g. ``serve_dream.py --host 0.0.0.0``) to
    expose the node on the network, ideally behind a reverse proxy that adds
    auth.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            if server.verbose:
                super().log_message(fmt, *args)

        def _send_json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_png(self, pil_image):
            buf = io.BytesIO()
            pil_image.save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _read_body(self):
            length = int(self.headers.get("Content-Length", 0))
            return self.rfile.read(length)

        def do_GET(self):
            if self.path == "/pose":
                self._send_json(server.get_pose())
            elif self.path == "/status":
                self._send_json(server.get_status())
            elif self.path.startswith("/debug/"):
                stream = self.path[len("/debug/"):].removesuffix(".png")
                img = server.render_debug(stream)
                if img is None:
                    self._send_json({"ok": False, "error": "no frame yet or unknown stream"}, 404)
                else:
                    self._send_png(img)
            else:
                self._send_json({"ok": False, "error": "unknown endpoint"}, 404)

        def do_POST(self):
            try:
                if self.path == "/image":
                    from PIL import Image as PILImage

                    img = PILImage.open(io.BytesIO(self._read_body())).convert("RGB")
                    self._send_json({"ok": True, **server.process_image(img)})
                elif self.path == "/camera_info":
                    info = json.loads(self._read_body())
                    server.on_camera_info(
                        info["fx"], info["fy"], info["cx"], info["cy"]
                    )
                    self._send_json({"ok": True})
                elif self.path == "/keypoint_positions":
                    server.on_keypoint_positions(json.loads(self._read_body()))
                    self._send_json({"ok": True})
                elif self.path == "/capture_frame":
                    self._send_json(server.capture_frame())
                elif self.path == "/clear_buffer":
                    self._send_json(server.clear_buffer())
                else:
                    self._send_json({"ok": False, "error": "unknown endpoint"}, 404)
            except Exception as exc:  # report errors to the client, keep serving
                self._send_json({"ok": False, "error": str(exc)}, 400)

    return ThreadingHTTPServer((host, port), Handler)

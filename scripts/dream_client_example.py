#!/usr/bin/env python3
"""Example robot-side client for the dream_tpu pose server.

Plays the role the ROS graph plays for the reference node: pushes camera
intrinsics, live forward-kinematics keypoint positions, and camera frames to
a running ``scripts/serve_dream.py``, then reads back the robot-from-camera
pose.  Stdlib only.

Usage:
  python scripts/dream_client_example.py --server http://localhost:8080 \
      --dataset /path/to/ndds_dir [--rate 10]

With an NDDS dataset the client replays its frames and uses the per-frame GT
3D keypoints as the "FK" source, so it doubles as an end-to-end smoke test
of a live serving deployment.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dream_tpu.utils import (
    find_ndds_data_in_dir,
    load_camera_intrinsics,
    load_keypoints,
)


def _post(server, path, data):
    req = urllib.request.Request(server + path, data=data)
    with urllib.request.urlopen(req) as resp:
        return json.loads(resp.read())


def _get(server, path):
    with urllib.request.urlopen(server + path) as resp:
        return json.loads(resp.read())


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("--server", default="http://localhost:8080")
    parser.add_argument("--dataset", required=True, help="NDDS dataset dir.")
    parser.add_argument("--rate", type=float, default=10.0, help="Frames/sec.")
    parser.add_argument("--max-frames", type=int, default=None)
    args = parser.parse_args()

    status = _get(args.server, "/status")
    keypoint_names = status["keypoint_names"]
    print(f"Server ready; manipulator keypoints: {keypoint_names}")

    found_data, found_configs = find_ndds_data_in_dir(args.dataset)
    K = load_camera_intrinsics(found_configs["camera"])
    _post(args.server, "/camera_info", json.dumps(
        {"fx": K[0, 0], "fy": K[1, 1], "cx": K[0, 2], "cy": K[1, 2]}
    ).encode())

    frames = found_data[: args.max_frames] if args.max_frames else found_data
    period = 1.0 / args.rate
    for datum in frames:
        t0 = time.time()

        # "FK": per-frame GT 3D keypoint positions from the dataset; on a real
        # robot this would come from the driver's forward kinematics.  The
        # server's manipulator config fixes the keypoint count and order.
        data_kp = load_keypoints(
            datum["data_path"],
            _first_object_class(datum["data_path"]),
            _dataset_names(datum, status),
        )
        _post(args.server, "/keypoint_positions",
              json.dumps(data_kp["positions_wrt_cam"]).encode())

        with open(datum["image_paths"]["rgb"], "rb") as f:
            result = _post(args.server, "/image", f.read())

        pose = _get(args.server, "/pose")
        if pose.get("ok"):
            t = [round(v, 4) for v in pose["translation"]]
            print(f"{datum['name']}: detected {result['n_detected']} kps, "
                  f"pose t={t} reproj={pose['reprojection_error_px']:.2f}px")
        else:
            print(f"{datum['name']}: no pose ({result})")

        dt = time.time() - t0
        if dt < period:
            time.sleep(period - dt)


def _first_object_keypoints(data_path):
    import json as _json

    with open(data_path) as f:
        data = _json.load(f)
    return [kp["name"] for kp in data["objects"][0]["keypoints"]]


def _first_object_class(data_path):
    import json as _json

    with open(data_path) as f:
        return _json.load(f)["objects"][0]["class"]


def _dataset_names(datum, status):
    names = _first_object_keypoints(datum["data_path"])
    # Prefer the server's order when all names exist in the data file.
    if all(n in names for n in status["keypoint_names"]):
        return status["keypoint_names"]
    return names


if __name__ == "__main__":
    main()

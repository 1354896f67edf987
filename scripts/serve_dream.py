#!/usr/bin/env python3
"""Online pose-serving CLI — the TPU-host equivalent of the reference ROS node
launcher (reference scripts/launch_dream_ros.py:629-719).

Example:
  python scripts/serve_dream.py -i best_network.msgpack -b panda_link0 -p 8080

Then from the robot side:
  curl -X POST localhost:8080/camera_info -d '{"fx":615,"fy":615,"cx":320,"cy":240}'
  curl -X POST localhost:8080/keypoint_positions -d '[[x,y,z], ...]'   # live FK
  curl -X POST localhost:8080/image --data-binary @frame.png
  curl localhost:8080/pose
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dream_tpu.network import create_network_from_config_file
from dream_tpu.serve import DreamInferenceServer, make_http_server


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-i", "--input-params-path", default=None,
                        help="Checkpoint to serve (required unless "
                             "--artifact).")
    parser.add_argument("-c", "--network-config", default=None)
    parser.add_argument("--artifact", default=None,
                        help="Serve a jax.export artifact "
                             "(scripts/export_inference.py) instead of a "
                             "checkpoint — needs only jax at serving time; "
                             "requires --manip-config for keypoint names.")
    parser.add_argument("-m", "--manip-config", default=None,
                        help="Manipulator YAML (keypoint names) when "
                             "serving an --artifact.")
    parser.add_argument("-b", "--base-frame", required=True,
                        help="Robot base frame name for the published pose.")
    parser.add_argument("-p", "--port", type=int, default=8080)
    parser.add_argument("--host", default="127.0.0.1",
                        help="Bind address. Loopback by default — the API is "
                             "unauthenticated; pass 0.0.0.0 to expose it on "
                             "the network deliberately.")
    parser.add_argument("--multi-frame", action="store_true", default=False,
                        help="Accumulate correspondences across captured frames "
                             "(reference's multi-frame calibration mode).")
    parser.add_argument("--max-reproj-err-px", type=float, default=None,
                        help="Reject PnP solutions whose mean reprojection "
                             "error exceeds this many pixels (off by default, "
                             "matching the reference).")
    parser.add_argument("--pnp-reject-outliers-px", type=float, default=None,
                        help="Drop correspondences reprojecting worse than "
                             "this many px after a first solve, then fully "
                             "re-solve (robust-PnP extension; same semantics "
                             "as network_inference_dataset.py).")
    parser.add_argument("--pnp-soft-detections", action="store_true",
                        default=False,
                        help="Feed PnP the best belief-map peak for every "
                             "keypoint above the score floor, even those the "
                             "score-gap disambiguation rejects (published "
                             "keypoint detections are unaffected).")
    parser.add_argument("--pnp-soft-min-score", type=float, default=0.05)
    parser.add_argument("--int8-calibration-frames", type=int, default=0,
                        help="After this many served frames (run in float "
                             "and used as calibration data), switch the "
                             "conv stack to int8 — 2x MXU rate on v5e "
                             "(dream_tpu extension; 0 = float serving).")
    parser.add_argument("-v", "--verbose", action="store_true", default=False)
    args = parser.parse_args()

    if args.artifact:
        assert not args.int8_calibration_frames and not args.pnp_soft_detections, (
            "online int8 calibration / soft detections need the full "
            "network; the artifact bakes these choices at export time."
        )
        from dream_tpu.serve import ArtifactInference

        if args.manip_config:
            from dream_tpu.utils.config import load_yaml

            manip = load_yaml(args.manip_config)["manipulator"]
            net = ArtifactInference(
                args.artifact,
                [k["name"] for k in manip["keypoints"]],
                [k.get("friendly_name", k["name"]) for k in manip["keypoints"]],
            )
        else:
            # Keypoint names come from the <artifact>.meta.json sidecar.
            net = ArtifactInference(args.artifact)
    else:
        assert args.input_params_path, "-i/--input-params-path is required"
        network_config_path = args.network_config or os.path.splitext(
            args.input_params_path
        )[0] + ".yaml"
        net = create_network_from_config_file(
            network_config_path, args.input_params_path
        )

    server = DreamInferenceServer(
        net,
        base_frame=args.base_frame,
        single_frame_mode=not args.multi_frame,
        verbose=args.verbose,
        max_reproj_err_px=args.max_reproj_err_px,
        pnp_reject_outliers_px=args.pnp_reject_outliers_px,
        pnp_soft_detections=args.pnp_soft_detections,
        pnp_soft_min_score=args.pnp_soft_min_score,
        int8_calibration_frames=args.int8_calibration_frames,
    )
    httpd = make_http_server(server, args.host, args.port)
    print(f"dream_tpu serving on {args.host}:{args.port} "
          f"(single_frame_mode={not args.multi_frame})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        print("shutting down")


if __name__ == "__main__":
    main()

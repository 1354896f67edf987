#!/usr/bin/env python3
"""Training entry point.

Same CLI surface, config assembly, checkpoint layout, and resume semantics as
the reference trainer (reference scripts/train_network.py:27-784), rebuilt on
the TPU-native stack:

- the host only decodes images; preprocessing, augmentation, GT belief-map
  synthesis, forward and backward all run on device inside jitted functions;
- ``--gpu-ids`` is replaced by ``--mesh-data/--mesh-model`` (a
  ``jax.sharding.Mesh``); with one device the mesh is degenerate and
  everything still works;
- checkpoints are ``epoch_N.yaml`` + ``epoch_N.msgpack`` pairs plus
  ``best_network.*`` and ``training_log_eN.pkl`` -> ``training_log.pkl``
  exactly mirroring the reference's layout (reference
  scripts/train_network.py:612-665), and — an improvement over the reference,
  which silently resets Adam moments on resume — the optimizer state is also
  checkpointed (``epoch_N.opt.msgpack``).
"""

from __future__ import annotations

import argparse
import copy
import os
import pickle
import random
import socket
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from flax import serialization

import dream_tpu
from dream_tpu import data as dream_data
from dream_tpu.network import create_network_from_config_data
from dream_tpu.utils import (
    find_ndds_data_in_dir,
    load_image_resolution,
    load_yaml,
    makedirs,
    save_yaml,
    set_random_seed,
)


def _write_checkpoint(output_dir, stem, config, variables, opt_state=None,
                      delete_stale_before=None, ema_variables=None):
    """Disk half of a checkpoint (runs on the async writer thread)."""
    save_yaml(config, os.path.join(output_dir, stem + ".yaml"), overwrite=True)
    with open(os.path.join(output_dir, stem + ".msgpack"), "wb") as f:
        f.write(serialization.to_bytes(variables))
    if opt_state is not None:
        with open(os.path.join(output_dir, stem + ".opt.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(opt_state))
    if ema_variables is not None:
        # Full variables dict with the EMA params swapped in, loadable by
        # every inference/eval CLI like any other checkpoint.
        with open(os.path.join(output_dir, stem + ".ema.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(ema_variables))
    if delete_stale_before is not None:
        for old_epoch in range(1, delete_stale_before):
            prev = os.path.join(output_dir, f"epoch_{old_epoch}.msgpack")
            for stale in [prev, prev.replace(".msgpack", ".yaml"),
                          prev.replace(".msgpack", ".opt.msgpack"),
                          prev.replace(".msgpack", ".ema.msgpack")]:
                if os.path.exists(stale):
                    os.remove(stale)


class _AsyncCheckpointWriter:
    """Background-thread checkpoint serialization.

    The main loop snapshots params/opt-state to host (required anyway: the
    fused step donates its input buffers, so the old device arrays die at the
    next step) and hands the msgpack serialization + disk write — the part
    that dominates short epochs — to a single worker thread.  At most one
    write is in flight; a second submit joins the first (checkpointing can
    never fall behind training by more than one epoch).
    """

    def __init__(self):
        import threading

        self._thread: "threading.Thread | None" = None

    def submit(self, fn, *fn_args):
        import threading

        self.wait()
        self._thread = threading.Thread(target=fn, args=fn_args, daemon=True)
        self._thread.start()

    def wait(self):
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def train_network(args):
    assert args.epochs > 0
    assert args.batch_size > 0
    assert 0.0 < args.training_data_fraction < 1.0
    validation_data_fraction = 1.0 - args.training_data_fraction

    # Multi-host DP over DCN (dream_tpu extension; the reference is strictly
    # single-node, SURVEY.md section 2.3).  Must run before any device use.
    process_index, process_count = 0, 1
    if getattr(args, "distributed", False):
        from dream_tpu import parallel as dream_parallel

        dist = dream_parallel.initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        process_index = dist["process_index"]
        process_count = dist["process_count"]
        assert args.batch_size % process_count == 0, (
            "Global batch size must divide evenly across processes."
        )
        print(f"jax.distributed: process {process_index}/{process_count}, "
              f"{dist['local_device_count']} local devices")

    if args.output_dir:
        # In multi-host runs only process 0 writes checkpoints/logs.
        save_results = process_index == 0
        if save_results and not args.resume_training:
            makedirs(args.output_dir, exist_ok=args.force_overwrite)
    else:
        assert not args.resume_training, (
            "Cannot resume training; output directory not provided."
        )
        save_results = False

    training_start_time = time.time()

    # ------------------------------------------------------------------
    # Resume scan (reference scripts/train_network.py:66-147)
    # ------------------------------------------------------------------
    start_epoch = 0
    most_recent_epoch_params_path = None
    if args.resume_training:
        dirlist = os.listdir(args.output_dir)
        epoch_paths = [
            x for x in dirlist
            if x.startswith("epoch") and x.endswith(".msgpack") and ".opt." not in x
        ]
        assert epoch_paths, "No epoch checkpoints found to resume from."
        epoch_numbers = [int(p.split("_")[1].split(".")[0]) for p in epoch_paths]
        order = sorted(range(len(epoch_paths)), key=lambda i: -epoch_numbers[i])
        most_recent_epoch_params_path = epoch_paths[order[0]]
        start_epoch = epoch_numbers[order[0]]
        assert start_epoch < args.epochs, (
            "Network is already trained for the number of requested epochs."
        )

        best_path = os.path.join(args.output_dir, "best_network.yaml")
        assert os.path.exists(best_path), "Could not determine the best validation loss."
        best_valid_loss = load_yaml(best_path)["training"]["results"][
            "validation_loss"
        ]["mean"]

        log_path = os.path.join(args.output_dir, "training_log.pkl")
        epoch_log_path = os.path.join(
            args.output_dir, f"training_log_e{start_epoch}.pkl"
        )
        if os.path.exists(log_path):
            with open(log_path, "rb") as f:
                train_log = pickle.load(f)
            if process_index == 0:
                os.rename(log_path, epoch_log_path)
        elif os.path.exists(epoch_log_path):
            with open(epoch_log_path, "rb") as f:
                train_log = pickle.load(f)
        else:
            raise AssertionError("Could not determine training log file to resume.")

        random_seed = train_log["random_seed"]
        if not isinstance(train_log["start_time"], list):
            train_log["start_time"] = [train_log["start_time"]]
        train_log["start_time"].append(training_start_time)
        train_log.setdefault("epochs_resumed", []).append(start_epoch + 1)
    else:
        random_seed = args.random_seed if args.random_seed else random.randint(0, 999999)
        train_log = {
            "epochs": [],
            "losses": [],
            "validation_losses": [],
            "batch_training_losses": [],
            "batch_validation_losses": [],
            "batch_training_sample_names": [],
            "batch_validation_sample_names": [],
            "start_time": training_start_time,
            "timestamps": [],
            "random_seed": random_seed,
        }
        best_valid_loss = float("inf")

    # Best-EMA tracking always restarts from scratch on resume (the prior
    # best EMA loss isn't recorded in the config; best_network_ema.* only
    # improves monotonically within a run).
    best_ema_valid_loss = float("inf")

    set_random_seed(random_seed)
    enable_augment_data = not args.not_augment_data

    # ------------------------------------------------------------------
    # Config assembly (reference scripts/train_network.py:180-323)
    # ------------------------------------------------------------------
    input_data_path = args.input_data_path
    found_data = find_ndds_data_in_dir(input_data_path)
    found_data_config = found_data[1]
    image_raw_resolution = load_image_resolution(found_data_config["camera"])

    assert os.path.exists(args.manipulator_config_path)
    manipulator_config = load_yaml(args.manipulator_config_path)["manipulator"]

    assert os.path.exists(args.architecture_config)
    architecture_config_file = load_yaml(args.architecture_config)
    architecture_config = architecture_config_file["architecture"]
    training_config_in = architecture_config_file["training"]["config"]

    # image_preprocessing may live in either place (reference supports both).
    training_image_preprocessing = training_config_in.get(
        "image_preprocessing", architecture_config.get("image_preprocessing")
    )
    assert training_image_preprocessing, (
        'Expected "image_preprocessing" in the architecture or training config.'
    )
    if "image_preprocessing" in architecture_config:
        assert (
            architecture_config["image_preprocessing"] == training_image_preprocessing
        )
    else:
        architecture_config["image_preprocessing"] = training_image_preprocessing
    training_net_input_resolution = training_config_in["net_input_resolution"]

    if args.loss_pos_weight is not None:
        # Opt-in plateau-free training loss (see network._weighted_mse_loss);
        # recorded in the sidecar config so resume/analysis see the same
        # criterion.  Inference/metrics are unaffected by the loss choice.
        architecture_config["loss"] = {
            "type": "weighted_mse", "pos_weight": args.loss_pos_weight,
        }
        if args.loss_sym:
            # Symmetric (false-positive-penalizing) weighting — required for
            # the full-resolution decoders (see network._weighted_mse_loss).
            architecture_config["loss"]["symmetric"] = True

    if args.compute_dtype:
        # Mixed-precision training: conv compute on the MXU in bf16, params /
        # optimizer state / loss accumulation in float32 (network.loss_fn
        # casts).  Recorded in the sidecar so resume and later inference use
        # the same policy.
        architecture_config["compute_dtype"] = args.compute_dtype

    if args.quant_mode:
        # Quantization-aware training (vgg only): every quantizable conv
        # fake-quantizes weights+activations through an STE round
        # (models/quant.py 'qat'), so the deploy-time int8 PTQ graph sees
        # weights already trained on the int8 grid.  Recorded in the sidecar
        # so resumed runs and later inference share the policy.
        architecture_config["quant_mode"] = args.quant_mode

    try:
        user = os.getlogin()
    except Exception:
        user = "not found"

    data_augment_config = {"image_rgb": True} if enable_augment_data else False
    mesh_spec = {"data": args.mesh_data, "model": args.mesh_model}

    network_config = {
        "data_path": input_data_path,
        "manipulator": manipulator_config,
        "architecture": architecture_config,
        "training": {
            "config": {
                "epochs": args.epochs,
                "training_data_fraction": args.training_data_fraction,
                "validation_data_fraction": validation_data_fraction,
                "batch_size": args.batch_size,
                "data_augmentation": data_augment_config,
                "worker_size": args.num_workers,
                "optimizer": {
                    "type": args.optimizer,
                    "learning_rate": args.learning_rate,
                    **(
                        {"grad_clip_norm": args.grad_clip_norm}
                        if args.grad_clip_norm
                        else {}
                    ),
                    **(
                        {
                            "schedule": {
                                "type": "cosine",
                                "decay_steps": args.lr_decay_steps,
                                "warmup_steps": args.lr_warmup_steps,
                            }
                        }
                        if args.lr_decay_steps
                        else {}
                    ),
                },
                "image_preprocessing": training_image_preprocessing,
                "image_raw_resolution": list(image_raw_resolution),
                "net_input_resolution": training_net_input_resolution,
            },
            "platform": {
                "user": user,
                "hostname": socket.gethostname(),
                "mesh": mesh_spec,
                "n_devices": len(jax.devices()),
                "backend": jax.default_backend(),
            },
            "results": {"epochs_trained": 0},
        },
    }

    # Resume consistency checks (reference scripts/train_network.py:325-396).
    if args.resume_training:
        most_recent_config_path = most_recent_epoch_params_path.replace(
            ".msgpack", ".yaml"
        )
        prev = load_yaml(os.path.join(args.output_dir, most_recent_config_path))
        assert prev["data_path"] == network_config["data_path"]
        assert prev["manipulator"] == network_config["manipulator"]
        assert prev["architecture"] == network_config["architecture"]
        for k in [
            "training_data_fraction", "validation_data_fraction", "batch_size",
            "data_augmentation", "worker_size", "optimizer",
            "image_preprocessing", "image_raw_resolution", "net_input_resolution",
        ]:
            assert prev["training"]["config"][k] == network_config["training"]["config"][k], k
        network_config = prev
        print(f"~~ RESUMING TRAINING FROM {most_recent_epoch_params_path} ~~\n")

    print(f"Network configuration: {network_config}")
    dream_network = create_network_from_config_data(network_config)
    dream_network.init_variables(seed=random_seed)
    if args.resume_training:
        dream_network.load_network_params(
            os.path.join(args.output_dir, most_recent_epoch_params_path)
        )
    elif args.init_params:
        # Warm start from an existing checkpoint (fresh optimizer state) —
        # fine-tuning/transfer, a TPU-native extension over the reference.
        dream_network.load_network_params(args.init_params)
        print(f"Initialized parameters from {args.init_params}")
    elif args.init_encoder:
        # Pretrained-encoder warm start — the stand-in for the reference's
        # ImageNet init (reference dream/models.py:587 pretrained=True);
        # produce the file with scripts/pretrain_encoder.py or extract it
        # from converted torchvision weights.
        n_grafted, n_skipped = dream_network.init_encoder_from(args.init_encoder)
        print(f"Initialized encoder from {args.init_encoder} "
              f"({n_grafted} leaves grafted, {n_skipped} shape-skipped)")
    dream_network.enable_training()
    if args.resume_training:
        opt_path = os.path.join(
            args.output_dir,
            most_recent_epoch_params_path.replace(".msgpack", ".opt.msgpack"),
        )
        if os.path.exists(opt_path):
            with open(opt_path, "rb") as f:
                dream_network.opt_state = serialization.from_bytes(
                    dream_network.opt_state, f.read()
                )
            print("Restored optimizer state (improvement over reference resume).")

    trained_net_input_res, trained_net_output_res = (
        dream_network.net_resolutions_from_image_raw_resolution(image_raw_resolution)
    )
    assert dream_network.trained_net_input_resolution() == trained_net_input_res
    dream_network.network_config["training"]["config"]["net_output_resolution"] = list(
        trained_net_output_res
    )

    # ------------------------------------------------------------------
    # Dataset + device-side batch processor
    # ------------------------------------------------------------------
    dataset = dream_data.ManipulatorNDDSDataset(
        found_data,
        manipulator_config["name"],
        dream_network.keypoint_names,
        trained_net_input_res,
        trained_net_output_res,
        dream_network.image_normalization,
        dream_network.image_preprocessing(),
        augment_data=enable_augment_data,
        include_ground_truth=True,
        include_belief_maps=True,
        n_decode_threads=max(args.num_workers, 1),
    )

    train_idx, valid_idx = dream_data.split_indices(
        len(dataset), args.training_data_fraction, random_seed
    )
    local_batch_size = args.batch_size
    if process_count > 1:
        # Each process loads a disjoint, equal-size partition of the split
        # and contributes local_batch rows per step; the global batch is
        # assembled on device (network._shard_batch -> process_local_batch).
        def partition(idx):
            n = len(idx) // process_count * process_count
            return idx[:n][process_index::process_count]

        train_idx = partition(train_idx)
        valid_idx = partition(valid_idx)
        local_batch_size = args.batch_size // process_count
    # --cache-device keeps the decoded dataset resident in HBM and serves
    # batches as device-side gathers — zero steady-state host work.  The
    # streaming DataLoader (host decode + prefetch thread) remains the
    # default for datasets that don't fit.
    loader_cls = (
        dream_data.DeviceCachedLoader if args.cache_device else dream_data.DataLoader
    )
    train_loader = loader_cls(
        dataset, local_batch_size, shuffle=True, seed=random_seed,
        indices=train_idx,
    )
    valid_loader = loader_cls(
        dataset, local_batch_size, shuffle=False, seed=random_seed,
        indices=valid_idx, drop_last=False,
    )

    process_train = dream_data.make_batch_processor(
        image_raw_resolution, trained_net_input_res, trained_net_output_res,
        dream_network.image_preprocessing(), dream_network.image_normalization,
        augment=enable_augment_data, include_belief_maps=True,
    )
    # Fuse the processor into the train step: one device dispatch per batch.
    # With the dataset HBM-resident on a single device, go further and scan
    # the WHOLE epoch in one dispatch (relay/dispatch latency otherwise
    # serializes between steps).
    scan_epochs = (
        args.cache_device
        and process_count == 1
        and args.mesh_data * args.mesh_model == 1
    )
    # Parameter EMA (dream_tpu extension): the shadow average updates inside
    # the training dispatch; the best EMA snapshot (by its own validation
    # loss) is checkpointed as best_network_ema.* — must be enabled before
    # the train-step builders close over it.
    if args.ema_decay is not None:
        dream_network.enable_ema(args.ema_decay)
        if args.resume_training:
            ema_path = os.path.join(
                args.output_dir,
                most_recent_epoch_params_path.replace(
                    ".msgpack", ".ema.msgpack"
                ),
            )
            if os.path.exists(ema_path):
                with open(ema_path, "rb") as f:
                    dream_network.ema_params = serialization.from_bytes(
                        dream_network.ema_params, f.read()
                    )
                print("Restored EMA parameters.")
        print(f"Parameter EMA enabled (decay {args.ema_decay}).")
    if scan_epochs:
        dream_network.enable_scanned_training(process_train)
        print("Scanned-epoch training: one device dispatch per epoch.")
    else:
        dream_network.enable_fused_training(process_train)

    # Place params/batches on the device mesh (DP over 'data', optional TP
    # channel sharding over 'model') when more than one device is requested.
    if args.mesh_data * args.mesh_model > 1:
        from dream_tpu import parallel as dream_parallel

        mesh = dream_parallel.make_mesh(args.mesh_data, args.mesh_model)
        dream_network.shard_for_mesh(mesh)
        print(f"Training on mesh {dict(mesh.shape)}")
    process_valid = dream_data.make_batch_processor(
        image_raw_resolution, trained_net_input_res, trained_net_output_res,
        dream_network.image_preprocessing(), dream_network.image_normalization,
        augment=False, include_belief_maps=True,
    )

    aug_key = jax.random.PRNGKey(random_seed)
    ckpt_writer = _AsyncCheckpointWriter()

    print("\nTRAINING NETWORK ~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~\n")
    last_epoch_timestamp = 0.0

    for e in range(start_epoch, args.epochs):
        this_epoch = e + 1
        print(f"Epoch {this_epoch} ------------")

        # Optional device trace of one steady-state epoch (TPU-native
        # observability; the reference has no profiling, SURVEY.md section 5).
        if args.profile_dir and e == start_epoch + 1:
            jax.profiler.start_trace(args.profile_dir)

        # Training phase.
        training_batch_losses = []
        training_batch_sample_names = []
        train_loader.set_epoch(e)
        if scan_epochs:
            # Whole epoch in one device dispatch (lax.scan over shuffled
            # gathers of the HBM-resident set).
            index_matrix = train_loader.epoch_index_matrix(e)
            aug_key, step_key = jax.random.split(aug_key)
            losses = dream_network.train_epoch_raw(
                step_key,
                train_loader.device_images,
                train_loader.device_kp_projs,
                index_matrix,
            )
            training_batch_losses = [float(x) for x in jax.device_get(losses)]
            training_batch_sample_names = [
                dataset.sample_names(train_loader.indices[sel])
                for sel in index_matrix
            ]
        else:
            for batch_idx, host_batch in enumerate(train_loader):
                aug_key, step_key = jax.random.split(aug_key)
                loss = dream_network.train_raw(
                    step_key,
                    jnp.asarray(host_batch["image_rgb_raw"]),
                    jnp.asarray(host_batch["keypoint_projections_raw"]),
                )
                # Keep the loss on device: a float() here would sync every
                # step and stall the dispatch pipeline; fetch once per epoch.
                training_batch_losses.append(loss)
                training_batch_sample_names.append(
                    dataset.sample_names(host_batch["indices"])
                )
                if args.verbose:
                    print(f"  batch {batch_idx}: loss {float(loss):.6f}")

            training_batch_losses = [
                float(x) for x in jax.device_get(training_batch_losses)
            ]
        mean_training_loss = float(np.mean(training_batch_losses))
        std_training_loss = float(np.std(training_batch_losses))

        # Validation phase (--valid-every thins it for long runs; the final
        # epoch always validates so best_network stays meaningful).
        run_validation = (
            this_epoch % args.valid_every == 0 or this_epoch == args.epochs
        )
        valid_batch_losses = []
        valid_batch_sample_names = []
        ema_batch_losses = []
        mean_ema_valid_loss = float("nan")
        if run_validation:
            ema_vars = (
                dream_network.ema_variables()
                if args.ema_decay is not None else None
            )
            for host_batch in valid_loader:
                batch = process_valid(
                    jax.random.PRNGKey(0),
                    jnp.asarray(host_batch["image_rgb_raw"]),
                    jnp.asarray(host_batch["keypoint_projections_raw"]),
                )
                vloss = dream_network.loss(
                    [batch["image_rgb_input"]], batch["belief_maps"]
                )
                valid_batch_losses.append(vloss)
                if ema_vars is not None:
                    ema_batch_losses.append(
                        dream_network.loss(
                            [batch["image_rgb_input"]], batch["belief_maps"],
                            variables=ema_vars,
                        )
                    )
                valid_batch_sample_names.append(
                    dataset.sample_names(host_batch["indices"])
                )
            valid_batch_losses = [
                float(x) for x in jax.device_get(valid_batch_losses)
            ]
            mean_valid_loss = float(np.mean(valid_batch_losses))
            std_valid_loss = float(np.std(valid_batch_losses))
            if ema_batch_losses:
                mean_ema_valid_loss = float(
                    np.mean([float(x) for x in jax.device_get(ema_batch_losses)])
                )
        else:
            mean_valid_loss = float("nan")
            std_valid_loss = float("nan")

        # Bookkeeping (reference scripts/train_network.py:587-609).
        results = dream_network.network_config["training"]["results"]
        results["epochs_trained"] += 1
        results["training_loss"] = {
            "mean": mean_training_loss, "stdev": std_training_loss,
        }
        if run_validation:
            results["validation_loss"] = {
                "mean": mean_valid_loss, "stdev": std_valid_loss,
            }
        print(
            f"Training Loss (batch-wise mean +- 1 stdev): "
            f"{mean_training_loss} +- {std_training_loss}"
        )
        if run_validation:
            print(
                f"Validation Loss (batch-wise mean +- 1 stdev): "
                f"{mean_valid_loss} +- {std_valid_loss}"
            )

        if run_validation and mean_valid_loss < best_valid_loss:
            print("Best network result so far.")
            best_valid_loss = mean_valid_loss
            if save_results:
                # Snapshot to host (the fused step donates its inputs, so
                # the device arrays die at the next step) and write on the
                # checkpoint thread.
                ckpt_writer.submit(
                    _write_checkpoint, args.output_dir, "best_network",
                    copy.deepcopy(dream_network.network_config),
                    jax.device_get(dream_network.variables),
                )
        if run_validation and args.ema_decay is not None:
            print(f"EMA Validation Loss (batch-wise mean): {mean_ema_valid_loss}")
            if mean_ema_valid_loss < best_ema_valid_loss:
                print("Best EMA network result so far.")
                best_ema_valid_loss = mean_ema_valid_loss
                if save_results:
                    ckpt_writer.submit(
                        _write_checkpoint, args.output_dir, "best_network_ema",
                        copy.deepcopy(dream_network.network_config),
                        jax.device_get(dream_network.ema_variables()),
                    )

        if args.profile_dir and e == start_epoch + 1:
            jax.profiler.stop_trace()
            print(f"Wrote device trace to {args.profile_dir}")

        this_epoch_timestamp = time.time() - training_start_time
        print(f"This epoch took {this_epoch_timestamp - last_epoch_timestamp} seconds.\n")
        last_epoch_timestamp = this_epoch_timestamp

        train_log["epochs"].append(this_epoch)
        train_log["losses"].append(mean_training_loss)
        train_log["validation_losses"].append(mean_valid_loss)
        train_log["batch_training_losses"].append(training_batch_losses)
        train_log["batch_validation_losses"].append(valid_batch_losses)
        train_log["batch_training_sample_names"].append(training_batch_sample_names)
        train_log["batch_validation_sample_names"].append(valid_batch_sample_names)
        train_log["timestamps"].append(this_epoch_timestamp)

        if save_results:
            epoch_training_log_path = os.path.join(
                args.output_dir, f"training_log_e{this_epoch}.pkl"
            )
            with open(epoch_training_log_path, "wb") as f:
                pickle.dump(train_log, f)
            last_log = os.path.join(args.output_dir, f"training_log_e{e}.pkl")
            if os.path.exists(last_log):
                os.remove(last_log)

            # --checkpoint-every thins epoch checkpoints for long runs (host
            # serialization of the full params+opt state is the dominant
            # per-epoch cost); default 1 == reference parity (checkpoint
            # every epoch, reference scripts/train_network.py:641-659).
            if this_epoch % args.checkpoint_every == 0 or this_epoch == args.epochs:
                ckpt_writer.submit(
                    _write_checkpoint, args.output_dir, f"epoch_{this_epoch}",
                    copy.deepcopy(dream_network.network_config),
                    jax.device_get(dream_network.variables),
                    jax.device_get(dream_network.opt_state),
                    this_epoch,
                    (
                        jax.device_get(dream_network.ema_variables())
                        if args.ema_decay is not None else None
                    ),
                )

    ckpt_writer.wait()
    if save_results:
        final_log = os.path.join(args.output_dir, "training_log.pkl")
        os.rename(epoch_training_log_path, final_log)

    print("~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~~\n")
    print("Done.\n")
    print(f"Total training time: {time.time() - training_start_time} seconds.\n")
    return dream_network


def make_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-i", "--input-data-path", required=True,
                        help="Path to training data.")
    parser.add_argument("-t", "--training-data-fraction", type=float, default=0.8)
    parser.add_argument("-m", "--manipulator-config-path", required=True)
    parser.add_argument("-o", "--output-dir")
    parser.add_argument("-f", "--force-overwrite", action="store_true", default=False)
    parser.add_argument("-ar", "--architecture-config", required=True)
    parser.add_argument("-e", "--epochs", type=int, required=True)
    parser.add_argument("-b", "--batch-size", type=int, required=True)
    parser.add_argument("-z", "--optimizer", choices=dream_tpu.KNOWN_OPTIMIZERS,
                        default="adam")
    parser.add_argument("-lr", "--learning-rate", type=float, default=0.0001)
    parser.add_argument("-not-a", "--not-augment-data", action="store_true",
                        default=False)
    parser.add_argument("-w", "--num-workers", type=int, default=8,
                        help="Host image-decode threads.")
    parser.add_argument("--mesh-data", type=int, default=1,
                        help="Data-parallel mesh axis size (replaces --gpu-ids).")
    parser.add_argument("--mesh-model", type=int, default=1,
                        help="Model-parallel mesh axis size.")
    parser.add_argument("--distributed", action="store_true", default=False,
                        help="Initialize jax.distributed for multi-host DP "
                             "over DCN (auto-detects on Cloud TPU pods; see "
                             "dream_tpu/parallel/mesh.py for the pod recipe).")
    parser.add_argument("--coordinator-address", default=None,
                        help="host:port of process 0 (omit on TPU pods).")
    parser.add_argument("--num-processes", type=int, default=None)
    parser.add_argument("--process-id", type=int, default=None)
    parser.add_argument("--init-params", default=None,
                        help="Warm-start parameters from a .msgpack checkpoint "
                             "(fresh optimizer; unlike --resume-training).")
    parser.add_argument("--init-encoder", default=None,
                        help="Warm-start only the VGG encoder trunk from a "
                             "pretrained subtree (scripts/pretrain_encoder.py) "
                             "— the ImageNet-init substitute.")
    parser.add_argument("--profile-dir", default=None,
                        help="Write a jax.profiler device trace of one epoch.")
    parser.add_argument("--checkpoint-every", type=int, default=1,
                        help="Save epoch_N checkpoints every N epochs "
                             "(best_network is always saved when improved).")
    parser.add_argument("--ema-decay", type=float, default=None,
                        help="Maintain a per-step parameter EMA with this "
                             "decay (e.g. 0.999); checkpoints the best EMA "
                             "snapshot (by its own validation loss) as "
                             "best_network_ema.*")
    parser.add_argument("--valid-every", type=int, default=1,
                        help="Run the validation pass every N epochs (the "
                             "final epoch always validates). 1 == reference "
                             "parity.")
    parser.add_argument("--grad-clip-norm", type=float, default=None,
                        help="Global-norm gradient clipping (guards against "
                             "the loss spikes bare Adam exhibits on this "
                             "objective). Default: off (reference parity).")
    parser.add_argument("--lr-decay-steps", type=int, default=None,
                        help="If set, cosine-decay the learning rate to ~0 "
                             "over this many steps (with --lr-warmup-steps "
                             "linear warmup). Default: flat LR.")
    parser.add_argument("--lr-warmup-steps", type=int, default=0)
    parser.add_argument("--compute-dtype", choices=["float32", "bfloat16"],
                        default=None,
                        help="Model compute dtype. bfloat16 runs the conv "
                             "stack on the MXU at ~2x f32 throughput (params, "
                             "optimizer state and the loss stay float32). "
                             "Default: the architecture config's value "
                             "(float32 if unset).")
    parser.add_argument("--quant-mode", choices=["qat"], default=None,
                        help="Quantization-aware training (vgg only): "
                             "fake-quantize conv weights+activations with "
                             "straight-through-estimator rounds so deploy "
                             "int8 PTQ costs ~no accuracy. Default: the "
                             "architecture config's value (off).")
    parser.add_argument("--loss-pos-weight", type=float, default=None,
                        help="If set, train with the weighted-MSE criterion "
                             "(pixel weight 1 + (W-1)*target): removes the "
                             "all-zero belief-map plateau that plain MSE "
                             "suffers from random init. Default: the "
                             "architecture config's loss (reference parity).")
    parser.add_argument("--loss-sym", action="store_true", default=False,
                        help="With --loss-pos-weight: weight by "
                             "max(target, stop_grad(pred)) so false-positive "
                             "belief mass also pays the pos weight. Required "
                             "for the full-resolution (F) decoders, whose "
                             "400x400 outputs otherwise admit a cheap "
                             "all-channels-identical degenerate solution.")
    parser.add_argument("--cache-device", action="store_true", default=False,
                        help="Decode the dataset once and keep it resident "
                             "in device memory; batches become device-side "
                             "gathers (for datasets that fit HBM).")
    parser.add_argument("-s", "--random-seed", type=int)
    parser.add_argument("-v", "--verbose", action="store_true", default=False)
    parser.add_argument("-r", "--resume-training", action="store_true", default=False)
    return parser


if __name__ == "__main__":
    train_network(make_parser().parse_args())

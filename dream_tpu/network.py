"""DreamNetwork: the config-driven network facade (core runtime).

TPU-native counterpart of the reference's ``dream/network.py:73-697``: builds
model + loss from a self-describing YAML config, owns the parameters, and
exposes training, inference, and save/load.  Key re-designs:

- **one jitted inference function**: ``image -> (belief_maps, keypoints)``
  runs entirely on device, including peak extraction — the reference
  round-trips every belief map through numpy/scipy on the CPU
  (reference dream/network.py:503-590).
- **analytic output resolutions** instead of a probe-with-zeros GPU forward
  (reference dream/network.py:397-418).
- **functional state**: parameters are an explicit pytree (flax), optimizer
  is optax; ``enable_training`` builds the optax transform
  (reference dream/network.py:634-691 builds torch.optim lazily the same way).
- **mesh instead of gpu_ids**: ``training/platform/mesh`` places params and
  batches on a (data, model) device mesh (reference ``gpu_ids`` +
  DataParallel, dream/network.py:184-185,244-284).

Checkpoints are a ``<name>.yaml`` config sidecar + ``<name>.msgpack`` flax
param file (layout parity with the reference's ``.yaml``+``.pth`` pairs,
reference dream/network.py:592-632).
"""

from __future__ import annotations

import functools
import os
import warnings
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

import dream_tpu
from dream_tpu import models as dream_models
from dream_tpu.ops import belief_maps as bm_ops
from dream_tpu.ops import coords as coord_ops
from dream_tpu.ops import image_proc as image_proc_ops
from dream_tpu.utils import resolutions as res_utils
from dream_tpu.utils.config import load_yaml, save_yaml, makedirs

KNOWN_ARCHITECTURES = ["vgg", "resnet"]  # reference dream/network.py:18-21
KNOWN_OPTIMIZERS = ["adam", "sgd"]  # reference dream/network.py:23-26


def create_network_from_config_file(config_file_path, network_params_path=None):
    """Parity: reference dream/network.py:29-63."""
    assert os.path.exists(config_file_path), (
        f'Expected config_file_path "{config_file_path}" to exist, but it does not.'
    )
    network_config = load_yaml(config_file_path)
    dream_network = create_network_from_config_data(network_config)
    if network_params_path:
        assert os.path.exists(network_params_path), (
            f'If provided, expected network_params_path "{network_params_path}" '
            "to exist, but it does not."
        )
        dream_network.load_network_params(network_params_path)
    return dream_network


def create_network_from_config_data(network_config_data):
    return DreamNetwork(network_config_data)


def _mse_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def _huber_loss(pred, target):
    """torch SmoothL1Loss (beta=1) semantics."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def _weighted_mse_loss(pos_weight: float, symmetric: bool = False):
    """MSE with belief-mass-proportional pixel weights.

    Belief-map targets are ~99.9% zeros (a 100x100 map holds seven sigma=2
    Gaussians), so plain MSE has a strong local optimum at the all-zero
    output — from random init the reference recipe sits on that plateau for
    thousands of steps (it is rescued by ImageNet-pretrained encoders, which
    this environment cannot download).  Weighting each pixel's squared error
    by ``1 + (pos_weight-1) * target`` makes the zero output pay ``pos_weight``
    x at peak centers, removing the plateau while keeping the optimum (exact
    target reproduction) unchanged.  TPU-native training extension — select
    with ``loss: {type: weighted_mse, pos_weight: N}``; the reference default
    (``mse``) is untouched.

    ``symmetric``: weight by ``max(target, stop_grad(pred))`` instead of
    ``target`` alone, so FALSE-POSITIVE belief mass also pays ``pos_weight``x.
    Under the target-only weighting, predicted mass where target~0 costs
    weight 1 — at full-resolution 400x400 outputs (16x the zero-pixels of
    vgg-Q's 100x100) that made a degenerate solution nearly free: every
    channel emitting the same arm-region blob cluster scores within ~2e-3
    of a perfect fit, and both round-4 F-variant runs converged to exactly
    that (all 7 channels peaking at one location; score-gap disambiguation
    then rejects every map -> zero detections).  The symmetric weight keeps
    the optimum (pred==target) identical while making channel-confusion and
    smeared blobs expensive.  Select with ``loss: {..., symmetric: true}``
    (``--loss-sym``); the F-variant recipes use it.
    """

    def criterion(pred, target):
        t = jnp.clip(target, 0.0, 1.0)
        if symmetric:
            p = jax.lax.stop_gradient(
                jnp.clip(pred.astype(jnp.float32), 0.0, 1.0)
            )
            t = jnp.maximum(t, p)
        w = 1.0 + (pos_weight - 1.0) * t
        return jnp.sum(w * (pred - target) ** 2) / jnp.sum(w)

    return criterion


class DreamNetwork:
    """Config-validated model + loss + inference + (de)serialization."""

    def __init__(self, network_config: Dict[str, Any], seed: int = 0):
        # --- config validation (reference dream/network.py:77-191) ---
        assert "architecture" in network_config, (
            'Required key "architecture" is missing from network configuration.'
        )
        assert "type" in network_config["architecture"]
        assert "manipulator" in network_config, (
            'Required key "manipulator" is missing from network configuration.'
        )
        assert "name" in network_config["manipulator"]
        assert "keypoints" in network_config["manipulator"]

        self.keypoint_names: List[str] = []
        self.friendly_keypoint_names: List[str] = []
        self.ros_keypoint_frames: List[str] = []
        for kp_def in network_config["manipulator"]["keypoints"]:
            assert "name" in kp_def, 'Keypoint specification is missing key "name".'
            self.keypoint_names.append(kp_def["name"])
            self.friendly_keypoint_names.append(
                kp_def.get("friendly_name", kp_def["name"])
            )
            self.ros_keypoint_frames.append(kp_def.get("ros_frame", kp_def["name"]))

        self.network_config = network_config
        self.manipulator_name = network_config["manipulator"]["name"]
        self.n_keypoints = len(self.keypoint_names)
        self.architecture_type = network_config["architecture"]["type"]
        assert self.architecture_type in KNOWN_ARCHITECTURES, (
            f'Expected architecture type "{self.architecture_type}" to be in the '
            "list of known network architectures, but it is not."
        )

        arch = network_config["architecture"]
        assert "image_normalization" in arch
        self.image_normalization = arch["image_normalization"]
        assert "image_preprocessing" in arch
        assert (
            self.image_preprocessing() in res_utils.KNOWN_IMAGE_PREPROC_TYPES
        ), f'Image preprocessing type "{self.image_preprocessing()}" is not recognized.'
        assert "output_heads" in arch
        assert "input_heads" in arch
        assert arch["input_heads"][0] == "image_rgb", (
            'First input head must be "image_rgb".'
        )
        assert "training" in network_config
        assert "config" in network_config["training"]
        assert "net_input_resolution" in network_config["training"]["config"]
        assert len(network_config["training"]["config"]["net_input_resolution"]) == 2

        # Multi-peak disambiguation knobs (reference dream/network.py:187-191).
        self.use_belief_peak_scores = True
        self.belief_peak_next_best_score = 0.25

        # --- model construction (reference dream/network.py:193-298) ---
        # Optional compute-dtype policy (TPU-native extension; params stay
        # float32, conv compute runs in e.g. bfloat16 on the MXU).
        compute_dtype_name = arch.get("compute_dtype", "float32")
        self.compute_dtype = {
            "float32": jnp.float32,
            "bfloat16": jnp.bfloat16,
        }[compute_dtype_name]
        # Optional training-time quantization mode (TPU-native extension).
        # 'qat' fake-quantizes every quantizable conv in the training graph
        # (models/quant.py) so deploy-time int8 PTQ costs ~nothing; vgg
        # architectures only — resnet trains through BatchNorm and is
        # quantized post-hoc on the BN-folded deploy graph instead.
        self.quant_mode = arch.get("quant_mode")
        assert self.quant_mode in (None, "qat"), (
            f'architecture "quant_mode" must be null or "qat", got '
            f"{self.quant_mode!r} (calibrate/int8 are inference-time modes "
            "driven by enable_int8_inference)."
        )
        self._arch_kwargs: Dict[str, Any] = {}
        if self.architecture_type == "vgg":
            vgg_kwargs: Dict[str, Any] = {}
            if self.quant_mode:
                vgg_kwargs["quant_mode"] = self.quant_mode
            if "spatial_softmax" in arch:
                assert arch["output_heads"] == ["belief_maps", "keypoints"]
                vgg_kwargs.update(
                    internalize_spatial_softmax=True,
                    learned_beta=arch["spatial_softmax"]["learned_beta"],
                    initial_beta=arch["spatial_softmax"]["initial_beta"],
                )
            else:
                assert arch["output_heads"] == ["belief_maps"]
                vgg_kwargs["internalize_spatial_softmax"] = False

            if "deconv_decoder" in arch and "full_output" not in arch:
                vgg_kwargs["deconv_decoder"] = arch["deconv_decoder"]
            elif "full_output" in arch:
                vgg_kwargs["deconv_decoder"] = arch["deconv_decoder"]
                vgg_kwargs["full_output"] = True
            if "skip_connections" in arch:
                vgg_kwargs["skip_connections"] = arch["skip_connections"]

            if "n_stages" in arch:
                self.model = dream_models.DreamHourglassMultiStage(
                    n_keypoints=self.n_keypoints,
                    n_stages=arch["n_stages"],
                    dtype=self.compute_dtype,
                    **vgg_kwargs,
                )
            else:
                self.model = dream_models.DreamHourglass(
                    n_keypoints=self.n_keypoints, dtype=self.compute_dtype,
                    **vgg_kwargs
                )
            self._arch_kwargs = {
                "deconv_decoder": vgg_kwargs.get("deconv_decoder", False),
                "full_output": vgg_kwargs.get("full_output", False),
            }
            self._has_batch_stats = False

        else:  # resnet
            assert arch["output_heads"] == ["belief_maps"]
            assert self.quant_mode is None, (
                "QAT applies to vgg architectures; resnet is quantized "
                "post-hoc on the BN-folded deploy graph "
                "(enable_int8_inference). Rationale: resnet's convs are "
                "BN-sandwiched, and the deployed int8 graph quantizes the "
                "BN-FOLDED weights (scale*w/sqrt(var)). Training-time fake "
                "quant of the unfolded conv would optimize against a "
                "different weight grid than deployment uses (the classic "
                "QAT/BN-folding mismatch), while the running BN statistics "
                "keep shifting that grid under it. Folding first and "
                "quantizing the exact deploy weights (PTQ) matches the "
                "deployed numerics by construction."
            )
            resnet_kwargs = {}
            if "full_decoder" in arch:
                resnet_kwargs["full"] = arch["full_decoder"]
            if "layers" in arch:
                # Trunk depth override (default resnet101); used by tests
                # and small-footprint deployments.
                resnet_kwargs["layers"] = tuple(arch["layers"])
            self.model = dream_models.ResnetSimple(
                n_keypoints=self.n_keypoints, dtype=self.compute_dtype,
                **resnet_kwargs
            )
            self._arch_kwargs = {"full": resnet_kwargs.get("full", False)}
            self._has_batch_stats = True

        loss_type = arch["loss"]["type"]
        if loss_type == "mse":
            self.criterion = _mse_loss
        elif loss_type == "huber":
            self.criterion = _huber_loss
        elif loss_type == "weighted_mse":
            self.criterion = _weighted_mse_loss(
                float(arch["loss"].get("pos_weight", 100.0)),
                symmetric=bool(arch["loss"].get("symmetric", False)),
            )
        else:
            raise AssertionError("Loss not yet implemented.")

        self.optimizer: Optional[optax.GradientTransformation] = None
        self.opt_state = None
        self.variables: Optional[Dict[str, Any]] = None
        self._seed = seed

        # --- output resolution: analytic, with config consistency check
        # (reference dream/network.py:303-317) ---
        out_res = list(
            self.net_output_resolution_from_input_resolution(
                self.trained_net_input_resolution()
            )
        )
        cfg = self.network_config["training"]["config"]
        if "net_output_resolution" in cfg:
            assert list(cfg["net_output_resolution"]) == out_res, (
                "Network model and config file disagree for trained network "
                "output resolution."
            )
        else:
            cfg["net_output_resolution"] = out_res

    # ------------------------------------------------------------------
    # Getters (reference dream/network.py:319-326)
    # ------------------------------------------------------------------

    def trained_net_input_resolution(self) -> Tuple[int, int]:
        return tuple(self.network_config["training"]["config"]["net_input_resolution"])

    def trained_net_output_resolution(self) -> Tuple[int, int]:
        return tuple(self.network_config["training"]["config"]["net_output_resolution"])

    def image_preprocessing(self) -> str:
        return self.network_config["architecture"]["image_preprocessing"]

    def net_resolutions_from_image_raw_resolution(
        self, image_raw_resolution, image_preprocessing_override=None
    ):
        """Parity: reference dream/network.py:368-395."""
        assert len(image_raw_resolution) == 2
        image_preprocessing = (
            image_preprocessing_override
            if image_preprocessing_override
            else self.image_preprocessing()
        )
        net_input_resolution = res_utils.resolution_after_preprocessing(
            image_raw_resolution,
            self.trained_net_input_resolution(),
            image_preprocessing,
        )
        net_output_resolution = self.net_output_resolution_from_input_resolution(
            net_input_resolution
        )
        return net_input_resolution, net_output_resolution

    def net_output_resolution_from_input_resolution(self, net_input_resolution):
        """Analytic (replaces the reference's device probe, dream/network.py:397-418)."""
        return res_utils.net_output_resolution_from_input_resolution(
            net_input_resolution, self.architecture_type, **self._arch_kwargs
        )

    # ------------------------------------------------------------------
    # Parameters
    # ------------------------------------------------------------------

    def init_variables(self, seed: Optional[int] = None, force: bool = False):
        """Initialize model parameters (idempotent unless ``force``)."""
        if self.variables is not None and not force:
            return self.variables
        key = jax.random.PRNGKey(self._seed if seed is None else seed)
        w, h = self.trained_net_input_resolution()
        dummy = jnp.zeros((1, h, w, 3), dtype=jnp.float32)
        if self._has_batch_stats:
            variables = self.model.init(key, dummy, train=False)
        else:
            variables = self.model.init(key, dummy)
        self.variables = dict(variables)
        return self.variables

    def apply_model(self, variables, net_input, train: bool = False):
        """Forward pass; returns (list of stage outputs NHWC, new_batch_stats|None)."""
        if self._has_batch_stats:
            if train:
                out, mutated = self.model.apply(
                    variables, net_input, train=True, mutable=["batch_stats"]
                )
                return out, mutated["batch_stats"]
            return self.model.apply(variables, net_input, train=False), None
        return self.model.apply(variables, net_input), None

    # ------------------------------------------------------------------
    # Loss / training (reference dream/network.py:328-364, 634-696)
    # ------------------------------------------------------------------

    def loss_fn(self, variables, net_input, target_belief_maps, train: bool = False):
        """Belief-map regression loss.

        ``target_belief_maps`` is ``[B, n_kp, h, w]`` (reference layout);
        multistage models average the criterion over all stage outputs against
        the broadcast target (reference dream/network.py:345-356).
        """
        assert self.network_config["architecture"]["output_heads"] == [
            "belief_maps"
        ], "Not yet implemented."  # reference dream/network.py:361-362
        outputs, new_batch_stats = self.apply_model(variables, net_input, train=train)
        target = jnp.moveaxis(target_belief_maps, 1, -1)  # -> NHWC
        # Accumulate the criterion in float32 regardless of the compute dtype:
        # with ``compute_dtype: bfloat16`` the conv stack runs on the MXU in
        # bf16 (params stay float32) but a bf16 squared-error reduction over
        # ~10^5 mostly-tiny pixels loses the signal entirely.
        stacked = jnp.stack(outputs).astype(jnp.float32)  # [n_stages, B, h, w, n_kp]
        target = target.astype(jnp.float32)
        loss = self.criterion(stacked, jnp.broadcast_to(target, stacked.shape))
        return loss, new_batch_stats

    def enable_training(self):
        """Build the optax optimizer from config (reference dream/network.py:634-691)."""
        if self.optimizer is None:
            tcfg = self.network_config["training"]["config"]
            assert "optimizer" in tcfg
            assert "type" in tcfg["optimizer"]
            optimizer_type = tcfg["optimizer"]["type"]
            assert optimizer_type in KNOWN_OPTIMIZERS, (
                f'Expected optimizer_type "{optimizer_type}" to be in the list '
                "of known optimizers, but it is not."
            )
            assert "learning_rate" in tcfg["optimizer"]
            lr = tcfg["optimizer"]["learning_rate"]
            # Optional schedule + gradient clipping (TPU-native training
            # extensions; the reference uses a flat-LR bare Adam,
            # reference scripts/train_network.py:441-447).  Config-driven so
            # resume reconstructs the exact same optimizer.
            schedule_cfg = tcfg["optimizer"].get("schedule")
            if schedule_cfg:
                assert schedule_cfg["type"] == "cosine", schedule_cfg
                lr = optax.warmup_cosine_decay_schedule(
                    init_value=0.0,
                    peak_value=tcfg["optimizer"]["learning_rate"],
                    warmup_steps=int(schedule_cfg.get("warmup_steps", 0)),
                    decay_steps=int(schedule_cfg["decay_steps"]),
                    end_value=float(schedule_cfg.get("end_value", 0.0)),
                )
            if optimizer_type == "adam":
                self.optimizer = optax.adam(lr)
            else:
                self.optimizer = optax.sgd(lr)
            clip_norm = tcfg["optimizer"].get("grad_clip_norm")
            if clip_norm:
                self.optimizer = optax.chain(
                    optax.clip_by_global_norm(float(clip_norm)), self.optimizer
                )

        self.init_variables()
        if self.opt_state is None:
            self.opt_state = self.optimizer.init(self.variables["params"])
        self._train_step = self._build_train_step()
        self._eval_loss = self._build_eval_loss()

    def _build_train_step(self):
        optimizer = self.optimizer

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(variables, opt_state, net_input, target_belief_maps):
            def compute(params):
                vars_in = dict(variables, params=params)
                loss, new_bs = self.loss_fn(
                    vars_in, net_input, target_belief_maps, train=True
                )
                return loss, new_bs

            (loss, new_batch_stats), grads = jax.value_and_grad(
                compute, has_aux=True
            )(variables["params"])
            updates, opt_state = optimizer.update(
                grads, opt_state, variables["params"]
            )
            params = optax.apply_updates(variables["params"], updates)
            new_vars = dict(variables, params=params)
            if new_batch_stats is not None:
                new_vars["batch_stats"] = new_batch_stats
            return new_vars, opt_state, loss

        return train_step

    def _build_eval_loss(self):
        @jax.jit
        def eval_loss(variables, net_input, target_belief_maps):
            loss, _ = self.loss_fn(variables, net_input, target_belief_maps, train=False)
            return loss

        return eval_loss

    def shard_for_mesh(self, mesh):
        """Place parameters (and future batches) on a (data, model) mesh.

        TPU-native replacement for DataParallel placement (reference
        dream/network.py:244-284): parameters are replicated (or channel-
        sharded over the model axis per dream_tpu.parallel.param_shardings);
        batches are sharded over the data axis by :meth:`train_raw` /
        :meth:`train`.  XLA inserts the gradient all-reduce over ICI.
        """
        from dream_tpu import parallel as dream_parallel

        self.init_variables()
        self._mesh = mesh
        self.variables = {
            k: (
                jax.device_put(
                    v, dream_parallel.param_shardings(v, mesh)
                )
                if k == "params"
                else jax.device_put(v, dream_parallel.replicated_sharding(mesh))
            )
            for k, v in self.variables.items()
        }
        if self.opt_state is not None:
            self.opt_state = jax.device_put(
                self.opt_state, dream_parallel.replicated_sharding(mesh)
            )
        self._batch_sharding = dream_parallel.batch_sharding(mesh, ndim=4)

    def _shard_batch(self, *arrays):
        if getattr(self, "_mesh", None) is None:
            return arrays
        from dream_tpu.parallel import process_local_batch

        # Single-process: a device_put onto the data axis.  Multi-host: each
        # process contributes its local rows and the result is one global
        # array sharded over ICI/DCN (see parallel.initialize_distributed).
        return tuple(
            process_local_batch(self._mesh, a) for a in arrays
        )

    def enable_ema(self, decay: float):
        """Maintain an exponential moving average of the parameters.

        The EMA update runs INSIDE the fused/scanned training dispatch (one
        multiply-add per parameter per step — free next to the backward
        pass), so long scanned epochs never materialize intermediate
        snapshots.  ``ema_variables()`` returns the model with the averaged
        weights swapped in; the trainer checkpoints it as
        ``best_network_ema.*``.  dream_tpu extension (no reference
        counterpart); call BEFORE enable_fused/scanned_training.
        """
        assert 0.0 < decay < 1.0, decay
        self.init_variables()
        self.ema_decay = float(decay)
        self.ema_params = jax.tree_util.tree_map(
            jnp.array, self.variables["params"]
        )

    def ema_variables(self):
        assert getattr(self, "ema_params", None) is not None
        return dict(self.variables, params=self.ema_params)

    def enable_fused_training(self, batch_processor):
        """Fuse the device-side batch processor into the train step.

        ``batch_processor`` is a (possibly jitted) function
        ``(key, raw_images_u8, kp_projs_raw) -> batch dict`` from
        dream_tpu.data.make_batch_processor; jit-inlining it here makes the
        whole step — preprocess, augment, GT belief-map synthesis, forward,
        backward, optimizer update — ONE device dispatch with no intermediate
        HBM round trips (TPU-native; no reference counterpart, whose pipeline
        crosses the DataLoader process boundary every batch).
        """
        self.enable_training()

        optimizer = self.optimizer
        ema_decay = getattr(self, "ema_decay", None)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def fused_step(variables, opt_state, ema_params, key, raw_images,
                       kp_projs_raw):
            batch = batch_processor(key, raw_images, kp_projs_raw)

            def compute(params):
                vars_in = dict(variables, params=params)
                loss, new_bs = self.loss_fn(
                    vars_in, batch["image_rgb_input"], batch["belief_maps"],
                    train=True,
                )
                return loss, new_bs

            (loss, new_batch_stats), grads = jax.value_and_grad(
                compute, has_aux=True
            )(variables["params"])
            updates, opt_state = optimizer.update(
                grads, opt_state, variables["params"]
            )
            params = optax.apply_updates(variables["params"], updates)
            new_vars = dict(variables, params=params)
            if new_batch_stats is not None:
                new_vars["batch_stats"] = new_batch_stats
            if ema_decay is not None:
                ema_params = jax.tree_util.tree_map(
                    lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                    ema_params, params,
                )
            return new_vars, opt_state, ema_params, loss

        self._fused_train_step = fused_step

    def enable_scanned_training(self, batch_processor):
        """Compile a whole-epoch training dispatch over a device-resident set.

        Through a remote/relayed TPU every dispatch pays a host round trip; a
        19-step epoch of ~114 ms steps realizes <100 imgs/s because the relay
        latency serializes between steps.  With the dataset resident in HBM
        (data.DeviceCachedLoader) the entire epoch — shuffled gathers,
        augmentation, GT belief maps, forward, backward, optimizer — is ONE
        ``lax.scan`` dispatch: realized throughput tracks the fused step rate.
        No reference counterpart (its DataLoader crosses a process boundary
        every batch, reference scripts/train_network.py:464-659).
        """
        self.enable_fused_training(batch_processor)
        optimizer = self.optimizer
        ema_decay = getattr(self, "ema_decay", None)

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def epoch_fn(variables, opt_state, ema_params, key, images_ref,
                     kp_ref, idx):
            keys = jax.random.split(key, idx.shape[0])

            def body(carry, xs):
                variables, opt_state, ema_params = carry
                sel, step_key = xs
                batch = batch_processor(
                    step_key,
                    jnp.take(images_ref, sel, axis=0),
                    jnp.take(kp_ref, sel, axis=0),
                )

                def compute(params):
                    vars_in = dict(variables, params=params)
                    return self.loss_fn(
                        vars_in, batch["image_rgb_input"], batch["belief_maps"],
                        train=True,
                    )

                (loss, new_bs), grads = jax.value_and_grad(
                    compute, has_aux=True
                )(variables["params"])
                updates, opt_state = optimizer.update(
                    grads, opt_state, variables["params"]
                )
                params = optax.apply_updates(variables["params"], updates)
                new_vars = dict(variables, params=params)
                if new_bs is not None:
                    new_vars["batch_stats"] = new_bs
                if ema_decay is not None:
                    ema_params = jax.tree_util.tree_map(
                        lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                        ema_params, params,
                    )
                return (new_vars, opt_state, ema_params), loss

            (variables, opt_state, ema_params), losses = jax.lax.scan(
                body, (variables, opt_state, ema_params), (idx, keys)
            )
            return variables, opt_state, ema_params, losses

        self._scanned_epoch = epoch_fn

    def train_epoch_raw(self, key, images_ref, kp_projs_ref, index_matrix):
        """Run one epoch (``index_matrix`` is ``[n_steps, batch]`` positions
        into the device-resident ``images_ref``/``kp_projs_ref``) in a single
        device dispatch; returns the per-step loss vector (on device)."""
        assert hasattr(self, "_scanned_epoch"), (
            "Call enable_scanned_training(batch_processor) first."
        )
        (
            self.variables, self.opt_state, self.ema_params, losses,
        ) = self._scanned_epoch(
            self.variables, self.opt_state,
            getattr(self, "ema_params", None), key, images_ref, kp_projs_ref,
            jnp.asarray(index_matrix, dtype=jnp.int32),
        )
        return losses

    def train_raw(self, key, raw_images, kp_projs_raw):
        """One fused optimization step directly from raw uint8 frames."""
        assert hasattr(self, "_fused_train_step"), (
            "Call enable_fused_training(batch_processor) first."
        )
        raw_images, kp_projs_raw = self._shard_batch(
            jnp.asarray(raw_images), jnp.asarray(kp_projs_raw)
        )
        (
            self.variables, self.opt_state, self.ema_params, loss,
        ) = self._fused_train_step(
            self.variables, self.opt_state,
            getattr(self, "ema_params", None), key, raw_images, kp_projs_raw,
        )
        return loss

    def train(self, network_input_heads, target):
        """One optimization step (reference dream/network.py:328-338).

        ``network_input_heads`` is a list whose first entry is the image batch
        (NHWC); ``target`` is ``[B, n_kp, h, w]`` belief maps.
        """
        assert self.optimizer is not None, (
            "Optimizer must be defined. Use enable_training() first."
        )
        self.variables, self.opt_state, loss = self._train_step(
            self.variables, self.opt_state, network_input_heads[0], target
        )
        return loss

    def loss(self, network_input_heads, target, variables=None):
        """Evaluation loss (no gradient; reference dream/network.py:340-364).

        ``variables`` overrides the model variables (e.g. the EMA snapshot
        from :meth:`ema_variables`) without touching the training state.
        """
        self.init_variables()
        if not hasattr(self, "_eval_loss"):
            self._eval_loss = self._build_eval_loss()
        return self._eval_loss(
            self.variables if variables is None else variables,
            network_input_heads[0], target,
        )

    def enable_evaluation(self):
        """Inference mode (reference dream/network.py:693-696).  flax models
        are stateless; this just ensures params exist."""
        self.init_variables()

    # ------------------------------------------------------------------
    # Inference (reference dream/network.py:503-590)
    # ------------------------------------------------------------------

    def peak_offset_due_to_upsampling(self) -> float:
        w, h = self.trained_net_output_resolution()
        # Heuristic for small belief maps (reference dream/network.py:534-538).
        return 0.0 if (w >= 400 and h >= 400) else 0.4395

    @functools.cached_property
    def _inference_fn(self):
        offset = self.peak_offset_due_to_upsampling()
        use_scores = self.use_belief_peak_scores
        gap = self.belief_peak_next_best_score
        output_heads = self.network_config["architecture"]["output_heads"]

        if output_heads == ["belief_maps", "keypoints"]:
            # Spatial-softmax head: the model itself emits keypoint coords
            # (reference dream/network.py:511-515).
            @jax.jit
            def run(variables, net_input):
                outputs, _ = self.apply_model(variables, net_input, train=False)
                belief = jnp.moveaxis(outputs[0], -1, 1)  # [B, n_kp, h, w]
                return belief, outputs[1]

            return run

        @jax.jit
        def run(variables, net_input):
            outputs, _ = self.apply_model(variables, net_input, train=False)
            belief_nhwc = outputs[-1]  # last stage (reference :522)
            belief = jnp.moveaxis(belief_nhwc, -1, 1)  # [B, n_kp, h, w]
            keypoints, peaks = bm_ops.keypoints_from_belief_maps(
                belief,
                offset,
                use_belief_peak_scores=use_scores,
                belief_peak_next_best_score=gap,
            )
            return belief, keypoints

        return run

    def enable_pipeline_inference(self, n_microbatches: int = 4, mesh=None):
        """Run the multistage cascade stage-parallel across devices.

        Replaces the sequential forward with a GPipe-style pipeline (one
        stage per device on a ``stage`` mesh axis, ppermute microbatch
        streaming — ``dream_tpu/parallel/pipeline.py``); the peak decode
        runs on the replicated final-stage maps.  Identical outputs to the
        sequential path (pipeline tests pin 1e-5 agreement).  The batch fed
        to :meth:`inference` must divide by ``n_microbatches``.  No
        reference analog (its multistage model is single-GPU sequential,
        reference dream/models.py:350-553).  Returns the stage mesh.
        """
        from dream_tpu import models as dream_models
        from dream_tpu.parallel.pipeline import pipeline_multistage_inference

        assert isinstance(self.model, dream_models.DreamHourglassMultiStage), (
            "Pipeline inference applies to the multistage cascade; "
            f"got {type(self.model).__name__}."
        )
        self.init_variables()
        pipe_fn, mesh = pipeline_multistage_inference(
            self.model, self.variables, mesh=mesh,
            n_microbatches=n_microbatches,
        )
        offset = self.peak_offset_due_to_upsampling()
        use_scores = self.use_belief_peak_scores
        gap = self.belief_peak_next_best_score
        decode = jax.jit(
            functools.partial(
                bm_ops.keypoints_from_belief_maps,
                offset_due_to_upsampling=offset,
                use_belief_peak_scores=use_scores,
                belief_peak_next_best_score=gap,
            )
        )

        def run(variables, net_input):
            belief = jnp.moveaxis(pipe_fn(net_input), -1, 1)  # [B, n_kp, h, w]
            keypoints, _ = decode(belief)
            return belief, keypoints

        # Override the cached sequential path (cached_property stores into
        # __dict__, so a later enable_ call simply replaces it).
        self.__dict__["_inference_fn"] = run
        return mesh

    def enable_int8_inference(self, calibration_net_inputs):
        """Post-training int8 quantization of the conv stack (dream_tpu
        extension; the reference is fp32 end-to-end).

        TPU v5e executes int8 MXU contractions at twice the bf16 rate and
        the hourglass is conv-bound, so this is the remaining single-chip
        inference speed lever.  Weights quantize per-output-channel, the
        activation scale per conv comes from calibration over
        ``calibration_net_inputs`` (an iterable of preprocessed+normalized
        ``[B, H, W, 3]`` batches — a few dozen representative frames
        suffice); the belief-map output conv stays in the float compute
        dtype (see dream_tpu/models/quant.py).  resnet architectures are
        first transformed to the BN-folded deploy graph
        (models/resnet_deploy.py) and quantized there.  Overrides the
        jitted inference paths; training and checkpoints are untouched
        (params stay float32).
        """
        import dataclasses

        self.init_variables()
        if self.architecture_type == "resnet":
            from dream_tpu.models.resnet_deploy import (
                ResnetSimpleDeploy, fold_batchnorm_resnet,
            )

            deploy_kwargs = dict(
                n_keypoints=self.n_keypoints,
                full=self._arch_kwargs["full"],
                layers=self.model.layers,
                dtype=self.compute_dtype,
            )
            calib_model = ResnetSimpleDeploy(**deploy_kwargs, mode="calibrate")
            int8_model = ResnetSimpleDeploy(**deploy_kwargs, mode="int8")
            int8_params = fold_batchnorm_resnet(self.variables)["params"]
        else:
            calib_model = dataclasses.replace(self.model, quant_mode="calibrate")
            int8_model = dataclasses.replace(self.model, quant_mode="int8")
            int8_params = self.variables["params"]
        w, h = self.trained_net_input_resolution()
        qvars = calib_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32)
        )["quant"]

        @jax.jit
        def calib_step(params, quant, net_input):
            _, mut = calib_model.apply(
                {"params": params, "quant": quant}, net_input,
                mutable=["quant"],
            )
            return mut["quant"]

        n_frames = 0
        for batch in calibration_net_inputs:
            batch = jnp.asarray(batch)
            qvars = calib_step(int8_params, qvars, batch)
            n_frames += int(batch.shape[0])
        assert n_frames > 0, "int8 calibration needs at least one batch."
        self._int8_quant_vars = qvars
        self._int8_params = int8_params
        self._int8_model = int8_model

        # Three int8 graph implementations share the same params +
        # calibration tree (models/vgg_int8_deploy.py, models/quant.py):
        #
        # - 'xla_chain': bf16 down1 prologue, then XLA int8 convs with the
        #   requant fused behind each conv so activations stay int8 in HBM
        #   between convs (no bf16 round trips, no Mosaic lane padding);
        # - 'quantconv': the QuantConv graph — every conv int8 (down1
        #   included) with dequant-to-compute-dtype between convs;
        # - 'pallas': the fused Mosaic kernel chain (ops/pallas_conv.py).
        #
        # Default 'auto' picks 'xla_chain' when the architecture qualifies
        # (bench.py races all three each capture; r4 b=128 measured
        # QuantConv 1603 fps vs Pallas chain 603 — the chain structure wins
        # through XLA's own int8 convs, not the hand kernel).  Override with
        # the DREAM_INT8_IMPL env var; DREAM_INT8_PALLAS=0 is honored as
        # 'quantconv' for back-compat.
        from dream_tpu.models import vgg_int8_deploy

        chain_ok = (
            self.architecture_type == "vgg"
            and vgg_int8_deploy.supports(self.model)
            and jax.default_backend() == "tpu"
        )
        impl = os.environ.get("DREAM_INT8_IMPL", "auto")
        if os.environ.get("DREAM_INT8_PALLAS", "1") == "0" and impl == "auto":
            impl = "quantconv"
        if impl not in ("auto", "xla_chain", "quantconv", "pallas"):
            raise ValueError(
                f"DREAM_INT8_IMPL={impl!r}: expected one of "
                "'auto', 'xla_chain', 'quantconv', 'pallas'."
            )
        if impl == "auto":
            impl = "xla_chain" if chain_ok else "quantconv"
        elif impl in ("xla_chain", "pallas") and not chain_ok:
            # An EXPLICIT override that this architecture/backend can't honor
            # must not be silently ignored — the user asked for a specific
            # int8 graph and would otherwise benchmark the wrong one.
            warnings.warn(
                f"DREAM_INT8_IMPL={impl!r} requires the vgg-Q chain "
                f"(vgg architecture + TPU backend); falling back to "
                f"'quantconv' for architecture "
                f"{self.architecture_type!r} on {jax.default_backend()!r}.",
                stacklevel=2,
            )
            impl = "quantconv"
        compute_dtype = self.compute_dtype

        if impl in ("xla_chain", "pallas"):
            chain_backend = "xla" if impl == "xla_chain" else "pallas"

            def apply_int8(params, net_input):
                return [
                    vgg_int8_deploy.vgg_q_int8_infer(
                        params, qvars, net_input, dtype=compute_dtype,
                        backend=chain_backend,
                    )
                ]
        else:
            def apply_int8(params, net_input):
                return int8_model.apply(
                    {"params": params, "quant": qvars}, net_input
                )
        self._int8_impl = impl
        # Exposed for export.py so AOT artifacts serialize the SAME int8
        # graph implementation the live path selected.
        self._int8_apply = apply_int8

        offset = self.peak_offset_due_to_upsampling()
        use_scores = self.use_belief_peak_scores
        gap = self.belief_peak_next_best_score
        output_heads = self.network_config["architecture"]["output_heads"]
        soft_argmax_head = output_heads == ["belief_maps", "keypoints"]

        # The quantized params are passed as jit ARGUMENTS (for resnet the
        # BN-folded tree differs from self.variables; embedding it as jaxpr
        # constants would bloat the compile).
        @jax.jit
        def run_impl(params, net_input):
            outputs = apply_int8(params, net_input)
            belief = jnp.moveaxis(outputs[0 if soft_argmax_head else -1], -1, 1)
            if soft_argmax_head:
                return belief, outputs[1]
            keypoints, _ = bm_ops.keypoints_from_belief_maps(
                belief, offset, use_belief_peak_scores=use_scores,
                belief_peak_next_best_score=gap,
            )
            return belief, keypoints

        @jax.jit
        def run_detailed_impl(params, net_input):
            outputs = apply_int8(params, net_input)
            if soft_argmax_head:
                belief = jnp.moveaxis(outputs[0], -1, 1)
                keypoints = outputs[1]
                return (
                    belief, keypoints, jnp.ones(keypoints.shape[:-1]), keypoints
                )
            belief = jnp.moveaxis(outputs[-1], -1, 1)
            keypoints, peaks = bm_ops.keypoints_from_belief_maps(
                belief, offset, use_belief_peak_scores=use_scores,
                belief_peak_next_best_score=gap,
            )
            return (
                belief, keypoints, peaks["scores"][..., 0],
                peaks["coords"][..., 0, :],
            )

        def run(variables, net_input):
            return run_impl(self._int8_params, net_input)

        def run_detailed(variables, net_input):
            return run_detailed_impl(self._int8_params, net_input)

        self.__dict__["_inference_fn"] = run
        self.__dict__["_inference_detailed_fn"] = run_detailed
        return qvars

    def inference(self, network_input):
        """Image batch (NHWC float) -> (belief_maps [B,n_kp,h,w], keypoints [B,n_kp,2]).

        Fully on device, single jit; sentinel (-999.999, -999.999) marks
        no-detection (reference dream/network.py:503-590).
        """
        self.init_variables()
        return self._inference_fn(self.variables, network_input)

    @functools.cached_property
    def _inference_detailed_fn(self):
        offset = self.peak_offset_due_to_upsampling()
        use_scores = self.use_belief_peak_scores
        gap = self.belief_peak_next_best_score
        output_heads = self.network_config["architecture"]["output_heads"]

        if output_heads == ["belief_maps", "keypoints"]:
            @jax.jit
            def run(variables, net_input):
                belief, keypoints = self._inference_fn(variables, net_input)
                return (
                    belief, keypoints, jnp.ones(keypoints.shape[:-1]), keypoints
                )

            return run

        @jax.jit
        def run(variables, net_input):
            outputs, _ = self.apply_model(variables, net_input, train=False)
            belief = jnp.moveaxis(outputs[-1], -1, 1)
            keypoints, peaks = bm_ops.keypoints_from_belief_maps(
                belief,
                offset,
                use_belief_peak_scores=use_scores,
                belief_peak_next_best_score=gap,
            )
            return (
                belief, keypoints, peaks["scores"][..., 0],
                peaks["coords"][..., 0, :],
            )

        return run

    def inference_detailed(self, network_input):
        """``inference`` plus per-keypoint best-peak scores ``[B, n_kp]`` and
        the unconditional best-peak coords ``[B, n_kp, 2]`` (the top peak even
        when the 0.25 score-gap disambiguation rejects it to a sentinel).

        The scores feed confidence-weighted PnP and the soft coords feed
        soft-detection PnP (dream_tpu extensions; the reference discards both
        after its disambiguation, dream/network.py:546-577).
        """
        self.init_variables()
        return self._inference_detailed_fn(self.variables, network_input)

    def keypoints_from_image(
        self, input_rgb_image, image_preprocessing_override=None, debug=False,
        detailed=False,
    ):
        """Full single-image pipeline, PIL in -> raw-frame keypoints out.

        Parity: reference dream/network.py:423-499.  ``detailed`` additionally
        returns per-keypoint best-peak scores and the unconditional best-peak
        coords in the raw frame (``peak_scores`` / ``best_peak_keypoints``) —
        the inputs to confidence-weighted / soft-detection PnP.
        """
        import PIL.Image as PILImage

        if isinstance(input_rgb_image, PILImage.Image):
            input_resolution = input_rgb_image.size
            image_arr = np.asarray(input_rgb_image.convert("RGB"), dtype=np.uint8)
        else:
            image_arr = np.asarray(input_rgb_image, dtype=np.uint8)
            input_resolution = (image_arr.shape[1], image_arr.shape[0])

        image_preprocessing = (
            image_preprocessing_override
            if image_preprocessing_override
            else self.image_preprocessing()
        )

        netin_res, netout_res = self.net_resolutions_from_image_raw_resolution(
            input_resolution, image_preprocessing_override=image_preprocessing
        )

        net_input = image_proc_ops.preprocess_and_normalize(
            jnp.asarray(image_arr)[None],
            self.trained_net_input_resolution(),
            image_preprocessing,
            self.image_normalization,
        )

        if detailed:
            belief_maps_batch, kp_netout_batch, peak_scores, best_netout = (
                self.inference_detailed(net_input)
            )
        else:
            belief_maps_batch, kp_netout_batch = self.inference(net_input)
        detected_kp_projs_net_out = np.asarray(kp_netout_batch[0], dtype=float)
        belief_maps = belief_maps_batch[0]

        netout_res_inf = (belief_maps.shape[-1], belief_maps.shape[-2])
        kp_netin = coord_ops.convert_keypoints_to_netin_from_netout(
            detected_kp_projs_net_out, netout_res_inf, netin_res
        )
        detected_kp_projs = coord_ops.convert_keypoints_to_raw_from_netin(
            kp_netin, netin_res, input_resolution, image_preprocessing
        )

        detection_result = {"detected_keypoints": np.asarray(detected_kp_projs)}
        if detailed:
            best_netin = coord_ops.convert_keypoints_to_netin_from_netout(
                np.asarray(best_netout[0], dtype=float), netout_res_inf, netin_res
            )
            best_raw = coord_ops.convert_keypoints_to_raw_from_netin(
                best_netin, netin_res, input_resolution, image_preprocessing
            )
            detection_result["peak_scores"] = np.asarray(peak_scores[0])
            detection_result["best_peak_keypoints"] = np.asarray(best_raw)
        if debug:
            detection_result["image_rgb_net_input"] = net_input[0]
            detection_result["belief_maps"] = belief_maps
            detection_result["detected_keypoints_net_output"] = detected_kp_projs_net_out
            detection_result["detected_keypoints_net_input"] = np.asarray(kp_netin)
        return detection_result

    # ------------------------------------------------------------------
    # Serialization (reference dream/network.py:592-632)
    # ------------------------------------------------------------------

    def save_network_config(self, config_file_path, overwrite=False):
        save_yaml(self.network_config, config_file_path, overwrite=overwrite)

    def save_network_params(self, network_params_path, overwrite=False):
        if not overwrite:
            assert not os.path.exists(network_params_path), (
                f'Output file already exists in "{network_params_path}".'
            )
        self.init_variables()
        with open(network_params_path, "wb") as f:
            f.write(serialization.to_bytes(self.variables))

    def init_encoder_from(self, encoder_params_path):
        """Warm-start just the VGG encoder trunk from a pretrained subtree.

        The TPU-native stand-in for the reference's ImageNet initialization
        (reference dream/models.py:587 ``vgg19(pretrained=True)``): loads a
        ``down1..down5`` params subtree written by scripts/pretrain_encoder.py
        (or extracted from converted torchvision weights) and grafts every
        shape-matching leaf into this model's params.  Returns
        ``(n_grafted, n_skipped)`` leaf counts.
        """
        from dream_tpu.models.pretrain import graft_encoder_params

        self.init_variables()
        with open(encoder_params_path, "rb") as f:
            raw = f.read()
        encoder = serialization.msgpack_restore(raw)
        merged, n_grafted, n_skipped = graft_encoder_params(
            jax.device_get(self.variables["params"]), encoder
        )
        assert n_grafted > 0, (
            f"No encoder weights from {encoder_params_path} matched this "
            f"model's params (wrong architecture?)."
        )
        self.variables = dict(
            self.variables, params=jax.tree_util.tree_map(jnp.asarray, merged)
        )
        self.__dict__.pop("_inference_fn", None)
        self.__dict__.pop("_inference_detailed_fn", None)
        return n_grafted, n_skipped

    def load_network_params(self, network_params_path):
        self.init_variables()
        with open(network_params_path, "rb") as f:
            loaded = serialization.from_bytes(self.variables, f.read())
        # Cast to the model's parameter dtypes: storage-compressed
        # checkpoints (e.g. the float16-cast artifacts committed under
        # trained_models/) run as ordinary float32 params.
        self.variables = jax.tree_util.tree_map(
            lambda t, l: jnp.asarray(l, t.dtype), self.variables, loaded
        )
        # Drop any stale compiled closure over old variables.
        self.__dict__.pop("_inference_fn", None)
        self.__dict__.pop("_inference_detailed_fn", None)

    def save_network(self, output_dir, output_filename_without_extension, overwrite=False):
        makedirs(output_dir, exist_ok=True)
        self.save_network_config(
            os.path.join(output_dir, output_filename_without_extension + ".yaml"),
            overwrite,
        )
        self.save_network_params(
            os.path.join(output_dir, output_filename_without_extension + ".msgpack"),
            overwrite,
        )

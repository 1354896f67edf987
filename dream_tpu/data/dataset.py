"""NDDS dataset pipeline: host decode only; everything else on device.

The reference's pipeline does per-sample PIL preprocessing, host
augmentation, and Python-loop belief-map synthesis inside DataLoader worker
processes (reference dream/datasets.py:109-273) — the CPU hot spot called out
in its training call stack.  The TPU-native split here is:

- **host** (this module): JSON keypoint parsing (eager, once), JPEG/PNG
  decode to raw-resolution uint8 arrays with a thread pool, shuffling,
  batching, double-buffered prefetch;
- **device** (:func:`make_batch_processor`): preprocessing, augmentation,
  normalization, keypoint frame conversion, and GT belief-map synthesis fused
  into one jitted function that runs as part of the train step.

Debug levels mirror the reference's enum (reference dream/datasets.py:22-30).
"""

from __future__ import annotations

import concurrent.futures
import enum
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import jax
import numpy as np

from dream_tpu.data.augment import AugmentConfig, DEFAULT_AUGMENT, augment_batch
from dream_tpu.ops import coords as coord_ops
from dream_tpu.ops.belief_maps import create_belief_maps
from dream_tpu.ops.image_proc import normalize_images, preprocess_images
from dream_tpu.utils import ndds as ndds_utils
from dream_tpu.utils.resolutions import KNOWN_IMAGE_PREPROC_TYPES


class ManipulatorNDDSDatasetDebugLevels(enum.IntEnum):
    """Parity: reference dream/datasets.py:22-30.

    NONE/LIGHT match the reference.  HEAVY dumps per-sample GT overlay +
    belief-map PNGs to disk (the reference declares this level but leaves it
    a TODO, dream/datasets.py:223-225); INTERACTIVE additionally writes an
    HTML contact sheet (``index.html``) — the headless substitute for the
    reference's on-screen ``PIL.show()`` + "Press Enter" loop
    (dream/datasets.py:228-271), which needs a display this host lacks.
    """

    NONE = 0
    LIGHT = 1
    HEAVY = 2
    INTERACTIVE = 3


class ManipulatorNDDSDataset:
    """Host-side index over an NDDS dataset.

    Ctor signature mirrors the reference (reference dream/datasets.py:33-104)
    minus torch specifics; the heavy lifting moved into
    :func:`make_batch_processor`.
    """

    def __init__(
        self,
        ndds_dataset,
        manipulator_name: str,
        keypoint_names: Sequence[str],
        network_input_resolution: Tuple[int, int],
        network_output_resolution: Tuple[int, int],
        image_normalization: Optional[dict] = None,
        image_preprocessing: str = "shrink-and-crop",
        augment_data: bool = False,
        include_ground_truth: bool = True,
        include_belief_maps: bool = False,
        debug_mode: int = ManipulatorNDDSDatasetDebugLevels.NONE,
        n_decode_threads: int = 8,
        use_native_loader: Optional[bool] = None,
        debug_dir: str = "dataset_debug",
    ):
        if isinstance(ndds_dataset, str):
            ndds_dataset = ndds_utils.find_ndds_data_in_dir(ndds_dataset)
        self.ndds_dataset_data = ndds_dataset[0]
        self.ndds_dataset_config = ndds_dataset[1]
        self.manipulator_name = manipulator_name
        self.keypoint_names = list(keypoint_names)
        self.network_input_resolution = tuple(network_input_resolution)
        self.network_output_resolution = tuple(network_output_resolution)
        self.image_normalization = image_normalization
        self.augment_data = augment_data
        if include_belief_maps:
            assert include_ground_truth, (
                'If "include_belief_maps" is True, "include_ground_truth" must also be True.'
            )
        self.include_ground_truth = include_ground_truth
        self.include_belief_maps = include_belief_maps
        self.debug_mode = debug_mode
        self.debug_dir = debug_dir
        self._debug_dumped: set = set()
        assert image_preprocessing in KNOWN_IMAGE_PREPROC_TYPES
        self.image_preprocessing = image_preprocessing

        self._decode_pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=n_decode_threads
        )
        self._n_decode_threads = n_decode_threads
        if use_native_loader is None:
            from dream_tpu.data import native_loader

            use_native_loader = native_loader.native_available()
        self._use_native_loader = use_native_loader

        # Eagerly parse all keypoint JSON (cheap relative to image decode,
        # keeps the steady-state loop free of JSON work).
        n = len(self.ndds_dataset_data)
        n_kp = len(self.keypoint_names)
        self.kp_projs_raw = np.zeros((n, n_kp, 2), dtype=np.float32)
        self.kp_positions = np.zeros((n, n_kp, 3), dtype=np.float32)
        if include_ground_truth:
            for i, datum in enumerate(self.ndds_dataset_data):
                kp = ndds_utils.load_keypoints(
                    datum["data_path"], manipulator_name, self.keypoint_names
                )
                self.kp_projs_raw[i] = np.asarray(kp["projections"], dtype=np.float32)
                self.kp_positions[i] = np.asarray(
                    kp["positions_wrt_cam"], dtype=np.float32
                )

        # Raw image resolution from camera config (fallback: first image).
        if self.ndds_dataset_config and self.ndds_dataset_config.get("camera"):
            self.image_raw_resolution = ndds_utils.load_image_resolution(
                self.ndds_dataset_config["camera"]
            )
        else:
            im = self._decode(0)
            self.image_raw_resolution = (im.shape[1], im.shape[0])

    def __len__(self) -> int:
        return len(self.ndds_dataset_data)

    def _decode(self, index: int) -> np.ndarray:
        from PIL import Image

        path = self.ndds_dataset_data[index]["image_paths"]["rgb"]
        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), dtype=np.uint8)

    def load_images(self, indices: Sequence[int]) -> np.ndarray:
        """Threaded decode of a batch of raw-resolution uint8 images.

        Uses the native C++ decoder (GIL-free thread pool) when built,
        otherwise a Python thread pool over PIL.
        """
        if self._use_native_loader:
            from dream_tpu.data import native_loader

            w, h = self.image_raw_resolution
            paths = [
                self.ndds_dataset_data[i]["image_paths"]["rgb"] for i in indices
            ]
            return native_loader.decode_batch(
                paths, h, w, n_threads=self._n_decode_threads
            )
        images = list(self._decode_pool.map(self._decode, indices))
        return np.stack(images)

    def host_batch(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        """Everything the device transform needs, as host numpy arrays."""
        batch = {
            "image_rgb_raw": self.load_images(indices),
            "indices": np.asarray(indices, dtype=np.int32),
        }
        if self.include_ground_truth:
            batch["keypoint_projections_raw"] = self.kp_projs_raw[indices]
            batch["keypoint_positions"] = self.kp_positions[indices]
        if self.debug_mode >= ManipulatorNDDSDatasetDebugLevels.HEAVY:
            self.dump_debug(indices, images=batch["image_rgb_raw"])
        return batch

    def dump_debug(
        self,
        indices: Sequence[int],
        images: Optional[np.ndarray] = None,
        output_dir: Optional[str] = None,
    ) -> List[str]:
        """HEAVY-level debug dumps: per-sample GT keypoint overlays (raw and
        net-input frames) and a GT belief-map mosaic, written to
        ``debug_dir``.  At INTERACTIVE level also (re)writes ``index.html``,
        an offline contact sheet replacing the reference's on-screen checks
        (reference dream/datasets.py:228-271).

        Returns the list of files written.  Each sample is dumped at most
        once per dataset instance (cheap enough to leave on during a debug
        training run).
        """
        import os

        from PIL import Image as PILImage

        from dream_tpu import visualize as viz
        from dream_tpu.ops.belief_maps import create_belief_maps

        out_dir = output_dir or self.debug_dir
        os.makedirs(out_dir, exist_ok=True)

        to_netin = coord_ops.affine_netin_from_raw(
            self.image_raw_resolution, self.network_input_resolution,
            self.image_preprocessing,
        )
        to_netout = coord_ops.affine_netout_from_netin(
            self.network_input_resolution, self.network_output_resolution
        )

        written: List[str] = []
        for j, idx in enumerate(indices):
            idx = int(idx)
            if idx in self._debug_dumped:
                continue
            self._debug_dumped.add(idx)
            name = self.ndds_dataset_data[idx]["name"]
            raw = (
                images[j]
                if images is not None
                else self.load_images([idx])[0]
            )
            kp_raw = self.kp_projs_raw[idx]
            kp_netin = np.asarray(to_netin(kp_raw))
            kp_netout = np.asarray(to_netout(kp_netin))

            pil_raw = PILImage.fromarray(raw)
            overlay_raw = viz.overlay_points_on_image(
                pil_raw, kp_raw, self.keypoint_names
            )
            p = os.path.join(out_dir, f"{name}_gt_overlay_raw.png")
            overlay_raw.save(p)
            written.append(p)

            net_in = np.asarray(
                preprocess_images(
                    raw[None].astype(np.float32),
                    self.network_input_resolution,
                    self.image_preprocessing,
                )[0]
            ).astype(np.uint8)
            overlay_netin = viz.overlay_points_on_image(
                PILImage.fromarray(net_in), kp_netin, self.keypoint_names
            )
            p = os.path.join(out_dir, f"{name}_gt_overlay_net_input.png")
            overlay_netin.save(p)
            written.append(p)

            bmaps = np.asarray(
                create_belief_maps(
                    kp_netout[None], self.network_output_resolution
                )[0]
            )
            mosaic = viz.mosaic_images(
                viz.images_from_belief_maps(bmaps),
                rows=1, cols=len(self.keypoint_names),
            )
            p = os.path.join(out_dir, f"{name}_gt_belief_maps.png")
            mosaic.save(p)
            written.append(p)

        if (
            written
            and self.debug_mode >= ManipulatorNDDSDatasetDebugLevels.INTERACTIVE
        ):
            written.append(self._write_debug_contact_sheet(out_dir))
        return written

    def _write_debug_contact_sheet(self, out_dir: str) -> str:
        """HTML contact sheet over every dump so far (INTERACTIVE level)."""
        import html
        import os

        rows = []
        for idx in sorted(self._debug_dumped):
            name = html.escape(self.ndds_dataset_data[idx]["name"])
            cells = "".join(
                f'<td><img src="{name}_{kind}.png" style="max-width:320px">'
                f"<br>{kind}</td>"
                for kind in ("gt_overlay_raw", "gt_overlay_net_input",
                             "gt_belief_maps")
            )
            rows.append(f"<tr><th>{name}</th>{cells}</tr>")
        path = os.path.join(out_dir, "index.html")
        with open(path, "w") as f:
            f.write(
                "<html><body><h1>dream_tpu dataset GT debug</h1>"
                f"<table border=1>{''.join(rows)}</table></body></html>"
            )
        return path

    def sample_names(self, indices: Sequence[int]) -> List[str]:
        return [self.ndds_dataset_data[i]["name"] for i in indices]


def make_batch_processor(
    image_raw_resolution: Tuple[int, int],
    network_input_resolution: Tuple[int, int],
    network_output_resolution: Tuple[int, int],
    image_preprocessing: str,
    image_normalization: Optional[dict],
    augment: bool = False,
    augment_config: AugmentConfig = DEFAULT_AUGMENT,
    include_belief_maps: bool = True,
):
    """Build the jitted device-side batch transform.

    Returns ``process(key, image_rgb_raw_u8, kp_projs_raw) -> dict`` with
    ``image_rgb_input`` (normalized net input, NHWC),
    ``keypoint_projections_output`` (netout frame) and optionally
    ``belief_maps`` ``[B, n_kp, h, w]``.
    """
    to_netin = coord_ops.affine_netin_from_raw(
        image_raw_resolution, network_input_resolution, image_preprocessing
    )
    to_netout = coord_ops.affine_netout_from_netin(
        network_input_resolution, network_output_resolution
    )

    @jax.jit
    def process(key, image_rgb_raw, kp_projs_raw):
        images = preprocess_images(
            image_rgb_raw, network_input_resolution, image_preprocessing
        )  # float32, 0-255 scale
        kp_netin = to_netin(kp_projs_raw)
        if augment:
            images, kp_netin = augment_batch(key, images, kp_netin, augment_config)
        if image_normalization:
            net_input = normalize_images(
                images,
                image_normalization["mean"],
                image_normalization["stdev"],
            )
        else:
            net_input = images / 255.0
        kp_netout = to_netout(kp_netin)
        out = {
            "image_rgb_input": net_input,
            "keypoint_projections_input": kp_netin,
            "keypoint_projections_output": kp_netout,
        }
        if include_belief_maps:
            out["belief_maps"] = create_belief_maps(
                kp_netout, network_output_resolution
            )
        return out

    return process


class DataLoader:
    """Shuffling, batching, double-buffered prefetch iterator.

    Replaces torch DataLoader worker processes (reference
    scripts/train_network.py:448-454) with a single background thread that
    decodes batch N+1 while the device runs step N — sufficient because decode
    is the only host work left.
    """

    def __init__(
        self,
        dataset: ManipulatorNDDSDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        indices: Optional[Sequence[int]] = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.indices = (
            np.asarray(indices, dtype=np.int64)
            if indices is not None
            else np.arange(len(dataset), dtype=np.int64)
        )
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _batches(self) -> List[np.ndarray]:
        order = self.indices.copy()
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self._epoch)
            rng.shuffle(order)
        n_batches = len(self)
        return [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = self._batches()
        if not batches:
            return
        # The pool must shut down even when iteration is abandoned early
        # (break / exception in the consumer closes the generator, which
        # raises GeneratorExit here and runs the context manager's __exit__).
        with concurrent.futures.ThreadPoolExecutor(max_workers=1) as pool:
            future = pool.submit(self.dataset.host_batch, batches[0])
            for i in range(len(batches)):
                batch = future.result()
                if i + 1 < len(batches):
                    future = pool.submit(self.dataset.host_batch, batches[i + 1])
                yield batch


class DeviceCachedLoader:
    """Loader over a dataset held resident in device memory.

    For datasets that fit HBM (a 768-frame 640x480 uint8 set is ~0.7 GB),
    decodes every image ONCE, transfers raw frames + GT to the device, and
    serves shuffled batches as device-side gathers — zero steady-state host
    work, so the realized epoch throughput tracks the fused train step
    instead of the host decode path.  Drop-in for :class:`DataLoader`
    (``set_epoch``, ``len``, iteration yielding the same batch dict; the
    ``indices`` entry stays host-side numpy for ``sample_names``).
    """

    def __init__(
        self,
        dataset: ManipulatorNDDSDataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        drop_last: bool = True,
        indices: Optional[Sequence[int]] = None,
        chunk: int = 64,
    ):
        import jax.numpy as jnp

        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.indices = (
            np.asarray(indices, dtype=np.int64)
            if indices is not None
            else np.arange(len(dataset), dtype=np.int64)
        )
        self._epoch = 0

        # One-time decode + device upload (chunked to bound host memory).
        parts = []
        for i in range(0, len(self.indices), chunk):
            parts.append(
                jnp.asarray(self.dataset.load_images(self.indices[i : i + chunk]))
            )
        self._images = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
        if dataset.include_ground_truth:
            self._kp_projs = jnp.asarray(dataset.kp_projs_raw[self.indices])
            self._kp_positions = jnp.asarray(dataset.kp_positions[self.indices])

    def __len__(self) -> int:
        n = len(self.indices)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    @property
    def device_images(self):
        """The HBM-resident raw image array ``[N, H, W, 3] uint8``."""
        return self._images

    @property
    def device_kp_projs(self):
        """The HBM-resident raw keypoint projections ``[N, n_kp, 2]``."""
        return self._kp_projs

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def epoch_order(self, epoch: int) -> np.ndarray:
        """The (seeded) position permutation this loader uses for ``epoch``."""
        order = np.arange(len(self.indices))
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            rng.shuffle(order)
        return order

    def epoch_index_matrix(self, epoch: int) -> np.ndarray:
        """``[n_steps, batch]`` gather positions into the cached device
        arrays for ``epoch`` — the input DreamNetwork.train_epoch_raw scans
        over to run the whole epoch as one device dispatch."""
        order = self.epoch_order(epoch)
        n_steps = len(self.indices) // self.batch_size  # scan needs full rows
        return order[: n_steps * self.batch_size].reshape(
            n_steps, self.batch_size
        )

    def __iter__(self):
        import jax.numpy as jnp

        order = self.epoch_order(self._epoch)
        for i in range(len(self)):
            sel = order[i * self.batch_size : (i + 1) * self.batch_size]
            sel_dev = jnp.asarray(sel)
            batch = {
                "image_rgb_raw": jnp.take(self._images, sel_dev, axis=0),
                "indices": self.indices[sel].astype(np.int32),
            }
            if self.dataset.include_ground_truth:
                batch["keypoint_projections_raw"] = jnp.take(
                    self._kp_projs, sel_dev, axis=0
                )
                batch["keypoint_positions"] = jnp.take(
                    self._kp_positions, sel_dev, axis=0
                )
            yield batch


def split_indices(
    n: int, training_fraction: float, seed: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Seed-pinned train/valid split (the reference reproduces its split on
    resume by reusing the logged seed, scripts/train_network.py:134,444)."""
    rng = np.random.RandomState(seed)
    order = rng.permutation(n)
    n_train = int(round(n * training_fraction))
    return order[:n_train], order[n_train:]


def collect_calibration_batches(dataset, process, n_frames, batch_size=16,
                                indices=None):
    """Collect >= ``n_frames`` preprocessed net-input batches for int8
    calibration (shared by the analysis/export/video CLIs).

    ``process`` is a ``make_batch_processor`` closure; frames come from the
    head of ``dataset`` (or of ``indices``) in on-disk order, never dropped
    on a partial tail batch.
    """
    import jax
    import jax.numpy as jnp

    batches, n = [], 0
    n_kp = len(dataset.keypoint_names)
    for host_batch in DataLoader(
        dataset, batch_size, shuffle=False, drop_last=False, indices=indices
    ):
        images = jnp.asarray(host_batch["image_rgb_raw"])
        # Calibration only consumes the net-input images; datasets built
        # with include_ground_truth=False (the export CLI) carry no
        # keypoint keys, so feed the processor placeholder coords.
        kp_raw = host_batch.get("keypoint_projections_raw")
        if kp_raw is None:
            kp_raw = np.zeros((images.shape[0], n_kp, 2), dtype=np.float32)
        b = process(
            jax.random.PRNGKey(0),
            images,
            jnp.asarray(kp_raw),
        )
        batches.append(b["image_rgb_input"])
        n += int(b["image_rgb_input"].shape[0])
        if n >= n_frames:
            break
    assert batches, "calibration dataset yielded no frames"
    return batches

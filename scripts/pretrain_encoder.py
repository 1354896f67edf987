#!/usr/bin/env python3
"""Self-pretrain the VGG19-layout encoder as a denoising autoencoder.

The reference's training recipe starts from ImageNet-pretrained encoders
(reference dream/models.py:587) — the source of its sample efficiency.  With
zero egress there are no ImageNet weights, so this script learns generic
edge/part features from streamed synthetic scenes instead:

    python scripts/pretrain_encoder.py -o trained_models/encoder_ae.msgpack \
        --steps 1500 --batch-size 32

then warm-start any hourglass training run:

    python scripts/train_network.py ... --init-encoder trained_models/encoder_ae.msgpack

Pretext: reconstruct the clean image (at 1/4 resolution) from a corrupted
input (Gaussian noise + brightness/contrast jitter + channel dropout).  All
compute (corruption included) runs on device in one fused jitted step; the
host only renders scenes (double-buffered thread).
"""

from __future__ import annotations

import argparse
import concurrent.futures
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pretrain_encoder(args):
    import jax
    import jax.numpy as jnp
    import optax
    from flax import serialization

    from dream_tpu.data.synthetic import render_random_scene
    from dream_tpu.models.pretrain import EncoderAutoencoder, extract_encoder_params

    res = (args.resolution, args.resolution)
    model = EncoderAutoencoder(dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    rng = np.random.RandomState(args.seed)

    def render_batch(seed):
        batch_rng = np.random.RandomState(seed)
        frames = np.stack([
            render_random_scene(batch_rng, res)[0] for _ in range(args.batch_size)
        ])
        return frames

    init_key = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, res[1], res[0], 3), jnp.float32)
    variables = jax.jit(model.init)(init_key, x0)
    params = variables["params"]
    tx = optax.adam(args.learning_rate)
    opt_state = tx.init(params)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, key, clean_u8):
        clean = clean_u8.astype(jnp.float32) / 127.5 - 1.0
        k1, k2, k3, k4 = jax.random.split(key, 4)
        noisy = clean + jax.random.normal(k1, clean.shape) * args.noise_sigma
        # Brightness/contrast jitter per sample.
        b = jax.random.uniform(k2, (clean.shape[0], 1, 1, 1), minval=-0.2, maxval=0.2)
        c = jax.random.uniform(k3, (clean.shape[0], 1, 1, 1), minval=0.8, maxval=1.2)
        noisy = noisy * c + b
        # Random channel dropout (10%).
        drop = jax.random.bernoulli(k4, 0.1, (clean.shape[0], 1, 1, 3))
        noisy = jnp.where(drop, 0.0, noisy)
        # Target: clean image at 1/4 resolution (4x4 mean pool).
        B, H, W, C = clean.shape
        target = clean.reshape(B, H // 4, 4, W // 4, 4, C).mean(axis=(2, 4))

        def loss_fn(p):
            pred = model.apply({"params": p}, noisy)
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    key = jax.random.PRNGKey(args.seed + 1)
    losses = []
    t0 = time.time()
    if args.pool:
        # Device-resident scene pool: render ``--pool`` scenes ONCE, park them
        # in HBM, and serve every step as a device-side gather.  On 1-vCPU
        # hosts the per-step render path is host-bound (seconds/step); the
        # on-device corruption pipeline (noise + jitter + channel dropout,
        # fresh per step) keeps the pretext diverse over a fixed pool.
        print(f"rendering {args.pool}-scene device pool ...", flush=True)
        pool_u8 = jnp.asarray(
            np.stack([
                render_random_scene(np.random.RandomState(args.seed + i), res)[0]
                for i in range(args.pool)
            ])
        )
        print(f"pool resident ({pool_u8.nbytes / 1e6:.0f} MB)", flush=True)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def gather_step(params, opt_state, key, pool_ref):
            k_idx, k_step = jax.random.split(key)
            idx = jax.random.randint(
                k_idx, (args.batch_size,), 0, pool_ref.shape[0]
            )
            clean_u8 = jnp.take(pool_ref, idx, axis=0)
            clean = clean_u8.astype(jnp.float32) / 127.5 - 1.0
            k1, k2, k3, k4 = jax.random.split(k_step, 4)
            noisy = clean + jax.random.normal(k1, clean.shape) * args.noise_sigma
            b = jax.random.uniform(
                k2, (clean.shape[0], 1, 1, 1), minval=-0.2, maxval=0.2
            )
            c = jax.random.uniform(
                k3, (clean.shape[0], 1, 1, 1), minval=0.8, maxval=1.2
            )
            noisy = noisy * c + b
            drop = jax.random.bernoulli(k4, 0.1, (clean.shape[0], 1, 1, 3))
            noisy = jnp.where(drop, 0.0, noisy)
            B, H, W, C = clean.shape
            target = clean.reshape(B, H // 4, 4, W // 4, 4, C).mean(axis=(2, 4))

            def loss_fn(p):
                pred = model.apply({"params": p}, noisy)
                return jnp.mean((pred - target) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        for i in range(args.steps):
            key, step_key = jax.random.split(key)
            params, opt_state, loss = gather_step(
                params, opt_state, step_key, pool_u8
            )
            losses.append(loss)
            if (i + 1) % args.log_every == 0:
                recent = [float(x) for x in jax.device_get(losses[-args.log_every:])]
                print(
                    f"step {i + 1}/{args.steps}  recon mse {np.mean(recent):.5f}  "
                    f"({(i + 1) * args.batch_size / (time.time() - t0):.1f} imgs/s)",
                    flush=True,
                )
    else:
        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        future = pool.submit(render_batch, args.seed)
        for i in range(args.steps):
            clean = future.result()
            future = pool.submit(render_batch, args.seed + i + 1)
            key, step_key = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state, step_key, jnp.asarray(clean)
            )
            losses.append(loss)
            if (i + 1) % args.log_every == 0:
                recent = [float(x) for x in jax.device_get(losses[-args.log_every:])]
                print(
                    f"step {i + 1}/{args.steps}  recon mse {np.mean(recent):.5f}  "
                    f"({(i + 1) * args.batch_size / (time.time() - t0):.1f} imgs/s)",
                    flush=True,
                )
        pool.shutdown(wait=False)

    encoder = extract_encoder_params({"params": jax.device_get(params)})
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    with open(args.output, "wb") as f:
        f.write(serialization.to_bytes(encoder))
    n = sum(np.size(x) for x in jax.tree_util.tree_leaves(encoder))
    print(f"Wrote encoder ({n} params) to {args.output}")


def make_parser():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    parser.add_argument("-o", "--output", required=True,
                        help="Output encoder .msgpack path.")
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("-b", "--batch-size", type=int, default=32)
    parser.add_argument("-lr", "--learning-rate", type=float, default=2e-4)
    parser.add_argument("--resolution", type=int, default=256,
                        help="Square pretraining resolution (features "
                             "transfer across resolutions).")
    parser.add_argument("--noise-sigma", type=float, default=0.25)
    parser.add_argument("--bf16", action="store_true", default=True)
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--pool", type=int, default=0,
                        help="If >0, pre-render this many scenes once and "
                             "keep them resident in device memory; each step "
                             "is then a device-side gather + fresh on-device "
                             "corruption (use on slow hosts; 0 streams "
                             "fresh scenes from the host every step).")
    parser.add_argument("-s", "--seed", type=int, default=0)
    return parser


if __name__ == "__main__":
    pretrain_encoder(make_parser().parse_args())

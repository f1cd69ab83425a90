#!/usr/bin/env python
"""End-to-end input-pipeline utilization proof (SURVEY §7 hard part 1; the
≥95% accelerator-utilization north star).

Generates a synthetic JPEG corpus, then drives the REAL train path:
FolderLoader (native libjpeg decode+crop+resample) → DeviceFeed (async host→
device prefetch) → fused Pallas augment → jitted ResNet-50 train step on the
chip. Reports end-to-end img/s, compute-only img/s (same step on a cached
device batch), and utilization = e2e/compute.

Scaling math (documented result; numbers from this host):
  required decode rate = step rate (img/s/chip)
  decode rate/core     ≈ 471 img/s at 500px sources, ~1/px² in source size
  cores needed/chip    = step_rate / decode_rate(src_px)
This host has ONE core, so the scaled-down proof uses pre-resized sources
(the reference's own convention — resize_imagenet.py produces 512/320/160
trees precisely so training never decodes full-size JPEGs).

    python scripts/bench_input_pipeline.py --src-px 180 --batches 30
"""

import argparse
import io
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_corpus(root: str, n: int, src_px: int, classes: int = 8) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in range(classes):
        os.makedirs(os.path.join(root, f"class_{c:03d}"), exist_ok=True)
    for i in range(n):
        c = i % classes
        arr = rng.integers(0, 256, (src_px, src_px, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"class_{c:03d}", f"img_{i:05d}.jpg"), quality=90)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/synth_imagenet")
    ap.add_argument("--n-images", type=int, default=2600)
    ap.add_argument("--src-px", type=int, default=180)
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--workers", type=int, default=1)
    ap.add_argument("--batches", type=int, default=30)
    ap.add_argument("--model", default="resnet50")
    ap.add_argument("--sam", action="store_true", help="SAM double-backward (halves step rate; real reference feature)")
    ap.add_argument(
        "--device-resample",
        action="store_true",
        help="device-resample split: host DCT-scaled decode only, triangular/cubic resample on the MXU (ops/resample.py)",
    )
    ap.add_argument(
        "--packed",
        action="store_true",
        help="decode-free packed uint8 records (data/packed.py): host cost = one memcpy/img; the >=95%% utilization proof",
    )
    ap.add_argument(
        "--device-cache",
        action="store_true",
        help="HBM-resident dataset cache (data/device_cache.py): fill once, then zero steady-state host->device image traffic",
    )
    ap.add_argument(
        "--fused",
        action="store_true",
        help="with --device-cache: gather+augment+train step in ONE dispatch (DeviceCacheFeed.fused_step)",
    )
    ap.add_argument(
        "--canonical-step-rate",
        type=float,
        default=None,
        help="fresh-process compute-only img/s (bench.py); utilization uses max(self-measured, canonical) as denominator",
    )
    args = ap.parse_args()

    root = os.path.join(args.root, f"{args.src_px}px", "train")
    if not os.path.exists(root) or len(os.listdir(root)) == 0:
        print(f"generating {args.n_images} jpegs @ {args.src_px}px -> {root}", flush=True)
        make_corpus(root, args.n_images, args.src_px)
    packed_root = os.path.dirname(root)  # holds train_packed/ beside train/
    if args.packed:
        from sota_imagenet_tpu.data.packed import PackedLoader, create_packed_records, packed_dirs

        rec_dir = packed_dirs(packed_root, "train")[0]
        if not os.path.isdir(rec_dir) or len(os.listdir(rec_dir)) == 0:
            print(f"packing {args.n_images} imgs @ {args.size}px -> {rec_dir}", flush=True)
            create_packed_records(
                packed_root, image_size=args.size, train_shards=16, workers=args.workers, splits=("train",)
            )

    import jax
    import jax.numpy as jnp

    from sota_imagenet_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    from sota_imagenet_tpu.data.pipeline import DeviceFeed, FolderLoader
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models import resnet50
    from sota_imagenet_tpu.ops.augment import build_train_augment
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import create_mesh, replicate
    from sota_imagenet_tpu.train import steps as steps_lib

    from sota_imagenet_tpu.config import instantiate

    mesh = create_mesh()
    model = instantiate({"_target_": args.model, "dtype": jnp.bfloat16})
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)
    sam = {"kind": "asam_unitwise", "rho": 0.01} if args.sam else None
    inner_step = steps_lib.build_train_step(model, crit, tx, sched, sam=sam, input_dtype=jnp.bfloat16)
    step = jax.jit(inner_step, donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (args.bs, args.size, args.size, 3), rng, input_dtype=jnp.bfloat16)
    state = jax.device_put(state, replicate(mesh))

    if args.packed:
        from sota_imagenet_tpu.data.packed import PackedLoader

        host = PackedLoader(
            packed_root, is_train=True, batch_size=args.bs, image_size=args.size, workers=args.workers, drop_last=True
        )
    else:
        host = FolderLoader(
            root, is_train=True, batch_size=args.bs, image_size=args.size, workers=args.workers, drop_last=True,
            device_resample=args.device_resample,
        )
    aug = build_train_augment(
        num_classes=1000, re_prob=0.3, color_twist_prob=0.4, gray_prob=0.2,
        resample_to=args.size if args.device_resample else None,
    )
    if args.device_cache:
        from sota_imagenet_tpu.data.device_cache import DeviceCacheFeed

        # flip the tunnel into its honest synchronous mode BEFORE the fill
        # (pre-first-readback transfers are lazily staged and drain at
        # ~0.2 MB/s when forced — PERF.md round 4)
        jax.device_get(jnp.zeros(()))
        feed = DeviceCacheFeed(host, mesh, aug)
    else:
        feed = DeviceFeed(host, mesh, aug, prefetch=2)

    # Phase ordering on this host (PERF.md round 4, corrected physics):
    # before the process's first D2H readback, tunnel transfers are lazily
    # staged (block_until_ready returns early; forced transfers drain at
    # ~0.2 MB/s). One scalar readback flips the stream into its honest
    # synchronous mode (~35 MB/s sustained, the tunnel's true rate). So the
    # warmup DELIBERATELY ends with a scalar device_get, and the e2e window
    # then measures the real synchronous transport. The compute-only rate is
    # cross-checked against --canonical-step-rate (bench.py's fresh-process
    # measurement, the strictest denominator).

    if args.fused:
        if not args.device_cache:
            raise SystemExit("--fused requires --device-cache")
        fused = feed.fused_step(inner_step)
        key0, idx0 = next(feed.iter_stubs())

        def run_one(state, stub):
            return fused(state, stub[0], stub[1], feed.images, feed.labels, rng)

        def epoch_stubs():
            return feed.iter_stubs()
    else:

        def run_one(state, batch):
            return step(state, batch, rng)

        def epoch_stubs():
            return iter(feed)

    # ---- warmup: compile + a few executions, then flip to sync mode ----
    batch0 = (key0, idx0) if args.fused else next(iter(feed))
    for _ in range(3):
        state, metrics = run_one(state, batch0)
    jax.device_get(metrics["loss"])  # force everything; first D2H

    # ---- end-to-end: real read -> transfer -> augment -> step ----
    done = 0
    t0 = time.perf_counter()
    while done < args.batches:
        for item in epoch_stubs():
            state, metrics = run_one(state, item)
            done += 1
            if done >= args.batches:
                break
    jax.device_get(metrics["loss"])  # window sync
    e2e_rate = args.bs * args.batches / (time.perf_counter() - t0)

    # ---- compute-only rate: repeat the step on the cached device batch ----
    for _ in range(3):
        state, metrics = run_one(state, batch0)
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(30):
        state, metrics = run_one(state, batch0)
    jax.device_get(metrics["loss"])
    step_rate = args.bs * 30 / (time.perf_counter() - t0)

    denom = max(step_rate, args.canonical_step_rate or 0.0)
    util = min(e2e_rate / denom, 1.0)
    import json

    print(
        json.dumps(
            {
                "src_px": args.src_px,
                "workers": args.workers,
                "step_img_per_sec": round(step_rate, 1),
                "e2e_img_per_sec": round(e2e_rate, 1),
                "input_utilization": round(util, 4),
                "canonical_step_rate": args.canonical_step_rate,
                "cores_per_chip_needed_at_500px": round(denom / 471.0, 2),
                "model": args.model, "sam": args.sam, "device_resample": args.device_resample,
                "packed": args.packed, "device_cache": args.device_cache, "fused": args.fused,
            }
        )
    )


if __name__ == "__main__":
    main()

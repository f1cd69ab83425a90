"""A/B the r50 train step with run.remat off / 'convs' / 'full' on real TPU.

Hypothesis (round 3): the r50 step is HBM-bandwidth-bound (PERF.md fusion
attribution), and remat='convs' cuts the fwd->bwd residual set ~4x (measured
at the jax level, tests/test_remat.py) — fewer forward residual WRITES and
backward residual READS. If XLA was materializing post-BN/post-act tensors as
residuals, 'convs' should BEAT the unremat step despite recomputing the
elementwise tail; 'full' re-runs convs (MXU FLOPs 2x fwd) and is expected to
lose at this batch size but bounds the recompute cost.

Usage: python scripts/bench_remat.py [--bs 128] [--size 224] [--iters 20]
Prints one JSON line per policy.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores the env var (CLAUDE.md); force it
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--model", default="resnet50")
    args = ap.parse_args()

    from sota_imagenet_tpu import registry
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.schedule import make_lr_schedule
    from sota_imagenet_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()
    n_chips = jax.device_count()
    mesh = create_mesh()
    bs = args.bs * n_chips

    model = registry.resolve(args.model)(dtype=jnp.bfloat16)
    criterion = CrossEntropyLoss(smoothing=0.1)
    sched = make_lr_schedule([dict(ep=(0, 90), lr=(1.0, 0.0), mode="cos")], steps_per_epoch=100)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)

    rng = jax.random.PRNGKey(0)
    state0 = steps_lib.init_state(model, tx, (bs, args.size, args.size, 3), rng, input_dtype=jnp.bfloat16)
    state0 = jax.device_put(state0, replicate(mesh))
    sh = batch_sharding(mesh)
    images = jax.device_put(jax.random.normal(rng, (bs, args.size, args.size, 3), jnp.bfloat16), sh)
    labels = jax.device_put(jax.nn.one_hot(jnp.arange(bs) % 1000, 1000, dtype=jnp.float32), sh)
    batch = {"image": images, "label": labels}

    for remat in [False, "convs", "full"]:
        step = jax.jit(
            steps_lib.build_train_step(model, criterion, tx, sched, remat=remat, input_dtype=jnp.bfloat16),
            donate_argnums=(0,),
        )
        state = jax.tree_util.tree_map(jnp.copy, state0)
        for _ in range(3):
            state, metrics = step(state, batch, rng)
        jax.device_get(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, metrics = step(state, batch, rng)
        jax.device_get(metrics["loss"])
        dt = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "model": args.model,
                    "remat": str(remat),
                    "img_per_sec_per_chip": round(bs * args.iters / dt / n_chips, 1),
                    "ms_per_step": round(dt / args.iters * 1000, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

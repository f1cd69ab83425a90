#!/usr/bin/env python
"""Capture a jax.profiler trace of the ResNet-50 train step (TensorBoard
profile plugin format) — the profile-first workflow for perf rounds.

    python scripts/profile_step.py --logdir /tmp/trace --bs 128 --steps 5
    tensorboard --logdir /tmp/trace   # Profile tab
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/jax_trace")
    ap.add_argument("--bs", type=int, default=128)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--model", default="resnet50")
    args = ap.parse_args()

    from sota_imagenet_tpu.config import instantiate
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train import steps as steps_lib

    model = instantiate({"_target_": args.model, "dtype": jnp.bfloat16})
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)
    step = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.bfloat16), donate_argnums=(0,))
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (args.bs, args.size, args.size, 3), rng, input_dtype=jnp.bfloat16)
    batch = {
        "image": jax.random.normal(rng, (args.bs, args.size, args.size, 3), jnp.bfloat16),
        "label": jax.nn.one_hot(jnp.arange(args.bs) % 1000, 1000, dtype=jnp.float32),
    }
    for _ in range(3):  # warm up / compile outside the trace
        state, m = step(state, batch, rng)
    jax.device_get(m["loss"])

    with jax.profiler.trace(args.logdir):
        for _ in range(args.steps):
            state, m = step(state, batch, rng)
        jax.device_get(m["loss"])
    print(f"trace written to {args.logdir}")


if __name__ == "__main__":
    main()

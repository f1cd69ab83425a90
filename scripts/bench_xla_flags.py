"""XLA compile-option sweep over the headline train step (real chip).

ROADMAP round-2 leftover: "XLA fusion-flag exploration ... expected <10%".

Measured fact (round 2): client-side ``XLA_FLAGS`` CANNOT carry TPU backend
flags here — the local process's flag parser aborts on unknown flags while
compilation happens in a remote compile service. ``jax.jit(...,
compiler_options=...)`` IS accepted and travels with the compile request, so
the sweep uses that. A config whose throughput shifts proves the option
reached the remote compiler.

Usage: python scripts/bench_xla_flags.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

SWEEPS = {
    "baseline": {},
    "vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "latency_hiding_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": "false"},
    "no_multi_output_fusion": {"xla_tpu_enable_multi_output_fusion": "false"},
    "aggressive_vmem": {
        "xla_tpu_scoped_vmem_limit_kib": "98304",
        "xla_tpu_aggressive_opt_barrier_removal": "true",
    },
}


def main():
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models import resnet50
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.schedule import make_lr_schedule

    mesh = create_mesh()
    n_chips = jax.device_count()
    bs = 128 * n_chips
    size = 224
    model = resnet50(dtype=jnp.bfloat16)
    criterion = CrossEntropyLoss(smoothing=0.1)
    sched = make_lr_schedule([dict(ep=(0, 90), lr=(1.0, 0.0), mode="cos")], steps_per_epoch=100)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)
    step_fn = steps_lib.build_train_step(model, criterion, tx, sched, input_dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    state0 = steps_lib.init_state(model, tx, (bs, size, size, 3), rng, input_dtype=jnp.bfloat16)
    state0 = jax.device_put(state0, replicate(mesh))
    sh = batch_sharding(mesh)
    batch = {
        "image": jax.device_put(jax.random.normal(rng, (bs, size, size, 3), jnp.bfloat16), sh),
        "label": jax.device_put(jax.nn.one_hot(jnp.arange(bs) % 1000, 1000, dtype=jnp.float32), sh),
    }

    results = {}
    for name, opts in SWEEPS.items():
        try:
            step = jax.jit(step_fn, donate_argnums=(0,), compiler_options=opts or None)
            state = jax.tree_util.tree_map(jnp.copy, state0)
            for _ in range(3):
                state, metrics = step(state, batch, rng)
            jax.device_get(metrics["loss"])
            iters = 20
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, batch, rng)
            jax.device_get(metrics["loss"])
            dt = time.perf_counter() - t0
            results[name] = round(bs * iters / dt / n_chips, 1)
        except Exception as e:
            results[name] = f"error: {str(e)[:160]}"
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"sweep": results}))


if __name__ == "__main__":
    main()

"""Execute one real train step on the TPU for representative experiment
configs — one per model family.

The CPU suite runs a train step for every family on the virtual mesh
(tests/test_exp_configs.py); this sweep proves the same families COMPILE AND
EXECUTE on real TPU hardware (Mosaic/XLA-TPU lowering differs from the CPU
backend: alignment rules, select lowering, scatter support...).

Usage: python scripts/tpu_config_sweep.py [config-name ...]
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# one representative per family (file names under configs/exp/)
DEFAULT = [
    "1.r50_baseline.yaml",           # torchvision ResNet-50 + SGD
    "15.eca_nfnet_l0.yaml",          # NFNet + AdamW
    "21.nf_like_xcit.yaml",          # norm-free CModel + XCA attention
    "24.nf_conv-act.yaml",           # ConvActBlock family (ScaledStdConv)
    "72.non-deep.yaml",              # ParNet/NonDeepBlock (multi-branch graph)
    "62.vgg-cmodel.yaml",            # VGG CModel + CutmixMixup
    "32.nf_conv-act_sam.yaml",       # SAM double-grad
    "41.nf_conv-act_lamb.yaml",      # LAMB optimizer
    "78.non-deeps_ufo.yaml",         # UFO attention
    "10.bnet_adamw_zero-mean.yaml",  # BNet + zero-mean WS parametrization
]


def run_one(name: str, size: int = 64, bs: int = 16) -> dict:
    from sota_imagenet_tpu import config as C
    from sota_imagenet_tpu.config import instantiate, parse_stages
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.loop import Runner
    from sota_imagenet_tpu.train.schedule import phases_from_stages

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs", "exp", name)
    cfg = C.load(path, strict_env=False)
    model = instantiate(cfg.model)
    criterion = instantiate(cfg.criterion)
    callbacks = [instantiate(c) for c in (cfg.run.extra_callbacks or [])]
    stages = parse_stages(cfg.run.stages)
    runner = Runner(
        model,
        criterion,
        lambda sched: build_optimizer(dict(cfg.optim), sched),
        lr_phases=phases_from_stages(stages),
        callbacks=callbacks,
        ema_decay=cfg.run.ema_decay,
        input_dtype=jnp.bfloat16,
    )
    t0 = time.perf_counter()
    runner.init_state((bs, size, size, 3))
    runner._build_steps(steps_per_epoch=10, base_epoch=0)
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jax.random.normal(rng, (bs, size, size, 3), jnp.bfloat16),
        "label": jax.nn.one_hot(jnp.arange(bs) % cfg.loader.num_classes, cfg.loader.num_classes, dtype=jnp.float32),
    }
    state, metrics = runner._train_step(runner.state, batch, rng)
    loss = float(jax.device_get(metrics["loss"]))
    dt = time.perf_counter() - t0
    import math

    return {"config": name, "loss_finite": math.isfinite(loss), "loss": round(loss, 3), "compile_s": round(dt, 1)}


def main(names):
    ok = True
    for name in names or DEFAULT:
        try:
            res = run_one(name)
            ok = ok and res["loss_finite"]
        except Exception as e:
            res = {"config": name, "error": repr(e)[:200]}
            ok = False
        print(json.dumps(res), flush=True)
    print(json.dumps({"all_ok": ok}))


if __name__ == "__main__":
    main(sys.argv[1:])

"""Train-step throughput across model families (real chip).

Extends bench.py's headline ResNet-50 number with the other reference model
families (SURVEY.md §2.2: BResNet, eca_nfnet_l0, vgg16_bn + a CModel config),
so the perf story is framework-wide, not single-model. Each entry runs the
FULL jitted train step (fwd + loss + grad + SGD/AdamW update) on synthetic
device-resident data, like bench.py.

Usage: python scripts/bench_models.py [name ...]   (default: all)
Prints one JSON line per model; results are recorded in PERF.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import jax
import jax.numpy as jnp


def bench_one(name: str, model, optim_cfg: dict, bs: int, size: int, iters: int = 20) -> dict:
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.schedule import make_lr_schedule

    mesh = create_mesh()
    n_chips = jax.device_count()
    gbs = bs * n_chips
    criterion = CrossEntropyLoss(smoothing=0.1)
    sched = make_lr_schedule([dict(ep=(0, 90), lr=(1.0, 0.0), mode="cos")], steps_per_epoch=100)
    from sota_imagenet_tpu.optim import build_optimizer

    tx = build_optimizer(optim_cfg, sched)
    train_step = jax.jit(
        steps_lib.build_train_step(model, criterion, tx, sched, input_dtype=jnp.bfloat16),
        donate_argnums=(0,),
    )
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (gbs, size, size, 3), rng, input_dtype=jnp.bfloat16)
    state = jax.device_put(state, replicate(mesh))
    sh = batch_sharding(mesh)
    images = jax.device_put(jax.random.normal(rng, (gbs, size, size, 3), jnp.bfloat16), sh)
    labels = jax.device_put(jax.nn.one_hot(jnp.arange(gbs) % 1000, 1000, dtype=jnp.float32), sh)
    batch = {"image": images, "label": labels}

    for _ in range(3):
        state, metrics = train_step(state, batch, rng)
    jax.device_get(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(state, batch, rng)
    jax.device_get(metrics["loss"])
    dt = time.perf_counter() - t0
    rate = gbs * iters / dt / n_chips
    out = {"model": name, "img_per_sec_per_chip": round(rate, 1), "bs_per_chip": bs, "size": size}
    print(json.dumps(out), flush=True)
    return out


def bench_eval(name: str, model, bs: int, size: int, iters: int = 30) -> dict:
    """Forward-only (serving/eval) throughput at the reference val batch."""
    from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate

    mesh = create_mesh()
    n_chips = jax.device_count()
    gbs = bs * n_chips
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1)}, jnp.zeros((2, size, size, 3), jnp.bfloat16), train=False
    )
    variables = jax.device_put(variables, replicate(mesh))
    images = jax.device_put(jax.random.normal(rng, (gbs, size, size, 3), jnp.bfloat16), batch_sharding(mesh))

    @jax.jit
    def fwd(variables, images):
        return jnp.argmax(model.apply(variables, images, train=False), axis=-1)

    for _ in range(3):
        pred = fwd(variables, images)
    jax.device_get(pred[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        pred = fwd(variables, images)
    jax.device_get(pred[0])
    dt = time.perf_counter() - t0
    rate = gbs * iters / dt / n_chips
    out = {"model": name, "mode": "eval", "img_per_sec_per_chip": round(rate, 1), "bs_per_chip": bs, "size": size}
    print(json.dumps(out), flush=True)
    return out


def main(names):
    from sota_imagenet_tpu.models import resnet50  # noqa: F401  (import check)
    from sota_imagenet_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    def r50():
        from sota_imagenet_tpu.models import resnet50

        return resnet50(dtype=jnp.bfloat16), {"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, 128, 224

    def bresnet():
        from sota_imagenet_tpu.models import bresnet50

        return bresnet50(dtype=jnp.bfloat16), {"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, 128, 224

    def nfnet():
        from sota_imagenet_tpu.models.nfnet import eca_nfnet_l0

        return eca_nfnet_l0(dtype=jnp.bfloat16), {"_target_": "adamw", "weight_decay": 0.02}, 128, 224

    def vgg():
        from sota_imagenet_tpu.models import vgg16_bn

        return vgg16_bn(dtype=jnp.bfloat16), {"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, 64, 224

    def vgg_cmodel():
        """The reference's 37.7M CModel VGG (62.vgg-cmodel.yaml, 75.458% top-1
        in 41h17m) built from the ported config."""
        from sota_imagenet_tpu import config as C
        from sota_imagenet_tpu.config import instantiate

        cfg = C.load(os.path.join(ROOT, "configs", "exp", "62.vgg-cmodel.yaml"), strict_env=False)
        return instantiate(cfg.model), {"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-4}, 64, 224

    table = {
        "resnet50": r50,
        "bresnet50": bresnet,
        "eca_nfnet_l0": nfnet,
        "vgg16_bn": vgg,
        "vgg_cmodel": vgg_cmodel,
    }
    eval_mode = "--eval" in names
    names = [n for n in names if n != "--eval"]
    for name in names or list(table):
        model, optim_cfg, bs, size = table[name]()
        try:
            if eval_mode:
                bench_eval(name, model, 250, size)  # reference val batch 250
            else:
                bench_one(name, model, optim_cfg, bs, size)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"model": name, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])

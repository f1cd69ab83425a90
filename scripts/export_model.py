"""Export a trained checkpoint as a serving artifact (StableHLO + params).

Usage:
  python scripts/export_model.py -c configs/r50_baseline.yaml \
      --ckpt logs/.../model_last.ckpt --out /tmp/r50_serve \
      [--ema] [--batch 8 | --batch poly] [--image-size 224]

The artifact is loadable WITHOUT this repo's model code:
  from sota_imagenet_tpu.utils.export import load_exported
  serve, meta = load_exported(out_dir); logits = serve(images_u8_nhwc)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the axon TPU plugin ignores the env var (CLAUDE.md); force it
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ema", action="store_true", help="export the EMA weights")
    ap.add_argument("--batch", default="poly", help="fixed batch size or 'poly' (symbolic)")
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument(
        "--quantize",
        choices=["int8"],
        default=None,
        help="per-output-channel int8 weight quantization (~3-4x smaller artifact vs fp32; "
        "dequantized at load, logits typically within 1e-2 relative)",
    )
    args = ap.parse_args()

    from sota_imagenet_tpu import config as C
    from sota_imagenet_tpu.config import instantiate
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.checkpoint import load_checkpoint
    from sota_imagenet_tpu.utils.export import export_inference, resolve_final_image_size

    cfg = C.load(args.config, strict_env=False)
    model = instantiate(cfg.model)
    # the EFFECTIVE model: forward parametrizations are part of the trained
    # function (weights on disk are the RAW kernels), so the export must wrap
    # exactly like train.py/Runner do — otherwise WS/spectral checkpoints
    # would serve un-normalized kernels
    from sota_imagenet_tpu.models.parametrize import ParametrizedModel, weight_standardization_fn

    if cfg.weight_standardization:
        model = ParametrizedModel(model, weight_standardization_fn(cfg.init_gamma))
    for clb_cfg in cfg.run.extra_callbacks or []:
        clb = instantiate(clb_cfg)
        fn = (clb.step_options() if hasattr(clb, "step_options") else {}).get("parametrization")
        if fn is not None:
            model = ParametrizedModel(model, fn)
    # val size follows the FINAL stage's train size (DataManager convention,
    # reference dali_dataloader.py:227-228)
    size = args.image_size or resolve_final_image_size(cfg)
    input_dtype = jnp.bfloat16 if cfg.run.bf16 else jnp.float32

    tx = build_optimizer(dict(cfg.optim), 0.1)
    state = steps_lib.init_state(
        model, tx, (2, size, size, 3), jax.random.PRNGKey(0),
        ema_decay=cfg.run.ema_decay, input_dtype=input_dtype,
        criterion=instantiate(cfg.criterion),
    )
    state, epoch = load_checkpoint(args.ckpt, state)
    params = state.ema_params if (args.ema and state.ema_params is not None) else state.params
    bstats = state.ema_batch_stats if (args.ema and state.ema_batch_stats is not None) else state.batch_stats
    variables = {"params": params}
    if bstats:
        variables["batch_stats"] = bstats

    bs = None if args.batch == "poly" else int(args.batch)
    out = export_inference(
        model, variables, args.out, image_size=size, batch_size=bs, input_dtype=input_dtype, quantize=args.quantize
    )
    print(
        f"exported epoch-{epoch} weights -> {out} (batch={'symbolic' if bs is None else bs}, size={size}"
        + (f", quantize={args.quantize}" if args.quantize else "")
        + ")"
    )


if __name__ == "__main__":
    main()

"""Inference export: serialize the compiled forward for serving.

The reference has no serving story (training-only repo; eval.ipynb is a
stripped blob). TPU-natively, serving = a serialized StableHLO program
(jax.export) plus an orbax/numpy params bundle: the artifact is
runtime-portable (loadable from any JAX process targeting TPU/CPU without
the model-zoo code) and shape-checked at call time.

Artifact layout (``export_inference`` output dir):
    model.stablehlo   serialized jax.export.Exported — fn(variables, images)
    params.npz        flat {path: array} of the variables pytree
    meta.json         input spec, dtype, EMA flag, num_classes

The exported function takes PREPROCESSED images (NHWC uint8, already
resized/center-cropped like the val pipeline) and returns fp32 logits; it
bakes in the reference normalization (mean .5*255 / std .2*255,
dali_dataloader.py:27-29) so a server only needs decode+resize.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.constants import DATA_MEAN, DATA_STD


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    tree = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def make_serve_fn(model, input_dtype=jnp.bfloat16):
    """fn(variables, images_u8) -> fp32 logits, with val normalization baked in."""

    def serve(variables, images_u8):
        x = images_u8.astype(jnp.float32)
        x = (x - jnp.asarray(DATA_MEAN, jnp.float32)) / jnp.asarray(DATA_STD, jnp.float32)
        logits = model.apply(variables, x.astype(input_dtype), train=False)
        return logits.astype(jnp.float32)

    return serve


def export_inference(
    model,
    variables,
    out_dir: str,
    *,
    image_size: int,
    batch_size: Optional[int] = None,
    input_dtype=jnp.bfloat16,
    platforms: Tuple[str, ...] = ("tpu", "cpu"),
) -> str:
    """Serialize the jitted forward. batch_size=None exports with a SYMBOLIC
    batch dimension (one artifact serves any batch size)."""
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)
    serve = make_serve_fn(model, input_dtype)

    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
        img_spec = jax.ShapeDtypeStruct((b, image_size, image_size, 3), jnp.uint8)
    else:
        img_spec = jax.ShapeDtypeStruct((batch_size, image_size, image_size, 3), jnp.uint8)
    var_specs = jax.tree_util.tree_map(lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), variables)

    exported = jexport.export(jax.jit(serve), platforms=list(platforms))(var_specs, img_spec)
    blob = exported.serialize()
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(blob)
    np.savez(os.path.join(out_dir, "params.npz"), **_flatten(variables))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "image_size": image_size,
                "batch_size": batch_size,
                "input_dtype": str(jnp.dtype(input_dtype)),
                "platforms": list(platforms),
                "in_tree": "fn(variables, images_u8_nhwc) -> logits_f32",
            },
            f,
            indent=2,
        )
    return out_dir


def load_exported(out_dir: str):
    """Returns (callable(images_u8) -> logits, meta). No model code needed."""
    from jax import export as jexport

    with open(os.path.join(out_dir, "model.stablehlo"), "rb") as f:
        exported = jexport.deserialize(f.read())
    flat = dict(np.load(os.path.join(out_dir, "params.npz")))
    variables = _unflatten(flat)
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)

    def serve(images_u8):
        return exported.call(variables, images_u8)

    return serve, meta

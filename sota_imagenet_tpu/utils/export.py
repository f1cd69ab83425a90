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


def _save_tree(path: str, tree, quantize: Optional[str] = None) -> None:
    """npz with enumerated array keys + a JSON path table — robust to dict
    keys that themselves contain '/' (e.g. the spectral-norm state's
    'conv/kernel' entries), which a separator-joined flat format is not.

    quantize='int8': conv/dense kernels (float leaves named 'kernel', ndim≥2)
    are stored as symmetric per-output-channel int8 + an fp32 scale row
    (`a{i}` int8, `a{i}_s` scales); everything else (biases, norm affines,
    running stats) stays full precision. Kernels are ~99% of the bytes and
    store 4x smaller than fp32, so the artifact lands ~3-4x smaller than an
    fp32 export (test_export.py asserts <0.35x) — and unlike a bf16 cast the
    8-bit grid + per-channel scaling keeps ~2 extra mantissa bits of
    relative resolution within each channel. Dequantized at load
    (`_load_tree`), so the serialized StableHLO program is unchanged.

    Raises if quantize was requested but no leaf qualified (e.g. a params
    tree with no 'kernel' arrays) — a silent full-precision artifact stamped
    quantize='int8' in meta.json would be a contract violation."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    paths = [[str(getattr(k, "key", k)) for k in p] for p, _ in flat]
    arrays = {}
    qdtypes = {}
    vdtypes = {}
    for i, (p, v) in enumerate(flat):
        a = np.asarray(v)
        leaf = str(getattr(p[-1], "key", p[-1])) if p else ""
        # jnp.issubdtype (not np.): ml_dtypes floats like bfloat16 are NOT
        # np.floating subtypes, and a bf16 params tree must still quantize.
        if quantize == "int8" and leaf == "kernel" and a.ndim >= 2 and jnp.issubdtype(a.dtype, jnp.floating):
            axes = tuple(range(a.ndim - 1))  # flax kernels are (..., out)
            amax = np.max(np.abs(a.astype(np.float32)), axis=axes, keepdims=True)
            scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            arrays[f"a{i}"] = np.clip(np.rint(a.astype(np.float32) / scale), -127, 127).astype(np.int8)
            arrays[f"a{i}_s"] = scale
            qdtypes[str(i)] = str(a.dtype)
        elif a.dtype.kind == "V":
            # ml_dtypes customs (bfloat16, fp8s) npz-roundtrip as raw void,
            # which numpy/jnp can't consume — store bit-viewed through a uint
            # carrier and record the real dtype for the load-time view back.
            arrays[f"a{i}"] = a.view(np.dtype(f"u{a.dtype.itemsize}"))
            vdtypes[str(i)] = str(a.dtype)
        else:
            arrays[f"a{i}"] = a
    if quantize == "int8" and not qdtypes:
        raise ValueError("quantize='int8' requested but no float 'kernel' leaf (ndim>=2) was found to quantize")
    np.savez(path, __paths__=json.dumps(paths), __quant__=json.dumps(qdtypes), __views__=json.dumps(vdtypes), **arrays)


def _load_tree(path: str):
    z = np.load(path, allow_pickle=False)
    paths = json.loads(str(z["__paths__"]))
    qdtypes = json.loads(str(z["__quant__"])) if "__quant__" in z else {}
    vdtypes = json.loads(str(z["__views__"])) if "__views__" in z else {}
    tree: dict = {}
    for i, parts in enumerate(paths):
        node = tree
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        a = z[f"a{i}"]
        if str(i) in qdtypes:  # dequantize once at load; serving math is unchanged
            a = (a.astype(np.float32) * z[f"a{i}_s"]).astype(np.dtype(qdtypes[str(i)]))
        elif str(i) in vdtypes:  # bit-view back to the ml_dtypes custom
            a = a.view(np.dtype(vdtypes[str(i)]))
        node[parts[-1]] = jnp.asarray(a)
    return tree


def resolve_final_image_size(cfg) -> int:
    """The size the FINAL training stage runs (and therefore validates) at:
    loader.image_size overridden by each stage's extra_args in order
    (DataManager semantics; val follows train, dali_dataloader.py:228)."""
    size = cfg.loader.image_size
    for stage in cfg.run.stages or []:
        extra = dict(stage.get("extra_args") or {}) if hasattr(stage, "get") else dict(getattr(stage, "extra_args", None) or {})
        if "image_size" in extra:
            size = int(extra["image_size"])
    return int(size)


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
    quantize: Optional[str] = None,  # 'int8': per-channel weight quantization (see _save_tree)
) -> str:
    """Serialize the jitted forward. batch_size=None exports with a SYMBOLIC
    batch dimension (one artifact serves any batch size)."""
    from jax import export as jexport

    if quantize not in (None, "int8"):  # validate BEFORE tracing/writing anything
        raise ValueError(f"quantize must be None or 'int8', got {quantize!r}")
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
    _save_tree(os.path.join(out_dir, "params.npz"), variables, quantize=quantize)
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "image_size": image_size,
                "batch_size": batch_size,
                "input_dtype": str(jnp.dtype(input_dtype)),
                "quantize": quantize,
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
    variables = _load_tree(os.path.join(out_dir, "params.npz"))
    with open(os.path.join(out_dir, "meta.json")) as f:
        meta = json.load(f)

    def serve(images_u8):
        return exported.call(variables, images_u8)

    return serve, meta

"""Inference-export roundtrip: serialize -> deserialize -> same logits,
without the model code in the loop (serving story; no reference analog —
the reference is training-only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.utils.export import export_inference, load_exported, make_serve_fn

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def tiny():
    return CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
            {"module": "BatchNorm2d", "args": [8]},
            {"module": "ReLU"},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [8, 10]},
        ]
    )


def test_export_roundtrip_fixed_batch(tmp_path):
    model = tiny()
    x8 = jnp.zeros((4, 16, 16, 3), jnp.uint8)
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, jnp.zeros((4, 16, 16, 3)), train=False)
    out = export_inference(
        model, variables, str(tmp_path / "art"), image_size=16, batch_size=4,
        input_dtype=jnp.float32, platforms=("cpu",),
    )
    serve, meta = load_exported(out)
    imgs = np.random.default_rng(0).integers(0, 256, (4, 16, 16, 3), np.uint8)
    got = np.asarray(serve(jnp.asarray(imgs)))
    want = np.asarray(make_serve_fn(model, jnp.float32)(variables, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert meta["image_size"] == 16


def test_export_spectral_parametrized_roundtrip(tmp_path):
    """A spectral-norm-parametrized model exports and serves correctly: the
    u/v state's slash-containing keys ('conv/kernel') survive the params
    bundle, and the served logits equal the wrapped model's."""
    from sota_imagenet_tpu.models.parametrize import ParametrizedModel, SpectralNormParametrization

    wrapped = ParametrizedModel(tiny(), SpectralNormParametrization())
    x = jnp.zeros((2, 16, 16, 3))
    variables = wrapped.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
    out = export_inference(
        wrapped, variables, str(tmp_path / "art"), image_size=16, batch_size=2,
        input_dtype=jnp.float32, platforms=("cpu",),
    )
    serve, _ = load_exported(out)
    imgs = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 16, 16, 3), np.uint8))
    got = np.asarray(serve(imgs))
    want = np.asarray(make_serve_fn(wrapped, jnp.float32)(variables, imgs))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_resolve_final_image_size():
    """Export must bake the FINAL progressive-resize stage's size, not the
    first stage's."""
    from sota_imagenet_tpu import config as C
    from sota_imagenet_tpu.utils.export import resolve_final_image_size
    import os

    cfg = C.load(os.path.join(os.path.dirname(__file__), "..", "configs", "tpu_soak.yaml"), strict_env=False)
    assert cfg.loader.image_size == 160
    assert resolve_final_image_size(cfg) == 224


def test_export_symbolic_batch(tmp_path):
    """One artifact serves ANY batch size (symbolic batch dim)."""
    model = tiny()
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, jnp.zeros((2, 16, 16, 3)), train=False)
    out = export_inference(
        model, variables, str(tmp_path / "art"), image_size=16, batch_size=None,
        input_dtype=jnp.float32, platforms=("cpu",),
    )
    serve, _ = load_exported(out)
    for bs in (1, 3, 7):
        imgs = jnp.zeros((bs, 16, 16, 3), jnp.uint8)
        assert serve(imgs).shape == (bs, 10)


def test_export_int8_quantized_roundtrip(tmp_path):
    """--quantize int8: kernels stored per-out-channel int8+scale, everything
    else full precision. Artifact kernels shrink ~4x vs fp32; logits of a
    REAL model (resnet18) stay close to the fp32 serve (weight-only
    quantization error only) and rank the same classes."""
    from sota_imagenet_tpu.models.resnet import resnet18

    model = resnet18(num_classes=10)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, jnp.zeros((2, 32, 32, 3)), train=False)
    fp = export_inference(
        model, variables, str(tmp_path / "fp"), image_size=32, batch_size=4,
        input_dtype=jnp.float32, platforms=("cpu",),
    )
    q8 = export_inference(
        model, variables, str(tmp_path / "q8"), image_size=32, batch_size=4,
        input_dtype=jnp.float32, platforms=("cpu",), quantize="int8",
    )
    import os

    sz_fp = os.path.getsize(os.path.join(fp, "params.npz"))
    sz_q8 = os.path.getsize(os.path.join(q8, "params.npz"))
    assert sz_q8 < 0.35 * sz_fp, (sz_fp, sz_q8)  # kernels dominate -> ~4x

    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3), np.uint8))
    serve_fp, _ = load_exported(fp)
    serve_q8, meta = load_exported(q8)
    assert meta["quantize"] == "int8"
    lf, lq = np.asarray(serve_fp(imgs), np.float64), np.asarray(serve_q8(imgs), np.float64)
    # same top-1 on every sample, high logit cosine similarity
    assert (lf.argmax(-1) == lq.argmax(-1)).all()
    cos = (lf * lq).sum(-1) / (np.linalg.norm(lf, axis=-1) * np.linalg.norm(lq, axis=-1))
    assert cos.min() > 0.999, cos


def test_export_quantize_rejects_unknown(tmp_path):
    import pytest as _pytest

    model = tiny()
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, jnp.zeros((2, 16, 16, 3)), train=False)
    with _pytest.raises(ValueError, match="quantize"):
        export_inference(
            model, variables, str(tmp_path / "x"), image_size=16, batch_size=2,
            input_dtype=jnp.float32, platforms=("cpu",), quantize="int4",
        )


def test_export_quantize_rejects_before_writing(tmp_path):
    """Invalid quantize must fail BEFORE tracing/writing: a half-written
    artifact dir (model.stablehlo without params.npz) breaks load_exported
    with an unrelated FileNotFoundError."""
    import os
    import pytest as _pytest

    model = tiny()
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, jnp.zeros((2, 16, 16, 3)), train=False)
    out = tmp_path / "half"
    with _pytest.raises(ValueError, match="quantize"):
        export_inference(
            model, variables, str(out), image_size=16, batch_size=2,
            input_dtype=jnp.float32, platforms=("cpu",), quantize="int4",
        )
    assert not os.path.exists(out / "model.stablehlo")


def test_export_int8_quantizes_bf16_params(tmp_path):
    """bfloat16 kernels are ml_dtypes floats, NOT np.floating subtypes — the
    quantization gate must still catch them (regression: silent full-size
    artifact stamped quantize='int8')."""
    import os

    model = tiny()
    variables = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, jnp.zeros((2, 16, 16, 3)), train=False)
    bf = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, variables)
    out = export_inference(
        model, bf, str(tmp_path / "q8bf"), image_size=16, batch_size=2,
        input_dtype=jnp.bfloat16, platforms=("cpu",), quantize="int8",
    )
    z = np.load(os.path.join(out, "params.npz"), allow_pickle=False)
    import json as _json

    qd = _json.loads(str(z["__quant__"]))
    assert qd, "no kernel was quantized for a bf16 tree"
    assert all(v == "bfloat16" for v in qd.values()), qd
    serve, meta = load_exported(out)
    imgs = jnp.asarray(np.random.default_rng(0).integers(0, 256, (2, 16, 16, 3), np.uint8))
    logits = np.asarray(serve(imgs))
    assert np.isfinite(logits).all()


def test_export_int8_raises_when_nothing_qualifies():
    """quantize='int8' on a tree with no float kernels must raise, not write
    a full-precision artifact labeled int8."""
    import pytest as _pytest

    from sota_imagenet_tpu.utils.export import _save_tree

    with _pytest.raises(ValueError, match="no float 'kernel'"):
        _save_tree("/tmp/never_written.npz", {"params": {"bias": np.zeros(4, np.float32)}}, quantize="int8")

"""End-to-end tests for the dataset-prep CLI entry points.

`sota-records` (cli.records_main) is the packaged analog of the reference's
create_records.py / resize_imagenet.py mains (reference create_records.py:1,
resize_imagenet.py:1); the underlying library functions are tested in
test_records.py / test_packed.py / test_resize_tool.py — these tests cover
the ARGUMENT WIRING: subcommand dispatch, defaults, and output layout.
"""

import os

import numpy as np
import pytest
from PIL import Image

from sota_imagenet_tpu.cli import export_main, records_main


def _make_tree(root, n_per_class=3, size=(64, 48)):
    for cls in ["n01440764", "n01443537"]:
        os.makedirs(root / cls, exist_ok=True)
        for i in range(n_per_class):
            Image.new("RGB", size, (i * 40, 100, 50)).save(root / cls / f"{cls}_{i}.JPEG", "JPEG")


def test_records_cli_tfrecord(tmp_path):
    _make_tree(tmp_path / "train")
    _make_tree(tmp_path / "val", n_per_class=2)
    records_main(["tfrecord", str(tmp_path), "--workers", "1"])
    from sota_imagenet_tpu.data import records as R

    # default shard counts are capped by the sample count; dirs + idx exist
    assert os.listdir(tmp_path / "train_records")
    assert os.listdir(tmp_path / "train_indexes")
    loader = R.TFRecordLoader(str(tmp_path), is_train=True, batch_size=2, image_size=32, workers=1)
    imgs, labels = next(iter(loader))
    assert imgs.shape == (2, 32, 32, 3)
    assert set(np.unique(labels)).issubset({0, 1})


def test_records_cli_packed(tmp_path):
    _make_tree(tmp_path / "train")
    _make_tree(tmp_path / "val", n_per_class=2)
    out = tmp_path / "packed"
    records_main(
        ["packed", str(tmp_path), "--out", str(out), "--size", "32", "--workers", "1",
         "--crops-per-image", "2"]
    )
    from sota_imagenet_tpu.data.packed import PackedLoader

    loader = PackedLoader(str(out), is_train=True, batch_size=4, image_size=32, workers=1)
    imgs, labels = next(iter(loader))
    assert imgs.shape == (4, 32, 32, 3) and imgs.dtype == np.uint8
    # k=2 crops per image -> train rows doubled
    assert len(loader) * 4 >= 6


def test_records_cli_resize(tmp_path):
    _make_tree(tmp_path / "raw" / "train", size=(128, 96))
    _make_tree(tmp_path / "raw" / "val", n_per_class=1, size=(96, 128))
    records_main(["resize", str(tmp_path / "raw"), "--size", "64", "--workers", "1"])
    out_root = tmp_path / "raw_64"
    resized = list(out_root.rglob("*.JPEG"))
    assert len(resized) == 8
    for p in resized:
        assert max(Image.open(p).size) <= 64


@pytest.mark.slow
def test_export_cli_end_to_end(tmp_path):
    # `sota-export` wiring: config -> model build -> checkpoint load ->
    # artifact -> served logits match a direct apply of the checkpointed
    # weights (the library roundtrip itself is tests/test_export.py)
    import jax
    import jax.numpy as jnp

    from sota_imagenet_tpu import config as C
    from sota_imagenet_tpu.config import instantiate
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.train import steps as steps_lib
    from sota_imagenet_tpu.train.checkpoint import save_checkpoint
    from sota_imagenet_tpu.utils.export import load_exported

    cfg = C.load(
        os.path.join(os.path.dirname(__file__), "..", "configs", "tiny_synthetic.yaml"),
        strict_env=False,
    )
    model = instantiate(cfg.model)
    tx = build_optimizer(dict(cfg.optim), 0.1)
    state = steps_lib.init_state(
        model, tx, (2, 32, 32, 3), jax.random.PRNGKey(3),
        input_dtype=jnp.bfloat16, criterion=instantiate(cfg.criterion),
    )
    ckpt = save_checkpoint(str(tmp_path), state, epoch=1, block=True)

    out = tmp_path / "artifact"
    export_main([
        "-c", os.path.join(os.path.dirname(__file__), "..", "configs", "tiny_synthetic.yaml"),
        "--ckpt", ckpt, "--out", str(out), "--batch", "4", "--image-size", "32",
    ])
    serve, meta = load_exported(str(out))
    imgs = np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3), np.uint8)
    logits = np.asarray(serve(imgs))
    assert logits.shape == (4, 1000)

    # reference logits: same normalize-and-apply the exporter bakes in
    from sota_imagenet_tpu.utils.export import make_serve_fn

    direct = make_serve_fn(model, input_dtype=jnp.bfloat16)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    np.testing.assert_allclose(
        logits, np.asarray(direct(variables, jnp.asarray(imgs))), rtol=2e-2, atol=2e-2
    )


def test_legacy_create_records_module_shim(tmp_path):
    # the `python -m sota_imagenet_tpu.data.create_records_cli` spelling the
    # docs quote (README.md) must keep working alongside `sota-records`
    from sota_imagenet_tpu.data.create_records_cli import main as shim_main

    _make_tree(tmp_path / "train")
    _make_tree(tmp_path / "val", n_per_class=2)
    shim_main([str(tmp_path), "--train_shards", "2", "--val_shards", "1", "--workers", "1"])
    assert len(os.listdir(tmp_path / "train_records")) == 2
    assert len(os.listdir(tmp_path / "val_records")) == 1

"""Spatial partitioning (SP): image-H sharding over the mesh 'spatial' axis.

The CNN analog of sequence parallelism — one sample's activations are split
across devices and XLA GSPMD inserts the conv halo exchanges. No reference
analog (DDP cannot split a sample across GPUs, SURVEY.md §2.4); the
correctness bar is the same as for data parallelism: sharded results must
EQUAL the single-device results (parallel/mesh.image_sharding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    image_sharding,
    replicate,
    validate_spatial_extent,
)
from sota_imagenet_tpu.train import steps as steps_lib

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def _model():
    # conv stride-2 + BN + pool: exercises halo exchange, strided partitioning
    # and cross-device BN reductions under the spatial split
    return CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
            {"module": "BatchNorm2d", "args": [8]},
            {"module": "ReLU"},
            {"module": "MaxPool2d", "args": [2, 2]},
            {"module": "conv3x3", "args": [8, 8]},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [8, 10]},
        ]
    )


def _setup(bs=16, size=32):
    model = _model()
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-4}, sched)
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (2, size, size, 3), rng, input_dtype=jnp.float32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (bs, size, size, 3))
    labels = jax.nn.one_hot(jnp.arange(bs) % 10, 10)
    return model, crit, tx, sched, state, {"image": imgs, "label": labels}, rng


@pytest.fixture(params=[(2, 4), (4, 2)], ids=["dp2xsp4", "dp4xsp2"])
def sp_mesh(request):
    data, spatial = request.param
    return create_mesh(data=data, spatial=spatial)


def test_mesh_axes_and_validation():
    m = create_mesh(data=2, spatial=4)
    assert m.axis_names == ("data", "spatial", "model")
    assert m.shape["data"] == 2 and m.shape["spatial"] == 4
    assert image_sharding(m) is not None
    assert image_sharding(create_mesh()) is None  # pure DP: fast path
    with pytest.raises(ValueError):
        create_mesh(data=3, spatial=3)


def test_spatial_extent_guard():
    """XLA SPMD miscompiles conv wgrad when the deepest feature map's spatial
    shards fall below the 3x3 halo — isolated in round 3 on the 8-dev CPU
    mesh: full r50 fwd EXACT but layer-4 weight grads scaled by exactly the
    data-axis size (x4 on dp4 x sp2 @64px, x2 on dp2 x sp4); at >= 2 rows/
    shard (128px, sp2) grads match to 2e-13. The guard enforces the safe
    regime (parallel/mesh.validate_spatial_extent; train.py applies it to the
    base size and every progressive-resize stage)."""
    m = create_mesh(data=2, spatial=4)
    validate_spatial_extent(m, 512)  # 512/32/4 = 4 rows/shard: fine
    with pytest.raises(ValueError, match="miscompiles"):
        validate_spatial_extent(m, 224)  # 224/32/4 < 2 rows/shard
    validate_spatial_extent(create_mesh(), 32)  # pure DP: never restricted


def test_spatial_train_step_matches_single_device(sp_mesh):
    """Updates/BN stats must be identical whether H lives on one device or is
    split over the spatial axis — halo exchange and partitioned reductions
    must not change the math."""
    model, crit, tx, sched, state, batch, rng = _setup()
    step_ref = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32))
    step_sp = jax.jit(
        steps_lib.build_train_step(
            model, crit, tx, sched, input_dtype=jnp.float32, image_sharding=image_sharding(sp_mesh)
        )
    )

    s_single, m_single = step_ref(state, batch, rng)

    sh, rep = batch_sharding(sp_mesh), replicate(sp_mesh)
    s_shard, m_shard = step_sp(
        jax.device_put(state, rep), {k: jax.device_put(v, sh) for k, v in batch.items()}, rng
    )

    np.testing.assert_allclose(float(m_single["loss"]), float(m_shard["loss"]), rtol=1e-6)
    for name, a_tree, b_tree in (
        ("params", s_single.params, s_shard.params),
        ("batch_stats", s_single.batch_stats, s_shard.batch_stats),
    ):
        for a, b in zip(jax.tree_util.tree_leaves(a_tree), jax.tree_util.tree_leaves(b_tree)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6, err_msg=name)


def test_spatial_eval_exact(sp_mesh):
    model, crit, tx, sched, state, batch, rng = _setup(bs=24)
    ev_ref = jax.jit(steps_lib.build_eval_step(model, crit, input_dtype=jnp.float32))
    ev_sp = jax.jit(
        steps_lib.build_eval_step(model, crit, input_dtype=jnp.float32, image_sharding=image_sharding(sp_mesh))
    )
    m1 = ev_ref(state, batch)
    sh, rep = batch_sharding(sp_mesh), replicate(sp_mesh)
    m8 = ev_sp(jax.device_put(state, rep), {k: jax.device_put(v, sh) for k, v in batch.items()})
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=1e-6, err_msg=k)


def test_spatial_resnet_forward():
    """A real zoo model (BN + maxpool + strided stages + global pool) forward
    under dp2 x sp4 equals the unsharded forward.

    NOTE: 64px/sp4 is BELOW the validate_spatial_extent floor — deliberately:
    the XLA wgrad miscompilation (see test_spatial_extent_guard) leaves the
    FORWARD exact even in the unsafe regime, and this test pins that down."""
    from sota_imagenet_tpu.models import resnet18

    mesh = create_mesh(data=2, spatial=4)
    model = resnet18(dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ref = fwd(v, x)
    img_sh = image_sharding(mesh)
    fwd_sp = jax.jit(lambda v, x: model.apply(v, jax.lax.with_sharding_constraint(x, img_sh), train=False))
    out = fwd_sp(jax.device_put(v, replicate(mesh)), jax.device_put(x, batch_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)

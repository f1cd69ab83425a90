"""Multi-device correctness: sharded results must equal single-device results
(the reference could only validate this by convention — val batch
divisibility, arg_parser.py:59-61; we can check exactly on the virtual mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.parallel.mesh import batch_sharding, create_mesh, replicate
from sota_imagenet_tpu.train import steps as steps_lib


def _model():
    return CModel(
        layer_config=[
            {"module": "conv3x3", "args": [3, 8], "kwargs": {"stride": 2}},
            {"module": "BatchNorm2d", "args": [8]},
            {"module": "ReLU"},
            {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
            {"module": "Linear", "args": [8, 10]},
        ]
    )


def _setup(bs=32):
    model = _model()
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-4}, sched)
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (2, 16, 16, 3), rng, input_dtype=jnp.float32)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (bs, 16, 16, 3))
    labels = jax.nn.one_hot(jnp.arange(bs) % 10, 10)
    return model, crit, tx, sched, state, {"image": imgs, "label": labels}, rng


def test_sharded_train_step_matches_single_device(mesh8):
    """Gradients/updates/BN stats must be IDENTICAL whether the global batch
    lives on 1 device or is sharded over 8 (global-view semantics — this is
    what makes BN cross-replica and eval exact)."""
    model, crit, tx, sched, state, batch, rng = _setup()
    step = jax.jit(steps_lib.build_train_step(model, crit, tx, sched, input_dtype=jnp.float32))

    s_single, m_single = step(state, batch, rng)

    sh = batch_sharding(mesh8)
    rep = replicate(mesh8)
    state_r = jax.device_put(state, rep)
    batch_s = {k: jax.device_put(v, sh) for k, v in batch.items()}
    s_shard, m_shard = step(state_r, batch_s, rng)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_shard["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_single.params), jax.tree_util.tree_leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(s_single.batch_stats), jax.tree_util.tree_leaves(s_shard.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_sharded_eval_exact(mesh8):
    model, crit, tx, sched, state, batch, rng = _setup(bs=40)
    ev = jax.jit(steps_lib.build_eval_step(model, crit, input_dtype=jnp.float32))
    m1 = ev(state, batch)
    sh, rep = batch_sharding(mesh8), replicate(mesh8)
    m8 = ev(jax.device_put(state, rep), {k: jax.device_put(v, sh) for k, v in batch.items()})
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=1e-6, err_msg=k)

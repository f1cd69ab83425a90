"""Head tensor parallelism (class-partitioned / vocab-parallel logits).

`mesh.model > 1` + `parallel/mesh.apply_head_tp`: the classifier kernel/bias
(and their optimizer moments / EMA copies) are sharded over the 'model' axis
along the class dim; under global-view jit each device computes its logit
shard and the CE softmax reductions lower to psums over 'model'. Matters for
metric-learning heads (losses/angular.py) with huge class counts; the
reference (pure DDP, SURVEY.md §2.4) replicates the head.
"""

import jax
import jax.numpy as jnp
import numpy as np

from sota_imagenet_tpu.losses import CrossEntropyLoss
from sota_imagenet_tpu.models import resnet18
from sota_imagenet_tpu.optim import build_optimizer
from sota_imagenet_tpu.parallel.mesh import (
    apply_head_tp,
    batch_sharding,
    create_mesh,
    tp_sharding,
)
from sota_imagenet_tpu.train import steps as steps_lib
import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


def test_tp_composes_with_zero1():
    """apply_head_tp after apply_zero1 must keep ZeRO-1's data-axis opt-state
    shards (only pattern-matched leaves are re-placed) while class-sharding
    the head's params AND its optimizer moments."""
    import jax.numpy as jnp

    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import apply_zero1, replicate
    from sota_imagenet_tpu.train import steps as steps_lib

    mesh = create_mesh(data=2, model=4)
    model = resnet18(dtype=jnp.float32)
    tx = build_optimizer(
        {"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-4}, lambda s: jnp.asarray(0.1)
    )
    state = steps_lib.init_state(model, tx, (2, 32, 32, 3), jax.random.PRNGKey(0), input_dtype=jnp.float32)
    state = apply_head_tp(apply_zero1(jax.device_put(state, replicate(mesh)), mesh), mesh)
    mom = next((s.trace for s in state.opt_state if hasattr(s, "trace")), None)
    assert mom is not None
    # a non-head momentum leaf keeps its ZeRO-1 'data' shard
    conv_mom = mom["stem_conv"]["Conv_0"]["kernel"]
    assert "data" in str(conv_mom.sharding.spec)
    # the head's param and momentum are class-sharded over 'model'
    assert state.params["fc"]["kernel"].sharding.shard_shape((512, 1000)) == (512, 250)
    assert mom["fc"]["kernel"].sharding.shard_shape((512, 1000)) == (512, 250)


def test_tp_spec_rules():
    mesh = create_mesh(data=2, model=4)
    tree = {
        "fc": {"kernel": jnp.zeros((16, 1000)), "bias": jnp.zeros((1000,))},
        "conv": {"kernel": jnp.zeros((3, 3, 8, 1000))},  # no pattern match
        "head": {"kernel": jnp.zeros((16, 10))},  # 10 % 4 != 0 -> replicated
        # patterns match path COMPONENTS (underscore tokens, optional numeric
        # suffix) — NOT substrings: 'fconv3' must not class-shard for 'fc'
        "fconv3": {"kernel": jnp.zeros((1, 1, 8, 1000))},
        "head_fc1": {"kernel": jnp.zeros((16, 1000))},
    }
    specs = tp_sharding(mesh, tree)
    assert specs["fc"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")
    assert specs["fc"]["bias"].spec == jax.sharding.PartitionSpec("model")
    assert specs["conv"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert specs["head"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert specs["fconv3"]["kernel"].spec == jax.sharding.PartitionSpec()
    assert specs["head_fc1"]["kernel"].spec == jax.sharding.PartitionSpec(None, "model")


def test_tp_train_step_matches_single_device():
    """One full train step (fwd + CE + bwd + momentum SGD + EMA) with the fc
    head class-sharded over model=4 must equal the single-device step."""
    mesh = create_mesh(data=2, model=4)
    model = resnet18(dtype=jnp.float32)
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)
    tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 1e-4}, sched)
    rng = jax.random.PRNGKey(0)
    state = steps_lib.init_state(model, tx, (2, 32, 32, 3), rng, ema_decay=0.9, input_dtype=jnp.float32)
    bs = 8
    batch = {
        "image": jax.random.normal(jax.random.PRNGKey(1), (bs, 32, 32, 3)),
        "label": jax.nn.one_hot(jnp.arange(bs) % 1000, 1000),
    }
    step = jax.jit(
        steps_lib.build_train_step(model, crit, tx, sched, ema_decay=0.9, input_dtype=jnp.float32)
    )

    s_single, m_single = step(state, batch, rng)

    state_tp = apply_head_tp(state, mesh)
    # the head kernel really is distributed (1/4 of the classes per device)
    fc_shards = state_tp.params["fc"]["kernel"].sharding.shard_shape((512, 1000))
    assert fc_shards == (512, 250)
    sh = batch_sharding(mesh)
    s_tp, m_tp = step(state_tp, {k: jax.device_put(v, sh) for k, v in batch.items()}, rng)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_tp["loss"]), rtol=1e-6)
    for name, a_tree, b_tree in (
        ("params", s_single.params, s_tp.params),
        ("ema_params", s_single.ema_params, s_tp.ema_params),
        ("batch_stats", s_single.batch_stats, s_tp.batch_stats),
    ):
        for a, b in zip(jax.tree_util.tree_leaves(a_tree), jax.tree_util.tree_leaves(b_tree)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name)

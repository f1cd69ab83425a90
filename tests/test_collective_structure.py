"""Collective-structure guards for every parallelism mode (round-3 VERDICT
next-step #4; anchor: DDP's bucketed all-reduce contract, reference
train.py:114).

tests/test_zero1.py / test_spatial.py / test_tp.py prove each mode's
SEMANTICS (sharded == single-device); nothing guarded the compiled
program's *communication structure* — a regression could silently turn
ZeRO-1 into "all-gather everything every step" or spatial partitioning
into a resharding storm while staying numerically correct. These tests
compile the full train step over an 8-device mesh per mode and assert
counts / tight upper bounds on every collective family in the optimized
HLO. Bounds are ~1.3x the values measured on jax 0.8 XLA:CPU SPMD
(recorded next to each assert) — loose enough for compiler drift, tight
enough that a structural regression (typically 2x+ more ops or
param-sized gathers) trips.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

from sota_imagenet_tpu.utils.hlo import (
    collective_counts as _counts,
    collective_lines as _op_lines,
    result_elems as _result_elems,
    result_elems_each as _result_elems_each,
)


@pytest.fixture(scope="module")
def compiled_modes():
    """Compile the full train step (truncated Bottleneck ResNet — same
    partitioned constructs as r50: BN, stride-2 convs, dense head) in the
    four parallelism modes and return {mode: optimized HLO text}."""
    from sota_imagenet_tpu.losses import CrossEntropyLoss
    from sota_imagenet_tpu.models.resnet import Bottleneck, ResNet
    from sota_imagenet_tpu.optim import build_optimizer
    from sota_imagenet_tpu.parallel.mesh import (
        apply_head_tp,
        apply_zero1,
        batch_sharding,
        create_mesh,
        image_sharding,
        replicate,
        validate_spatial_extent,
    )
    from sota_imagenet_tpu.train import steps as steps_lib

    model = ResNet(block=Bottleneck, layers=(1, 1), num_classes=16, dtype=jnp.float32)
    crit = CrossEntropyLoss(smoothing=0.1)
    sched = lambda s: jnp.asarray(0.1, jnp.float32)

    out = {}
    modes = {
        "dp": dict(mesh=create_mesh(data=8, spatial=1, model=1)),
        "dp_sp": dict(mesh=create_mesh(data=4, spatial=2, model=1)),
        "dp_tp": dict(mesh=create_mesh(data=4, spatial=1, model=2), tp=True),
        "zero1": dict(mesh=create_mesh(data=8, spatial=1, model=1), zero1=True),
    }
    for name, m in modes.items():
        mesh = m["mesh"]
        if mesh.shape["spatial"] > 1:
            validate_spatial_extent(mesh, 32, max_stride=8)
        tx = build_optimizer({"_target_": "sgd", "momentum": 0.9, "weight_decay": 3e-5}, sched)
        state = steps_lib.init_state(model, tx, (16, 32, 32, 3), jax.random.PRNGKey(0), input_dtype=jnp.float32)
        step = jax.jit(
            steps_lib.build_train_step(
                model, crit, tx, sched, input_dtype=jnp.float32, image_sharding=image_sharding(mesh)
            )
        )
        sh = batch_sharding(mesh)
        batch = {
            "image": jax.device_put(jnp.zeros((16, 32, 32, 3), jnp.float32), sh),
            "label": jax.device_put(jax.nn.one_hot(jnp.arange(16) % 16, 16), sh),
        }
        state = jax.device_put(state, replicate(mesh))
        if m.get("zero1"):
            state = apply_zero1(state, mesh)
        if m.get("tp"):
            state = apply_head_tp(state, mesh)
        with mesh:
            out[name] = step.lower(state, batch, jax.random.PRNGKey(1)).compile().as_text()
    out["_params"] = state.params  # same model every mode
    return out


def test_no_exotic_collectives_any_mode(compiled_modes):
    """No mode may introduce reduce-scatter or all-to-all: the designed
    programs use all-reduce (grads/BN stats), collective-permute (sp halo)
    and all-gather (zero1/tp reassembly) only."""
    for name in ("dp", "dp_sp", "dp_tp", "zero1"):
        c = _counts(compiled_modes[name])
        assert c["reduce-scatter"] == 0, (name, c)
        assert c["all-to-all"] == 0, (name, c)


def test_dp_structure(compiled_modes):
    c = _counts(compiled_modes["dp"])
    # measured 91: per-BN fwd+bwd stats reductions + per-leaf grad reductions
    # (XLA:CPU doesn't bucket) + loss/metric reductions
    assert 1 <= c["all-reduce"] <= 120, c
    # pure DP must not permute or gather anything param-sized
    assert c["collective-permute"] == 0, c
    assert c["all-gather"] <= 4, c  # measured 2, tiny mixup/metric reshapes
    for l in _op_lines(compiled_modes["dp"], "all-gather"):
        assert _result_elems(l) <= 2048, l[:160]


def test_dp_sp_structure(compiled_modes):
    """Spatial partitioning adds conv halo exchanges (collective-permute)
    and per-shard stats reductions — and nothing else."""
    c = _counts(compiled_modes["dp_sp"])
    assert c["collective-permute"] >= 2, c  # halo exchange exists (measured 50)
    assert c["collective-permute"] <= 80, c  # ...and is bounded: ~2/conv, not a resharding storm
    assert c["all-reduce"] <= 230, c  # measured 185
    assert c["all-gather"] <= 4, c  # same tiny set as dp — sp must not gather activations


def test_dp_tp_structure(compiled_modes):
    """Class-partitioned head: logits stay sharded over 'model' (softmax/CE
    reduce via psum); neither the head kernel nor the full logits may be
    all-gathered."""
    params = compiled_modes["_params"]
    head_elems = int(
        max(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    )  # fc kernel is the largest leaf (2048*16)
    c = _counts(compiled_modes["dp_tp"])
    assert c["all-reduce"] <= 150, c  # measured 113 (adds softmax psums over 'model')
    assert c["all-gather"] <= 16, c  # measured 11
    assert c["collective-permute"] == 0, c
    for l in _op_lines(compiled_modes["dp_tp"], "all-gather"):
        # per-tensor: a combined gather may bundle several small tensors
        for n in _result_elems_each(l):
            assert n < head_elems, f"head-sized all-gather defeats TP: {l[:160]}"


def test_zero1_structure(compiled_modes):
    """ZeRO-1 sharded optimizer state: the ONLY acceptable gathers are
    update/BN-vector reassembly. Guard (a) op count stays O(param leaves),
    (b) no single gather exceeds the largest param leaf (no gathering of
    stacked/concatenated state), (c) total gathered volume stays below
    1.5x the param count — a 'gather params every step too' regression
    would at least double it."""
    params = compiled_modes["_params"]
    leaves = jax.tree_util.tree_leaves(params)
    param_elems = int(sum(np.prod(l.shape) for l in leaves))
    largest_leaf = int(max(np.prod(l.shape) for l in leaves))
    lines = _op_lines(compiled_modes["zero1"], "all-gather")
    c = _counts(compiled_modes["zero1"])
    assert c["all-reduce"] <= 160, c  # measured 122
    assert c["collective-permute"] == 0, c
    assert len(lines) <= 3 * len(leaves), (len(lines), len(leaves))  # measured 94 vs 62 leaves
    total = 0
    for l in lines:
        # per-tensor so that XLA's combined (tuple-result) all-gathers are
        # judged on their member tensors, while the volume guard still sums
        # everything (these previously counted as ZERO — ADVICE r4)
        for n in _result_elems_each(l):
            assert n <= largest_leaf, f"gather larger than any param leaf: {l[:160]}"
            total += n
    assert total <= 1.5 * param_elems, (total, param_elems)

"""BNet family (models/bnet.py) — the legacy `arch:` vocabulary.

The builder is reconstructed per evident intent from the legacy configs
(configs/_old_configs); the strongest available oracle is the param count a
config comment records: exp64.BNet_small.yaml states "7.15M params" for its
exact model_params at 1000 classes — asserted here within 1%.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sota_imagenet_tpu.models import bnet as B

EXP64 = dict(
    stage_fns=["simpl"] * 4,
    block_fns=["Pre_XX", "Pre_XX", "Pre_Custom_2", "Pre_Custom_2"],
    stage_args=[
        {"dim_reduction": "stride & expand", "bottle_ratio": 1, "force_residual": True},
        {"dim_reduction": "stride & expand", "bottle_ratio": 1, "force_residual": True},
        {"bottle_ratio": 1, "dw_str2_kernel_size": 9},
        {"bottle_ratio": 1, "dw_str2_kernel_size": 9},
    ],
    stem_width=32,
    head_width=2560,
    norm_act="leaky_relu",
    stem_type="s2d",
    layers=[2, 4, 8, 2],
    channels=[64, 128, 256, 512],
    head_type="default",
)


def _build(kw, size=32, num_classes=10, train=False):
    m = B.bnet(num_classes=num_classes, **kw)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, size, size, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, train=train)
    out, _ = m.apply(v, x, train=train, mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(1)})
    return m, v, out


def test_exp64_param_count_matches_config_comment():
    m = B.bnet(num_classes=1000, **EXP64)
    v = jax.eval_shape(lambda k: m.init(k, jnp.zeros((1, 224, 224, 3)), train=False), jax.random.PRNGKey(0))
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(v["params"]))
    # exp64.BNet_small.yaml: "7.15M params. 5350 imgs/sec forward"
    assert abs(n - 7.15e6) / 7.15e6 < 0.01, f"{n / 1e6:.2f}M != 7.15M"


def test_forward_shapes_and_finite():
    _, _, out = _build(EXP64)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_filter_steps_ramps_widths():
    kw = dict(EXP64)
    kw["stage_args"] = [dict(a) for a in EXP64["stage_args"]]
    kw["stage_args"][2]["filter_steps"] = 32
    _, v, _ = _build(kw)
    # stage2: in 128, steps 32, 8 blocks, target 256 -> outputs 160,192,224,256,256...
    # Pre_Custom_2 plan: conv1 (k1) emits the block's OUT width
    p = v["params"]
    widths = [p[f"stage2_block{i}"]["conv1"]["Conv_0"]["kernel"].shape[-1] for i in range(8)]
    assert widths == [160, 192, 224, 256, 256, 256, 256, 256], widths


def test_residual_policy_stride2_has_no_residual():
    """exp31: 'no residual in stride=2 blocks' — a strided block's output must
    not contain its (spatially reduced) input; structurally, stride-2 XX
    blocks reduce H/W by 2 and partial_residual would throw on mismatched
    spatial dims, so a successful forward at every stage IS the check."""
    _, _, out = _build(dict(layers=[2, 2], channels=[32, 64], block_fns=["XX", "XX"],
                            stage_args=[{"force_residual": True}, {"force_residual": True}],
                            stem_type="s2d", stem_width=16, head_type="pool_fc", head_width=0))
    assert np.isfinite(np.asarray(out)).all()


def test_dim_reduction_expand_then_stride():
    kw = dict(layers=[1, 2], channels=[32, 64], block_fns=["XX", "XX"],
              stage_args=[{}, {"dim_reduction": "expand -> stride"}],
              stem_type="s2d", stem_width=16, head_type="pool_fc", head_width=0)
    m, v, _ = _build(kw, size=64)
    # stage1 block0 expands at stride 1 (64x16->16 spatial kept), block1 strides
    x = jnp.zeros((1, 64, 64, 3))
    _, inter = m.apply(v, x, train=False, capture_intermediates=True, mutable=["intermediates"])
    acts = inter["intermediates"]
    b0 = acts["stage1_block0"]["__call__"][0]
    b1 = acts["stage1_block1"]["__call__"][0]
    assert b0.shape[1:3] == (16, 16) and b0.shape[-1] == 64  # expanded, full res
    assert b1.shape[1:3] == (8, 8)  # strided


def test_dim_reduction_s2d():
    kw = dict(layers=[1, 1], channels=[32, 64], block_fns=["XX", "XX"],
              stage_args=[{}, {"dim_reduction": "s2d"}],
              stem_type="s2d", stem_width=16, head_type="pool_fc", head_width=0)
    _, v, out = _build(kw, size=64)
    # stage1's first conv sees 4*32 input channels from SpaceToDepth
    assert v["params"]["stage1_block0"]["conv0"]["Conv_0"]["kernel"].shape[2] == 128
    assert np.isfinite(np.asarray(out)).all()


def test_csp_stage_split_and_transition():
    m = B.csp_simpl_resnet34(num_classes=10, stem_type="s2d", csp_block_ratio=0.5,
                             x2_transition=False, no_first_csp=True)
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    p = v["params"]
    assert "stage0_csp_t2" not in p  # no_first_csp
    assert "stage1_csp_t2" in p  # transition conv present
    assert "stage1_csp_t1" not in p  # x2_transition=False -> single transition
    # csp blocks run at half width
    assert p["stage1_block1"]["conv0"]["Conv_0"]["kernel"].shape[-1] == 64  # 128 * 0.5


@pytest.mark.parametrize("head", ["default", "default_nonorm", "mobilenetv3", "mobilenetv3_norm",
                                  "mlp_2", "mlp_3", "mlp_bn_fc", "mlp_bn_fc_bn", "pool_fc"])
def test_heads(head):
    kw = dict(layers=[1], channels=[16], block_fns=["XX"], stem_type="s2d", stem_width=8,
              head_type=head, head_width=24)
    _, _, out = _build(kw)
    assert out.shape == (2, 10) and np.isfinite(np.asarray(out)).all()


def test_pre_blocks_are_preactivation():
    """Pre_XX starts with a norm: its first conv's input == block input
    (un-activated), and the block has no trailing norm on the residual path."""
    kw = dict(layers=[1], channels=[16], block_fns=["Pre_XX"], stem_type="s2d", stem_width=16,
              head_type="pool_fc", head_width=0)
    m, v, _ = _build(kw)
    # pre variant: per-conv ABN wrappers exist, no separate "norm{i}" BatchNorm leaves
    names = set(v["params"]["stage0_block0"].keys())
    assert any(n.startswith("conv") for n in names)
    assert not any(n.startswith("norm") for n in names), names


def test_genet_normal_geometry():
    m = B.genet_normal(num_classes=10)
    x = jnp.zeros((1, 224, 224, 3))
    _, inter = m.apply(
        m.init(jax.random.PRNGKey(0), x, train=False), x, train=False,
        capture_intermediates=True, mutable=["intermediates"],
    )
    acts = inter["intermediates"]
    # /2 stem, 4 strided stages -> 7x7 final map at 640 channels (GENet-normal)
    last = acts["stage3_block4"]["__call__"][0]
    assert last.shape[1:] == (7, 7, 640), last.shape


def test_fca_gate_bounded():
    from sota_imagenet_tpu.models.attention import FCA

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 32)), jnp.float32)
    m = FCA(channels=32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    # gate in (0,1): |out| <= |x| elementwise
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(x)) + 1e-6)


def test_sphere_fc_unit_cosine_range():
    kw = dict(layers=[1], channels=[16], block_fns=["XX"], stem_type="s2d", stem_width=8,
              head_type="mlp_2", head_width=24, sphere_fc=True)
    _, _, out = _build(kw)
    assert np.all(np.abs(np.asarray(out)) <= 1.0 + 1e-5)  # cosines

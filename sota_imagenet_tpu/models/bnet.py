"""BNet — bonlime's configurable experimental CNN family, NHWC/linen.

The reference drives this family from 77 legacy YAMLs
(``configs/_old_configs/_exp1-85_configs`` and ``_exp85-114_configs``, e.g.
exp31.GENet_norm_my_closer_s2d.yaml, exp63.GEnet_no_dim_red_pwpwdw.yaml,
exp99.BNet_adacos_margin.yaml) whose builder lived in the external
pytorch-tools package (not part of the reference repo). This module is a
**reconstruction per evident intent** from the configs themselves — the block
orderings are documented in the configs' comments:

- exp63: ``Pre_Custom_2`` is "PW -> PW -> DW instead of PW -> DW -> PW as in
  Inverted [residual]";
- exp31 (a GENet reimplementation): "no residual in stride=2 blocks",
  "mobilenetv3 head - GAP before last expansion", Btl ``bottle_ratio 0.25``,
  IR ``bottle_ratio 3``;
- exp65: ``filter_steps`` "gradually increase filter size" within a stage;
- exp11: "groups width 16 ... number of groups varies from layer to layer".

Vocabulary covered (complete over the legacy corpus):
  stage_fns: simpl (the only value used) + the csp_* arch presets
  block_fns: XX, Btl, IR, Sep2, Sep3, Dark and Pre\\_ variants, Pre_Custom_2
  stage_args: bottle_ratio, force_residual, force_expansion, dim_reduction
              (stride & expand | expand -> stride | s2d), dw_str2_kernel_size,
              filter_steps, final_act, groups_width
  stem_type: default | s2d/space2depth | deep | genet | dark
  head_type: default | default_nonorm | mobilenetv3(_norm) | mlp_2 | mlp_3 |
             mlp_bn_fc | mlp_bn_fc_bn | pool_fc

TPU notes: every conv is an NHWC XLA conv on the MXU; depthwise convs lower to
the VPU-friendly feature-group path; BN+act fuse. The partial-residual idiom
uses ``out.at[..., :c].add(res)`` (fused by XLA, see blocks.partial_residual).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sota_imagenet_tpu.models.attention import get_attn
from sota_imagenet_tpu.models.blocks import partial_residual
from sota_imagenet_tpu.models.layers import (
    BlurPool,
    Conv,
    DropPath,
    Dropout,
    SpaceToDepth,
    activation_from_name,
    max_pool,
)
from sota_imagenet_tpu.models.norms import BatchNorm, norm_from_name

Dtype = Any

# conv plans: (kind, width_key, stride_here, depthwise)
#   kind: kernel size or "dw" (kernel resolved from dw_kernel_size)
_PLANS = {
    # basic: 3x3 -> 3x3 (ResNet XX block)
    "XX": (("k3", "mid", True, False), ("k3", "out", False, False)),
    # bottleneck 1-3-1 (GENet BL, bottle_ratio 0.25)
    "Btl": (("k1", "mid", False, False), ("k3", "mid", True, False), ("k1", "out", False, False)),
    # inverted residual PW -> DW -> PW (GENet DW, bottle_ratio 3)
    "IR": (("k1", "mid", False, False), ("dw", "mid", True, True), ("k1", "out", False, False)),
    # exp63: PW -> PW -> DW
    "Custom_2": (("k1", "mid", False, False), ("k1", "out", False, False), ("dw", "out", True, True)),
    # separable x2 / x3: (DW -> PW) repeated
    "Sep2": (("dw", "in", True, True), ("k1", "mid", False, False), ("dw", "mid", False, True), ("k1", "out", False, False)),
    "Sep3": (
        ("dw", "in", True, True),
        ("k1", "mid", False, False),
        ("dw", "mid", False, True),
        ("k1", "mid", False, False),
        ("dw", "mid", False, True),
        ("k1", "out", False, False),
    ),
    # darknet residual: 1x1 half -> 3x3 (simpl_dark presets, bottle_ratio 0.5)
    "Dark": (("k1", "mid", False, False), ("k3", "out", True, False)),
}


def _plan(block_fn: str):
    pre = block_fn.startswith("Pre_")
    key = block_fn[4:] if pre else block_fn
    if key not in _PLANS:
        raise KeyError(f"unknown block_fn {block_fn!r}; known: {sorted(_PLANS)} (+ Pre_ variants)")
    return pre, _PLANS[key]


class BNetBlock(nn.Module):
    """One BNet block. ``Pre_`` variants are pre-activation (norm-act before
    every conv, residual added to the un-normalized input — ResNet-v2 style);
    plain variants are post-activation (conv -> norm-act, last conv -> norm,
    + act after the residual only when ``final_act``).

    Residual policy (exp31: "no residual in stride=2 blocks"): residual only
    at stride 1; identity when shapes match, partial residual
    (``out[..., :in_chs] += x``) when ``force_residual`` and out_chs > in_chs.
    """

    block_fn: str = "XX"
    in_chs: int = 64
    out_chs: int = 64
    stride: int = 1
    bottle_ratio: float = 1.0
    force_residual: bool = False
    force_expansion: bool = False
    dw_kernel_size: int = 3
    groups: int = 1
    groups_width: Optional[int] = None
    norm_layer: str = "abn"
    norm_act: str = "leaky_relu"
    final_act: bool = False
    antialias: bool = False
    keep_prob: float = 1.0
    attn_type: Optional[str] = None
    attn_kwargs: Optional[Dict[str, Any]] = None
    init_zero: bool = False  # zero-init the last norm's scale
    dtype: Dtype = None

    def _width(self, key: str) -> int:
        if key == "in":
            return self.in_chs
        if key == "out":
            return self.out_chs
        # mid: bottle_ratio scales the block's base width. force_expansion
        # (exp90/99 IR stages) computes it from the wider side so an
        # expanding first block keeps a real expansion instead of a
        # representational bottleneck.
        base = max(self.in_chs, self.out_chs) if self.force_expansion else self.out_chs
        return max(int(round(base * self.bottle_ratio)), 8)

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        pre, plan = _plan(self.block_fn)
        norm = norm_from_name(self.norm_layer)
        dt = self.dtype
        act = self.norm_act

        out = x
        n_convs = len(plan)
        for i, (kind, wkey, takes_stride, depthwise) in enumerate(plan):
            chs = self._width(wkey)
            stride = self.stride if takes_stride else 1
            k = self.dw_kernel_size if kind == "dw" else (3 if kind == "k3" else 1)
            if depthwise:
                groups = out.shape[-1]  # true depthwise over current width
            elif k == 1:
                # grouping applies to the spatial convs only — the reference
                # blocks pass `groups` to their 3x3s and keep the 1x1
                # reductions/expansions dense (model.py:909-912); grouping a
                # 1x1 whose in/out differ (e.g. exp46 Btl 640->1024 with
                # groups_width 1) is invalid in torch too
                groups = 1
            elif self.groups_width:
                groups = max(out.shape[-1] // self.groups_width, 1)
            else:
                groups = self.groups
            if pre:
                out = norm(activation=act, dtype=dt)(out, train=train)
            conv_stride = 1 if (self.antialias and stride == 2) else stride
            out = Conv(
                out_chs=chs,
                kernel_size=k,
                stride=conv_stride,
                padding=k // 2,
                groups=groups,
                use_bias=False,
                dtype=dt,
                name=f"conv{i}",
            )(out)
            if self.antialias and stride == 2:
                out = BlurPool()(out)
            if not pre:
                last = i == n_convs - 1
                if last:
                    if self.init_zero:
                        # zero-init'd last-norm gamma (the classic residual
                        # trick; BatchNorm has no scale_init knob, so the
                        # scale is a separate zero-init param)
                        out = BatchNorm(use_scale=False, dtype=dt, name=f"norm{i}")(out, train=train)
                        gamma = self.param("gamma", nn.initializers.zeros, (out.shape[-1],), jnp.float32)
                        out = out * gamma.astype(out.dtype)
                    else:
                        out = BatchNorm(dtype=dt, name=f"norm{i}")(out, train=train)
                else:
                    out = norm(activation=act, dtype=dt, name=f"norm{i}")(out, train=train)

        if self.attn_type:
            attn = get_attn(self.attn_type)(out.shape[-1], **(self.attn_kwargs or {}))
            if attn is not None:
                out = attn(out)
        out = DropPath(keep_prob=self.keep_prob)(out, train=train)

        res = None
        if self.stride == 1:
            if self.in_chs == self.out_chs:
                res = x
            elif self.force_residual and self.in_chs < self.out_chs:
                res = x  # partial residual
        if res is not None:
            out = partial_residual(out, res)
        if not pre and self.final_act:
            out = activation_from_name(act)(out)
        return out


class _NormActLayer(nn.Module):
    norm_layer: str = "abn"
    activation: str = "leaky_relu"
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return norm_from_name(self.norm_layer)(activation=self.activation, dtype=self.dtype)(x, train=train)


class BNet(nn.Module):
    """Config-driven BNet (the legacy ``arch: BNet`` + ``model_params``)."""

    layers: Sequence[int] = (1, 2, 6, 5)
    channels: Sequence[int] = (128, 192, 640, 640)
    stage_fns: Sequence[str] = ("simpl",) * 4
    block_fns: Sequence[str] = ("XX", "XX", "Btl", "IR")
    stage_args: Sequence[Dict[str, Any]] = ()
    stem_type: str = "default"
    stem_width: int = 32
    head_type: str = "default"
    head_width: Any = 2560  # int, or per-layer list for mlp_* heads (exp53/54)
    head_norm_act: Optional[str] = None  # None -> norm_act; "none" -> no act
    mobilenetv3_head: Optional[bool] = None  # legacy alias for head_type
    norm_act: str = "leaky_relu"
    norm_layer: str = "abn"
    attn_type: Optional[str] = None
    temperature: Optional[float] = None  # attention temperature (XCA/FCA)
    reduction: Optional[int] = None  # SE reduction
    groups: int = 1
    groups_width: Optional[int] = None
    # exp19 "no groups with stride": stride-2 blocks fall back to dense convs
    no_groups_with_stride: bool = False
    # exp23 "no last expand": skip the head 1x1 expansion entirely (GAP -> fc)
    expand_before_head: bool = True
    antialias: bool = False
    init_zero: bool = False
    drop_rate: float = 0.0
    drop_connect_rate: float = 0.0
    normalize: bool = False  # l2-normalize the embedding before the classifier
    sphere_fc: bool = False  # sphere-normalized classifier (angular criteria)
    # SimCLR-style train-only MLP projector before the sphere classifier —
    # the legacy 'mlp_adacos' head (exp102.BNet_adacos_m_mlp.yaml)
    sphere_mlp: bool = False
    first_stage_stride: int = 1  # GENet-style /2 stems stride in stage 0
    # csp presets
    csp_stages: Sequence[bool] = ()
    csp_block_ratio: float = 0.5
    x2_transition: bool = True
    num_classes: int = 1000
    dtype: Dtype = None

    def _attn_kwargs(self) -> Dict[str, Any]:
        kw: Dict[str, Any] = {}
        name = (self.attn_type or "").lower()
        if self.temperature is not None and name.startswith("fca"):
            kw["temperature"] = self.temperature
        if self.reduction is not None and name.startswith("se"):
            kw["reduction"] = self.reduction
        return kw

    @nn.compact
    def __call__(self, x, train: bool = False, **_):
        dt = self.dtype
        if dt is not None:
            x = x.astype(dt)
        n_stages = len(self.layers)
        assert len(self.channels) == n_stages, "layers/channels length mismatch"
        stage_args = list(self.stage_args) + [{}] * (n_stages - len(self.stage_args))
        block_fns = list(self.block_fns) + [self.block_fns[-1]] * (n_stages - len(self.block_fns))
        csp = list(self.csp_stages) + [False] * (n_stages - len(self.csp_stages))

        # --- stem ---
        st = self.stem_type
        if st in ("s2d", "space2depth"):
            x = SpaceToDepth(block_size=4)(x)  # /4
            x = Conv(out_chs=self.stem_width, kernel_size=3, padding=1, use_bias=False, dtype=dt, name="stem_conv")(x)
            x = _NormActLayer(self.norm_layer, self.norm_act, dt, name="stem_norm")(x, train=train)
        elif st == "deep":
            for i, chs in enumerate((self.stem_width, self.stem_width, self.stem_width * 2)):
                x = Conv(out_chs=chs, kernel_size=3, stride=2 if i == 0 else 1, padding=1, use_bias=False, dtype=dt, name=f"stem_conv{i}")(x)
                x = _NormActLayer(self.norm_layer, self.norm_act, dt, name=f"stem_norm{i}")(x, train=train)
            x = max_pool(x, 3, 2, 1)  # /4
        elif st == "genet":
            # GENet stem: single 3x3/2 (exp31 notes "in GENet kernel size is 3")
            x = Conv(out_chs=self.stem_width, kernel_size=3, stride=2, padding=1, use_bias=False, dtype=dt, name="stem_conv")(x)
            x = _NormActLayer(self.norm_layer, self.norm_act, dt, name="stem_norm")(x, train=train)  # /2
        elif st == "dark":
            # darknet stem: 3x3/1 then 3x3/2
            x = Conv(out_chs=self.stem_width, kernel_size=3, padding=1, use_bias=False, dtype=dt, name="stem_conv0")(x)
            x = _NormActLayer(self.norm_layer, self.norm_act, dt, name="stem_norm0")(x, train=train)
            x = Conv(out_chs=self.stem_width * 2, kernel_size=3, stride=2, padding=1, use_bias=False, dtype=dt, name="stem_conv1")(x)
            x = _NormActLayer(self.norm_layer, self.norm_act, dt, name="stem_norm1")(x, train=train)  # /2
        else:  # "default": ResNet 7x7/2 + maxpool (/4)
            x = Conv(out_chs=self.stem_width, kernel_size=7, stride=2, padding=3, use_bias=False, dtype=dt, name="stem_conv")(x)
            x = _NormActLayer(self.norm_layer, self.norm_act, dt, name="stem_norm")(x, train=train)
            x = max_pool(x, 3, 2, 1)

        # --- stages ---
        total_blocks = sum(self.layers)
        block_idx = 0
        for s in range(n_stages):
            n_blocks = int(self.layers[s])
            stage_chs = int(self.channels[s])
            args = dict(stage_args[s])
            dim_reduction = args.pop("dim_reduction", "stride & expand")
            filter_steps = args.pop("filter_steps", None)
            stage_stride = self.first_stage_stride if s == 0 else 2

            def keep(i):
                kp = 1.0 - self.drop_connect_rate * (block_idx + i) / max(total_blocks - 1, 1)
                return kp if self.drop_connect_rate > 0 else 1.0

            def block_kwargs(i, in_chs, out_chs, stride):
                return dict(
                    block_fn=block_fns[s],
                    in_chs=in_chs,
                    out_chs=out_chs,
                    stride=stride,
                    dw_kernel_size=args.get("dw_str2_kernel_size", 3) if stride == 2 else 3,
                    groups=1 if (stride == 2 and self.no_groups_with_stride) else self.groups,
                    groups_width=None
                    if (stride == 2 and self.no_groups_with_stride)
                    else args.get("groups_width", self.groups_width),
                    norm_layer=self.norm_layer,
                    norm_act=self.norm_act,
                    antialias=self.antialias,
                    keep_prob=keep(i),
                    attn_type=self.attn_type,
                    attn_kwargs=self._attn_kwargs(),
                    init_zero=self.init_zero,
                    dtype=dt,
                    **{
                        k: args[k]
                        for k in ("bottle_ratio", "force_residual", "force_expansion", "final_act")
                        if k in args
                    },
                )

            in_chs = x.shape[-1]

            # per-block output widths (filter_steps ramps within the stage,
            # exp65: "gradually increase filter size")
            if filter_steps:
                outs = [min(stage_chs, in_chs + filter_steps * (i + 1)) for i in range(n_blocks)]
                outs[-1] = stage_chs
            else:
                outs = [stage_chs] * n_blocks

            # dim_reduction: where the stride/expansion happens
            strides = [1] * n_blocks
            if dim_reduction == "s2d":
                if stage_stride == 2:
                    x = SpaceToDepth(block_size=2)(x)  # channels x4, /2
                    in_chs = x.shape[-1]
            elif dim_reduction == "expand -> stride" and n_blocks > 1:
                strides[1] = stage_stride  # block 0 expands at full res, block 1 strides
            else:  # "stride & expand"
                strides[0] = stage_stride

            if csp[s]:
                x = self._csp_stage(x, s, n_blocks, stage_chs, strides, outs, block_kwargs, train)
            else:
                for i in range(n_blocks):
                    x = BNetBlock(name=f"stage{s}_block{i}", **block_kwargs(i, x.shape[-1], outs[i], strides[i]))(
                        x, train=train
                    )
            block_idx += n_blocks

        # --- head ---
        head_act = self.norm_act if self.head_norm_act is None else self.head_norm_act
        ht = self.head_type
        if self.mobilenetv3_head is not None:
            ht = "mobilenetv3" if self.mobilenetv3_head else ht
        if not self.expand_before_head:
            ht = "pool_fc"
        act = activation_from_name(head_act) if head_act and head_act != "none" else (lambda t: t)

        if ht == "default":
            x = Conv(out_chs=self.head_width, kernel_size=1, padding=0, use_bias=False, dtype=dt, name="head_conv")(x)
            x = _NormActLayer(self.norm_layer, head_act if head_act != "none" else "identity", dt, name="head_norm")(x, train=train)
            x = jnp.mean(x, axis=(1, 2))
        elif ht == "default_nonorm":
            x = Conv(out_chs=self.head_width, kernel_size=1, padding=0, use_bias=True, dtype=dt, name="head_conv")(x)
            x = act(x)
            x = jnp.mean(x, axis=(1, 2))
        elif ht in ("mobilenetv3", "mobilenetv3_norm"):
            # exp31: "mobilenetv3 head - GAP before last expansion"
            x = jnp.mean(x, axis=(1, 2))
            x = nn.Dense(self.head_width, dtype=dt or x.dtype, param_dtype=jnp.float32, name="head_fc")(x)
            if ht == "mobilenetv3_norm":
                x = BatchNorm(dtype=dt, name="head_norm")(x[:, None, None, :], train=train)[:, 0, 0, :]
            x = act(x)
        elif ht in ("mlp_2", "mlp_3"):
            x = jnp.mean(x, axis=(1, 2))
            n = 2 if ht == "mlp_2" else 3
            # head_width may be per-layer (exp53 "head_width: [1536, 2560]")
            widths = list(self.head_width) if isinstance(self.head_width, (list, tuple)) else [self.head_width] * n
            for i in range(n):
                x = nn.Dense(widths[min(i, len(widths) - 1)], dtype=dt or x.dtype, param_dtype=jnp.float32, name=f"head_fc{i}")(x)
                x = act(x)
        elif ht in ("mlp_bn_fc", "mlp_bn_fc_bn"):
            x = jnp.mean(x, axis=(1, 2))
            x = BatchNorm(dtype=dt, name="head_bn0")(x[:, None, None, :], train=train)[:, 0, 0, :]
            x = nn.Dense(self.head_width, dtype=dt or x.dtype, param_dtype=jnp.float32, name="head_fc")(x)
            if ht == "mlp_bn_fc_bn":
                x = BatchNorm(dtype=dt, name="head_bn1")(x[:, None, None, :], train=train)[:, 0, 0, :]
            x = act(x)
        elif ht == "pool_fc":  # plain GAP -> fc (resnet/darknet presets)
            x = jnp.mean(x, axis=(1, 2))
        else:
            raise KeyError(f"unknown head_type {ht!r}")

        x = Dropout(rate=self.drop_rate)(x, train=train)
        if self.normalize:
            x = x / jnp.maximum(jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True), 1e-12).astype(x.dtype)
        if self.sphere_mlp:
            from sota_imagenet_tpu.losses.angular import SphereMLPLayer  # lazy: avoids import cycle

            x = SphereMLPLayer(embedding_size=x.shape[-1], num_classes=self.num_classes, name="fc")(x, train=train)
        elif self.sphere_fc:
            from sota_imagenet_tpu.losses.angular import SphereLinearLayer  # lazy: avoids import cycle

            x = SphereLinearLayer(embedding_size=x.shape[-1], num_classes=self.num_classes, name="fc")(x)
        else:
            x = nn.Dense(
                self.num_classes,
                dtype=dt or x.dtype,
                param_dtype=jnp.float32,
                kernel_init=nn.initializers.normal(0.01),
                name="fc",
            )(x)
        return x.astype(jnp.float32)

    def _csp_stage(self, x, s, n_blocks, stage_chs, strides, outs, block_kwargs, train):
        """CSP stage (csp_simpl_* presets, CSPNet arXiv:1911.11929): the first
        block performs the dim reduction, then channels split
        ``csp_block_ratio`` through the remaining blocks with the rest
        bypassing; concat + 1x1 transition (doubled when ``x2_transition``)."""
        x = BNetBlock(name=f"stage{s}_block0", **block_kwargs(0, x.shape[-1], outs[0], strides[0]))(x, train=train)
        if n_blocks == 1:
            return x
        c_blk = max(int(stage_chs * self.csp_block_ratio), 8)
        blk, bypass = x[..., :c_blk], x[..., c_blk:]
        for i in range(1, n_blocks):
            blk = BNetBlock(name=f"stage{s}_block{i}", **block_kwargs(i, blk.shape[-1], c_blk, 1))(blk, train=train)
        if self.x2_transition:
            blk = Conv(out_chs=c_blk, kernel_size=1, padding=0, use_bias=False, dtype=self.dtype, name=f"stage{s}_csp_t1")(blk)
            blk = _NormActLayer(self.norm_layer, self.norm_act, self.dtype, name=f"stage{s}_csp_t1n")(blk, train=train)
        x = jnp.concatenate([blk, bypass], axis=-1)
        x = Conv(out_chs=stage_chs, kernel_size=1, padding=0, use_bias=False, dtype=self.dtype, name=f"stage{s}_csp_t2")(x)
        x = _NormActLayer(self.norm_layer, self.norm_act, self.dtype, name=f"stage{s}_csp_t2n")(x, train=train)
        return x


def _merge(defaults: Dict[str, Any], kwargs: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(defaults)
    kwargs.pop("pretrained", None)
    out.update(kwargs)
    for k in ("layers", "channels", "stage_fns", "block_fns"):
        if k in out and out[k] is not None:
            out[k] = tuple(out[k])
    if "stage_args" in out and out["stage_args"]:
        out["stage_args"] = tuple(dict(a) for a in out["stage_args"])
    if "csp_stages" in out and out["csp_stages"]:
        out["csp_stages"] = tuple(out["csp_stages"])
    return out


def bnet(**kwargs) -> BNet:
    """``arch: BNet`` — fully config-driven (legacy model_params pass through)."""
    kwargs.setdefault("stage_fns", ("simpl",) * len(kwargs.get("layers", (1, 2, 6, 5))))
    return BNet(**_merge({}, kwargs))


_SIMPL_R34 = dict(
    layers=(3, 4, 6, 3),
    channels=(64, 128, 256, 512),
    block_fns=("XX",) * 4,
    stage_args=tuple({"dim_reduction": "stride & expand", "bottle_ratio": 1, "final_act": True} for _ in range(4)),
    stem_type="default",
    stem_width=64,
    head_type="pool_fc",
    head_width=512,
    norm_act="relu",
)


def simpl_resnet34(**kwargs) -> BNet:
    """Simplified ResNet-34 rebuilt on the BNet block DSL (legacy
    ``arch: simpl_resnet34``, e.g. exp37.SimpR34_new.yaml)."""
    return BNet(**_merge(_SIMPL_R34, kwargs))


def simpl_resnet50(**kwargs) -> BNet:
    d = dict(_SIMPL_R34)
    d.update(
        layers=(3, 4, 6, 3),
        channels=(256, 512, 1024, 2048),
        block_fns=("Btl",) * 4,
        stage_args=tuple(
            {"dim_reduction": "stride & expand", "bottle_ratio": 0.25, "final_act": True} for _ in range(4)
        ),
        head_width=2048,
    )
    return BNet(**_merge(d, kwargs))


def simpl_preactresnet34(**kwargs) -> BNet:
    """Pre-activation variant (legacy ``arch: simpl_preactresnet34``,
    exp11: "preactivation (aka ResNet v2 trick)")."""
    d = dict(_SIMPL_R34)
    d.update(
        block_fns=("Pre_XX",) * 4,
        stage_args=tuple({"dim_reduction": "stride & expand", "bottle_ratio": 1, "force_residual": True} for _ in range(4)),
    )
    return BNet(**_merge(d, kwargs))


def csp_simpl_resnet34(**kwargs) -> BNet:
    """CSP wrapping of simpl_resnet34 (legacy ``arch: csp_simpl_resnet34``,
    exp16-18; ``no_first_csp`` keeps stage 0 plain)."""
    no_first = kwargs.pop("no_first_csp", False)
    d = dict(_SIMPL_R34)
    d["csp_stages"] = (not no_first, True, True, True)
    return BNet(**_merge(d, kwargs))


_DARK = dict(
    layers=(1, 2, 8, 8, 4),
    channels=(64, 128, 256, 512, 1024),
    stage_fns=("simpl",) * 5,
    block_fns=("Dark",) * 5,
    stage_args=tuple({"bottle_ratio": 0.5, "final_act": True} for _ in range(5)),
    stem_type="dark",
    stem_width=32,
    head_type="pool_fc",
    head_width=1024,
)


def simpl_dark(**kwargs) -> BNet:
    """Darknet-53-shaped BNet (legacy ``arch: simpl_dark``,
    exp25.simpl_Dark_less_cls.yaml)."""
    return BNet(**_merge(_DARK, kwargs))


def csp_simpl_dark(**kwargs) -> BNet:
    no_first = kwargs.pop("no_first_csp", False)
    d = dict(_DARK)
    d["csp_stages"] = (not no_first, True, True, True, True)
    return BNet(**_merge(d, kwargs))


def genet_normal(**kwargs) -> BNet:
    """GENet-normal (GPU-Efficient Networks arXiv:2006.14090; legacy
    ``arch: GENet_normal``, exp26 — exp31 documents the stage plan:
    XX, XX, Btl(ratio .25), IR(ratio 3), head 2560)."""
    d = dict(
        layers=(1, 2, 6, 5),
        channels=(128, 192, 640, 640),
        block_fns=("XX", "XX", "Btl", "IR"),
        stage_args=(
            {"dim_reduction": "stride & expand", "bottle_ratio": 1, "final_act": True},
            {"dim_reduction": "stride & expand", "bottle_ratio": 1, "final_act": True},
            {"bottle_ratio": 0.25, "final_act": True},
            {"bottle_ratio": 3, "final_act": True},
        ),
        stem_type="genet",
        stem_width=32,
        head_type="default",
        head_width=2560,
        norm_act="relu",
        first_stage_stride=2,  # /2 stem, all four stages stride (/32 total)
    )
    return BNet(**_merge(d, kwargs))

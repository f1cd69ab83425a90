"""Import torch/torchvision-style ResNet checkpoints into the flax models.

The reference saves `model.chpn` = a torch state_dict with torchvision naming
(conv1/bn1/layer{L}.{B}.{conv,bn}{1..3}/downsample/fc — pytorch-tools resnets
keep that layout). This converts such a dict (as numpy arrays) into our
{params, batch_stats} trees so reference-trained ResNet checkpoints can be
evaluated or fine-tuned here.

Conventions: torch conv weights are OIHW → flax HWIO; torch Linear weight is
(out, in) → flax kernel (in, out); BN weight/bias → scale/bias, running_* →
batch_stats mean/var.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def convert_resnet_state_dict(
    state_dict: Mapping[str, Any], layers=(3, 4, 6, 3), bottleneck: bool = True
) -> Tuple[Dict, Dict]:
    """torchvision-style ResNet state_dict (numpy values) -> (params, batch_stats)."""
    sd = {(k[7:] if k.startswith("module.") else k): np.asarray(v) for k, v in state_dict.items()}  # strip DDP prefix only
    params: Dict = {}
    stats: Dict = {}

    def conv(src: str, dst: str):
        w = sd[src + ".weight"]  # OIHW
        _set(params, dst + "/kernel", np.transpose(w, (2, 3, 1, 0)))

    def bn(src: str, dst: str):
        _set(params, dst + "/scale", sd[src + ".weight"])
        _set(params, dst + "/bias", sd[src + ".bias"])
        _set(stats, dst + "/mean", sd[src + ".running_mean"])
        _set(stats, dst + "/var", sd[src + ".running_var"])

    conv("conv1", "stem_conv/Conv_0")
    bn("bn1", "stem_bn/BatchNorm_0/BatchNorm_0")
    n_convs = 3 if bottleneck else 2
    for li, depth in enumerate(layers, start=1):
        for b in range(depth):
            t = f"layer{li}.{b}"
            f = f"layer{li}_{b}"
            for ci in range(1, n_convs + 1):
                conv(f"{t}.conv{ci}", f"{f}/Conv_{ci - 1}/Conv_0")
                if ci < n_convs:
                    bn(f"{t}.bn{ci}", f"{f}/_NormAct_{ci - 1}/BatchNorm_0/BatchNorm_0")
                else:
                    bn(f"{t}.bn{ci}", f"{f}/BatchNorm_0/BatchNorm_0")
            if f"{t}.downsample.0.weight" in sd:
                conv(f"{t}.downsample.0", f"{f}/down_conv/Conv_0")
                bn(f"{t}.downsample.1", f"{f}/down_bn/BatchNorm_0")
    _set(params, "fc/kernel", sd["fc.weight"].T)
    _set(params, "fc/bias", sd["fc.bias"])
    return params, stats


def convert_nfnet_state_dict(state_dict: Mapping[str, Any], depths=(1, 2, 6, 3)) -> Tuple[Dict, Dict]:
    """timm NFNet-layout state_dict (numpy values) -> (params, batch_stats).

    Covers timm's eca_nfnet_l0/l1 naming (reference 15.eca_nfnet_l0.yaml
    resumes such checkpoints): stem.conv1..4, stages.S.B.{conv1,conv2,conv2b,
    conv3,downsample.conv,attn/attn_last.conv,skipinit_gain}, final_conv,
    head.fc — all ScaledStdConv2d with (weight OIHW, bias, gain (O,1,1,1)).
    Our NFNet folds the activation gamma into the activation exactly like
    timm, so weights import without rescaling. NF nets have no BN buffers:
    batch_stats is empty."""
    sd = {(k[7:] if k.startswith("module.") else k): np.asarray(v) for k, v in state_dict.items()}  # strip DDP prefix only
    params: Dict = {}

    def ws_conv(src: str, dst: str):
        _set(params, dst + "/kernel", np.transpose(sd[src + ".weight"], (2, 3, 1, 0)))
        _set(params, dst + "/gain", sd[src + ".gain"].reshape(-1))
        if src + ".bias" in sd:
            _set(params, dst + "/bias", sd[src + ".bias"])

    for i in range(4):
        ws_conv(f"stem.conv{i + 1}", f"stem_conv{i}")
    for s, depth in enumerate(depths):
        for b in range(depth):
            t = f"stages.{s}.{b}"
            f = f"stage{s}_block{b}"
            for cname in ("conv1", "conv2", "conv2b", "conv3"):
                ws_conv(f"{t}.{cname}", f"{f}/{cname}")
            if f"{t}.downsample.conv.weight" in sd:
                ws_conv(f"{t}.downsample.conv", f"{f}/downsample")
            for attn_key in ("attn_last", "attn"):  # timm names it attn_last for NFNets
                k = f"{t}.{attn_key}.conv.weight"
                if k in sd:
                    _set(params, f"{f}/ECA_0/kernel", np.transpose(sd[k], (2, 1, 0)))
                    break
            if f"{t}.skipinit_gain" in sd:
                _set(params, f"{f}/skipinit_gain", np.asarray(sd[f"{t}.skipinit_gain"]).reshape(()))
    ws_conv("final_conv", "final_conv")
    _set(params, "fc/kernel", sd["head.fc.weight"].T)
    _set(params, "fc/bias", sd["head.fc.bias"])
    return params, {}


def convert_bresnet_state_dict(state_dict: Mapping[str, Any], layers=(3, 4, 6, 3)) -> Tuple[Dict, Dict]:
    """pytorch-tools BResNet-layout state_dict (numpy) -> (params, batch_stats)
    for models.bresnet50 (reference BResNet50_encoder.yaml:42-52: s2d stem +
    antialias BlurPool + ECA + (inplace)ABN leaky_relu + drop-path).

    Accepted layout (torchvision naming extended the pytorch-tools way):
    conv1/bn1 stem (s2d is param-free), layerL.B.{convN,bnN} with ABN buffers
    named like BN, ECA as `se_module.conv` (1,1,k) conv1d, antialias
    downsample as Sequential [BlurPool (fixed buffer, skipped), conv, bn] —
    plain stride-2 downsample [conv, bn] also handled. BlurPool blur filters
    are fixed binomial kernels, not parameters."""
    sd = {(k[7:] if k.startswith("module.") else k): np.asarray(v) for k, v in state_dict.items()}  # strip DDP prefix only
    params: Dict = {}
    stats: Dict = {}

    def conv(src: str, dst: str):
        _set(params, dst + "/kernel", np.transpose(sd[src + ".weight"], (2, 3, 1, 0)))

    def bn(src: str, dst: str):
        _set(params, dst + "/scale", sd[src + ".weight"])
        _set(params, dst + "/bias", sd[src + ".bias"])
        _set(stats, dst + "/mean", sd[src + ".running_mean"])
        _set(stats, dst + "/var", sd[src + ".running_var"])

    conv("conv1", "stem_conv/Conv_0")
    bn("bn1", "stem_bn/BatchNorm_0/BatchNorm_0")
    for li, depth in enumerate(layers, start=1):
        for b in range(depth):
            t = f"layer{li}.{b}"
            f = f"layer{li}_{b}"
            for ci in (1, 2, 3):
                conv(f"{t}.conv{ci}", f"{f}/Conv_{ci - 1}/Conv_0")
                if ci < 3:
                    bn(f"{t}.bn{ci}", f"{f}/_NormAct_{ci - 1}/BatchNorm_0/BatchNorm_0")
                else:
                    bn(f"{t}.bn{ci}", f"{f}/BatchNorm_0/BatchNorm_0")
            if f"{t}.se_module.conv.weight" in sd:
                _set(params, f"{f}/ECA_0/kernel", np.transpose(sd[f"{t}.se_module.conv.weight"], (2, 1, 0)))
            for di in (0, 1):  # [blurpool, conv, bn] (antialias) or [conv, bn]
                if f"{t}.downsample.{di}.weight" in sd and sd[f"{t}.downsample.{di}.weight"].ndim == 4:
                    conv(f"{t}.downsample.{di}", f"{f}/down_conv/Conv_0")
                    bn(f"{t}.downsample.{di + 1}", f"{f}/down_bn/BatchNorm_0")
                    break
    _set(params, "fc/kernel", sd["fc.weight"].T)
    _set(params, "fc/bias", sd["fc.bias"])
    return params, stats


def load_torch_checkpoint(path: str, layers=(3, 4, 6, 3), bottleneck: bool = True) -> Tuple[Dict, Dict]:
    """Load a reference .chpn / torch .pth file (dict may be nested under
    'state_dict', reference train.py:101)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}
    return convert_resnet_state_dict(sd_np, layers=layers, bottleneck=bottleneck)

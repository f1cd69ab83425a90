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
    sd = {k.replace("module.", ""): np.asarray(v) for k, v in state_dict.items()}
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


def load_torch_checkpoint(path: str, layers=(3, 4, 6, 3), bottleneck: bool = True) -> Tuple[Dict, Dict]:
    """Load a reference .chpn / torch .pth file (dict may be nested under
    'state_dict', reference train.py:101)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd_np = {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}
    return convert_resnet_state_dict(sd_np, layers=layers, bottleneck=bottleneck)

"""BResNet import parity: hand-built torch BResNet (pytorch-tools layout:
s2d stem conv1/bn1, blocks convN/bnN + ECA `se_module` + antialias BlurPool,
downsample Sequential) vs models.bresnet50 with weights synced through
utils.torch_import.convert_bresnet_state_dict. Offline stand-in for importing
reference BResNet checkpoints (BResNet50_encoder.yaml 81.4/95.7 recipe)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from sota_imagenet_tpu.models import bresnet50
from sota_imagenet_tpu.utils.torch_import import convert_bresnet_state_dict

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

LAYERS = (1, 1)  # tiny: 2 stages


def blur2d(x):
    c = x.shape[1]
    f = torch.tensor([[1.0, 2, 1], [2, 4, 2], [1, 2, 1]]) / 16.0
    k = f.view(1, 1, 3, 3).repeat(c, 1, 1, 1)
    return F.conv2d(x, k, stride=2, padding=1, groups=c)


class Eca(tnn.Module):
    def __init__(self, k=3):
        super().__init__()
        self.conv = tnn.Conv1d(1, 1, kernel_size=k, padding=1, bias=False)

    def forward(self, x):
        y = x.mean((2, 3)).view(x.shape[0], 1, -1)
        y = self.conv(y)
        return x * y.view(x.shape[0], -1, 1, 1).sigmoid()


def act(x):
    return F.leaky_relu(x, 0.01)


class Bottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=False, antialias=True):
        super().__init__()
        out = planes * 4
        self.stride, self.antialias = stride, antialias
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=1 if antialias else stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.se_module = Eca()
        if downsample:
            if antialias and stride == 2:
                # [BlurPool (no params), conv, bn] — converter skips index 0
                self.downsample = tnn.Sequential(
                    tnn.Identity(), tnn.Conv2d(inplanes, out, 1, bias=False), tnn.BatchNorm2d(out)
                )
            else:
                self.downsample = tnn.Sequential(tnn.Conv2d(inplanes, out, 1, stride=stride, bias=False), tnn.BatchNorm2d(out))
        else:
            self.downsample = None

    def forward(self, x):
        out = act(self.bn1(self.conv1(x)))
        out = self.conv2(out)
        if self.antialias and self.stride == 2:
            out = blur2d(out)
        out = act(self.bn2(out))
        out = self.bn3(self.conv3(out))
        out = self.se_module(out)
        res = x
        if self.downsample is not None:
            if self.antialias and self.stride == 2:
                res = blur2d(res)
                res = self.downsample[2](self.downsample[1](res))
            else:
                res = self.downsample(res)
        return act(out + res)


class TorchBResNet(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.conv1 = tnn.Conv2d(48, 64, 3, padding=1, bias=False)  # after s2d(4)
        self.bn1 = tnn.BatchNorm2d(64)
        in_chs = 64
        for li, depth in enumerate(LAYERS, start=1):
            planes = 64 * 2 ** (li - 1)
            blocks = []
            for b in range(depth):
                stride = 2 if (li > 1 and b == 0) else 1
                down = stride != 1 or in_chs != planes * 4
                blocks.append(Bottleneck(in_chs, planes, stride, down))
                in_chs = planes * 4
            setattr(self, f"layer{li}", tnn.Sequential(*blocks))
        self.fc = tnn.Linear(in_chs, num_classes)

    def forward(self, x):
        s = 4  # SpaceToDepth(4), ordering (bs_h, bs_w, C) like pytorch_tools
        n, c, h, w = x.shape
        x = x.view(n, c, h // s, s, w // s, s).permute(0, 3, 5, 1, 2, 4).reshape(n, c * s * s, h // s, w // s)
        x = act(self.bn1(self.conv1(x)))
        for li in range(1, len(LAYERS) + 1):
            x = getattr(self, f"layer{li}")(x)
        x = x.mean((2, 3))
        return self.fc(x)


@pytest.fixture(scope="module")
def synced():
    torch.manual_seed(1)
    tm = TorchBResNet().eval()
    with torch.no_grad():  # non-trivial BN stats
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(torch.rand_like(m.running_var) * 0.5 + 0.75)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_bresnet_state_dict(sd, layers=LAYERS)
    fm = bresnet50(num_classes=10, drop_rate=0.0, drop_connect_rate=0.0)
    fm = fm.copy(layers=LAYERS)  # shrink for CPU
    return tm, fm, {"params": params, "batch_stats": stats}


def test_bresnet_import_logit_parity(synced):
    tm, fm, variables = synced
    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f_out = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_out, t_out, rtol=1e-3, atol=1e-3)


def test_bresnet_param_tree_fully_mapped(synced):
    tm, fm, variables = synced
    x = jnp.zeros((1, 32, 32, 3))
    ref = fm.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x, train=False)
    for col in ("params", "batch_stats"):
        want = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(ref[col])}
        got = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(variables[col])}
        assert want == got, (col, want.symmetric_difference(got))

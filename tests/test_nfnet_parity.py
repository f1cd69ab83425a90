"""NFNet import parity: a hand-built torch NFNet with timm's exact layout
(ScaledStdConv2d via F.batch_norm on weights, gamma folded into the
activation, deep-quad stem, pre-act NF bottlenecks with alpha/beta, ECA after
conv3 "attn_last", skipinit gain) and our flax NFNet must produce identical
logits after utils.torch_import.convert_nfnet_state_dict syncs the weights.

This is the offline stand-in for importing real timm eca_nfnet_l0 checkpoints
(reference 15.eca_nfnet_l0.yaml resumes one; no egress here, so the torch twin
is built by hand per the timm/DeepMind published architecture)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from sota_imagenet_tpu.models.layers import ACTIVATION_GAMMA
from sota_imagenet_tpu.models.nfnet import NFNet
from sota_imagenet_tpu.utils.torch_import import convert_nfnet_state_dict

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

GAMMA = ACTIVATION_GAMMA["silu"]
DEPTHS = (1, 2)
CHANNELS = (64, 128)
STEM = (8, 8, 16, 32)
GROUP = 32
ALPHA = 0.2


def act(x):
    return F.silu(x) * GAMMA


class ScaledStdConv2d(tnn.Conv2d):
    """timm layers/std_conv.py ScaledStdConv2d."""

    def __init__(self, in_ch, out_ch, k, stride=1, padding=0, groups=1, gamma=1.0, eps=1e-6):
        super().__init__(in_ch, out_ch, k, stride=stride, padding=padding, groups=groups, bias=True)
        self.gain = tnn.Parameter(torch.full((out_ch, 1, 1, 1), 1.0))
        self.scale = gamma * self.weight[0].numel() ** -0.5
        self.eps = eps

    def forward(self, x):
        weight = F.batch_norm(
            self.weight.reshape(1, self.out_channels, -1),
            None,
            None,
            weight=(self.gain * self.scale).view(-1),
            training=True,
            momentum=0.0,
            eps=self.eps,
        ).reshape_as(self.weight)
        return F.conv2d(x, weight, self.bias, self.stride, self.padding, self.dilation, self.groups)


class Eca(tnn.Module):
    def __init__(self, k=3):
        super().__init__()
        self.conv = tnn.Conv1d(1, 1, kernel_size=k, padding=(k - 1) // 2, bias=False)

    def forward(self, x):
        y = x.mean((2, 3)).view(x.shape[0], 1, -1)
        y = self.conv(y)
        return x * y.view(x.shape[0], -1, 1, 1).sigmoid()


class NFBlock(tnn.Module):
    def __init__(self, in_ch, out_ch, stride, beta, alpha=ALPHA, group_size=GROUP, bottle=0.25):
        super().__init__()
        mid = int(out_ch * bottle)
        groups = max(mid // group_size, 1)
        mid = groups * group_size
        self.beta, self.alpha, self.stride = beta, alpha, stride
        self.need_down = stride > 1 or in_ch != out_ch
        if self.need_down:
            self.downsample = tnn.Module()
            self.downsample.conv = ScaledStdConv2d(in_ch, out_ch, 1)
        self.conv1 = ScaledStdConv2d(in_ch, mid, 1)
        self.conv2 = ScaledStdConv2d(mid, mid, 3, stride=stride, padding=1, groups=groups)
        self.conv2b = ScaledStdConv2d(mid, mid, 3, padding=1, groups=groups)
        self.conv3 = ScaledStdConv2d(mid, out_ch, 1)
        self.attn_last = Eca()
        self.skipinit_gain = tnn.Parameter(torch.zeros(()))

    def forward(self, x):
        out = act(x) * self.beta
        shortcut = x
        if self.need_down:
            s = out
            if self.stride > 1:
                s = F.avg_pool2d(s, 2, 2)
            shortcut = self.downsample.conv(s)
        out = self.conv1(out)
        out = self.conv2(act(out))
        out = self.conv2b(act(out))
        out = act(out)
        out = self.conv3(out)
        out = 2.0 * self.attn_last(out)
        out = out * self.skipinit_gain
        return out * self.alpha + shortcut


class TorchNFNet(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        self.stem = tnn.Module()
        chs, strides = STEM, (2, 1, 1, 2)
        prev = 3
        for i, (c, s) in enumerate(zip(chs, strides)):
            setattr(self.stem, f"conv{i + 1}", ScaledStdConv2d(prev, c, 3, stride=s, padding=1))
            prev = c
        self.stages = tnn.ModuleList()
        expected_std = 1.0
        in_ch = prev
        for si, (depth, c) in enumerate(zip(DEPTHS, CHANNELS)):
            blocks = tnn.ModuleList()
            for b in range(depth):
                stride = 2 if (b == 0 and si > 0) else 1
                beta = 1.0 / expected_std
                blocks.append(NFBlock(in_ch, c, stride, beta))
                if b == 0:
                    expected_std = 1.0
                expected_std = (expected_std**2 + ALPHA**2) ** 0.5
                in_ch = c
            self.stages.append(blocks)
        self.final_conv = ScaledStdConv2d(in_ch, int(CHANNELS[-1] * 1.5), 1)
        self.head = tnn.Module()
        self.head.fc = tnn.Linear(int(CHANNELS[-1] * 1.5), num_classes)

    def forward(self, x):
        for i in range(4):
            x = getattr(self.stem, f"conv{i + 1}")(x)
            if i < 3:
                x = act(x)
        for blocks in self.stages:
            for blk in blocks:
                x = blk(x)
        x = act(self.final_conv(x))
        x = x.mean((2, 3))
        return self.head.fc(x)


@pytest.fixture(scope="module")
def synced():
    torch.manual_seed(0)
    tm = TorchNFNet().eval()
    # non-trivial weights: randomize gains/skipinit so the test is not blind
    # to gain/skipinit mapping bugs
    with torch.no_grad():
        for n, p in tm.named_parameters():
            if n.endswith("gain") or n.endswith("skipinit_gain"):
                p.add_(torch.rand_like(p) * 0.3)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params, stats = convert_nfnet_state_dict(sd, depths=DEPTHS)
    fm = NFNet(
        depths=DEPTHS,
        channels=CHANNELS,
        stem_chs=STEM,
        group_size=GROUP,
        num_classes=10,
        attn_type="eca",
        final_mult=1.5,
    )
    return tm, fm, {"params": params}


def test_nfnet_import_logit_parity(synced):
    tm, fm, variables = synced
    x = np.random.default_rng(0).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    f_out = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_out, t_out, rtol=1e-3, atol=1e-3)


def test_nfnet_param_tree_fully_mapped(synced):
    """Every parameter our NFNet owns must be covered by the converter —
    catches silently-unmapped (randomly initialized) leaves."""
    tm, fm, variables = synced
    x = jnp.zeros((1, 32, 32, 3))
    ref = fm.init({"params": jax.random.PRNGKey(0)}, x, train=False)["params"]
    want = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(ref)}
    got = {jax.tree_util.keystr(k) for k, _ in jax.tree_util.tree_leaves_with_path(variables["params"])}
    assert want == got, want.symmetric_difference(got)

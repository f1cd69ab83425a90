"""VGG16-BN architecture parity vs a hand-built torch twin.

Completes the per-family torch-parity coverage (r50/r18, BResNet, NFNet
already have it): the conv trunk is the standard torchvision vgg16_bn
features layout (13 conv+BN+ReLU, 5 MaxPool(2,2)); the head is the GAP
variant the reference's own VGG recipe uses (62.vgg-cmodel.yaml — GAP +
512→4096→4096→C MLP instead of the 25088→4096 flatten monster)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from sota_imagenet_tpu.models import vgg16_bn
import pytest

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`

STAGES = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


class TorchVGG16BNGap(tnn.Module):
    def __init__(self, num_classes=10):
        super().__init__()
        layers, in_chs = [], 3
        for chs, n in STAGES:
            for _ in range(n):
                layers += [tnn.Conv2d(in_chs, chs, 3, padding=1, bias=False), tnn.BatchNorm2d(chs), tnn.ReLU()]
                in_chs = chs
            layers.append(tnn.MaxPool2d(2, 2))
        self.features = tnn.Sequential(*layers)
        self.head = tnn.Sequential(
            tnn.Linear(512, 4096), tnn.ReLU(), tnn.Dropout(0.5),
            tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(0.5),
            tnn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = x.mean(dim=(2, 3))
        return self.head(x)


def _sync_from_torch(tm: TorchVGG16BNGap, params, batch_stats):
    """Copy the torch twin's weights into our param/batch_stats trees."""
    params = jax.tree_util.tree_map(np.asarray, params)
    batch_stats = jax.tree_util.tree_map(np.asarray, batch_stats)
    convs = [m for m in tm.features if isinstance(m, tnn.Conv2d)]
    bns = [m for m in tm.features if isinstance(m, tnn.BatchNorm2d)]
    for i, (c, b) in enumerate(zip(convs, bns)):
        node = params[f"ConvBnAct_{i}"]
        node["Conv_0"]["Conv_0"]["kernel"] = c.weight.detach().numpy().transpose(2, 3, 1, 0)
        node["BatchNorm_0"]["BatchNorm_0"]["scale"] = b.weight.detach().numpy()
        node["BatchNorm_0"]["BatchNorm_0"]["bias"] = b.bias.detach().numpy()
        sb = batch_stats[f"ConvBnAct_{i}"]["BatchNorm_0"]["BatchNorm_0"]
        sb["mean"] = b.running_mean.detach().numpy()
        sb["var"] = b.running_var.detach().numpy()
    linears = [m for m in tm.head if isinstance(m, tnn.Linear)]
    for i, l in enumerate(linears):
        params[f"Linear_{i}"]["Dense_0"]["kernel"] = l.weight.detach().numpy().T
        params[f"Linear_{i}"]["Dense_0"]["bias"] = l.bias.detach().numpy()
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    return to_j(params), to_j(batch_stats)


def test_vgg16_bn_forward_parity():
    torch.manual_seed(0)
    tm = TorchVGG16BNGap(num_classes=10).eval()
    # non-trivial BN running stats so the normalization path is exercised
    with torch.no_grad():
        for m in tm.features:
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)

    model = vgg16_bn(num_classes=10)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, jnp.zeros((1, 64, 64, 3)), train=False)
    params, batch_stats = _sync_from_torch(tm, variables["params"], variables["batch_stats"])

    x = np.random.default_rng(0).standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(
        model.apply({"params": params, "batch_stats": batch_stats}, jnp.asarray(x), train=False)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

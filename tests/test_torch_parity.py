"""Architecture parity vs torch: a hand-built torch ResNet-50 (standard
torchvision layout) and our flax ResNet-50 must produce (near-)identical
eval outputs when the weights are synced via utils.torch_import. This is the
strongest evidence the architecture matches the reference's
pytorch_tools.models.resnet50 (torchvision-compatible, SURVEY §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from sota_imagenet_tpu.models import resnet50
from sota_imagenet_tpu.utils.torch_import import convert_resnet_state_dict

pytestmark = pytest.mark.slow  # heavy tier: excluded from `make test-fast`


class TorchBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet50(tnn.Module):
    def __init__(self, num_classes=1000):
        super().__init__()
        self.inplanes = 64
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(64, 3)
        self.layer2 = self._make_layer(128, 4, stride=2)
        self.layer3 = self._make_layer(256, 6, stride=2)
        self.layer4 = self._make_layer(512, 3, stride=2)
        self.avgpool = tnn.AdaptiveAvgPool2d(1)
        self.fc = tnn.Linear(2048, num_classes)

    def _make_layer(self, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * 4:
            downsample = tnn.Sequential(
                tnn.Conv2d(self.inplanes, planes * 4, 1, stride=stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )
        layers = [TorchBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        layers += [TorchBottleneck(self.inplanes, planes) for _ in range(1, blocks)]
        return tnn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.avgpool(x).flatten(1)
        return self.fc(x)


@pytest.fixture(scope="module")
def synced_models():
    torch.manual_seed(0)
    tm = TorchResNet50().eval()
    # randomize BN stats so the test isn't trivially mean=0/var=1
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
    sd = {k: v.numpy() for k, v in tm.state_dict().items() if "num_batches" not in k}
    params, stats = convert_resnet_state_dict(sd)
    fm = resnet50()
    return tm, fm, {"params": params, "batch_stats": stats}


def test_resnet50_forward_parity(synced_models):
    tm, fm, variables = synced_models
    x = np.random.default_rng(0).normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    f_out = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    assert t_out.shape == f_out.shape == (2, 1000)
    np.testing.assert_allclose(f_out, t_out, rtol=1e-3, atol=2e-3)


def test_resnet50_imagesize_224_parity(synced_models):
    tm, fm, variables = synced_models
    x = np.random.default_rng(1).normal(0, 1, (1, 224, 224, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    f_out = np.asarray(fm.apply(variables, jnp.asarray(x), train=False))
    # top-5 predictions identical, logits close
    assert list(np.argsort(t_out[0])[-5:]) == list(np.argsort(f_out[0])[-5:])
    np.testing.assert_allclose(f_out, t_out, rtol=2e-3, atol=5e-3)


def test_resnet18_import_parity():
    """BasicBlock path of the importer (bottleneck=False)."""
    from sota_imagenet_tpu.models import resnet18

    class TorchBasic(tnn.Module):
        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.relu = tnn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            idn = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            return self.relu(self.bn2(self.conv2(out)) + idn)

    class TorchResNet18(tnn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU()
            self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
            for li, (planes, stride) in enumerate(((64, 1), (128, 2), (256, 2), (512, 2)), start=1):
                down = None
                if stride != 1 or self.inplanes != planes:
                    down = tnn.Sequential(
                        tnn.Conv2d(self.inplanes, planes, 1, stride=stride, bias=False), tnn.BatchNorm2d(planes)
                    )
                setattr(self, f"layer{li}", tnn.Sequential(
                    TorchBasic(self.inplanes, planes, stride, down), TorchBasic(planes, planes)
                ))
                self.inplanes = planes
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc = tnn.Linear(512, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            return self.fc(self.avgpool(x).flatten(1))

    torch.manual_seed(1)
    tm = TorchResNet18().eval()
    sd = {k: v.numpy() for k, v in tm.state_dict().items() if "num_batches" not in k}
    params, stats = convert_resnet_state_dict(sd, layers=(2, 2, 2, 2), bottleneck=False)
    fm = resnet18()
    x = np.random.default_rng(2).normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.tensor(x).permute(0, 3, 1, 2)).numpy()
    f_out = np.asarray(fm.apply({"params": params, "batch_stats": stats}, jnp.asarray(x), train=False))
    np.testing.assert_allclose(f_out, t_out, rtol=1e-3, atol=2e-3)

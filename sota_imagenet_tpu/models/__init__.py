"""Model zoo. Registers every model/module target name used by configs
(including reference-compatible aliases like ``pytorch_tools.models.resnet50``)."""

from sota_imagenet_tpu import registry
from sota_imagenet_tpu.models import attention, blocks, cmodel, layers, nfnet, norms, parametrize, resnet
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.models.nfnet import NFNet, eca_nfnet_l0, eca_nfnet_l1
from sota_imagenet_tpu.models.resnet import bresnet50, resnet18, resnet34, resnet50, resnet101

registry.register("resnet18", aliases=("pytorch_tools.models.resnet18",))(resnet18)
registry.register("resnet34", aliases=("pytorch_tools.models.resnet34",))(resnet34)
registry.register("resnet50", aliases=("pytorch_tools.models.resnet50",))(resnet50)
registry.register("resnet101", aliases=("pytorch_tools.models.resnet101",))(resnet101)
registry.register("bresnet50")(bresnet50)
registry.register("eca_nfnet_l0", aliases=("timm.models.eca_nfnet_l0",))(eca_nfnet_l0)
registry.register("eca_nfnet_l1", aliases=("timm.models.eca_nfnet_l1",))(eca_nfnet_l1)


def vgg16_bn(num_classes: int = 1000, **kwargs):
    """VGG16-BN (timm.models.vgg16_bn is referenced by SURVEY §2.2): standard
    13-conv layout with BN, GAP head variant (the reference's own VGG work
    showed GAP saves ~100M params for equal accuracy, 62.vgg-cmodel.yaml)."""
    kwargs.pop("pretrained", None)
    cfg = []
    in_chs = 3
    for stage_chs, n in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
        for _ in range(n):
            cfg.append({"module": "ConvBnAct", "args": [in_chs, stage_chs], "kwargs": {"activation": "relu"}})
            in_chs = stage_chs
        cfg.append({"module": "MaxPool2d", "args": [2, 2]})
    cfg += [
        {"module": "FastGlobalAvgPool2d", "kwargs": {"flatten": True}},
        {"module": "Linear", "args": [512, 4096]},
        {"module": "ReLU"},
        {"module": "Dropout", "args": [0.5]},
        {"module": "Linear", "args": [4096, 4096]},
        {"module": "ReLU"},
        {"module": "Dropout", "args": [0.5]},
        {"module": "Linear", "args": [4096, num_classes]},
    ]
    return CModel(layer_config=tuple(cfg), **kwargs)


registry.register("vgg16_bn", aliases=("timm.models.vgg16_bn", "pytorch_tools.models.vgg16_bn"))(vgg16_bn)
registry.register("CModel", aliases=("src.model.CModel", "sota_imagenet.model.CModel", "cmodel"))(
    lambda layer_config, extra_kwargs=None, **kw: CModel(
        layer_config=tuple(_freeze(e) for e in layer_config), extra_kwargs=extra_kwargs, **kw
    )
)


def _freeze(e):
    # linen module attributes must be hashable-ish; keep dicts (flax wraps them)
    return e

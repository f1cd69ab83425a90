"""Model zoo. Registers every model/module target name used by configs
(including reference-compatible aliases like ``pytorch_tools.models.resnet50``)."""

from sota_imagenet_tpu import registry
from sota_imagenet_tpu.models import attention, bnet, blocks, cmodel, extras, layers, nfnet, norms, parametrize, resnet
from sota_imagenet_tpu.models.cmodel import CModel
from sota_imagenet_tpu.models.nfnet import NFNet, eca_nfnet_l0, eca_nfnet_l1
from sota_imagenet_tpu.models.resnet import Bottleneck, ResNet, bresnet50, resnet18, resnet34, resnet50, resnet101

registry.register("resnet18", aliases=("pytorch_tools.models.resnet18",))(resnet18)
registry.register("resnet34", aliases=("pytorch_tools.models.resnet34",))(resnet34)
registry.register("resnet50", aliases=("pytorch_tools.models.resnet50",))(resnet50)
registry.register("resnet101", aliases=("pytorch_tools.models.resnet101",))(resnet101)
registry.register("bresnet50")(bresnet50)
registry.register("eca_nfnet_l0", aliases=("timm.models.eca_nfnet_l0",))(eca_nfnet_l0)
registry.register("eca_nfnet_l1", aliases=("timm.models.eca_nfnet_l1",))(eca_nfnet_l1)

# --- BNet family (legacy `arch:` names, configs/_old_configs) ---
registry.register("BNet", aliases=("bnet",))(bnet.bnet)
registry.register("simpl_resnet34")(bnet.simpl_resnet34)
registry.register("simpl_resnet50")(bnet.simpl_resnet50)
registry.register("simpl_preactresnet34")(bnet.simpl_preactresnet34)
registry.register("csp_simpl_resnet34")(bnet.csp_simpl_resnet34)
registry.register("simpl_dark")(bnet.simpl_dark)
registry.register("csp_simpl_dark")(bnet.csp_simpl_dark)
registry.register("GENet_normal", aliases=("genet_normal",))(bnet.genet_normal)


def _se_resnet(layers, **kwargs):
    kwargs.pop("pretrained", None)
    defaults = dict(attn_type="se")
    defaults.update(kwargs)
    # legacy model_params use deep_stem=True (se_resnet50_better.yaml)
    if defaults.pop("deep_stem", False):
        defaults["stem_type"] = "deep"
    return ResNet(block=Bottleneck, layers=tuple(layers), **defaults)


def se_resnet50(**kwargs):
    """SE-ResNet-50 (legacy ``arch: se_resnet50``, _first_attempts)."""
    return _se_resnet((3, 4, 6, 3), **kwargs)


def resnext50_32x4d(**kwargs):
    kwargs.pop("pretrained", None)
    if kwargs.pop("deep_stem", False):
        kwargs["stem_type"] = "deep"
    return ResNet(block=Bottleneck, layers=(3, 4, 6, 3), groups=32, base_width=4, **kwargs)


def resnext101_32x4d(**kwargs):
    """ResNeXt-101 32x4d (legacy ``arch: resnext101_32x4d``)."""
    kwargs.pop("pretrained", None)
    if kwargs.pop("deep_stem", False):
        kwargs["stem_type"] = "deep"
    return ResNet(block=Bottleneck, layers=(3, 4, 23, 3), groups=32, base_width=4, **kwargs)


def se_resnext50_32x4d(**kwargs):
    kwargs.setdefault("attn_type", "se")
    return resnext50_32x4d(**kwargs)


registry.register("se_resnet50", aliases=("pytorch_tools.models.se_resnet50",))(se_resnet50)
registry.register("resnext50_32x4d")(resnext50_32x4d)
registry.register("resnext101_32x4d")(resnext101_32x4d)
registry.register("se_resnext50_32x4d")(se_resnext50_32x4d)

# --- legacy one-off archs (models/extras.py) ---
registry.register("darknet53", aliases=("timm_darknet53",))(extras.darknet53)
registry.register("cspdarknet53", aliases=("timm_cspdarknet53",))(extras.cspdarknet53)
registry.register("densenet121")(extras.densenet121)
registry.register("efficientnet_b0", aliases=("effnetb0", "effnetb0_tf"))(extras.efficientnet_b0)
registry.register("tresnetm")(extras.tresnetm)


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

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
registry.register("CModel", aliases=("src.model.CModel", "sota_imagenet.model.CModel", "cmodel"))(
    lambda layer_config, extra_kwargs=None, **kw: CModel(
        layer_config=tuple(_freeze(e) for e in layer_config), extra_kwargs=extra_kwargs, **kw
    )
)


def _freeze(e):
    # linen module attributes must be hashable-ish; keep dicts (flax wraps them)
    return e

from sota_imagenet_tpu import registry
from sota_imagenet_tpu.losses.base import FnLoss, Loss, SumLoss, WeightedLoss
from sota_imagenet_tpu.losses.smooth import BinaryKLDivLoss, CrossEntropyLoss, FocalLoss, SigmoidLoss
from sota_imagenet_tpu.losses.wrappers import FixMatchLoss, HardNegativeWrapper

registry.register("cross_entropy", aliases=("pytorch_tools.losses.smooth.CrossEntropyLoss", "CrossEntropyLoss"))(
    CrossEntropyLoss
)
registry.register("focal", aliases=("pytorch_tools.losses.FocalLoss", "FocalLoss"))(FocalLoss)
registry.register("binary_kl", aliases=("pytorch_tools.losses.BinaryKLDivLoss", "BinaryKLDivLoss"))(BinaryKLDivLoss)
registry.register("sigmoid_loss", aliases=("SigmoidLoss",))(SigmoidLoss)
registry.register("hard_negative", aliases=("src.utils.HardNegativeWrapper", "HardNegativeWrapper"))(
    HardNegativeWrapper
)
registry.register("fixmatch", aliases=("src.utils.FixMatchLoss", "FixMatchLoss"))(FixMatchLoss)

from sota_imagenet_tpu.losses.angular import (  # noqa: E402
    AdaCos,
    AdditiveAngularMarginLoss,
    AngularPenaltySMLoss,
    ArcCosSoftmax,
    ArcCosSoftmaxCenter,
    DSoftmax_intra,
    LargeMarginCosineLoss,
    MyLoss1,
    NegativeContrastive,
    SphereCosMAELoss,
    SphereLinearLayer,
    SphereMAELoss,
    SphereMLPLayer,
)

registry.register("adacos", aliases=("src.angular_losses.AdaCos", "AdaCos"))(AdaCos)
registry.register("arcface", aliases=("src.angular_losses.AdditiveAngularMarginLoss", "AdditiveAngularMarginLoss"))(
    AdditiveAngularMarginLoss
)
registry.register("cosface", aliases=("src.angular_losses.LargeMarginCosineLoss", "LargeMarginCosineLoss"))(
    LargeMarginCosineLoss
)
registry.register("angular_penalty", aliases=("src.angular_losses.AngularPenaltySMLoss", "AngularPenaltySMLoss"))(
    AngularPenaltySMLoss
)
registry.register("sphere_mae", aliases=("SphereMAELoss",))(SphereMAELoss)
registry.register("sphere_cos_mae", aliases=("SphereCosMAELoss",))(SphereCosMAELoss)
registry.register("negative_contrastive", aliases=("NegativeContrastive",))(NegativeContrastive)
registry.register("dsoftmax_intra", aliases=("DSoftmax_intra",))(DSoftmax_intra)
registry.register("myloss1", aliases=("MyLoss1",))(MyLoss1)
registry.register("arccos_softmax", aliases=("ArcCosSoftmax",))(ArcCosSoftmax)
registry.register("arccos_softmax_center", aliases=("ArcCosSoftmaxCenter",))(ArcCosSoftmaxCenter)

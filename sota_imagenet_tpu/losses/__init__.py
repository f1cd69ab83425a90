from sota_imagenet_tpu import registry
from sota_imagenet_tpu.losses.base import FnLoss, Loss, SumLoss, WeightedLoss
from sota_imagenet_tpu.losses.smooth import (
    BinaryFocalLoss,
    BinaryKLDivLoss,
    CrossEntropyLoss,
    FocalLoss,
    SigmoidLoss,
)
from sota_imagenet_tpu.losses.wrappers import FixMatchLoss, HardNegativeWrapper

# legacy flat-schema criterion names (configs/_old_configs; the old trainer's
# LOSS_FROM_NAME-style lookup, reference angular_losses.py:619-629) are
# registered as aliases next to the canonical names.
registry.register(
    "cross_entropy",
    aliases=(
        "pytorch_tools.losses.smooth.CrossEntropyLoss",
        "CrossEntropyLoss",
        # legacy 'a-softmax' = sphere-normalized linear + CE(logits/temperature)
        # ("scale is inside CCE", exp89.BNet_asoft.yaml); the sphere head is
        # model-side (BNet sphere_fc) — the criterion is plain tempered CE
        "a-softmax",
        "normalized_ce",
    ),
)(CrossEntropyLoss)
registry.register("focal", aliases=("pytorch_tools.losses.FocalLoss", "FocalLoss"))(FocalLoss)
registry.register(
    "binary_focal",
    aliases=("BinaryFocalLoss", "a-focal"),  # a-focal: pass temperature (exp91)
)(BinaryFocalLoss)
registry.register(
    "binary_kl", aliases=("pytorch_tools.losses.BinaryKLDivLoss", "BinaryKLDivLoss", "kld")
)(BinaryKLDivLoss)
registry.register("sigmoid_loss", aliases=("SigmoidLoss", "sigmoid"))(SigmoidLoss)
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

# 'mlp_adacos' (exp102) = AdaCos criterion; the MLP projector is the model's
# sphere head (BNet sphere_mlp / SphereMLPLayer)
registry.register("adacos", aliases=("src.angular_losses.AdaCos", "AdaCos", "mlp_adacos"))(AdaCos)
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
registry.register("myloss1", aliases=("MyLoss1", "my_loss_1"))(MyLoss1)
registry.register("arccos_softmax", aliases=("ArcCosSoftmax", "arc-softmax"))(ArcCosSoftmax)
registry.register("arccos_softmax_center", aliases=("ArcCosSoftmaxCenter", "arc-softmax-center"))(
    ArcCosSoftmaxCenter
)

from sota_imagenet_tpu.utils.logging import get_logger, setup_logger
from sota_imagenet_tpu.utils.misc import (
    count_parameters,
    filter_from_weight_decay,
    listify,
    set_random_seed,
)

from sota_imagenet_tpu.parallel.mesh import (
    apply_head_tp,
    apply_zero1,
    batch_sharding,
    create_mesh,
    image_sharding,
    replicate,
    shard_batch,
    tp_sharding,
    validate_spatial_extent,
    zero1_opt_sharding,
)

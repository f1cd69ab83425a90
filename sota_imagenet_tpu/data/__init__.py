from sota_imagenet_tpu.data.packed import PackedLoader, create_packed_records
from sota_imagenet_tpu.data.pipeline import DataManager, DeviceFeed, FolderLoader, SyntheticLoader, build_loader
